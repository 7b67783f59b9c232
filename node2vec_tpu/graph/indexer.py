"""Vertex indexing: arbitrary vertex names -> dense int32 ids and back.

Parity with reference ``/root/reference/node2vec/indexer.py:9-82``: collect the
union of src/dst names, assign each distinct name a dense id, relabel edges,
keep a name<->id table for the return trip.  We use sorted-unique order (the
reference's spark path does ``distinct().sort().zipWithIndex``,
``indexer.py:69-71``); its pandas path uses first-appearance order — a known
divergence the reference itself ships (SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd


def index_edges(
    src: np.ndarray, dst: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Map arbitrary vertex names to dense ids.

    Returns (src_ids int32, dst_ids int32, names) where ``names[id]`` is the
    original vertex name (sorted ascending, so ids are deterministic).
    """
    src = np.asarray(src)
    dst = np.asarray(dst)
    if (
        np.issubdtype(src.dtype, np.integer)
        and np.issubdtype(dst.dtype, np.integer)
        and np.can_cast(src.dtype, np.int64)  # uint64 would wrap: fallback
        and np.can_cast(dst.dtype, np.int64)
    ):
        from node2vec_tpu import native

        if native.available():
            # parallel C++ path (bit-compatible: sorted-unique order either way)
            src_ids, dst_ids, names = native.index_edges_i64(src, dst)
            out_dtype = np.result_type(src.dtype, dst.dtype)  # numpy concat rule
            if names.size and out_dtype != np.int64:
                names = names.astype(out_dtype)
            return src_ids, dst_ids, names
    all_names = np.concatenate([src, dst])
    # string/object names: hash-table factorize (C) then sort only the
    # UNIQUES — 3-6x over np.unique's full sort of the 2E-element array,
    # bit-identical ids (measured: 31.6s -> 5.5s at 10M object names).
    # use_na_sentinel=False keeps NaN names as ordinary uniques (matching
    # np.unique) instead of dropping them to code -1.
    try:
        codes, uniques = pd.factorize(
            all_names, sort=False, use_na_sentinel=False
        )
    except TypeError:  # unhashable names (e.g. lists): np.unique's error wins
        uniques = None
    if uniques is not None and len(uniques):
        order = np.argsort(uniques)
        rank = np.empty(len(order), dtype=np.int64)
        rank[order] = np.arange(len(order))
        inverse = rank[codes]
        names = np.asarray(uniques)[order]
        if names.dtype != all_names.dtype and all_names.dtype.kind != "O":
            names = names.astype(all_names.dtype)  # pandas re-infers widths
    else:
        names, inverse = np.unique(all_names, return_inverse=True)
    if len(names) > np.iinfo(np.int32).max:
        raise ValueError(f"Too many vertices for int32 ids: {len(names)}")
    inverse = inverse.astype(np.int32)
    n = len(src)
    return inverse[:n], inverse[n:], names


def index_graph_pandas(
    df: pd.DataFrame, indexed: bool = False
) -> Tuple[pd.DataFrame, Optional[pd.DataFrame]]:
    """DataFrame-level indexing mirroring reference ``indexer.py:9-49``.

    Input must have columns src/dst (+ optional weight, defaulted to 1.0,
    reference spark.py:490-491).  Returns (edges with int32 src/dst ids,
    name_id frame with columns [name, id]) — or (df, None) if already indexed.
    """
    if "src" not in df.columns or "dst" not in df.columns:
        raise ValueError(f"Input graph NOT in the right format: {list(df.columns)}")
    if "weight" not in df.columns:
        df = df.assign(weight=np.float32(1.0))
    if indexed:
        out = df[["src", "dst", "weight"]].copy()
        out["src"] = out["src"].astype(np.int32)
        out["dst"] = out["dst"].astype(np.int32)
        out["weight"] = out["weight"].astype(np.float32)
        return out, None
    src_ids, dst_ids, names = index_edges(df["src"].to_numpy(), df["dst"].to_numpy())
    edges = pd.DataFrame(
        {
            "src": src_ids,
            "dst": dst_ids,
            "weight": df["weight"].to_numpy().astype(np.float32),
        }
    )
    name_id = pd.DataFrame({"name": names, "id": np.arange(len(names), dtype=np.int32)})
    return edges, name_id
