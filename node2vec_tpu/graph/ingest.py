"""Graph ingestion: edge lists from DataFrames, arrays, or files -> Graph.

End-to-end preprocessing pipeline with parity to the reference's
``preprocess_input_graph`` (``/root/reference/node2vec/spark.py:470-534``) and
``trim_index`` (``fugue.py:24-77``): validate schema, default weight to 1.0,
optionally log1p-transform weights (the reference examples do this at ingest,
``examples/fugue_spark.py:37-39``), mirror for undirected graphs, trim hotspot
vertices, index names to dense ids, and build the CSR + alias tables.

Trim/mirror ordering follows the native-spark path by default (mirror BEFORE
trim, ``spark.py:496-497``); ``trim_before_mirror=True`` selects the fugue
ordering (``fugue.py:57-77``) — the reference ships both (SURVEY.md §2.6).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple, Union

import numpy as np
import pandas as pd

from node2vec_tpu.constants import MAX_OUT_DEGREES
from node2vec_tpu.graph.csr import Graph, from_edge_arrays, mirror_dedup
from node2vec_tpu.graph.indexer import index_edges
from node2vec_tpu.graph.trim import trim_hotspot_edges

EdgeInput = Union[pd.DataFrame, Tuple[np.ndarray, ...], str]


def _load_edge_columns(
    data: EdgeInput,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Normalize any supported input into (src, dst, weight-or-None) arrays."""
    if isinstance(data, str):
        ext = os.path.splitext(data)[1].lower()
        if ext in (".npz",):
            z = np.load(data, allow_pickle=True)
            return z["src"], z["dst"], (z["weight"] if "weight" in z else None)
        if ext in (".parquet", ".pq"):
            data = pd.read_parquet(data)
        elif ext in (".csv",):
            data = pd.read_csv(data)
        else:  # whitespace-separated edge list: src dst [weight]
            data = pd.read_csv(
                data,
                sep=r"\s+",
                comment="#",
                header=None,
                names=["src", "dst", "weight"],
            )
            if data["weight"].isna().all():
                data = data[["src", "dst"]]
    if isinstance(data, pd.DataFrame):
        if "src" not in data.columns or "dst" not in data.columns:
            raise ValueError(
                f"Input graph NOT in the right format: {list(data.columns)}"
            )
        w = data["weight"].to_numpy() if "weight" in data.columns else None
        return data["src"].to_numpy(), data["dst"].to_numpy(), w
    if isinstance(data, tuple):
        if len(data) == 2:
            return np.asarray(data[0]), np.asarray(data[1]), None
        if len(data) == 3:
            return np.asarray(data[0]), np.asarray(data[1]), np.asarray(data[2])
    raise TypeError(f"Unsupported edge input type: {type(data)!r}")


def build_graph(
    data: EdgeInput,
    *,
    indexed: bool = True,
    directed: bool = True,
    max_out_degree: int = 0,
    random_seed: Optional[int] = None,
    log1p_weight: bool = False,
    trim_before_mirror: bool = False,
) -> Graph:
    """Full ingest pipeline: load -> weight default -> [log1p] -> mirror/trim -> index -> CSR."""
    src, dst, weight = _load_edge_columns(data)
    if weight is None:
        weight = np.ones(len(src), dtype=np.float32)
    weight = np.asarray(weight, dtype=np.float32)
    if log1p_weight:
        weight = np.log1p(weight)
    if np.any(weight < 0):
        raise ValueError("negative edge weights are not supported")

    names = None
    if not indexed:
        src, dst, names = index_edges(src, dst)
    else:
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        if len(src) and (src.min() < 0 or dst.min() < 0):
            raise ValueError("indexed vertex ids must be non-negative")
        if len(src) and max(src.max(), dst.max()) >= 2**31:
            raise ValueError(
                "indexed vertex ids must fit int32 (< 2^31); re-index with "
                "indexed=False to map arbitrary ids to dense int32"
            )
        src = src.astype(np.int32)
        dst = dst.astype(np.int32)

    if max_out_degree <= 0:
        max_out_degree = MAX_OUT_DEGREES

    if not directed and not trim_before_mirror:
        # native-spark ordering: mirror first, then trim (spark.py:496-502)
        src, dst, weight = mirror_dedup(src, dst, weight)
    src, dst, weight = trim_hotspot_edges(src, dst, weight, max_out_degree, random_seed)
    if not directed and trim_before_mirror:
        # fugue ordering: trim first, mirror inside the indexer (fugue.py:57-77)
        src, dst, weight = mirror_dedup(src, dst, weight)

    n_vertices = len(names) if names is not None else (
        int(max(src.max(initial=-1), dst.max(initial=-1))) + 1 if len(src) else 0
    )
    # Mirroring already happened above, so build directed; record the logical flag.
    g = from_edge_arrays(
        src, dst, weight, n_vertices=n_vertices, names=names, directed=True
    )
    g.directed = directed
    return g
