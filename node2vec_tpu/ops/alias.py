"""Alias-method tables: host-side construction and device-side draws.

The alias method turns an O(deg) categorical draw into O(1): build a table of
(prob, alias) pairs once, then each draw is one uniform + one compare + one
gather.  The reference builds these tables *per walker per step* in Python
(``/root/reference/node2vec/randomwalk.py:157-232``); the TPU design instead
builds **first-order** tables once over the whole CSR (one entry per edge) and
applies the second-order p/q bias at draw time by rejection sampling
(see node2vec_tpu.walk.engine) — same output distribution, O(1) per draw,
fully vectorized.

Construction follows the same underfull/overfull LIFO-stack algorithm as the
reference (``randomwalk.py:170-190``) so unit tests can assert identical
tables, with a multithreaded C++ bulk path (node2vec_tpu.native) for whole-CSR
construction.
"""

from __future__ import annotations

from typing import List, Sequence, Set, Tuple

import numpy as np

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------- #
# Host-side construction
# --------------------------------------------------------------------------- #


def generate_alias_tables(node_weights: Sequence[float]) -> Tuple[List[int], List[float]]:
    """Build (alias, probs) for one weight vector.

    Matches reference ``randomwalk.py:157-190`` output exactly (same LIFO stack
    discipline), so golden-value tests transfer: probabilities are normalized
    by the mean weight; underfull/overfull stacks are filled in index order and
    popped from the end.
    """
    n = len(node_weights)
    if n == 0:
        return [], []
    alias = [0] * n
    avg_weight = sum(node_weights) / n
    if avg_weight <= 0:
        raise ValueError(f"Non-positive total weight in {node_weights!r}")
    probs = [w / avg_weight for w in node_weights]

    underfull: List[int] = []
    overfull: List[int] = []
    for i in range(n):
        (underfull if probs[i] < 1.0 else overfull).append(i)

    while underfull and overfull:
        under, over = underfull.pop(), overfull.pop()
        alias[under] = over
        probs[over] = probs[over] + probs[under] - 1.0
        (underfull if probs[over] < 1.0 else overfull).append(over)
    return alias, probs


def generate_edge_alias_tables(
    src_id: int,
    src_nbs_id: Set[int],
    dst_neighbors: Tuple[Sequence[int], Sequence[float]],
    return_param: float = 1.0,
    inout_param: float = 1.0,
) -> Tuple[List[int], List[float]]:
    """Second-order (p/q-biased) alias table for a single edge.

    API/behavior parity with reference ``randomwalk.py:193-232``: weight/p for
    the back-edge, weight for a shared neighbor, weight/q otherwise.  The TPU
    walk engine never materializes these (it rejection-samples instead); this
    exists for API parity, tests, and as the ground-truth oracle for the
    statistical walk tests.
    """
    if len(dst_neighbors) != 2 or len(dst_neighbors[0]) != len(dst_neighbors[1]):
        raise ValueError(f"Invalid neighbors tuple '{dst_neighbors}'!")
    if return_param == 0 or inout_param == 0:
        raise ValueError(
            f"Zero return ({return_param}) or inout ({inout_param}) parameter!"
        )
    biased: List[float] = []
    for nbr, weight in zip(dst_neighbors[0], dst_neighbors[1]):
        if nbr == src_id:
            biased.append(weight / return_param)
        elif nbr in src_nbs_id:
            biased.append(weight)
        else:
            biased.append(weight / inout_param)
    return generate_alias_tables(biased)


def _build_alias_csr_numpy(indptr: np.ndarray, weights: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Pure-numpy bulk alias build: one (alias, prob) entry per CSR edge.

    Per-vertex loop mirroring generate_alias_tables; the C++ path in
    node2vec_tpu.native is the production route — this is the fallback.
    """
    n_edges = int(indptr[-1])
    alias = np.zeros(n_edges, dtype=np.int32)
    prob = np.ones(n_edges, dtype=np.float32)
    w = np.asarray(weights, dtype=np.float64)
    for v in range(len(indptr) - 1):
        lo, hi = int(indptr[v]), int(indptr[v + 1])
        deg = hi - lo
        if deg == 0:
            continue
        seg = w[lo:hi]
        probs = seg * (deg / seg.sum())
        a = np.zeros(deg, dtype=np.int32)
        underfull = [i for i in range(deg) if probs[i] < 1.0]
        overfull = [i for i in range(deg) if probs[i] >= 1.0]
        while underfull and overfull:
            under, over = underfull.pop(), overfull.pop()
            a[under] = over
            probs[over] = probs[over] + probs[under] - 1.0
            (underfull if probs[over] < 1.0 else overfull).append(over)
        alias[lo:hi] = a
        prob[lo:hi] = probs.astype(np.float32)
    return alias, prob


def build_alias_csr(indptr: np.ndarray, weights: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Bulk first-order alias tables over an entire CSR graph.

    Returns (alias[E] int32 — *segment-local* alias slots, prob[E] float32).
    Uses the multithreaded C++ builder when available, numpy otherwise.
    """
    from node2vec_tpu import native

    if native.available():
        return native.build_alias_csr(indptr, weights)
    return _build_alias_csr_numpy(np.asarray(indptr), np.asarray(weights))


# --------------------------------------------------------------------------- #
# Device-side draws (jax)
# --------------------------------------------------------------------------- #


def alias_draw_single(
    alias: Sequence[int], probs: Sequence[float], r1: float, r2: float
) -> int:
    """Two-uniform alias draw, matching reference ``randomwalk.py:86-99``:
    pick slot floor(r1*n), keep it if r2 < prob else take its alias."""
    n = len(alias)
    i = min(int(r1 * n), n - 1)
    return i if r2 < probs[i] else int(alias[i])


def alias_draw_single_wiki(
    alias: Sequence[int], probs: Sequence[float], r: float
) -> int:
    """One-uniform alias draw, matching reference ``randomwalk.py:70-84``:
    split r*n into slot (integer part) and coin (fractional part)."""
    n = len(alias)
    scaled = r * n
    i = min(int(scaled), n - 1)
    frac = scaled - i
    return i if frac < probs[i] else int(alias[i])


def alias_draw(
    key: jax.Array,
    start: jax.Array,
    degree: jax.Array,
    alias: jax.Array,
    prob: jax.Array,
    indices: jax.Array,
) -> jax.Array:
    """Vectorized first-order neighbor draw for a batch of walkers.

    Args:
      key: PRNG key (consumed; caller splits).
      start: [W] int32 CSR segment start (indptr[v]) per walker.
      degree: [W] int32 segment length per walker (0 ⇒ output is garbage;
        caller masks dead walkers).
      alias, prob: [E] global alias tables (segment-local alias slots).
      indices: [E] int32 CSR neighbor ids.

    Returns [W] int32 sampled neighbor vertex ids.
    """
    k1, k2 = jax.random.split(key)
    shape = start.shape
    safe_deg = jnp.maximum(degree, 1)
    r1 = jax.random.uniform(k1, shape)
    r2 = jax.random.uniform(k2, shape)
    slot = jnp.minimum((r1 * safe_deg).astype(jnp.int32), safe_deg - 1)
    e = start + slot
    keep = r2 < prob[e]
    j = jnp.where(keep, slot, alias[e])
    return indices[start + j]
