"""Holdout link-prediction protocol comparison at north-star-class scale.

bench.py's full-config block scores held-out edges vs RANDOM non-edge
pairs — measured scale-19 results (BASELINE.md round 5): embedding AUC
0.694 @1 epoch, 0.632 @10 epochs, while a log-degree-product baseline
reads 0.991: on RMAT the random-negative protocol is almost entirely
degree-separable, so it probes degree encoding, not learned structure.

This probe adds DEGREE-MATCHED negatives (endpoints drawn from the edge-
endpoint distribution, true train/holdout edges excluded by sorted-key
membership) — the degree confound cancels and any AUC above 0.5 is
residual learned structure (RMAT's recursive-quadrant communities).

Run: python experiments/holdout_protocol.py [scale] [epochs]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def matched_negatives(src, dst, n_vertices, n, rng, edge_keys_sorted):
    """[n] degree-matched non-edge pairs: endpoints ~ edge-endpoint dist."""
    ends = np.concatenate([src, dst])
    out_u = np.empty(0, np.int64)
    out_v = np.empty(0, np.int64)
    while len(out_u) < n:
        u = ends[rng.integers(0, len(ends), n)].astype(np.int64)
        v = ends[rng.integers(0, len(ends), n)].astype(np.int64)
        ok = u != v
        u, v = u[ok], v[ok]
        key = np.minimum(u, v) * n_vertices + np.maximum(u, v)
        pos = np.searchsorted(edge_keys_sorted, key)
        pos = np.minimum(pos, len(edge_keys_sorted) - 1)
        is_edge = edge_keys_sorted[pos] == key
        out_u = np.concatenate([out_u, u[~is_edge]])
        out_v = np.concatenate([out_v, v[~is_edge]])
    return out_u[:n].astype(np.int32), out_v[:n].astype(np.int32)


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "examples"))
    sys.path.insert(0, root)
    import jax.numpy as jnp
    from scale_test import rmat_edges

    from bench import (
        _rank_auc,
        degree_baseline_auc,
        holdout_auc,
        holdout_split,
    )
    from node2vec_tpu.constants import Node2VecParams, Word2VecParams
    from node2vec_tpu.graph.ingest import build_graph
    from node2vec_tpu.models import Word2VecTPU
    from node2vec_tpu.walk.engine import WalkEngine

    rng = np.random.default_rng(5)
    src0, dst0 = rmat_edges(scale, 8 * (1 << scale))
    n_vertices = int(max(src0.max(), dst0.max())) + 1
    src, dst, pos_u, pos_v = holdout_split(
        src0, dst0, n_vertices, min(100_000, len(src0) // 100)
    )
    g = build_graph(
        (src, dst), indexed=True, directed=False, max_out_degree=10_000,
        random_seed=0,
    )
    log(f"graph: V={g.n_vertices:,} E={g.n_edges:,} holdout={len(pos_u):,}")

    # all known edges (train + holdout, undirected-canonical) for exclusion
    keys = np.unique(
        np.minimum(src0, dst0).astype(np.int64) * n_vertices
        + np.maximum(src0, dst0).astype(np.int64)
    )
    del src0, dst0

    params = Node2VecParams(
        num_walks=10, walk_length=20, return_param=0.25, inout_param=4.0,
        walker_chunk=1 << 17,
    )
    eng = WalkEngine(g, params, strategy="blocked")
    t0 = time.perf_counter()
    walks = eng.run(seed=0)
    log(f"walks {walks.shape} in {time.perf_counter()-t0:.0f}s")
    del eng

    m = Word2VecTPU(Word2VecParams(
        min_count=1, vector_size=128, max_iter=epochs, batch_walks=8192,
    ))
    t0 = time.perf_counter()
    m.fit_host(walks, n_vertices=g.n_vertices)
    log(f"fit {epochs} epoch(s) in {time.perf_counter()-t0:.0f}s "
        f"losses={[round(x,3) for x in m._losses]}")

    emb = m._emb_in
    auc_rand = holdout_auc(emb, pos_u, pos_v, g.n_vertices)
    deg_auc = degree_baseline_auc(
        np.diff(g.indptr).astype(np.int64), pos_u, pos_v, g.n_vertices
    )
    neg_u, neg_v = matched_negatives(
        src, dst, n_vertices, len(pos_u), rng, keys
    )

    def scores(u, v):
        return np.asarray(jnp.sum(
            emb[jnp.asarray(u)] * emb[jnp.asarray(v)], axis=-1
        ))

    auc_matched = _rank_auc(scores(pos_u, pos_v), scores(neg_u, neg_v))
    ld = np.log1p(np.diff(g.indptr).astype(np.float64))
    deg_matched = _rank_auc(
        ld[pos_u] + ld[pos_v], ld[neg_u] + ld[neg_v]
    )
    print(
        f"scale={scale} epochs={epochs}: random-neg emb AUC {auc_rand:.4f} "
        f"(degree baseline {deg_auc:.4f}) | degree-MATCHED emb AUC "
        f"{auc_matched:.4f} (degree baseline {deg_matched:.4f})"
    )


if __name__ == "__main__":
    main()
