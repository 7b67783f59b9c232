"""Scale smoke test: ogbn-products-class graph size (2.4M vertices, ~60M
edges, skewed degrees) through the host graph core + a walk + training slice.

This is the BASELINE.json "ogbn-products" configuration shape run on
synthetic data (the environment has no dataset egress): an RMAT-style
power-law edge list, hotspot trimming, C++ CSR + alias construction, dense or
CSR walk engine selection by observed max degree, and a short SGNS run.

Run: python examples/scale_test.py [n_edges_millions]
"""

import sys
import time

import numpy as np


def rmat_edges(
    n_vertices_log2: int, n_edges: int, seed: int = 0
) -> "tuple[np.ndarray, np.ndarray]":
    """RMAT generator (a=0.57, b=c=0.19): power-law degree distribution."""
    rng = np.random.default_rng(seed)
    src = np.zeros(n_edges, dtype=np.int64)
    dst = np.zeros(n_edges, dtype=np.int64)
    a, b, c = 0.57, 0.19, 0.19
    for level in range(n_vertices_log2):
        r = rng.random(n_edges)
        src_bit = (r >= a + b).astype(np.int64)
        r2 = rng.random(n_edges)
        dst_bit = np.where(
            src_bit == 0, (r2 >= a / (a + b)).astype(np.int64),
            (r2 >= c / (c + (1 - a - b - c))).astype(np.int64),
        )
        src = (src << 1) | src_bit
        dst = (dst << 1) | dst_bit
    return src.astype(np.int32), dst.astype(np.int32)


def main() -> None:
    from node2vec_tpu import Node2Vec

    millions = float(sys.argv[1]) if len(sys.argv) > 1 else 16.0
    n_edges = int(millions * 1e6)
    log2_v = 21  # 2.1M vertex id space

    t0 = time.time()
    src, dst = rmat_edges(log2_v, n_edges)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    print(f"RMAT edges: {len(src):,} in {time.time()-t0:.1f}s")

    n2v = Node2Vec(
        n2v_params={"num_walks": 1, "walk_length": 10},
        w2v_params={"vector_size": 128, "max_iter": 1, "min_count": 1,
                    "batch_walks": 4096},
        max_out_degree=10_000,  # hotspot trimming engaged on the RMAT head
        random_seed=0,
    )
    t0 = time.time()
    g = n2v.preprocess_input_graph((src, dst), indexed=True, directed=False)
    print(
        f"graph build: V={g.n_vertices:,} E={g.n_edges:,} "
        f"max_deg={g.out_degrees().max():,} in {time.time()-t0:.1f}s"
    )

    t0 = time.time()
    walks = n2v.random_walk()
    steps = int((walks >= 0).sum()) - len(walks)
    dt = time.time() - t0
    print(f"walks: {walks.shape} ({steps/dt:,.0f} steps/s incl. host I/O) in {dt:.1f}s")

    t0 = time.time()
    n2v.fit()
    print(f"1-epoch SGNS: {time.time()-t0:.1f}s")
    print("vectors:", n2v.backend.model.vectors.shape)


if __name__ == "__main__":
    main()
