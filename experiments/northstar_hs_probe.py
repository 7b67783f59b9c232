"""Standalone scale-23 staged-HS probe (round-5 worker-crash fix).

The round-5 full bench crashed the TPU worker at the staged dim-128 HS
epoch (8.4M vertices).  Round 3 documented the fault shape: a CL-19
HS program runs on the CPU backend but dies through the remote-compile
service (BASELINE.md round 3; hs_max_code_length=18 sidesteps it).  This
probe reproduces JUST that stage — scale-23 graph, 1-walk corpus, one HS
dim-128 epoch — reporting the corpus tree's natural (tail-capped) code
length and then training with the CL-18 cap, so the bench fix is
validated without a 45-minute full run.

Run: python experiments/northstar_hs_probe.py [scale] [cap]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "examples"),
)


def main(scale=23, cap=18):
    import jax.numpy as jnp

    from bench import holdout_split
    from scale_test import rmat_edges

    from node2vec_tpu.constants import Node2VecParams, Word2VecParams
    from node2vec_tpu.graph.ingest import build_graph
    from node2vec_tpu.models.hsoftmax import build_huffman, cap_code_length
    from node2vec_tpu.models.vocab import build_vocab
    from node2vec_tpu.models.word2vec import Word2VecTPU
    from node2vec_tpu.walk.blocked import build_blocked_graph
    from node2vec_tpu.walk.engine import WalkEngine

    t0 = time.perf_counter()
    src, dst = rmat_edges(scale, 8 * (1 << scale))
    n_v_raw = int(max(src.max(), dst.max())) + 1
    src, dst, _, _ = holdout_split(
        src, dst, n_v_raw, min(100_000, len(src) // 100)
    )
    g = build_graph(
        (src, dst), indexed=True, directed=False, max_out_degree=10_000,
        random_seed=0,
    )
    del src, dst
    print(f"graph: V={g.n_vertices:,} E={g.n_edges:,} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)

    t0 = time.perf_counter()
    bg = build_blocked_graph(g.indptr, g.indices, g.weights)
    params = Node2VecParams(
        num_walks=1, walk_length=20, return_param=0.25, inout_param=4.0,
    )
    engine = WalkEngine(g, params, strategy="blocked", blocked_graph=bg)
    walks = engine.run(seed=0)
    print(f"1-walk corpus: {walks.shape} ({time.perf_counter() - t0:.0f}s)",
          flush=True)
    del engine, bg

    # the tree shape the bench's staged-HS stage would build uncapped
    vocab = build_vocab(walks, g.n_vertices, min_count=1)
    tree = cap_code_length(build_huffman(vocab.counts), vocab.counts)
    print(f"natural tail-capped CL = {tree.points.shape[1]} "
          f"(crash shape is CL>=19; cap under test = {cap})", flush=True)

    w2v_hs = Word2VecParams(
        min_count=1, vector_size=128, max_iter=1, batch_walks=2048,
        negative=0, hs_max_code_length=cap,
    )
    model = Word2VecTPU(w2v_hs)
    t0 = time.perf_counter()
    model.fit(jnp.asarray(walks), n_vertices=g.n_vertices)
    float(jnp.sum(model._emb_in[-1]))
    dt = time.perf_counter() - t0
    print(f"staged HS dim-128 CL{cap}: epoch {dt:.0f}s "
          f"loss {model._losses[-1]:.4f}", flush=True)
    assert np.isfinite(model._losses[-1])
    print("PROBE OK", flush=True)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
