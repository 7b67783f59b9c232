"""North-star single-chip probe: find the training configuration that fits.

The reference's flagship claim is hundreds of millions of vertices /
billions of edges on a Spark cluster (/root/reference/README.md:28).  This
probe runs the >=100M-edge scale-23 RMAT end to end on ONE 16 GiB v5e and
bisects the training-stage OOM observed in round 4: static sets are 7.13
GiB blocked tables + 4.3 GiB dim-64 tables = 11.4 GiB, and the streaming
SGNS epoch at batch 8192 exhausts HBM (XLA carries table-sized transients
inside the epoch scan on top of the prefetched walk chunk).

Modes (sys.argv[1]):
  stream <dim> <batch>  — fit_streaming over the virtual corpus
  staged <dim> <batch>  — run_device (corpus materialized ON DEVICE, ~0.7
                          GiB), FREE the blocked tables, then fit() — the
                          reference's own stage handoff (walk -> embed via
                          parquet, examples/native_spark.py:50-61) done as
                          a device buffer instead of files; fits dim 128
                          (8.6 GiB tables) because graph and trainer never
                          coexist
Host CSR is cached to /tmp/ns23_csr.npz so repeat attempts skip the 190s
rmat gen + build.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

import numpy as np


def get_graph(scale: int):
    from node2vec_tpu.graph.csr import Graph
    from node2vec_tpu.graph.ingest import build_graph
    from scale_test import rmat_edges

    cache = f"/tmp/ns{scale}_csr.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        g = Graph(
            indptr=z["indptr"], indices=z["indices"], weights=z["weights"],
            alias=z["alias"], prob=z["prob"],
        )
        print(f"loaded cached CSR: V={g.n_vertices:,} E={g.n_edges:,}",
              flush=True)
        return g
    t0 = time.perf_counter()
    src, dst = rmat_edges(scale, 8 * (1 << scale))
    print(f"rmat gen: {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    g = build_graph((src, dst), indexed=True, directed=False,
                    max_out_degree=10_000, random_seed=0)
    print(f"build: {time.perf_counter() - t0:.0f}s  V={g.n_vertices:,} "
          f"E={g.n_edges:,}", flush=True)
    np.savez(cache, indptr=g.indptr, indices=g.indices, weights=g.weights,
             alias=g.alias, prob=g.prob)
    return g


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "stream"
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    batch_walks = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
    scale = int(os.environ.get("NS_SCALE", 23))
    walk_length = 20

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from node2vec_tpu.constants import Node2VecParams, Word2VecParams
    from node2vec_tpu.models.word2vec import Word2VecTPU
    from node2vec_tpu.walk.blocked import build_blocked_graph
    from node2vec_tpu.walk.engine import WalkEngine

    g = get_graph(scale)
    t0 = time.perf_counter()
    bg = build_blocked_graph(g.indptr, g.indices, g.weights)
    table_bytes = sum(int(np.prod(a.shape)) * 4
                      for a in (bg.light, bg.biw, bg.bids, bg.brp))
    print(f"pack: {time.perf_counter() - t0:.0f}s  tables="
          f"{table_bytes / 2**30:.2f} GiB", flush=True)

    params = Node2VecParams(num_walks=1, walk_length=walk_length,
                            return_param=0.25, inout_param=4.0)
    engine = WalkEngine(g, params, strategy="blocked", blocked_graph=bg)
    n_positions = g.n_vertices * (walk_length + 1)
    w2v = Word2VecParams(min_count=1, vector_size=dim, max_iter=1,
                         batch_walks=batch_walks)
    model = Word2VecTPU(w2v)

    if mode == "stream":
        n_chunks, chunk_walks, source = engine.chunk_source(seed=0)
        print(f"stream dim={dim} batch={batch_walks}: {n_chunks} chunks x "
              f"{chunk_walks:,}", flush=True)
        t0 = time.perf_counter()
        model.fit_streaming(source, n_chunks, g.n_vertices)
        train_s = time.perf_counter() - t0
    else:  # staged
        t0 = time.perf_counter()
        corpus = engine.run_device(seed=0)
        corpus.block_until_ready()
        walk_s = time.perf_counter() - t0
        print(f"staged: corpus on device {corpus.shape} "
              f"({corpus.nbytes / 2**30:.2f} GiB, {walk_s:.0f}s walks)",
              flush=True)
        # free the graph: trainer tables and blocked tables never coexist
        del engine, bg
        import gc
        gc.collect()
        t0 = time.perf_counter()
        model.fit(corpus, n_vertices=g.n_vertices)
        train_s = time.perf_counter() - t0

    nominal = n_positions * 2 * w2v.window_size
    print(f"{mode} dim={dim} batch={batch_walks}: train {train_s:.0f}s  "
          f"{nominal / train_s / 1e6:.1f}M nominal pairs/s  "
          f"loss={model._losses[-1]:.4f}", flush=True)
    assert np.isfinite(model._losses[-1])


if __name__ == "__main__":
    main()
