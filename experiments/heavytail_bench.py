"""Heavy-tail walk engine shootout on the real chip: blocked vs csr.

The round-1 cliff (VERDICT what's-weak #2): CSR biased engine at 0.4M steps/s
on the 2.1M-vertex RMAT (max_deg 10k) vs 23M+ for the dense engine on
max_deg<=256 graphs.  Target: blocked >= 10M steps/s.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "examples")
from scale_test import rmat_edges  # noqa: E402

from node2vec_tpu.graph.ingest import build_graph  # noqa: E402
from node2vec_tpu.constants import Node2VecParams  # noqa: E402
from node2vec_tpu.walk import WalkEngine  # noqa: E402


def bench_engine(g, strategy, p, q, n_walkers=1 << 17, walk_length=40, reps=3):
    params = Node2VecParams(
        num_walks=1, walk_length=walk_length, return_param=p, inout_param=q,
        walker_chunk=n_walkers,
    )
    eng = WalkEngine(g, params, strategy=strategy)
    # RMAT leaves ~half the id space isolated; starting walkers there would
    # undercount steps/s 2x (they die at step 0) — sample live vertices
    live = np.flatnonzero(np.diff(g.indptr) > 0)
    starts = live[
        np.random.default_rng(0).integers(0, len(live), n_walkers)
    ].astype(np.int32)
    # compile + warm
    t0 = time.perf_counter()
    out = eng.run_device(seed=0, start_vertices=starts)
    steps = float(jnp.sum(out >= 0)) - n_walkers  # forces sync
    t_compile = time.perf_counter() - t0
    best = 0.0
    for r in range(reps):
        t0 = time.perf_counter()
        out = eng.run_device(seed=r + 1, start_vertices=starts)
        steps = float(jnp.sum(out >= 0)) - n_walkers
        dt = time.perf_counter() - t0
        best = max(best, steps / dt)
    print(
        f"{strategy:8s} p={p:<5} q={q:<5} compile+first={t_compile:6.1f}s "
        f"steady {best/1e6:8.2f}M steps/s (fallbacks {eng.fallback_count})",
        flush=True,
    )
    return best


def main():
    print("devices:", jax.devices(), flush=True)
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    n_edges = 8 * (1 << scale)
    t0 = time.perf_counter()
    src, dst = rmat_edges(scale, n_edges)
    g = build_graph(
        (src, dst), indexed=True, directed=False, max_out_degree=10_000
    )
    deg = g.out_degrees()
    print(
        f"graph: V={g.n_vertices:,} E={g.n_edges:,} max_deg={deg.max()} "
        f"p95={np.percentile(deg,95):.0f} build={time.perf_counter()-t0:.1f}s",
        flush=True,
    )
    strategies = sys.argv[2].split(",") if len(sys.argv) > 2 else ["blocked"]
    for p, q in [(1.0, 1.0), (0.25, 4.0), (4.0, 0.25)]:
        for strategy in strategies:
            # NOTE: csr at p=4/q=.25 reproducibly crashes the TPU worker
            # (kernel fault) — see ROADMAP; run it explicitly if needed
            bench_engine(g, strategy, p, q)


if __name__ == "__main__":
    main()
