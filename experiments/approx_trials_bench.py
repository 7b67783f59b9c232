"""A/B: prefix_sums matmul threshold + bounded-trial (approximate) bias mode.

Two questions, measured interleaved in ONE process on the real chip (tunnel
absolutes swing +-40%; only same-process interleaved ratios are trusted):

1. prefix_sums matmul_max_width 128 vs 256: does routing the blocked
   engine's [W, 256] block CDF through the MXU upper-tri matmul (like the
   dense engine's row CDF) beat cumsum's reduce-window lowering?
2. max_rejection_trials in {64, 4, 2, 1} on the biased heavy-tail walk:
   the exact sampler is at 99% of its gathers x attempts floor, so the only
   remaining lever is fewer attempts.  A cap of k forces lanes that failed
   k rejection rounds to accept the current proposal (drawn from the
   back-atom + prev-excluded-propto-w mixture) - an APPROXIMATE sampler
   whose error is confined to the forced fraction (reported).

Run: python experiments/approx_trials_bench.py  (real TPU via tunnel)

RESULTS (524k-vertex RMAT, 7.9M edges, max_deg 10k, v5e via tunnel):

1. threshold 128 vs 256 — NO reliable effect.  Biased is exactly 1.00x both
   rounds; unbiased flips sign between rounds (1.21x then 0.91x — the same
   config measured 9.2M then 13.0M, i.e. tunnel noise dwarfs any signal).
   The dense engine's matmul win does NOT transfer to the blocked engine's
   [W, 256] block CDF; default stays 128.

2. trial cap (p=.25, q=4, exact = cap 64 at 4.3-4.6M steps/s):
     cap 4:  5.6-6.2M (~1.3x), 8.4% of steps forced
     cap 2:  8.1-8.2M (~1.8x), 17.2% forced
     cap 1: 11.3-12.0M (~2.6x), 24.7% forced
   Consistent across interleaved rounds.  Quality impact of the forced
   fraction: experiments/approx_quality.py.
"""

import sys
import time

import os

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "examples")

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from scale_test import rmat_edges  # noqa: E402
from node2vec_tpu.graph.ingest import build_graph  # noqa: E402
from node2vec_tpu.constants import Node2VecParams  # noqa: E402
from node2vec_tpu.walk.engine import WalkEngine  # noqa: E402
import node2vec_tpu.ops.sampling as S  # noqa: E402
import node2vec_tpu.walk.blocked as B  # noqa: E402

W = 131072
L = 20


def make_engine(g, p, q, trials):
    return WalkEngine(
        g,
        Node2VecParams(
            num_walks=1,
            walk_length=L,
            walker_chunk=W,
            return_param=p,
            inout_param=q,
            max_rejection_trials=trials,
        ),
        strategy="blocked",
    )


def measure(g, starts, p, q, trials, thresh, reps=4):
    B.prefix_sums = lambda x, _t=thresh: S.prefix_sums(x, matmul_max_width=_t)
    assert hasattr(B.blocked_walk_chunk, "_clear_cache")
    B.blocked_walk_chunk._clear_cache()
    eng = make_engine(g, p, q, trials)
    w = eng._run_chunk(starts, gid_base=0, seed=7)  # warm/compile
    float(jnp.sum(jnp.where(w >= 0, w, 0)))
    eng.fallback_count = eng.attempt_count = 0
    t0 = time.perf_counter()
    for i in range(reps):
        w = eng._run_chunk(starts, gid_base=0, seed=1000 + i)
    float(jnp.sum(jnp.where(w >= 0, w, 0)))
    dt = (time.perf_counter() - t0) / reps
    steps = W * L
    att = eng.attempt_count / reps / steps
    fb = eng.fallback_count / reps / steps
    return steps / dt / 1e6, att, fb


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 19
    src, dst = rmat_edges(scale, 8 * (1 << scale))
    g = build_graph((src, dst), indexed=True, directed=False,
                    max_out_degree=10_000)
    print(f"graph: V={g.n_vertices} E={g.n_edges}", flush=True)
    starts = (
        np.arange(W, dtype=np.int64) * 2654435761 % g.n_vertices
    ).astype(np.int32)

    if os.environ.get("SKIP_PART1", "0") != "1":
        print("== part 1: prefix threshold (exact sampler, trials=64) ==")
        for r in range(2):
            for p, q in [(1.0, 1.0), (0.25, 4.0)]:
                a, _, _ = measure(g, starts, p, q, 64, 128)
                b, _, _ = measure(g, starts, p, q, 64, 256)
                print(
                    f"round {r} p={p} q={q}: thresh128 {a:.2f}M "
                    f"thresh256 {b:.2f}M ({b / a:.3f}x)",
                    flush=True,
                )

    print("== part 2: trial cap (production thresh 128, p=0.25 q=4.0) ==")
    for r in range(2):
        for trials in (64, 4, 2, 1):
            m, att, fb = measure(g, starts, 0.25, 4.0, trials, 128)
            print(
                f"round {r} cap={trials:3d}: {m:6.2f}M steps/s  "
                f"attempts/step {att:.2f}  forced frac {fb:.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
