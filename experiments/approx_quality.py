"""Quality impact of the bounded-trial (approximate) bias mode.

The blocked engine's trial cap (``Node2VecParams.max_rejection_trials``)
forces lanes that failed ``cap`` rejection rounds to accept the current
proposal — an approximate sampler whose error is confined to the forced
fraction.  This measures what that approximation costs where it matters:

1. one-step transition TV distance vs the analytic p/q distribution on a
   small graph where every distribution is enumerable exactly;
2. end-to-end multi-label F1 on a heavy-tail overlapping-community graph
   (degree_skew hubs -> blocked engine) at caps {64, 2, 1}.

Run: python experiments/approx_quality.py

RESULTS (v5e via tunnel):

1. worst-edge step-2 TV distance, 40-vertex hub graph (forced frac is much
   higher here than on RMAT — tiny rows, extreme hub):
     cap 64: 0.044 (pure sampling noise at ~2-4k samples/edge), 0% forced
     cap  2: 0.193, 10.6% forced
     cap  1: 0.348, 36.7% forced
   The approximation is a real per-edge distortion (biased toward the plain
   ∝w distribution), NOT noise — use it when downstream quality, not the
   transition law, is the target.

2. end-to-end multilabel F1 (4000 vertices, skew hubs, max_deg 739,
   p=.25/q=4, 50% train):
     cap 64: micro 0.838   cap 2: 0.835 (-0.003)   cap 1: 0.828 (-0.010)
   The embedding objective averages over ~320 window pairs per vertex, so
   per-step distortion washes out; cap=2 is near-free, cap=1 costs ~1 point.
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from node2vec_tpu.constants import Node2VecParams, Word2VecParams  # noqa: E402
from node2vec_tpu.datasets import run_quality, synthetic_multilabel  # noqa: E402
from node2vec_tpu.eval import analytic_second_order_probs  # noqa: E402
from node2vec_tpu.graph.csr import from_edge_arrays  # noqa: E402
from node2vec_tpu.walk import WalkEngine  # noqa: E402

P, Q = 0.25, 4.0


def tv_distance(cap: int, n_walks: int = 800000) -> tuple[float, float]:
    """Max-over-edges TV distance of the step-2 transition empirical
    distribution vs analytic, on a 40-vertex graph with a hub."""
    rng = np.random.default_rng(3)
    n = 40
    src = rng.integers(0, n, 260)
    dst = rng.integers(0, n, 260)
    hub_dst = rng.integers(0, n, 60)  # vertex 0 becomes a hub
    src = np.concatenate([src, np.zeros(60, np.int64)])
    dst = np.concatenate([dst, hub_dst])
    keep = src != dst
    g = from_edge_arrays(
        src[keep].astype(np.int32), dst[keep].astype(np.int32), directed=False
    )
    eng = WalkEngine(
        g,
        Node2VecParams(
            num_walks=n_walks // g.n_vertices,
            walk_length=2,
            return_param=P,
            inout_param=Q,
            max_rejection_trials=cap,
        ),
        strategy="blocked",
    )
    walks = np.asarray(eng.run(seed=11))
    forced = eng.fallback_count / max(eng.attempt_count, 1)

    worst = 0.0
    counts: dict[tuple[int, int], dict[int, int]] = {}
    for w in walks:
        if w[2] < 0:
            continue
        counts.setdefault((int(w[0]), int(w[1])), {}).setdefault(
            int(w[2]), 0
        )
        counts[(int(w[0]), int(w[1]))][int(w[2])] += 1
    n_eval = 0
    for (u, v), cnt in counts.items():
        tot = sum(cnt.values())
        if tot < 2000:
            continue
        n_eval += 1
        nbrs, probs = analytic_second_order_probs(g, u, v, P, Q)
        emp = np.array([cnt.get(int(x), 0) / tot for x in nbrs])
        tv = 0.5 * np.abs(emp - probs).sum()
        worst = max(worst, float(tv))
    assert n_eval > 20, f"only {n_eval} (prev,cur) pairs had enough samples"
    return worst, forced


def main() -> None:
    print("== step-2 transition TV distance (40-vertex hub graph) ==")
    for cap in (64, 2, 1):
        tv, forced = tv_distance(cap)
        print(
            f"cap={cap:3d}: worst-edge TV {tv:.4f}  forced frac {forced:.3f}",
            flush=True,
        )

    print("== end-to-end F1, heavy-tail multilabel graph (skew hubs) ==")
    g, labels = synthetic_multilabel(
        n_vertices=4000, seed=0, degree_skew=0.8, avg_degree=16
    )
    deg = np.diff(g.indptr)
    print(f"V={g.n_vertices} E={g.n_edges} max_deg={deg.max()}")
    for cap in (64, 2, 1):
        out = run_quality(
            g,
            labels,
            n2v_params=Node2VecParams(
                num_walks=8,
                walk_length=40,
                return_param=P,
                inout_param=Q,
                max_rejection_trials=cap,
            ),
            w2v_params=Word2VecParams(
                min_count=1, max_iter=5, vector_size=128
            ),
            train_ratios=(0.5,),
            seed=0,
        )
        print(
            f"cap={cap:3d}: micro_f1 {out['micro_f1@0.5']:.3f} "
            f"macro {out['macro_f1@0.5']:.3f} "
            f"(strategy {out['walk_strategy']})",
            flush=True,
        )


if __name__ == "__main__":
    main()
