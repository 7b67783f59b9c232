"""Per-occurrence vs pre-aggregated row-wise Adagrad for single-device SGNS.

The routed row-sharded trainer and the HS dense head both pre-aggregate
duplicate rows' gradients before ONE Adagrad update per row per batch; the
single-device SGNS scatter uses the per-occurrence recipe (each occurrence's
sq-mean summed, every occurrence scaled by the post-sum accumulator).  In HS
the pre-aggregated semantics alone fixed hot-row convergence (0.09 -> 1.22
separation on the example SBM).  This measures whether SGNS hubs care:
multilabel F1 on skew-hub graphs under both semantics, same data and seeds.

Run: python experiments/sgns_preagg_quality.py   (CPU or TPU)

RESULT (4000 vertices, 8x40 walks, dim 64, 5 epochs, 50% train, CPU):

    skew=0.0 max_deg=108: per-occ 0.934 vs preagg 0.906 micro-F1
    skew=0.8 max_deg=739: per-occ 0.876 vs preagg 0.856
    skew=1.2 max_deg=827: per-occ 0.692 vs preagg 0.685

NEGATIVE: pre-aggregation loses ~1-3 F1 points at every skew level (and the
sort+segment pass costs ~30% step time).  The HS win did NOT transfer —
SGNS hubs see ~10^2-10^3 occurrences/batch of mostly-uncorrelated pair
gradients (vs the HS root's 10^5 correlated ones), so the per-occurrence
accumulator's larger effective steps help rather than oscillate.  The
per-occurrence recipe stays the default; the ``preagg`` flag stays for
cheap re-testing at other scales.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from node2vec_tpu.constants import Node2VecParams  # noqa: E402
from node2vec_tpu.datasets import multilabel_f1, synthetic_multilabel  # noqa: E402
from node2vec_tpu.models.skipgram import init_embeddings, sgns_walk_step  # noqa: E402
from node2vec_tpu.models.vocab import build_vocab  # noqa: E402
from node2vec_tpu.walk import WalkEngine  # noqa: E402

DIM = 64
EPOCHS = 5
BATCH = 256
WINDOW = 5
LR = 0.05


def train(walks, n_vertices, preagg: bool):
    vocab = build_vocab(walks, n_vertices, min_count=1)
    emb_in, emb_out, acc_in, acc_out = init_embeddings(n_vertices, DIM, seed=1)
    ns_alias = jnp.asarray(vocab.ns_alias)
    ns_prob = jnp.asarray(vocab.ns_prob)
    mask = jnp.asarray(vocab.mask)
    n = (len(walks) // BATCH) * BATCH
    corpus = walks[:n]
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(7)
    losses = []
    for epoch in range(EPOCHS):
        order = rng.permutation(n)
        for b in range(n // BATCH):
            wb = jnp.asarray(corpus[order[b * BATCH : (b + 1) * BATCH]])
            emb_in, emb_out, acc_in, acc_out, loss = sgns_walk_step(
                emb_in, emb_out, acc_in, acc_out, wb,
                jax.random.fold_in(key, epoch * 10_000 + b),
                jnp.float32(LR), ns_alias, ns_prob, mask,
                window=WINDOW, negatives=5, shared_negatives=64,
                shrink_window=True, preagg=preagg,
            )
        losses.append(float(loss))
    return np.asarray(emb_in), losses


def main() -> None:
    for skew in (0.0, 0.8, 1.2):
        g, labels = synthetic_multilabel(
            n_vertices=4000, seed=0, degree_skew=skew, avg_degree=16
        )
        deg = np.diff(g.indptr)
        walks = WalkEngine(
            g, Node2VecParams(num_walks=8, walk_length=40)
        ).run(seed=3)
        for preagg in (False, True):
            t0 = time.perf_counter()
            emb, losses = train(walks, g.n_vertices, preagg)
            dt = time.perf_counter() - t0
            f1 = multilabel_f1(emb, labels, train_ratio=0.5, seed=0)
            print(
                f"skew={skew} max_deg={deg.max():5d} preagg={int(preagg)}: "
                f"micro_f1 {f1['micro_f1']:.3f} macro {f1['macro_f1']:.3f} "
                f"final_loss {losses[-1]:.3f} ({dt:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
