"""ROADMAP item 12: can optimizer="sgd" close the residual SGNS band?

The sequential word2vec.c-semantics oracle (experiments/ref_w2v_oracle.py)
beats the batched-Adagrad trainer by ~0.13 micro-F1 at 5 epochs (~0.09 at
the reference's default 10) on the overlapping-community multilabel-3k
graph.  Round 4 added Word2VecParams(optimizer="sgd") — duplicate-mean
plain -lr*grad with the linear decay, i.e. the reference trainers' own
update rule applied once per vertex per batch.  This sweep measures whether
matching the optimizer (not just the objective) closes the band, plus the
batch-size/negative-pool staleness knobs (ROADMAP item 12's candidates).

MEASURED EN ROUTE (divergences that shaped the design): per-occurrence
summed SGD (-lr * sum over duplicates) NaNs on karate/multilabel-3k at lr
0.025 — hub rows sum hundreds of correlated stale gradients; duplicate-mean
alone still diverged (loss 3e14) because each SHARED negative row absorbs
the whole batch's negative mass (~n_pairs * negatives / s occurrences).
The shipped "sgd" mode therefore mean-scales both sides.

Identical walks to the oracle runs (seed 7, p=.25/q=4, 10x20); CPU backend
recommended for comparability with the BASELINE epoch-matched oracle reruns
(walks are backend-invariant counter-keyed).

Run: JAX_PLATFORMS=cpu python experiments/sgd_mode_sweep.py
"""

import sys
import time

import numpy as np


def main():
    from node2vec_tpu.constants import Node2VecParams, Word2VecParams
    from node2vec_tpu.datasets import multilabel_f1, synthetic_multilabel
    from node2vec_tpu.models.word2vec import Word2VecTPU
    from node2vec_tpu.walk import random_walks

    g, labels = synthetic_multilabel(seed=0)
    walks = random_walks(
        g,
        Node2VecParams(
            num_walks=10, walk_length=20, return_param=0.25, inout_param=4.0
        ),
        seed=7,
    )
    dim, window = 64, 5

    def run(tag, **kw):
        p = Word2VecParams(
            min_count=1, vector_size=dim, window_size=window, negative=5,
            seed=1, **kw,
        )
        t0 = time.time()
        m = Word2VecTPU(p).fit(walks, n_vertices=g.n_vertices)
        emb = np.asarray(m.emb_in)
        if not np.isfinite(emb).all():
            print(f"{tag:52s} DIVERGED (non-finite embeddings, "
                  f"{time.time() - t0:.0f}s)", flush=True)
            return float("nan")
        f1 = multilabel_f1(emb, labels, train_ratio=0.5, seed=3)
        print(
            f"{tag:52s} micro={f1['micro_f1']:.3f} "
            f"macro={f1['macro_f1']:.3f} ({time.time() - t0:.0f}s)",
            flush=True,
        )
        return f1["micro_f1"]

    # oracle reference points (BASELINE.md round-4 table, identical walks):
    # e5 micro 0.947, e10 0.944-0.947, e20 0.944
    for e in (5, 10):
        run(f"adagrad lr0.2 (default) e{e}", max_iter=e)
        # ROADMAP 12 candidate: staleness via smaller batches
        run(f"adagrad batch64 e{e}", max_iter=e, batch_walks=64)
        run(f"adagrad batch128 e{e}", max_iter=e, batch_walks=128)
        # ROADMAP 12 candidate: sgd rule at the reference's own lr
        run(f"sgd lr0.025 e{e}", optimizer="sgd", step_size=0.025, max_iter=e)
        run(f"sgd lr0.1 e{e}", optimizer="sgd", step_size=0.1, max_iter=e)
        run(f"sgd lr0.025 batch64 e{e}",
            optimizer="sgd", step_size=0.025, batch_walks=64, max_iter=e)


if __name__ == "__main__":
    sys.exit(main())
