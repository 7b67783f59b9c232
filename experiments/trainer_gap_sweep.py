"""Chase the quality gap the reference oracle exposed (round 4).

experiments/ref_w2v_oracle.py measured the sequential word2vec.c-semantics
oracle at micro-F1 0.947 (SGNS) / 0.925 (HS) on multilabel-3k where
Word2VecTPU reads 0.597 / 0.729 with IDENTICAL walks and dim/window/epochs.
This sweep isolates which trainer knob carries the gap: batch size (one
Adagrad update per 8192-walk batch vs per pair), shared negatives (64 per
batch vs 5 fresh per pair), step size, epochs.

Run: python experiments/trainer_gap_sweep.py
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
        negative = kw.pop("negative", 5)
        shared = kw.pop("shared_negatives", 64)
        p = Word2VecParams(
            min_count=1, vector_size=dim, window_size=window,
            negative=negative, seed=1, **kw,
        )
        t0 = time.time()
        m = Word2VecTPU(p, shared_negatives=shared).fit(
            walks, n_vertices=g.n_vertices
        )
        f1 = multilabel_f1(
            np.asarray(m.emb_in), labels, train_ratio=0.5, seed=3
        )
        print(
            f"{tag:44s} micro={f1['micro_f1']:.3f} "
            f"macro={f1['macro_f1']:.3f} ({time.time() - t0:.0f}s)",
            flush=True,
        )
        return f1["micro_f1"]

    run("baseline (batch 8192, shared 64, e5)", max_iter=5)
    run("batch 1024", max_iter=5, batch_walks=1024)
    run("batch 256", max_iter=5, batch_walks=256)
    run("batch 64", max_iter=5, batch_walks=64)
    run("shared_negatives 16", max_iter=5, shared_negatives=16)
    run("shared_negatives 256", max_iter=5, shared_negatives=256)
    run("batch 256 + shared 256", max_iter=5, batch_walks=256,
        shared_negatives=256)
    run("epochs 20", max_iter=20)
    run("batch 256 + epochs 20", max_iter=20, batch_walks=256)
    run("lr 0.05", max_iter=5, step_size=0.05)
    run("batch 256 + lr 0.05", max_iter=5, batch_walks=256, step_size=0.05)
    # HS variants
    run("HS baseline (batch 8192, e5)", negative=0, max_iter=5)
    run("HS batch 256", negative=0, max_iter=5, batch_walks=256)
    run("HS batch 256 + e20", negative=0, max_iter=20, batch_walks=256)


if __name__ == "__main__":
    sys.exit(main())
