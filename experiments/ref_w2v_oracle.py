"""Offline quality-parity oracle: a minimal sequential word2vec with the
REFERENCE's training semantics, compared against Word2VecTPU on IDENTICAL
walks (round-3 VERDICT item 3).

The environment has no gensim and no egress, so the reference's exact
embedding backends (``/root/reference/node2vec/embedding.py:120-127`` gensim
C kernels; ``spark.py:616-631`` spark.ml Scala HS) cannot run here.  The
oracle reimplements their TRAINING RULES from the public word2vec.c
schedule in ~110 lines of C++ (experiments/ref_w2v_core.cpp, compiled on
first use): strictly sequential per-pair SGD, skip-gram with negative
sampling (negative>0) or hierarchical softmax (negative=0, the reference
default, ``constants.py:65``), linear LR decay, per-position random window
shrink, unigram^0.75 negative table, the word2vec.c LCG.  The experiment
trains it and Word2VecTPU on the SAME walk corpus and scores both with the
same multi-label-F1 protocol.  Parity = overlapping quality bands.

(Quality parity, not bit parity: Word2VecTPU batches updates and uses
Adagrad — the objective and data are what must match, per SURVEY.md §7
"validate on F1 and link-pred AUC, not bit-exactness".  A vectorized
numpy oracle was tried first and DIVERGED: batching thousands of pairs per
update loses sequential SGD's per-pair saturation feedback on small dense
graphs — the C core exists because sequential semantics are load-bearing.)

Run: python experiments/ref_w2v_oracle.py            (~3-6 min, CPU ok)
"""

from __future__ import annotations

import sys
import time

import numpy as np


# --------------------------------------------------------------------------- #
# the oracle


import ctypes
import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "ref_w2v_core.cpp")
_LIB = os.path.join(_HERE, "libref_w2v.so")


def _load_core():
    if not os.path.exists(_LIB) or os.path.getmtime(_SRC) > os.path.getmtime(_LIB):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared",
             "-std=c++17", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
    lib = ctypes.CDLL(_LIB)
    lib.w2v_ref_train.restype = ctypes.c_int
    p_i64 = ctypes.POINTER(ctypes.c_int64)
    p_i32 = ctypes.POINTER(ctypes.c_int32)
    p_u8 = ctypes.POINTER(ctypes.c_uint8)
    p_f32 = ctypes.POINTER(ctypes.c_float)
    lib.w2v_ref_train.argtypes = [
        ctypes.c_int64, p_i64, p_i32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
        p_i32, p_u8, p_i32, ctypes.c_int32, p_i32, ctypes.c_int64,
        ctypes.c_uint64, p_f32, p_f32, p_f32,
    ]
    return lib


class RefWord2Vec:
    """Reference-semantics sequential skip-gram (C core, word2vec.c
    schedule): SGNS (negative>0) or HS (negative=0, the reference default,
    ``/root/reference/node2vec/constants.py:65``)."""

    def __init__(self, n_vertices, dim=64, window=5, negative=5, epochs=5,
                 alpha=0.025, min_alpha=1e-4, seed=1):
        self.V, self.D = n_vertices, dim
        self.window, self.negative = window, negative
        self.epochs, self.alpha0, self.min_alpha = epochs, alpha, min_alpha
        rng = np.random.default_rng(seed)
        # gensim init: syn0 uniform(-0.5/D, 0.5/D), syn1 zeros
        self.syn0 = rng.uniform(
            -0.5 / dim, 0.5 / dim, (n_vertices, dim)
        ).astype(np.float32)
        self.seed = seed

    def fit(self, walks, counts):
        lib = _load_core()
        use_hs = self.negative == 0
        if use_hs:
            from node2vec_tpu.models.hsoftmax import build_huffman

            tree = build_huffman(counts)
            points = np.ascontiguousarray(tree.points, np.int32)
            codes = np.ascontiguousarray(tree.codes, np.uint8)
            lengths = np.ascontiguousarray(tree.lengths, np.int32)
            cl = points.shape[1]
            self.syn1 = np.zeros((tree.n_inner, self.D), np.float32)
            neg_table = np.zeros(1, np.int32)
        else:
            points = np.zeros((1, 1), np.int32)
            codes = np.zeros((1, 1), np.uint8)
            lengths = np.zeros(1, np.int32)
            cl = 1
            self.syn1 = np.zeros((self.V, self.D), np.float32)
            # word2vec.c unigram^0.75 table (1e8 entries there; 1e7 here)
            p = np.maximum(counts.astype(np.float64), 0) ** 0.75
            cdf = np.cumsum(p / p.sum())
            neg_table = np.searchsorted(
                cdf, (np.arange(10_000_000) + 0.5) / 10_000_000
            ).astype(np.int32)
        sents = [w[w >= 0].astype(np.int32) for w in walks]
        sents = [s for s in sents if len(s) >= 1]
        offsets = np.zeros(len(sents) + 1, np.int64)
        np.cumsum([len(s) for s in sents], out=offsets[1:])
        flat = (
            np.concatenate(sents).astype(np.int32)
            if sents else np.zeros(0, np.int32)
        )
        scratch = np.zeros(self.D, np.float32)

        def ptr(a, t):
            return a.ctypes.data_as(ctypes.POINTER(t))

        rc = lib.w2v_ref_train(
            len(sents), ptr(offsets, ctypes.c_int64),
            ptr(flat, ctypes.c_int32), self.D, self.window, self.negative,
            self.epochs, self.alpha0, self.min_alpha,
            ptr(points, ctypes.c_int32), ptr(codes, ctypes.c_uint8),
            ptr(lengths, ctypes.c_int32), cl,
            ptr(neg_table, ctypes.c_int32), len(neg_table),
            np.uint64(self.seed * 25214903917 + 11),
            ptr(self.syn0, ctypes.c_float), ptr(self.syn1, ctypes.c_float),
            ptr(scratch, ctypes.c_float),
        )
        assert rc == 0
        return self


# --------------------------------------------------------------------------- #
# the experiment


def main():
    from node2vec_tpu.constants import Node2VecParams, Word2VecParams
    from node2vec_tpu.datasets import multilabel_f1, synthetic_multilabel
    from node2vec_tpu.models.vocab import build_vocab
    from node2vec_tpu.models.word2vec import Word2VecTPU
    from node2vec_tpu.walk import random_walks

    dim, window, epochs = 64, 5, 5
    rows = []
    for gname, (g, labels) in {
        "sbm-900": _sbm(),
        "multilabel-3k": synthetic_multilabel(seed=0),
    }.items():
        walks = random_walks(
            g,
            Node2VecParams(
                num_walks=10, walk_length=20,
                return_param=0.25, inout_param=4.0,
            ),
            seed=7,
        )
        counts = build_vocab(walks, g.n_vertices, min_count=1).counts
        for negative in (5, 0):
            obj = "sgns" if negative else "hs"
            t0 = time.time()
            oracle = RefWord2Vec(
                g.n_vertices, dim=dim, window=window, negative=negative,
                epochs=epochs, seed=1,
            ).fit(walks, counts)
            t_oracle = time.time() - t0
            emb_o = oracle.syn0
            t0 = time.time()
            m = Word2VecTPU(
                Word2VecParams(
                    min_count=1, vector_size=dim, window_size=window,
                    negative=negative, max_iter=epochs, seed=1,
                )
            ).fit(walks, n_vertices=g.n_vertices)
            t_tpu = time.time() - t0
            emb_t = np.asarray(m.emb_in)
            for name, emb in [("oracle", emb_o), ("tpu", emb_t)]:
                f1 = multilabel_f1(emb, labels, train_ratio=0.5, seed=3)
                rows.append(
                    (gname, obj, name, f1["micro_f1"], f1["macro_f1"])
                )
                print(
                    f"{gname:14s} {obj:4s} {name:6s} "
                    f"micro={f1['micro_f1']:.3f} macro={f1['macro_f1']:.3f} "
                    f"(train {t_oracle if name == 'oracle' else t_tpu:.0f}s)",
                    flush=True,
                )
    print("\nparity bands (tpu - oracle):")
    by = {}
    for gname, obj, name, mi, ma in rows:
        by.setdefault((gname, obj), {})[name] = (mi, ma)
    worst = 0.0
    for (gname, obj), d in by.items():
        dmi = d["tpu"][0] - d["oracle"][0]
        dma = d["tpu"][1] - d["oracle"][1]
        worst = min(worst, dmi, dma)
        print(f"  {gname:14s} {obj:4s} d_micro={dmi:+.3f} d_macro={dma:+.3f}")
    print(f"worst tpu-minus-oracle delta: {worst:+.3f}")


def _sbm(n=900, k=3, seed=0):
    from node2vec_tpu.graph import from_edge_arrays

    rng = np.random.default_rng(seed)
    labels = np.arange(n) % k
    src, dst = [], []
    for _ in range(n * 8):
        a = rng.integers(0, n)
        same = rng.random() < 0.9
        b = rng.integers(0, n)
        while (labels[b] == labels[a]) != same or b == a:
            b = rng.integers(0, n)
        src.append(a)
        dst.append(b)
    g = from_edge_arrays(
        np.array(src, np.int32), np.array(dst, np.int32), directed=False
    )
    onehot = np.zeros((n, k), bool)
    onehot[np.arange(n), labels] = True
    return g, onehot


if __name__ == "__main__":
    sys.exit(main())
