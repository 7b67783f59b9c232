"""HS-vs-SGNS objective quality comparison (VERDICT round-1 item 5).

The reference's default training objective is hierarchical softmax on both
backends (gensim ``negative=0``, /root/reference/node2vec/constants.py:65;
spark.ml Word2Vec is HS-only, embedding.py:240).  This experiment runs the
full quality protocol (walks -> train -> node-classification F1) with both
objectives on karate, a 3-block SBM, and the synthetic multilabel graph,
and prints the per-dataset F1 delta.  Results recorded in BASELINE.md.

Run: python experiments/hs_vs_sgns.py
"""

import json

import numpy as np

from node2vec_tpu.constants import Node2VecParams, Word2VecParams
from node2vec_tpu.datasets import multilabel_f1, synthetic_multilabel
from node2vec_tpu.graph import from_edge_arrays
from node2vec_tpu.models.word2vec import Word2VecTPU
from node2vec_tpu.walk import WalkEngine

KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2),
    (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3),
    (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32), (3, 7),
    (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16), (6, 16),
    (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33),
]
# Zachary's ground-truth factions (Mr. Hi = 0, Officer = 1)
KARATE_FACTION = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 1, 1, 0, 0, 1, 0, 1, 0, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1]
)


def karate():
    e = np.array(KARATE_EDGES, dtype=np.int32)
    g = from_edge_arrays(e[:, 0], e[:, 1], directed=False)
    labels = np.eye(2, dtype=bool)[KARATE_FACTION]
    return g, labels


def sbm(n_per_block=300, n_blocks=3, p_in=0.08, p_out=0.005, seed=0):
    rng = np.random.default_rng(seed)
    n = n_per_block * n_blocks
    block = np.repeat(np.arange(n_blocks), n_per_block)
    s, d = np.triu_indices(n, k=1)
    p = np.where(block[s] == block[d], p_in, p_out)
    keep = rng.random(len(s)) < p
    g = from_edge_arrays(
        s[keep].astype(np.int32), d[keep].astype(np.int32), directed=False
    )
    labels = np.eye(n_blocks, dtype=bool)[block]
    return g, labels


def score(g, labels, negative, seed=7, dim=64, train_ratio=0.5):
    n2v = Node2VecParams(num_walks=10, walk_length=20)
    w2v = Word2VecParams(
        min_count=1, vector_size=dim, max_iter=5, negative=negative,
        batch_walks=256,
    )
    walks = WalkEngine(g, n2v).run(seed=seed)
    model = Word2VecTPU(w2v).fit(walks, n_vertices=g.n_vertices)
    return multilabel_f1(model.vectors, labels, train_ratio=train_ratio, seed=seed)


def main():
    out = {}
    for name, (g, labels) in (
        ("karate", karate()),
        ("sbm_900", sbm()),
        ("synthetic_multilabel_3k", synthetic_multilabel(seed=0)),
    ):
        sg = score(g, labels, negative=5)
        hs = score(g, labels, negative=0)
        out[name] = {
            "sgns_micro_f1": round(sg["micro_f1"], 4),
            "hs_micro_f1": round(hs["micro_f1"], 4),
            "delta": round(hs["micro_f1"] - sg["micro_f1"], 4),
            "sgns_macro_f1": round(sg["macro_f1"], 4),
            "hs_macro_f1": round(hs["macro_f1"], 4),
        }
        print(name, json.dumps(out[name]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
