"""End-to-end node2vec on the Zachary karate club graph.

Counterpart of the reference's toy runs: builds the graph, runs biased walks
(p=0.25/q=4 — the community-sensitive setting), trains SGNS embeddings, and
evaluates community separation + link prediction.

Run: python examples/karate.py
"""

import numpy as np

from node2vec_tpu import Node2Vec
from node2vec_tpu.eval import link_prediction_auc, sample_negative_edges

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
COMMUNITY = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 1, 1, 0, 0, 1, 0, 1, 0,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1]
)


def main() -> None:
    edges = np.array(KARATE_EDGES, dtype=np.int32)
    n2v = Node2Vec(
        n2v_params={
            "num_walks": 30, "walk_length": 15,
            "return_param": 0.25, "inout_param": 4.0,
        },
        w2v_params={
            "vector_size": 64, "max_iter": 30, "min_count": 1,
            "step_size": 0.05, "batch_walks": 256,
        },
        random_seed=3,
    )
    n2v.preprocess_input_graph((edges[:, 0], edges[:, 1]), indexed=True, directed=False)
    walks = n2v.random_walk()
    print(f"walks: {walks.shape}")
    n2v.fit()
    emb = np.stack(n2v.embedding()["vector"].to_numpy())
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)

    sims = emb @ emb.T
    same = COMMUNITY[:, None] == COMMUNITY[None, :]
    off = ~np.eye(34, dtype=bool)
    print(f"intra-community cosine: {sims[same & off].mean():.3f}")
    print(f"inter-community cosine: {sims[~same].mean():.3f}")

    g = n2v.graph
    neg = sample_negative_edges(g.indptr, g.indices, 200, seed=1)
    auc = link_prediction_auc(emb, (edges[:, 0], edges[:, 1]), neg)
    print(f"link-prediction AUC: {auc:.3f}")


if __name__ == "__main__":
    main()
