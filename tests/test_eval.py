"""Evaluation-harness tests: node classification on a stochastic block model
and the analytic transition oracle (quality gates the reference lacks,
SURVEY.md §4)."""

import numpy as np
import pytest

from node2vec_tpu import Node2Vec
from node2vec_tpu.constants import Node2VecParams
from node2vec_tpu.eval import (
    analytic_second_order_probs,
    node_classification_f1,
    sample_negative_edges,
    walk_transition_pvalue,
)
from node2vec_tpu.graph import from_edge_arrays
from node2vec_tpu.walk import random_walks


def make_sbm(n_per_block=100, n_blocks=3, p_in=0.12, p_out=0.01, seed=0):
    """Stochastic block model edges + labels."""
    rng = np.random.default_rng(seed)
    n = n_per_block * n_blocks
    labels = np.repeat(np.arange(n_blocks), n_per_block)
    src, dst = [], []
    for i in range(n):
        for j in range(i + 1, n):
            p = p_in if labels[i] == labels[j] else p_out
            if rng.random() < p:
                src.append(i)
                dst.append(j)
    return (
        np.array(src, dtype=np.int32),
        np.array(dst, dtype=np.int32),
        labels,
    )


def test_sbm_node_classification_f1():
    src, dst, labels = make_sbm()
    n2v = Node2Vec(
        n2v_params={"num_walks": 10, "walk_length": 10},
        w2v_params={
            "vector_size": 64, "max_iter": 10, "min_count": 1,
            "step_size": 0.05, "batch_walks": 512,
        },
        random_seed=5,
    )
    n2v.preprocess_input_graph((src, dst), indexed=True, directed=False)
    n2v.random_walk()
    n2v.fit()
    emb = np.stack(n2v.embedding()["vector"].to_numpy())
    scores = node_classification_f1(emb, labels, train_ratio=0.5, seed=0)
    assert scores["micro_f1"] > 0.85, scores
    assert scores["macro_f1"] > 0.85, scores


def test_analytic_probs_match_reference_oracle():
    # triangle with a tail: 0-1, 1-2, 2-0, 2-3
    src = np.array([0, 1, 1, 2, 2, 0, 2, 3], dtype=np.int32)
    dst = np.array([1, 0, 2, 1, 0, 2, 3, 2], dtype=np.int32)
    g = from_edge_arrays(src, dst, directed=True)
    # from edge (0 -> 2): N(2) = {0 back, 1 shared, 3 far}
    nbrs, probs = analytic_second_order_probs(g, 0, 2, return_param=2.0, inout_param=0.5)
    np.testing.assert_array_equal(nbrs, [0, 1, 3])
    expect = np.array([0.5, 1.0, 2.0])
    np.testing.assert_allclose(probs, expect / expect.sum(), rtol=1e-6)


def test_walk_transition_pvalue_end_to_end():
    src = np.array([0, 1, 1, 2, 2, 0, 2, 3], dtype=np.int32)
    dst = np.array([1, 0, 2, 1, 0, 2, 3, 2], dtype=np.int32)
    g = from_edge_arrays(src, dst, directed=True)
    walks = random_walks(
        g,
        Node2VecParams(num_walks=3000, walk_length=4, return_param=0.5,
                       inout_param=2.0, walker_chunk=1 << 14),
        seed=2,
    )
    pv = walk_transition_pvalue(g, walks, 0, 2, 0.5, 2.0)
    assert pv is not None and pv > 1e-4, pv
    # too-small corpus returns None
    assert walk_transition_pvalue(g, walks[:2], 0, 2, 0.5, 2.0) is None


def test_sample_negative_edges_are_non_edges():
    src = np.array([0, 1, 2], dtype=np.int32)
    dst = np.array([1, 2, 0], dtype=np.int32)
    g = from_edge_arrays(src, dst, n_vertices=10, directed=True)
    nu, nv = sample_negative_edges(g.indptr, g.indices, 50, seed=3)
    edge_set = {(0, 1), (1, 2), (2, 0)}
    for u, v in zip(nu, nv):
        assert u != v and (u, v) not in edge_set
