"""SGNS trainer tests: mechanics, vocab/min_count, and embedding quality on
the karate graph (community structure + link prediction), mirroring the
reference's embedding-backend test matrix
(``/root/reference/tests/test_embedding.py``) plus the quality eval it lacks."""

import numpy as np
import pytest

from node2vec_tpu.constants import Node2VecParams, Word2VecParams
from node2vec_tpu.eval import link_prediction_auc, sample_negative_edges
from node2vec_tpu.graph import from_edge_arrays
from node2vec_tpu.models import Word2VecTPU, build_vocab
from node2vec_tpu.walk import random_walks

KARATE_COMMUNITY = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 1, 1, 0, 0, 1, 0, 1, 0,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1]
)


def test_build_vocab_min_count():
    walks = np.array([[0, 1, 2], [0, 1, -1], [0, -1, -1]], dtype=np.int32)
    v = build_vocab(walks, min_count=2)
    np.testing.assert_array_equal(v.counts, [3, 2, 1])
    np.testing.assert_array_equal(v.mask, [True, True, False])
    # noise table excludes out-of-vocab vertices
    assert v.ns_prob.shape == (3,)


def test_word2vec_validation_ranges():
    # reference spark.py:458-465 validation surfaces
    pytest.raises(ValueError, Word2VecParams, window_size=2)
    pytest.raises(ValueError, Word2VecParams, window_size=64)
    pytest.raises(ValueError, Word2VecParams, vector_size=8)
    pytest.raises(ValueError, Word2VecParams, vector_size=4096)


def test_word2vec_param_aliases():
    p = Word2VecParams.from_dict({"stepSize": 0.05, "vectorSize": 64, "minCount": 0})
    assert p.step_size == 0.05 and p.vector_size == 64 and p.min_count == 0
    g = Word2VecParams.from_dict({"alpha": 0.1, "size": 32, "iter": 3, "window": 6})
    assert g.step_size == 0.1 and g.vector_size == 32 and g.max_iter == 3
    assert g.window_size == 6


def test_fit_updates_and_decreases_loss(karate_edges):
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    walks = random_walks(g, Node2VecParams(num_walks=10, walk_length=10), seed=0)
    params = Word2VecParams(
        min_count=1, vector_size=32, max_iter=5, batch_walks=128, seed=3
    )
    model = Word2VecTPU(params).fit(walks, n_vertices=g.n_vertices)
    assert model.vectors.shape == (34, 32)
    assert np.isfinite(model.vectors).all()
    assert model._losses[-1] < model._losses[0]


def test_fit_deterministic(karate_edges):
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    walks = random_walks(g, Node2VecParams(num_walks=4, walk_length=8), seed=0)
    params = Word2VecParams(min_count=1, vector_size=32, max_iter=2, batch_walks=64, seed=9)
    m1 = Word2VecTPU(params).fit(walks, n_vertices=g.n_vertices)
    m2 = Word2VecTPU(params).fit(walks, n_vertices=g.n_vertices)
    np.testing.assert_array_equal(m1.vectors, m2.vectors)


def test_fit_sgd_optimizer(karate_edges):
    """optimizer="sgd" (the reference trainers' update rule, duplicate-mean
    pre-aggregated): trains to finite decreasing loss and differs from the
    Adagrad trajectory."""
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    walks = random_walks(g, Node2VecParams(num_walks=10, walk_length=10), seed=0)
    kw = dict(min_count=1, vector_size=32, max_iter=5, batch_walks=128, seed=3)
    m_sgd = Word2VecTPU(
        Word2VecParams(optimizer="sgd", step_size=0.025, **kw)
    ).fit(walks, n_vertices=g.n_vertices)
    assert np.isfinite(m_sgd.vectors).all()
    assert m_sgd._losses[-1] < m_sgd._losses[0]
    m_ada = Word2VecTPU(Word2VecParams(**kw)).fit(
        walks, n_vertices=g.n_vertices
    )
    assert not np.allclose(m_sgd.vectors, m_ada.vectors)
    pytest.raises(ValueError, Word2VecParams, optimizer="adam")


def test_min_count_raises_on_empty_vocab():
    walks = np.array([[0, 1]], dtype=np.int32)
    model = Word2VecTPU(Word2VecParams(min_count=100, vector_size=32))
    pytest.raises(ValueError, model.fit, walks)


def test_karate_embedding_quality(karate_edges):
    """Communities must separate and link-pred AUC must beat random by a lot."""
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    walks = random_walks(
        g, Node2VecParams(num_walks=30, walk_length=15), seed=0
    )
    params = Word2VecParams(
        min_count=1, vector_size=64, max_iter=30, batch_walks=256,
        step_size=0.05, seed=3,
    )
    model = Word2VecTPU(params).fit(walks, n_vertices=g.n_vertices)
    emb = model.vectors / np.linalg.norm(model.vectors, axis=1, keepdims=True)

    # intra-community cosine similarity exceeds inter-community
    sims = emb @ emb.T
    same = KARATE_COMMUNITY[:, None] == KARATE_COMMUNITY[None, :]
    off_diag = ~np.eye(34, dtype=bool)
    intra = sims[same & off_diag].mean()
    inter = sims[~same].mean()
    assert intra > inter + 0.2, (intra, inter)

    # link prediction AUC well above chance
    neg = sample_negative_edges(g.indptr, g.indices, 200, seed=1)
    auc = link_prediction_auc(emb, (src, dst), neg)
    assert auc > 0.75, auc
