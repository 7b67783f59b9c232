"""Frequent-vertex subsampling tests (Word2VecParams.sample — the gensim
``sample`` knob, active by default at 1e-3 in the reference's gensim backend
since params pass straight through, reference embedding.py:105-126)."""

import numpy as np

import jax
import jax.numpy as jnp

from node2vec_tpu.constants import Word2VecParams
from node2vec_tpu.models import Word2VecTPU
from node2vec_tpu.models.vocab import subsample_keep_prob
from node2vec_tpu.models.word2vec import _subsample_walks


def test_keep_prob_gensim_formula():
    """p_keep = (sqrt(c/thr) + 1) * thr/c with thr = sample * total, cap 1."""
    counts = np.array([1000, 100, 10, 1], dtype=np.int64)
    sample = 1e-2
    p = subsample_keep_prob(counts, sample)
    thr = sample * counts.sum()
    for i, c in enumerate(counts):
        expected = min(1.0, (np.sqrt(c / thr) + 1.0) * thr / c)
        np.testing.assert_allclose(p[i], expected, rtol=1e-6)
    # monotone: rarer vertices are kept at a weakly higher rate
    assert (np.diff(p) >= -1e-7).all()
    assert p[-1] == 1.0  # rare vertex below threshold: always kept


def test_keep_prob_absolute_threshold_convention():
    """sample >= 1 is an absolute count threshold (gensim's other mode)."""
    counts = np.array([1000, 100, 10], dtype=np.int64)
    p = subsample_keep_prob(counts, 50.0)
    expected = min(1.0, (np.sqrt(1000 / 50.0) + 1.0) * 50.0 / 1000)
    np.testing.assert_allclose(p[0], expected, rtol=1e-6)
    assert p[2] == 1.0


def test_keep_prob_disabled_and_masked():
    counts = np.array([1000, 100, 0], dtype=np.int64)
    assert (subsample_keep_prob(counts, 0.0) == 1.0).all()
    # masked (below-min_count) vertices don't contribute to the total
    mask = np.array([True, False, False])
    p_masked = subsample_keep_prob(counts, 1e-2, mask)
    p_all = subsample_keep_prob(counts, 1e-2)
    assert p_masked[0] < p_all[0]  # smaller retained total -> lower threshold


def test_subsample_walks_statistics():
    """A hub vertex is kept at ~p_keep; padding and rare vertices untouched."""
    rng = np.random.default_rng(0)
    n = 40_000
    walks = rng.integers(0, 4, (n, 8)).astype(np.int32)
    walks[:, -1] = -1  # padding column must stay -1
    counts = np.bincount(walks[walks >= 0], minlength=4).astype(np.int64)
    keep = subsample_keep_prob(counts, 5e-2)
    assert keep[0] < 0.9  # the test is vacuous unless something is dropped
    out = np.asarray(
        _subsample_walks(jnp.asarray(walks), jax.random.PRNGKey(1), jnp.asarray(keep))
    )
    assert (out[:, -1] == -1).all()
    for v in range(4):
        was = (walks == v).sum()
        now = (out == v).sum()
        rate = now / was
        assert abs(rate - keep[v]) < 0.02, (v, rate, keep[v])
    # only discards, never rewrites: surviving positions are unchanged
    changed = walks != out
    assert (out[changed] == -1).all()


def test_fit_with_subsampling_trains():
    rng = np.random.default_rng(2)
    walks = []
    for c in range(3):
        for _ in range(60):
            walks.append(rng.integers(c * 10, (c + 1) * 10, 12))
    walks = np.array(walks, dtype=np.int32)
    p = Word2VecParams(min_count=1, max_iter=3, vector_size=32, sample=1e-2)
    m = Word2VecTPU(p).fit(walks, n_vertices=30)
    assert m.emb_in.shape == (30, 32)
    assert m._losses[-1] < m._losses[0]
    # HS objective with subsampling
    p = Word2VecParams(
        min_count=1, max_iter=3, vector_size=32, sample=1e-2, negative=0
    )
    m = Word2VecTPU(p).fit(walks, n_vertices=30)
    assert np.isfinite(m._losses).all()


def test_fit_sharded_with_subsampling():
    from node2vec_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(3)
    walks = rng.integers(0, 30, (96, 10)).astype(np.int32)
    p = Word2VecParams(
        min_count=1, max_iter=2, vector_size=32, sample=1e-2, batch_walks=32
    )
    mesh = make_mesh(n_data=4, n_model=2)
    m = Word2VecTPU(p).fit_sharded(walks, mesh, n_vertices=30)
    assert m.emb_in.shape == (30, 32)
    mesh_r = make_mesh(n_data=8, n_model=1)
    m2 = Word2VecTPU(p).fit_sharded(
        walks, mesh_r, n_vertices=30, table_sharding="row"
    )
    assert m2.emb_in.shape == (30, 32)


def test_params_plumbing():
    p = Word2VecParams.from_dict({"sg": 0, "sample": 1e-3, "cbow_mean": False})
    assert p.sg == 0 and p.sample == 1e-3 and p.cbow_mean is False
    import pytest

    with pytest.raises(ValueError, match="sg"):
        Word2VecParams(sg=2)
    with pytest.raises(ValueError, match="sample"):
        Word2VecParams(sample=-0.1)
