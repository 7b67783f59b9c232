"""Alias-table construction and draw tests.

Golden values transfer from the reference test suite
(``/root/reference/tests/test_randomwalk.py:131-188``) because our construction
follows the same LIFO stack algorithm.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from node2vec_tpu.ops.alias import (
    alias_draw,
    alias_draw_single,
    build_alias_csr,
    _build_alias_csr_numpy,
    generate_alias_tables,
    generate_edge_alias_tables,
)


@pytest.mark.parametrize(
    "weights,exp_alias,exp_probs",
    [
        ([0.5, 0.8, 1.0], [2, 0, 1], [0.6521739, 1.0, 0.9565217]),
        ([0.5, 0.2], [0, 0], [1.0, 0.5714285714285715]),
        ([0.2], [0], [1.0]),
        ([1.0], [0], [1.0]),
    ],
)
def test_generate_alias_tables_golden(weights, exp_alias, exp_probs):
    alias, probs = generate_alias_tables(weights)
    assert alias == exp_alias
    np.testing.assert_almost_equal(probs, exp_probs, decimal=7)


@pytest.mark.parametrize(
    "src_id,shd_ids,dst_nbs,p,q,exp_alias,exp_probs",
    [
        (0, {2}, ([0, 2], [0.5, 0.2]), 1.0, 1.0, [0, 0], [1.0, 0.5714285714285715]),
        (1, set(), ([1], [0.2]), 0.8, 1.5, [0], [1.0]),
        (3, set(), ([1, 3], [0.5, 1.0]), 2.0, 4.0, [1, 0], [0.4, 1.0]),
    ],
)
def test_generate_edge_alias_tables_golden(src_id, shd_ids, dst_nbs, p, q, exp_alias, exp_probs):
    alias, probs = generate_edge_alias_tables(src_id, shd_ids, dst_nbs, p, q)
    assert alias == exp_alias
    np.testing.assert_almost_equal(probs, exp_probs, decimal=7)


def test_generate_edge_alias_tables_errors():
    pytest.raises(ValueError, generate_edge_alias_tables, 0, set(), ([0], [1.0]), 0)
    pytest.raises(ValueError, generate_edge_alias_tables, 0, set(), ([0], [1.0]), 1.0, 0)
    pytest.raises(ValueError, generate_edge_alias_tables, 0, set(), ([0, 1], [1.0]))


def test_bulk_alias_matches_reference_algorithm():
    """C++/numpy bulk builders must reproduce the per-vertex python algorithm."""
    rng = np.random.default_rng(7)
    degrees = [0, 1, 2, 3, 5, 17, 64]
    indptr = np.zeros(len(degrees) + 1, dtype=np.int64)
    np.cumsum(degrees, out=indptr[1:])
    weights = rng.random(int(indptr[-1])).astype(np.float32) + 0.01

    alias_bulk, prob_bulk = build_alias_csr(indptr, weights)
    alias_np, prob_np = _build_alias_csr_numpy(indptr, weights)

    for v, deg in enumerate(degrees):
        lo, hi = int(indptr[v]), int(indptr[v + 1])
        if deg == 0:
            continue
        ref_alias, ref_prob = generate_alias_tables(weights[lo:hi].tolist())
        np.testing.assert_array_equal(alias_bulk[lo:hi], ref_alias)
        np.testing.assert_allclose(prob_bulk[lo:hi], ref_prob, rtol=1e-5)
        np.testing.assert_array_equal(alias_np[lo:hi], ref_alias)
        np.testing.assert_allclose(prob_np[lo:hi], ref_prob, rtol=1e-5)


def test_alias_draw_single_wiki():
    from node2vec_tpu.ops.alias import alias_draw_single_wiki

    alias, probs = generate_alias_tables([0.5, 0.8, 1.0])
    # r=0.5 -> scaled 1.5 -> slot 1, frac 0.5 < probs[1]=1.0 keeps slot
    assert alias_draw_single_wiki(alias, probs, 0.5) == 1
    # r=0.99 -> slot 2, frac 0.97 > probs[2]=0.9565 -> alias[2] == 1
    assert alias_draw_single_wiki(alias, probs, 0.99) == 1
    # empirical distribution matches weights
    import random

    random.seed(20)
    counts = [0, 0, 0]
    n = 30000
    for _ in range(n):
        counts[alias_draw_single_wiki(alias, probs, random.random())] += 1
    w = np.array([0.5, 0.8, 1.0])
    from scipy import stats

    res = stats.chisquare(counts, w / w.sum() * n)
    assert res.pvalue > 1e-4, counts


def test_alias_draw_single_matches_table():
    alias, probs = generate_alias_tables([0.5, 0.8, 1.0])
    # r1 picks slot 1; r2=0.5 < probs[1]=1.0 keeps it
    assert alias_draw_single(alias, probs, 0.4, 0.5) == 1
    # slot 0 has prob 0.652: r2=0.9 rejects -> alias[0] == 2
    assert alias_draw_single(alias, probs, 0.1, 0.9) == 2


def test_alias_draw_distribution():
    """Empirical draw frequencies must match the weights (chi-square)."""
    from scipy import stats

    weights = np.array([0.5, 1.0, 2.0, 4.0], dtype=np.float32)
    indptr = np.array([0, 4], dtype=np.int64)
    alias, prob = build_alias_csr(indptr, weights)
    indices = jnp.arange(4, dtype=jnp.int32)

    n = 40_000
    key = jax.random.PRNGKey(0)
    start = jnp.zeros(n, dtype=jnp.int32)
    degree = jnp.full(n, 4, dtype=jnp.int32)
    draws = alias_draw(
        key, start, degree, jnp.asarray(alias), jnp.asarray(prob), indices
    )
    counts = np.bincount(np.asarray(draws), minlength=4)
    expected = weights.astype(np.float64) / weights.sum() * counts.sum()
    chi2 = stats.chisquare(counts, expected)
    assert chi2.pvalue > 1e-4, (counts, expected)
