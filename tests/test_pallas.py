"""Correctness tests for the Pallas sampling kernel (interpret mode on CPU).

The kernel is an experimental alternative to the XLA-fused dense-walk math
(see ops/pallas_kernels.py STATUS note); these tests pin its semantics so the
TPU path stays verifiable without TPU hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import node2vec_tpu.ops.pallas_kernels as pk
from node2vec_tpu.walk.dense import PAD_ID


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _random_case(rng, n_walkers, p_cols, id_space=1000):
    packed = np.full((n_walkers, 2 * p_cols), PAD_ID, dtype=np.int32)
    packed[:, p_cols:] = np.float32(0).view(np.int32)
    prev_rows = np.full((n_walkers, p_cols), PAD_ID, dtype=np.int32)
    prev = rng.integers(0, id_space, n_walkers).astype(np.int32)
    for w in range(n_walkers):
        deg = int(rng.integers(1, p_cols + 1))
        ids = np.sort(rng.choice(id_space, deg, replace=False)).astype(np.int32)
        wts = rng.random(deg).astype(np.float32) + 0.1
        packed[w, :deg] = ids
        packed[w, p_cols : p_cols + deg] = wts.view(np.int32)
        pdeg = int(rng.integers(1, p_cols + 1))
        prev_rows[w, :pdeg] = np.sort(rng.choice(id_space, pdeg, replace=False))
        if rng.random() < 0.5:
            prev[w] = ids[int(rng.integers(0, deg))]
    return packed, prev_rows, prev


def _reference_totals(packed, prev_rows, prev, p_cols, inv_p, inv_q):
    totals = np.empty(len(packed), dtype=np.float64)
    for w in range(len(packed)):
        ids = packed[w, :p_cols]
        wts = packed[w, p_cols:].view(np.float32)
        real = ids != PAD_ID
        pr = prev_rows[w][prev_rows[w] != PAD_ID]
        bias = np.where(
            ids == prev[w], inv_p, np.where(np.isin(ids, pr), 1.0, inv_q)
        )
        if prev[w] < 0:
            bias = np.ones_like(bias)
        totals[w] = float((wts * bias * real).sum())
    return totals


@pytest.mark.parametrize("p_cols", [8, 32])
def test_kernel_totals_and_draw_validity(p_cols):
    rng = np.random.default_rng(1)
    packed, prev_rows, prev = _random_case(rng, 64, p_cols)
    inv_p, inv_q = 4.0, 0.25
    nxt, total = pk.biased_sample(
        jnp.int32(7), jnp.asarray(packed), jnp.asarray(prev_rows),
        jnp.asarray(prev), p_cols=p_cols, inv_p=inv_p, inv_q=inv_q,
        uniform_bias=False,
    )
    ref = _reference_totals(packed, prev_rows, prev, p_cols, inv_p, inv_q)
    np.testing.assert_allclose(np.asarray(total), ref, rtol=1e-4)
    for w, v in enumerate(np.asarray(nxt)):
        real = packed[w, :p_cols][packed[w, :p_cols] != PAD_ID]
        assert v in real


def test_kernel_uniform_bias_path():
    rng = np.random.default_rng(2)
    packed, prev_rows, prev = _random_case(rng, 32, 8)
    nxt, total = pk.biased_sample(
        jnp.int32(3), jnp.asarray(packed), jnp.asarray(prev_rows),
        jnp.asarray(prev), p_cols=8, inv_p=1.0, inv_q=1.0, uniform_bias=True,
    )
    wts = packed[:, 8:].view(np.float32)
    wts = np.where(packed[:, :8] != PAD_ID, wts, 0.0)
    np.testing.assert_allclose(np.asarray(total), wts.sum(1), rtol=1e-4)


def test_kernel_first_order_rule():
    """prev < 0 must disable all bias (reference sentinel semantics)."""
    rng = np.random.default_rng(3)
    packed, prev_rows, prev = _random_case(rng, 32, 8)
    prev[:] = -1
    nxt, total = pk.biased_sample(
        jnp.int32(3), jnp.asarray(packed), jnp.asarray(prev_rows),
        jnp.asarray(prev), p_cols=8, inv_p=9.0, inv_q=0.1, uniform_bias=False,
    )
    wts = packed[:, 8:].view(np.float32)
    wts = np.where(packed[:, :8] != PAD_ID, wts, 0.0)
    np.testing.assert_allclose(np.asarray(total), wts.sum(1), rtol=1e-4)
