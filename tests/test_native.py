"""Native C++ graph core vs numpy fallback equivalence.

The framework must behave identically with and without the compiled
libgraphcore.so (SURVEY.md §2.4: native components need real implementations,
but graceful degradation matters for portability)."""

import numpy as np
import pytest

from node2vec_tpu import native
from node2vec_tpu.graph import csr


@pytest.fixture
def edges():
    rng = np.random.default_rng(5)
    n_v, n_e = 200, 3000
    src = rng.integers(0, n_v, n_e).astype(np.int32)
    dst = rng.integers(0, n_v, n_e).astype(np.int32)
    w = rng.random(n_e).astype(np.float32) + 0.05
    return src, dst, w, n_v


def test_native_available_in_this_environment():
    # the build environment has g++; the native path must actually engage
    assert native.available()


def test_csr_native_matches_numpy(edges, monkeypatch):
    src, dst, w, n_v = edges
    ip_n, idx_n, w_n = csr.build_csr(src, dst, w, n_v)  # native path
    monkeypatch.setattr(native, "available", lambda: False)
    ip_f, idx_f, w_f = csr.build_csr(src, dst, w, n_v)  # numpy fallback
    np.testing.assert_array_equal(ip_n, ip_f)
    np.testing.assert_array_equal(idx_n, idx_f)
    np.testing.assert_allclose(w_n, w_f)


def test_mirror_dedup_native_matches_numpy(edges, monkeypatch):
    src, dst, w, _ = edges
    s_n, d_n, w_n = csr.mirror_dedup(src, dst, w)
    monkeypatch.setattr(native, "available", lambda: False)
    s_f, d_f, w_f = csr.mirror_dedup(src, dst, w)
    # same edge set (order may differ between implementations)
    native_set = set(zip(s_n.tolist(), d_n.tolist()))
    numpy_set = set(zip(s_f.tolist(), d_f.tolist()))
    assert native_set == numpy_set
    assert len(s_n) == len(s_f)


def test_alias_native_matches_numpy(edges, monkeypatch):
    from node2vec_tpu.ops import alias as alias_mod

    src, dst, w, n_v = edges
    indptr, indices, weights = csr.build_csr(src, dst, w, n_v)
    a_n, p_n = alias_mod.build_alias_csr(indptr, weights)
    monkeypatch.setattr(native, "available", lambda: False)
    a_f, p_f = alias_mod.build_alias_csr(indptr, weights)
    np.testing.assert_array_equal(a_n, a_f)
    np.testing.assert_allclose(p_n, p_f, rtol=1e-5)


def test_native_rejects_out_of_range():
    src = np.array([0, 50], dtype=np.int32)
    dst = np.array([1, 0], dtype=np.int32)
    pytest.raises(ValueError, native.build_csr, src, dst, None, 10)
