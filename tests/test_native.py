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


def test_edge_metadata_native_matches_numpy(edges, monkeypatch):
    from node2vec_tpu.walk import blocked

    src, dst, w, n_v = edges
    ip, ix, wt = csr.build_csr(src, dst, w, n_v)
    rev_n, pfx_n = blocked._edge_metadata(ip, ix, wt)  # native path
    monkeypatch.setattr(native, "available", lambda: False)
    rev_f, pfx_f = blocked._edge_metadata(ip, ix, wt)  # numpy fallback
    # reverse-weight bits and the triangle sign bit must agree exactly
    np.testing.assert_array_equal(rev_n, rev_f)
    # pfx: f64 prefix-sum association differs (global vs per-row) — allclose
    np.testing.assert_allclose(pfx_n, pfx_f, rtol=1e-6, atol=1e-6)


def test_index_edges_native_matches_numpy(monkeypatch):
    from node2vec_tpu.graph import indexer

    rng = np.random.default_rng(9)
    # sparse non-contiguous integer names, including negatives
    src = rng.choice(np.arange(-500, 10_000, 7), 5000)
    dst = rng.choice(np.arange(-500, 10_000, 7), 5000)
    s_n, d_n, names_n = indexer.index_edges(src, dst)  # native path
    monkeypatch.setattr(native, "available", lambda: False)
    s_f, d_f, names_f = indexer.index_edges(src, dst)  # numpy fallback
    np.testing.assert_array_equal(names_n, names_f)
    np.testing.assert_array_equal(s_n, s_f)
    np.testing.assert_array_equal(d_n, d_f)
    assert s_n.dtype == np.int32 and d_n.dtype == np.int32
    # round trip: ids map back to the original names
    np.testing.assert_array_equal(names_n[s_n], np.asarray(src))
    np.testing.assert_array_equal(names_n[d_n], np.asarray(dst))


def test_index_edges_dtype_edge_cases():
    from node2vec_tpu.graph import indexer

    # mixed widths: result dtype follows numpy's concatenate promotion
    src = np.array([1, 2, 3], dtype=np.int8)
    dst = np.array([10**10, 2, 10**10 + 5], dtype=np.int64)
    s, d, names = indexer.index_edges(src, dst)
    assert names.dtype == np.int64
    np.testing.assert_array_equal(names[d], dst)
    # uint64 cannot safely cast to int64 -> numpy fallback, still correct
    srcu = np.array([2**63 + 5, 1], dtype=np.uint64)
    dstu = np.array([3, 2**63 + 9], dtype=np.uint64)
    s2, d2, n2 = indexer.index_edges(srcu, dstu)
    np.testing.assert_array_equal(n2[s2], srcu)
    np.testing.assert_array_equal(n2[d2], dstu)


def test_trim_hotspot_native():
    from node2vec_tpu.graph.trim import trim_hotspot_edges

    rng = np.random.default_rng(3)
    # vertex 0 is a hub with 5000 out-edges; others stay under the cap
    src = np.concatenate([np.zeros(5000, np.int32),
                          rng.integers(1, 50, 2000).astype(np.int32)])
    dst = rng.integers(0, 50, 7000).astype(np.int32)
    w = np.arange(7000, dtype=np.float32)
    s, d, wt = trim_hotspot_edges(src, dst, w, max_out_degree=100, random_seed=11)
    assert (s == 0).sum() == 100
    assert np.bincount(s).max() <= 100
    # (dst, weight) pairing preserved through the mask
    orig = {i: (dst[i], w[i]) for i in range(7000)}
    kept_pairs = set(zip(d.tolist(), wt.tolist()))
    assert kept_pairs <= set((v[0], v[1]) for v in orig.values())
    # deterministic under a seed; different seed -> different subset
    s2, d2, _ = trim_hotspot_edges(src, dst, w, max_out_degree=100, random_seed=11)
    np.testing.assert_array_equal(d, d2)
    s3, d3, _ = trim_hotspot_edges(src, dst, w, max_out_degree=100, random_seed=12)
    assert not np.array_equal(d[:100], d3[:100])
    # the kept subset of the hub is not a positional prefix (real sampling)
    hub_kept = wt[s == 0]
    assert hub_kept.max() > 200


def test_edge_shared_list_native_matches_fallback(edges, monkeypatch):
    from node2vec_tpu.walk import blocked

    src, dst, w, n_v = edges
    ip, ix, wt = csr.build_csr(src, dst, w, n_v)
    sl_n = blocked._edge_shared_list(ip, ix, wt)  # native path
    monkeypatch.setattr(native, "available", lambda: False)
    sl_f = blocked._edge_shared_list(ip, ix, wt)  # per-edge python fallback
    assert sl_n is not None and sl_f is not None
    # slot packs, weight bits, rev_eid and overflow flags must agree exactly
    np.testing.assert_array_equal(sl_n, sl_f)
    # sanity: at least one edge has a shared entry, at least one has a
    # reverse edge
    assert (sl_n[:, 0].view(np.uint32) != 0xFFFFFFFF).any()
    assert (sl_n[:, 12] >= 0).any()


def test_pack_blocked_native_matches_numpy(monkeypatch):
    """Threaded C++ blocked packing == the numpy packer, exactly, except
    heavy-block CDF lanes (documented last-ulp rounding difference between
    row-local accumulation and global-prefix differencing)."""
    from node2vec_tpu.graph.ingest import build_graph
    from node2vec_tpu.walk import blocked

    if not native.available():
        pytest.skip("native core unavailable")
    rng = np.random.default_rng(1)
    n_v = 3000
    src = (rng.zipf(1.5, 60000) % n_v).astype(np.int32)
    dst = rng.integers(0, n_v, 60000).astype(np.int32)
    keep = src != dst
    g = build_graph((src[keep], dst[keep]), indexed=True, directed=False)
    indptr = np.asarray(g.indptr, np.int64)
    rev_enc, pfx = blocked._edge_metadata(indptr, g.indices, g.weights)
    assert (np.diff(indptr) > 31).any()  # heavy vertices exercised
    maxb = blocked._max_blocks(31)
    for ebase in (False, True):
        for lo, hi in [(0, g.n_vertices), (100, 2000)]:
            l_n, biw_n, bids_n, brp_n = blocked._pack_range(
                indptr, g.indices, g.weights, rev_enc, pfx, lo, hi, 31, 256,
                ebase=ebase,
            )
            monkeypatch.setattr(native, "available", lambda: False)
            l_f, biw_f, bids_f, brp_f = blocked._pack_range(
                indptr, g.indices, g.weights, rev_enc, pfx, lo, hi, 31, 256,
                ebase=ebase,
            )
            monkeypatch.undo()
            assert l_n.shape == l_f.shape
            heavy_rows = l_f[:, 0] == -2
            cdf = np.zeros(l_f.shape[1], bool)
            cdf[5 + maxb : 5 + 2 * maxb] = True
            cdf[3] = True  # wtot lane: also a rounded CDF value
            mismatch = (l_n != l_f) & ~np.outer(heavy_rows, cdf)
            assert not mismatch.any()
            np.testing.assert_allclose(
                l_n[heavy_rows][:, cdf].view(np.float32),
                l_f[heavy_rows][:, cdf].view(np.float32),
                rtol=1e-5,
            )
            np.testing.assert_array_equal(biw_n, biw_f)
            np.testing.assert_array_equal(bids_n, bids_f)
            np.testing.assert_array_equal(brp_n, brp_f)


def test_huffman_native_matches_heap_cost():
    """Native two-queue Huffman == python heap in optimal cost (tie
    resolution may differ; both trees are optimal), with valid BFS level
    ranges and prefix-free codes."""
    from node2vec_tpu.models import hsoftmax as H

    if not native.available():
        pytest.skip("native core unavailable")
    rng = np.random.default_rng(2)
    n = 70000  # above the native threshold (65536)
    counts = rng.zipf(1.4, n).astype(np.int64)
    t_native = H.build_huffman(counts)

    import node2vec_tpu.native as NN

    av = NN.available
    NN.available = lambda: False
    try:
        t_heap = H.build_huffman(counts)
    finally:
        NN.available = av
    w = np.maximum(counts, 1)
    assert (w * t_native.lengths).sum() == (w * t_heap.lengths).sum()
    # level ranges: path position c falls inside level c's id range
    tr = t_native
    for c in range(min(tr.points.shape[1], len(tr.level_offsets) - 1)):
        vmask = tr.lengths > c
        pts = tr.points[vmask, c]
        assert (pts >= tr.level_offsets[c]).all()
        assert (pts < tr.level_offsets[c + 1]).all()
    # prefix-freeness on a sample of leaves
    sample = rng.integers(0, n, 2000)
    keys = {
        (
            tuple(tr.points[v, : tr.lengths[v]].tolist()),
            tuple(tr.codes[v, : tr.lengths[v]].tolist()),
        )
        for v in sample
    }
    assert len(keys) == len(set(sample))
