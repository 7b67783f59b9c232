"""Graph core tests: indexing, trimming, CSR construction, ingest pipeline.

Coverage model follows the reference's indexer/trim tests
(``/root/reference/tests/test_indexer.py``, ``tests/test_randomwalk.py:194-243``).
"""

import numpy as np
import pandas as pd
import pytest

from node2vec_tpu.graph import (
    build_csr,
    build_graph,
    from_edge_arrays,
    index_edges,
    index_graph_pandas,
    mirror_dedup,
    trim_hotspot_edges,
)


def test_index_edges_sorted_dense_ids():
    src = np.array(["b", "a", "c", "a"])
    dst = np.array(["a", "c", "b", "b"])
    s, d, names = index_edges(src, dst)
    assert list(names) == ["a", "b", "c"]
    np.testing.assert_array_equal(s, [1, 0, 2, 0])
    np.testing.assert_array_equal(d, [0, 2, 1, 1])
    assert s.dtype == np.int32


def test_index_edges_factorize_matches_unique():
    """The hash-factorize fast path must be bit-identical to np.unique
    across name dtypes (object strings, NaN floats, object ints)."""
    cases = [
        (
            np.array(["b", "a", "c", "a"], dtype=object),
            np.array(["a", "c", "b", "z"], dtype=object),
        ),
        (np.array([1.5, np.nan, 2.5]), np.array([2.5, 1.5, np.nan])),
        (np.array([3, 1], dtype=object), np.array([2, 3], dtype=object)),
    ]
    for src, dst in cases:
        s, d, names = index_edges(src, dst)
        ref_names, ref_inv = np.unique(
            np.concatenate([src, dst]), return_inverse=True
        )
        if names.dtype.kind == "f":
            np.testing.assert_array_equal(names, ref_names)
        else:
            assert names.tolist() == ref_names.tolist()
        np.testing.assert_array_equal(s, ref_inv[: len(src)])
        np.testing.assert_array_equal(d, ref_inv[len(src):])


def test_index_graph_pandas():
    df = pd.DataFrame({"src": ["x", "y"], "dst": ["y", "z"]})
    edges, name_id = index_graph_pandas(df)
    assert len(name_id) == 3
    assert set(edges.columns) == {"src", "dst", "weight"}
    assert (edges["weight"] == 1.0).all()  # default weight, reference spark.py:490-491
    # schema validation raises, reference fugue.py:53-54
    pytest.raises(ValueError, index_graph_pandas, pd.DataFrame({"a": [1]}))


def test_trim_hotspot_edges():
    # vertex 0 has 6 out-edges, cap at 3; vertex 1 has 2, untouched
    src = np.array([0] * 6 + [1] * 2, dtype=np.int32)
    dst = np.arange(8, dtype=np.int32)
    w = np.arange(8, dtype=np.float32)
    s, d, wt = trim_hotspot_edges(src, dst, w, max_out_degree=3, random_seed=20)
    assert (s == 0).sum() == 3
    assert (s == 1).sum() == 2
    # kept edges preserve their (dst, weight) pairing
    for di, wi in zip(d, wt):
        assert wi == float(di)
    # sampling is uniform-random, not a prefix
    s2, d2, _ = trim_hotspot_edges(src, dst, w, max_out_degree=3, random_seed=21)
    assert len(s2) == 5


def test_build_csr_sorted_rows(toy_graph_edges):
    src, dst, w = toy_graph_edges
    indptr, indices, weights = build_csr(src, dst, w, 5)
    np.testing.assert_array_equal(indptr, [0, 2, 4, 5, 6, 6])
    np.testing.assert_array_equal(indices, [1, 2, 2, 3, 4, 4])
    np.testing.assert_allclose(weights, [1.0, 0.5, 2.0, 1.0, 1.0, 0.5])
    # rows sorted ascending (enables binary-search membership)
    for v in range(5):
        row = indices[indptr[v] : indptr[v + 1]]
        assert (np.diff(row) > 0).all() if len(row) > 1 else True


def test_build_csr_rejects_out_of_range():
    src = np.array([0, 9], dtype=np.int32)
    dst = np.array([1, 0], dtype=np.int32)
    pytest.raises(ValueError, build_csr, src, dst, None, 3)


def test_mirror_dedup():
    src = np.array([0, 1, 0], dtype=np.int32)
    dst = np.array([1, 0, 2], dtype=np.int32)
    w = np.array([3.0, 7.0, 1.0], dtype=np.float32)
    s, d, wt = mirror_dedup(src, dst, w)
    pairs = set(zip(s.tolist(), d.tolist()))
    assert pairs == {(0, 1), (1, 0), (0, 2), (2, 0)}
    assert len(s) == 4  # (0,1)/(1,0) deduplicated


def test_from_edge_arrays_undirected(karate_edges):
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    assert g.n_vertices == 34
    assert g.n_edges == 156  # 78 undirected edges mirrored
    degs = g.out_degrees()
    assert degs.sum() == 156
    assert degs[33] == 17 and degs[0] == 16  # known karate degrees
    # alias tables cover every edge
    assert len(g.alias) == g.n_edges and len(g.prob) == g.n_edges


def test_build_graph_with_names():
    df = pd.DataFrame(
        {"src": ["a", "b", "c"], "dst": ["b", "c", "a"], "weight": [1.0, 2.0, 3.0]}
    )
    g = build_graph(df, indexed=False, directed=True)
    assert g.n_vertices == 3
    assert g.id_of("a") == 0 and g.name_of(2) == "c"
    pytest.raises(KeyError, g.id_of, "zz")


def test_build_graph_log1p_and_sink():
    # vertex 2 is a sink (no out-edges)
    src = np.array([0, 1], dtype=np.int32)
    dst = np.array([1, 2], dtype=np.int32)
    w = np.array([np.e - 1, 1.0], dtype=np.float32)
    g = build_graph((src, dst, w), indexed=True, directed=True, log1p_weight=True)
    assert g.n_vertices == 3
    np.testing.assert_allclose(g.weights[0], 1.0, rtol=1e-6)
    assert g.out_degrees()[2] == 0


def test_build_graph_rejects_negative_weight():
    src = np.array([0], dtype=np.int32)
    dst = np.array([1], dtype=np.int32)
    w = np.array([-1.0], dtype=np.float32)
    pytest.raises(ValueError, build_graph, (src, dst, w), indexed=True)


def test_build_graph_trim_orderings(karate_edges):
    src, dst = karate_edges
    g_native = build_graph(
        (src, dst), indexed=True, directed=False, max_out_degree=5, random_seed=1
    )
    g_fugue = build_graph(
        (src, dst),
        indexed=True,
        directed=False,
        max_out_degree=5,
        random_seed=1,
        trim_before_mirror=True,
    )
    assert g_native.out_degrees().max() <= 5
    # fugue ordering mirrors after trimming, so mirrored edges can push a
    # vertex back over the cap — but every original row obeys it pre-mirror
    assert g_fugue.n_edges >= g_native.n_edges - g_native.n_vertices * 5
