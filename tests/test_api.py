"""End-to-end API tests, mirroring the reference integration suite
(``/root/reference/tests/test_fugue.py`` toy-graph pipeline and
``tests/test_embedding.py`` save/load matrix)."""

import numpy as np
import pandas as pd
import pytest

from node2vec_tpu import Node2Vec, Node2VecBase, random_walk, trim_index
from node2vec_tpu.embedding import Node2VecTPUEmbedding


@pytest.fixture
def toy_df():
    # reference test_fugue.py-style 5-vertex graph with string names
    return pd.DataFrame(
        {
            "src": ["a", "a", "b", "b", "c", "d", "b", "c", "d", "e", "e", "f"],
            "dst": ["b", "c", "c", "d", "e", "e", "a", "a", "b", "c", "d", "a"],
        }
    )


SMALL_W2V = {"min_count": 1, "vector_size": 32, "max_iter": 2, "batch_walks": 64}
SMALL_N2V = {"num_walks": 4, "walk_length": 6}


def test_node2vec_base_contract():
    b = Node2VecBase()
    for call in (b.fit, b.embedding):
        pytest.raises(NotImplementedError, call)
    pytest.raises(NotImplementedError, b.get_vector, "x")
    pytest.raises(NotImplementedError, b.save_model, "p", "m")
    pytest.raises(NotImplementedError, b.load_model, "p", "m")


def test_full_pipeline_named_graph(toy_df):
    n2v = Node2Vec(n2v_params=SMALL_N2V, w2v_params=SMALL_W2V, random_seed=7)
    g = n2v.preprocess_input_graph(toy_df, indexed=False, directed=False)
    assert g.n_vertices == 6
    walks = n2v.random_walk()
    assert walks.shape == (6 * 4, 7)
    n2v.fit()
    emb = n2v.embedding()
    assert set(emb.columns) == {"name", "vector"}
    assert set(emb["name"]) == {"a", "b", "c", "d", "e", "f"}
    vec = n2v.get_vector("a")
    assert vec.shape == (32,)
    np.testing.assert_array_equal(vec, emb[emb.name == "a"].vector.iloc[0])


def test_pipeline_stage_order_enforced(toy_df):
    n2v = Node2Vec(w2v_params=SMALL_W2V)
    pytest.raises(RuntimeError, n2v.random_walk)
    pytest.raises(RuntimeError, n2v.fit)
    pytest.raises(RuntimeError, n2v.embedding)
    pytest.raises(RuntimeError, n2v.get_vector, "a")


def test_model_save_load_roundtrip(toy_df, tmp_path):
    n2v = Node2Vec(n2v_params=SMALL_N2V, w2v_params=SMALL_W2V, random_seed=7)
    n2v.preprocess_input_graph(toy_df, indexed=False, directed=False)
    n2v.random_walk()
    n2v.fit()
    n2v.save_model(str(tmp_path), "toy_model")

    n2v2 = Node2Vec(w2v_params=SMALL_W2V)
    n2v2.load_model(str(tmp_path), "toy_model")
    emb1 = n2v.embedding().sort_values("name").reset_index(drop=True)
    emb2 = n2v2.backend.embedding().sort_values("name").reset_index(drop=True)
    assert list(emb1["name"]) == list(emb2["name"])
    for v1, v2 in zip(emb1["vector"], emb2["vector"]):
        np.testing.assert_allclose(v1, v2)


def test_vectors_save_load_roundtrip(toy_df, tmp_path):
    n2v = Node2Vec(n2v_params=SMALL_N2V, w2v_params=SMALL_W2V, random_seed=7)
    n2v.preprocess_input_graph(toy_df, indexed=False, directed=False)
    n2v.random_walk()
    n2v.fit()
    n2v.save_vectors(str(tmp_path), "vecs.txt")
    df = n2v.load_vectors(str(tmp_path), "vecs.txt")
    assert len(df) == 6
    a_vec = df[df.name == "a"].vector.iloc[0]
    np.testing.assert_allclose(a_vec, n2v.get_vector("a"), atol=1e-4)


def test_trim_index_functional(toy_df):
    edges, name_id = trim_index(toy_df, indexed=False, directed=False, max_out_deg=2, random_seed=5)
    assert name_id is not None and len(name_id) == 6
    assert edges["src"].dtype == np.int32
    # schema error parity (reference fugue.py:53-54)
    pytest.raises(ValueError, trim_index, pd.DataFrame({"x": [1]}))


def test_random_walk_functional(toy_df):
    edges, _ = trim_index(toy_df, indexed=False, directed=False)
    df_walks = random_walk(edges, n2v_params=SMALL_N2V, random_seed=3)
    assert set(df_walks.columns) == {"src", "walk"}
    for _, row in df_walks.iterrows():
        assert row["walk"][0] == row["src"]


def test_random_walk_with_seed_vertices(toy_df):
    edges, _ = trim_index(toy_df, indexed=False, directed=False)
    seeds = np.array([0, 2], dtype=np.int32)
    df_walks = random_walk(edges, n2v_params=SMALL_N2V, walk_seed=seeds)
    assert sorted(set(df_walks["src"])) == [0, 2]


def test_run_pipeline_device_resident(toy_df):
    """run_pipeline must match the staged random_walk()+fit() quality path."""
    n2v = Node2Vec(n2v_params=SMALL_N2V, w2v_params=SMALL_W2V, random_seed=7)
    n2v.preprocess_input_graph(toy_df, indexed=False, directed=False)
    model = n2v.run_pipeline()
    assert model.vectors.shape == (6, 32)
    assert np.isfinite(model.vectors).all()
    assert n2v.walks.shape == (6 * SMALL_N2V["num_walks"], SMALL_N2V["walk_length"] + 1)
    emb = n2v.embedding()
    assert len(emb) == 6


def test_run_pipeline_host_corpus(toy_df):
    """host_corpus mode: walk to host RAM, train via fit_host slabs."""
    n2v = Node2Vec(
        n2v_params=SMALL_N2V, w2v_params=SMALL_W2V, random_seed=7,
        host_corpus=True,
    )
    n2v.preprocess_input_graph(toy_df, indexed=False, directed=False)
    model = n2v.run_pipeline()
    assert model.vectors.shape == (6, 32)
    assert np.isfinite(model.vectors).all()
    assert isinstance(n2v.walks, np.ndarray)  # corpus kept on host
    assert len(n2v.embedding()) == 6
    # host_corpus is a single-device path: mesh combination must refuse
    import pytest as _pytest

    with _pytest.raises(ValueError, match="host_corpus"):
        Node2Vec(host_corpus=True, mesh=object())


def test_native_profile_defaults():
    n2v = Node2Vec(profile="native")
    assert n2v.n2v_params.num_walks == 20  # reference spark.py:36-38
    assert n2v.n2v_params.walk_length == 10
    n2v_fugue = Node2Vec()
    assert n2v_fugue.n2v_params.num_walks == 10


def test_preprocess_log1p_and_trim(toy_df):
    n2v = Node2Vec(max_out_degree=2, random_seed=1, w2v_params=SMALL_W2V)
    g = n2v.preprocess_input_graph(toy_df, indexed=False, directed=True,
                                   log1p_weight=True)
    assert g.out_degrees().max() <= 2
    # log1p(1.0) on the defaulted unit weights
    np.testing.assert_allclose(g.weights, np.log1p(1.0), rtol=1e-6)


def test_embedding_backend_df_walks():
    df_walks = pd.DataFrame(
        {"src": [0, 1], "walk": [[0, 1, 2, 1], [1, 2, 0]]}
    )
    back = Node2VecTPUEmbedding(df_walks=df_walks, w2v_params=SMALL_W2V)
    assert back.walks.shape == (2, 4)
    assert back.walks[1, 3] == -1  # ragged rows padded
    back.fit()
    emb = back.embedding()
    assert len(emb) == 3


def test_shared_lists_knob_reaches_engine():
    """Node2Vec(shared_lists=True) must build and use the slq table (walks
    stay valid; exactness is covered by the blocked-engine chi-square
    tests)."""
    import numpy as np

    from node2vec_tpu import Node2Vec

    rng = np.random.default_rng(0)
    # hub of degree 400 forces the blocked engine (auto threshold 256),
    # which is where shared_lists applies
    hub_dst = np.arange(1, 401, dtype=np.int32)
    src = np.concatenate([np.zeros(400, np.int32),
                          rng.integers(1, 401, 300).astype(np.int32)])
    dst = np.concatenate([hub_dst,
                          rng.integers(1, 401, 300).astype(np.int32)])
    keep = src != dst
    n2v = Node2Vec(
        n2v_params={"num_walks": 2, "walk_length": 5,
                    "return_param": 0.5, "inout_param": 2.0},
        shared_lists=True,
    )
    n2v.preprocess_input_graph((src[keep], dst[keep]), directed=False)
    assert int(n2v.graph.out_degrees().max()) > 256
    walks = n2v.random_walk()
    assert walks.shape[1] == 6
    adj = {
        v: set(n2v.graph.neighbors(v)[0].tolist())
        for v in range(n2v.graph.n_vertices)
    }
    for row in walks:
        path = row[row >= 0]
        for a, b in zip(path[:-1], path[1:]):
            assert int(b) in adj[int(a)]
