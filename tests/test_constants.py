"""Default-parameter presence/type tests (reference tests/test_constants.py)."""

from node2vec_tpu.constants import (
    GENSIM_PARAMS,
    MAX_OUT_DEGREES,
    MAX_OUT_DEGREES_NATIVE,
    NODE2VEC_PARAMS,
    NODE2VEC_PARAMS_NATIVE,
    NUM_PARTITIONS,
    WORD2VEC_PARAMS,
    Node2VecParams,
    Word2VecParams,
    merge_defaults,
)


def test_scalar_constants():
    assert MAX_OUT_DEGREES == 100_000  # reference constants.py:6
    assert MAX_OUT_DEGREES_NATIVE == 500_000  # reference spark.py:26
    assert NUM_PARTITIONS == 3000  # reference constants.py:10


def test_node2vec_param_dicts():
    # fugue profile (reference constants.py:14-27)
    assert NODE2VEC_PARAMS["num_walks"] == 10
    assert NODE2VEC_PARAMS["walk_length"] == 20
    assert NODE2VEC_PARAMS["return_param"] == 1.0
    assert NODE2VEC_PARAMS["inout_param"] == 1.0
    # native profile flips (reference spark.py:34-47)
    assert NODE2VEC_PARAMS_NATIVE["num_walks"] == 20
    assert NODE2VEC_PARAMS_NATIVE["walk_length"] == 10


def test_word2vec_param_dicts():
    for key, value in [
        ("min_count", 10),
        ("step_size", 0.025),
        ("max_iter", 10),
        ("window_size", 5),
        ("vector_size", 128),
    ]:
        assert WORD2VEC_PARAMS[key] == value, key
    assert GENSIM_PARAMS["alpha"] == 0.025
    assert GENSIM_PARAMS["size"] == 128
    assert GENSIM_PARAMS["window"] == 5


def test_merge_defaults_is_merge_if_absent():
    merged = merge_defaults({"num_walks": 3}, NODE2VEC_PARAMS)
    assert merged["num_walks"] == 3
    assert merged["walk_length"] == NODE2VEC_PARAMS["walk_length"]
    assert merge_defaults(None, {"a": 1}) == {"a": 1}


def test_profile_selection():
    fugue = Node2VecParams.from_dict(None, profile="fugue")
    native = Node2VecParams.from_dict(None, profile="native")
    assert (fugue.num_walks, fugue.walk_length) == (10, 20)
    assert (native.num_walks, native.walk_length) == (20, 10)


def test_dataclass_defaults_match_dicts():
    p = Node2VecParams()
    assert p.num_walks == NODE2VEC_PARAMS["num_walks"]
    w = Word2VecParams()
    assert w.vector_size == WORD2VEC_PARAMS["vector_size"]
    # DELIBERATE divergence: the dicts document the reference's plain-SGD
    # defaults; our Adagrad trainers default to a measured-better 0.2
    # (constants.py step_size comment, experiments/ref_w2v_oracle.py)
    assert WORD2VEC_PARAMS["step_size"] == 0.025
    assert w.step_size == 0.2
