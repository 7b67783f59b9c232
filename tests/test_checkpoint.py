"""Checkpoint/resume tests: walk-chunk skip and trainer epoch resume
(reference analogue: lineage checkpoint every 10 steps, spark.py:597-598,
and stage-level parquet handoff, examples/native_spark.py:39-61)."""

import os

import numpy as np

from node2vec_tpu.constants import Node2VecParams, Word2VecParams
from node2vec_tpu.graph import from_edge_arrays
from node2vec_tpu.models import Word2VecTPU
from node2vec_tpu.utils.checkpoint import (
    load_train_state,
    load_walk_chunks,
    save_train_state,
    save_walk_chunk,
)
from node2vec_tpu.walk import random_walks


def test_walk_chunk_roundtrip(tmp_path):
    paths = np.arange(12, dtype=np.int32).reshape(3, 4)
    save_walk_chunk(str(tmp_path), 0, paths)
    save_walk_chunk(str(tmp_path), 2, paths + 1)
    chunks = load_walk_chunks(str(tmp_path))
    assert set(chunks) == {0, 2}
    np.testing.assert_array_equal(chunks[0], paths)
    assert load_walk_chunks(None) == {}
    assert load_walk_chunks(str(tmp_path / "missing")) == {}


def test_walk_resume_skips_done_chunks(karate_edges, tmp_path):
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    params = Node2VecParams(num_walks=4, walk_length=5, walker_chunk=34)
    ckpt = str(tmp_path / "walks")
    w1 = random_walks(g, params, seed=9, checkpoint_dir=ckpt)
    chunk_files = sorted(f for f in os.listdir(ckpt) if f.endswith(".npz"))
    assert len(chunk_files) == 4  # one file per chunk (+ fingerprint marker)
    marker = np.load(os.path.join(ckpt, chunk_files[1]))["paths"].copy()
    w2 = random_walks(g, params, seed=9, checkpoint_dir=ckpt)
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_array_equal(
        marker, np.load(os.path.join(ckpt, chunk_files[1]))["paths"]
    )


def test_walk_resume_rejects_stale_config(karate_edges, tmp_path):
    """A checkpoint dir written under a different seed/params must not serve
    its chunks to the new run (round-1 advisor finding: stale-walk reuse)."""
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    ckpt = str(tmp_path / "walks")
    params = Node2VecParams(num_walks=4, walk_length=5, walker_chunk=34)
    random_walks(g, params, seed=9, checkpoint_dir=ckpt)
    w_fresh = random_walks(g, params, seed=10)  # different seed, no ckpt
    w_ckpt = random_walks(g, params, seed=10, checkpoint_dir=ckpt)
    np.testing.assert_array_equal(w_fresh, w_ckpt)  # stale chunks ignored
    # and the dir is now usable for the NEW config on a subsequent resume
    biased = Node2VecParams(
        num_walks=4, walk_length=5, walker_chunk=34, return_param=0.5
    )
    w_b1 = random_walks(g, biased, seed=10)
    w_b2 = random_walks(g, biased, seed=10, checkpoint_dir=ckpt)
    np.testing.assert_array_equal(w_b1, w_b2)


def test_train_state_roundtrip(tmp_path):
    e_in = np.random.default_rng(0).random((5, 8)).astype(np.float32)
    save_train_state(str(tmp_path), 3, e_in, e_in * 2, e_in[:, 0], e_in[:, 1])
    state = load_train_state(str(tmp_path))
    assert state is not None
    epoch, a, b, c, d = state
    assert epoch == 3
    np.testing.assert_allclose(a, e_in)
    assert load_train_state(None) is None
    assert load_train_state(str(tmp_path / "nope")) is None


def test_train_state_version_guard(tmp_path):
    """Checkpoints from an older format version (e.g. pre-BFS Huffman
    renumbering) must be ignored loudly, never silently resumed — the saved
    theta rows would map to permuted tree nodes."""
    import numpy as np

    e_in = np.random.default_rng(0).random((5, 8)).astype(np.float32)
    save_train_state(str(tmp_path), 3, e_in, e_in, e_in[:, 0], e_in[:, 0])
    path = tmp_path / "train_state.npz"
    z = dict(np.load(str(path)))
    z["version"] = np.int64(1)  # forge an old-format checkpoint
    np.savez_compressed(str(path), **z)
    assert load_train_state(str(tmp_path)) is None
    # a versionless (pre-versioning) checkpoint is treated as v1
    del z["version"]
    np.savez_compressed(str(path), **z)
    assert load_train_state(str(tmp_path)) is None


def test_trainer_resumes_from_checkpoint(karate_edges, tmp_path):
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    walks = random_walks(g, Node2VecParams(num_walks=5, walk_length=8), seed=0)
    # both objectives checkpoint/resume: SGNS (negative>0) and the
    # reference-default hierarchical softmax (negative=0)
    for negative in (5, 0):
        params = Word2VecParams(
            min_count=1, vector_size=32, max_iter=4, batch_walks=64,
            negative=negative,
        )
        ckpt = str(tmp_path / f"train_{negative}")

        # full run with checkpoints
        m_full = Word2VecTPU(params).fit(walks, checkpoint_dir=ckpt)
        assert load_train_state(ckpt)[0] == 4

        # resume at max_iter: no further epochs, state straight from disk
        m_resumed = Word2VecTPU(params).fit(walks, checkpoint_dir=ckpt)
        np.testing.assert_allclose(m_resumed.emb_in, m_full.emb_in)
        np.testing.assert_allclose(m_resumed.emb_out, m_full.emb_out)


def test_sharded_checkpoint_resume(tmp_path):
    """All three sharded trainers must save/resume: resuming at max_iter
    reconstructs the final tables purely from disk (re-sharding the
    checkpointed host copy), and a forced mid-run resume trains the
    remaining epochs from the loaded state."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from node2vec_tpu.utils.checkpoint import load_train_state, save_train_state

    g = from_edge_arrays(
        np.array([0, 1, 2, 3, 4, 5, 0, 2], dtype=np.int32),
        np.array([1, 2, 3, 4, 5, 0, 3, 5], dtype=np.int32),
        directed=False,
    )
    walks = random_walks(g, Node2VecParams(num_walks=30, walk_length=8), seed=0)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    for mode, negative in [("column", 5), ("row", 5), ("row", 0)]:
        params = Word2VecParams(
            min_count=1, vector_size=32, max_iter=4, batch_walks=64,
            negative=negative, seed=2,
        )
        ck = str(tmp_path / f"{mode}_{negative}")
        full = Word2VecTPU(params).fit_sharded(
            walks, mesh, n_vertices=g.n_vertices, table_sharding=mode,
            checkpoint_dir=ck,
        )
        assert load_train_state(ck)[0] == 4
        # resume at max_iter: tables come straight from disk through the
        # re-sharding path; must equal the original run exactly
        resumed = Word2VecTPU(params).fit_sharded(
            walks, mesh, n_vertices=g.n_vertices, table_sharding=mode,
            checkpoint_dir=ck,
        )
        np.testing.assert_allclose(
            resumed.vectors, full.vectors, rtol=1e-6, atol=1e-7,
            err_msg=f"mode={mode} negative={negative}",
        )
        # forced mid-run resume: rewind the epoch stamp to 2 and retrain —
        # the loader must rebuild valid sharded state and run epochs 3-4
        epoch, e_in, e_out, a_in, a_out = load_train_state(ck)
        save_train_state(ck, 2, e_in, e_out, a_in, a_out)
        mid = Word2VecTPU(params).fit_sharded(
            walks, mesh, n_vertices=g.n_vertices, table_sharding=mode,
            checkpoint_dir=ck,
        )
        assert len(mid._losses) == 2  # epochs 3 and 4 only
        assert np.isfinite(mid.vectors).all()


def test_walk_checkpoint_rejects_shared_list_toggle(tmp_path):
    """Toggling the shared-list sampler changes the walk bit-stream, so a
    checkpoint dir written with it off must not serve chunks to a run with
    it on (round-3 advisor: walk_fingerprint omitted the sampler mode)."""
    from node2vec_tpu.walk import WalkEngine

    rng = np.random.default_rng(7)
    n = 40
    # clustered random graph: plenty of triangles for the 3-atom sampler
    src = rng.integers(0, n, 400).astype(np.int32)
    dst = (src + rng.integers(1, 6, 400)).astype(np.int32) % n
    g = from_edge_arrays(src, dst, directed=False)
    params = Node2VecParams(
        num_walks=4, walk_length=6, walker_chunk=40, inout_param=2.0
    )
    eng_off = WalkEngine(g, params, strategy="blocked", shared_lists=False)
    eng_on = WalkEngine(g, params, strategy="blocked", shared_lists=True)
    assert eng_off._strategy_token() == "blocked"
    assert eng_on._strategy_token() in ("blocked+sl", "blocked+slx")

    ck = str(tmp_path / "walks")
    w_off = eng_off.run(seed=5, checkpoint_dir=ck)
    w_on_fresh = eng_on.run(seed=5)
    assert not np.array_equal(w_off, w_on_fresh)  # streams really differ
    w_on = eng_on.run(seed=5, checkpoint_dir=ck)  # must ignore off-chunks
    np.testing.assert_array_equal(w_on, w_on_fresh)
