"""Packed-pair dim-64 table layout (skipgram.pack_rows) tests.

Gathering from a [V, 64] f32 parameter makes XLA materialize a full-table
relayout copy (half-lane-tile rows — measured 4 GiB of pure-forward
temporaries at V=8.4M, experiments/sgns_memory_probe.py), so the SGNS
trainers store dim-64 tables as [ceil(V/2), 128] packed pairs: gather
fetches row id//2 and selects the half by parity, scatter-add widens
updates to half-masked rows.  Measured on v5e: epoch temp 8.37 GiB ->
0.22 GiB AND 2.48x faster (BASELINE.md round 5).  These tests pin the
bit-exactness of the packed math and the transparency of the fit-path
integration (logical [V, 64] in, logical [V, 64] out, checkpoints
layout-stable).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from node2vec_tpu.constants import Node2VecParams, Word2VecParams
from node2vec_tpu.graph import from_edge_arrays
from node2vec_tpu.models import Word2VecTPU, build_vocab
from node2vec_tpu.models.skipgram import (
    init_embeddings,
    pack_rows,
    sgns_epoch,
    unpack_rows,
    use_packed_rows,
)
from node2vec_tpu.utils.checkpoint import load_train_state
from node2vec_tpu.walk import random_walks


def test_pack_unpack_roundtrip_odd_even():
    for n in (6, 7):
        t = jnp.arange(n * 4, dtype=jnp.float32).reshape(n, 4)
        p = pack_rows(t)
        assert p.shape == ((n + 1) // 2, 8)
        np.testing.assert_array_equal(np.asarray(unpack_rows(p, n)), t)
        # numpy arrays take the same path (checkpoint save uses host copies)
        np.testing.assert_array_equal(
            unpack_rows(np.asarray(p), n), np.asarray(t)
        )


def test_policy_is_dim64_only():
    assert use_packed_rows(10, 64) and use_packed_rows(10_000_000, 64)
    for d in (32, 63, 65, 128, 256):
        assert not use_packed_rows(10_000_000, d)


@pytest.mark.parametrize("optimizer,preagg", [
    ("adagrad", False), ("adagrad", True), ("sgd", False),
])
def test_packed_epoch_matches_unpacked(optimizer, preagg):
    rng = np.random.default_rng(0)
    V, D, B = 501, 64, 32  # odd V exercises the zero pad row
    walks = rng.integers(0, V, (128, 11), dtype=np.int32)
    walks[rng.random(walks.shape) < 0.1] = -1
    vocab = build_vocab(walks, V, min_count=1)
    na, nprb, msk = map(
        jnp.asarray, (vocab.ns_alias, vocab.ns_prob, vocab.mask)
    )
    corpus = jnp.asarray(walks)
    key = jax.random.PRNGKey(3)
    kw = dict(batch=B, n_batches=4, window=5, negatives=5,
              shared_negatives=16, shrink_window=True, min_lr=1e-4,
              optimizer=optimizer, preagg=preagg)

    e1, e2, a1, a2 = init_embeddings(V, D, seed=1)
    ref = sgns_epoch(e1, e2, a1, a2, corpus, key, jnp.int32(0),
                     jnp.float32(0.025), jnp.float32(1e-4),
                     na, nprb, msk, packed=False, **kw)
    e1, e2, a1, a2 = init_embeddings(V, D, seed=1)
    pk = sgns_epoch(pack_rows(e1), pack_rows(e2), a1, a2, corpus, key,
                    jnp.int32(0), jnp.float32(0.025), jnp.float32(1e-4),
                    na, nprb, msk, packed=True, **kw)
    np.testing.assert_array_equal(
        unpack_rows(np.asarray(pk[0]), V), np.asarray(ref[0])
    )
    np.testing.assert_array_equal(
        unpack_rows(np.asarray(pk[1]), V), np.asarray(ref[1])
    )
    np.testing.assert_array_equal(np.asarray(pk[2]), np.asarray(ref[2]))
    np.testing.assert_array_equal(np.asarray(pk[3]), np.asarray(ref[3]))
    np.testing.assert_allclose(
        np.asarray(pk[4]), np.asarray(ref[4]), rtol=1e-6
    )


@pytest.fixture(scope="module")
def corpus64():
    rng = np.random.default_rng(7)
    n_v = 301  # odd
    src = rng.integers(0, n_v, 3000).astype(np.int32)
    dst = rng.integers(0, n_v, 3000).astype(np.int32)
    keep = src != dst
    g = from_edge_arrays(src[keep], dst[keep], n_vertices=n_v, directed=False)
    walks = random_walks(g, Node2VecParams(num_walks=4, walk_length=8), seed=1)
    return g, walks


def _fit_with_packing(g, walks, monkeypatch, enabled, **fit_kw):
    import node2vec_tpu.models.word2vec as w2v_mod

    if not enabled:
        monkeypatch.setattr(w2v_mod, "use_packed_rows", lambda n, d: False)
    params = Word2VecParams(min_count=1, vector_size=64, max_iter=2,
                            batch_walks=64)
    return Word2VecTPU(params).fit(walks, n_vertices=g.n_vertices, **fit_kw)


def test_fit_dim64_transparent(corpus64, monkeypatch):
    """fit() at dim 64 packs internally but yields identical logical
    results to the unpacked path, with the logical [V, 64] output shape."""
    g, walks = corpus64
    m_pk = _fit_with_packing(g, walks, monkeypatch, enabled=True)
    m_ref = _fit_with_packing(g, walks, monkeypatch, enabled=False)
    assert m_pk.emb_in.shape == (g.n_vertices, 64)
    np.testing.assert_array_equal(m_pk.emb_in, m_ref.emb_in)
    np.testing.assert_array_equal(m_pk.emb_out, m_ref.emb_out)


def test_fit_dim64_checkpoint_layout_and_resume(corpus64, tmp_path):
    """Checkpoints store the logical [V, 64] layout (not the packed device
    format) and resuming from one bit-matches the uninterrupted run."""
    g, walks = corpus64
    params = Word2VecParams(min_count=1, vector_size=64, max_iter=3,
                            batch_walks=64)
    full = Word2VecTPU(params).fit(walks, n_vertices=g.n_vertices)

    # same schedule, checkpoint only at epoch 2 -> the saved state is the
    # mid-run snapshot a killed run would resume from
    ck = str(tmp_path / "dim64")
    Word2VecTPU(params).fit(
        walks, n_vertices=g.n_vertices, checkpoint_dir=ck,
        checkpoint_every=2,
    )
    state = load_train_state(ck)
    assert state is not None and state[0] == 2
    assert state[1].shape == (g.n_vertices, 64)  # logical layout on disk

    resumed = Word2VecTPU(params).fit(
        walks, n_vertices=g.n_vertices, checkpoint_dir=ck
    )
    np.testing.assert_array_equal(resumed.emb_in, full.emb_in)


def test_fit_host_dim64(corpus64):
    g, walks = corpus64
    params = Word2VecParams(min_count=1, vector_size=64, max_iter=2,
                            batch_walks=64)
    m = Word2VecTPU(params).fit_host(
        walks, n_vertices=g.n_vertices, slab_walks=512
    )
    assert m.emb_in.shape == (g.n_vertices, 64)
    assert np.all(np.isfinite(m.emb_in))
    assert m._losses[-1] < m._losses[0]


def test_fit_streaming_dim64(corpus64):
    from node2vec_tpu.walk.engine import WalkEngine

    g, _ = corpus64
    eng = WalkEngine(
        g, Node2VecParams(num_walks=2, walk_length=8, walker_chunk=256)
    )
    n_chunks, chunk, source = eng.chunk_source(seed=0)
    params = Word2VecParams(min_count=1, vector_size=64, max_iter=2)
    m = Word2VecTPU(params).fit_streaming(source, n_chunks, g.n_vertices)
    assert m.emb_in.shape == (g.n_vertices, 64)
    assert np.all(np.isfinite(m.emb_in))
