"""Packed-pair dim-64 layout for the HS and CBOW heads.

Round 5 shipped the packed-pair [ceil(N/2), 128] storage for SGNS
(tests/test_packed64.py); this extends it to the remaining dim-64
consumers — skip-gram hierarchical softmax (models/hsoftmax.py, including
the level-shared dense head whose theta[:K] slice must be un-interleaved
and whose pre-aggregated update is widened back to physical rows) and
both CBOW variants (models/cbow.py).  The contract: numerically equivalent
logical results vs the unpacked formulation (see below), logical [N, 64]
layouts at every user-visible boundary (fit outputs, checkpoints).

Equality contract: the packed math is elementwise IDENTICAL in exact
arithmetic, but packing maps two logical rows onto one physical scatter
row, which can reorder XLA's duplicate-index accumulation inside a
fused scatter — measured <=5e-6 relative on theta under the dense-head
program (24/32000 elements).  The assertions therefore use allclose at
tolerances far below any training-relevant scale (the SGNS tests keep
their stricter bit-exact assertions where XLA's order happens to match).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from node2vec_tpu.constants import Node2VecParams, Word2VecParams
from node2vec_tpu.graph import from_edge_arrays
from node2vec_tpu.models import Word2VecTPU, build_vocab
from node2vec_tpu.models.cbow import cbow_epoch, cbow_hs_epoch
from node2vec_tpu.models.hsoftmax import (
    build_huffman,
    cap_code_length,
    head_level_offsets,
    hs_epoch,
)
from node2vec_tpu.models.skipgram import (
    init_embeddings,
    pack_rows,
    unpack_rows,
)
from node2vec_tpu.walk import random_walks

V, D, B = 501, 64, 32  # odd V exercises the zero pad row


def _close(a, b):
    # see module docstring: scatter duplicate-accumulation order under
    # packing; tolerances are orders of magnitude below training scales
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-8)


@pytest.fixture(scope="module")
def hs_setup():
    rng = np.random.default_rng(0)
    walks = rng.integers(0, V, (128, 11), dtype=np.int32)
    walks[rng.random(walks.shape) < 0.1] = -1
    vocab = build_vocab(walks, V, min_count=1)
    tree = cap_code_length(build_huffman(vocab.counts), vocab.counts)
    return walks, vocab, tree


def _hs_state(tree, seed=1):
    key = jax.random.PRNGKey(seed)
    emb_in = jax.random.uniform(key, (V, D), jnp.float32, -0.01, 0.01)
    theta = jax.random.normal(jax.random.fold_in(key, 1),
                              (tree.n_inner, D)) * 0.01
    return emb_in, theta, jnp.zeros((V,)), jnp.zeros((tree.n_inner,))


@pytest.mark.parametrize("head", ["none", "root_only", "default"])
def test_packed_hs_epoch_matches_unpacked(hs_setup, head):
    """hs_epoch packed vs unpacked matches across head splits —
    'root_only' pins the odd-k_rows widening (K=1 pads a zero half-row
    into a physical row the tail scatter also touches)."""
    walks, vocab, tree = hs_setup
    if head == "none":
        hs_head = (0,)
    elif head == "root_only":
        hs_head = tuple(int(x) for x in tree.level_offsets[:2])
        assert hs_head[-1] % 2 == 1  # odd head size is the point
    else:
        hs_head = head_level_offsets(tree)
    args = (
        jnp.asarray(walks), jax.random.PRNGKey(3), jnp.int32(0),
        jnp.float32(0.025), jnp.float32(1e-4),
        jnp.asarray(tree.points), jnp.asarray(tree.codes),
        jnp.asarray(tree.lengths), jnp.asarray(vocab.mask),
    )
    kw = dict(batch=B, n_batches=4, window=5, shrink_window=True,
              min_lr=1e-4, head_offsets=hs_head)

    e, t, a1, a2 = _hs_state(tree)
    ref = hs_epoch(e, t, a1, a2, *args, packed=False, **kw)
    e, t, a1, a2 = _hs_state(tree)
    pk = hs_epoch(pack_rows(e), pack_rows(t), a1, a2, *args,
                  packed=True, **kw)
    _close(unpack_rows(np.asarray(pk[0]), V), np.asarray(ref[0]))
    _close(unpack_rows(np.asarray(pk[1]), tree.n_inner), np.asarray(ref[1]))
    _close(np.asarray(pk[2]), np.asarray(ref[2]))
    _close(np.asarray(pk[3]), np.asarray(ref[3]))
    np.testing.assert_allclose(
        np.asarray(pk[4]), np.asarray(ref[4]), rtol=1e-6
    )


def test_packed_cbow_ns_epoch_matches_unpacked(hs_setup):
    walks, vocab, _ = hs_setup
    args = (
        jnp.asarray(walks), jax.random.PRNGKey(3), jnp.int32(0),
        jnp.float32(0.025), jnp.float32(1e-4),
        jnp.asarray(vocab.ns_alias), jnp.asarray(vocab.ns_prob),
        jnp.asarray(vocab.mask),
    )
    kw = dict(batch=B, n_batches=4, window=5, negatives=5,
              shared_negatives=16, shrink_window=True, min_lr=1e-4,
              cbow_mean=True)

    e1, e2, a1, a2 = init_embeddings(V, D, seed=1)
    ref = cbow_epoch(e1, e2, a1, a2, *args, packed=False, **kw)
    e1, e2, a1, a2 = init_embeddings(V, D, seed=1)
    pk = cbow_epoch(pack_rows(e1), pack_rows(e2), a1, a2, *args,
                    packed=True, **kw)
    for i in (0, 1):
        _close(unpack_rows(np.asarray(pk[i]), V), np.asarray(ref[i]))
    for i in (2, 3):
        _close(np.asarray(pk[i]), np.asarray(ref[i]))
    np.testing.assert_allclose(
        np.asarray(pk[4]), np.asarray(ref[4]), rtol=1e-6
    )


def test_packed_cbow_hs_epoch_matches_unpacked(hs_setup):
    walks, vocab, tree = hs_setup
    args = (
        jnp.asarray(walks), jax.random.PRNGKey(3), jnp.int32(0),
        jnp.float32(0.025), jnp.float32(1e-4),
        jnp.asarray(tree.points), jnp.asarray(tree.codes),
        jnp.asarray(tree.lengths), jnp.asarray(vocab.mask),
    )
    kw = dict(batch=B, n_batches=4, window=5, shrink_window=True,
              min_lr=1e-4, cbow_mean=True)

    e, t, a1, a2 = _hs_state(tree)
    ref = cbow_hs_epoch(e, t, a1, a2, *args, packed=False, **kw)
    e, t, a1, a2 = _hs_state(tree)
    pk = cbow_hs_epoch(pack_rows(e), pack_rows(t), a1, a2, *args,
                       packed=True, **kw)
    _close(unpack_rows(np.asarray(pk[0]), V), np.asarray(ref[0]))
    _close(unpack_rows(np.asarray(pk[1]), tree.n_inner), np.asarray(ref[1]))
    _close(np.asarray(pk[2]), np.asarray(ref[2]))
    _close(np.asarray(pk[3]), np.asarray(ref[3]))


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


def _fit(g, walks, monkeypatch, enabled, **params_kw):
    import node2vec_tpu.models.word2vec as w2v_mod

    if not enabled:
        monkeypatch.setattr(w2v_mod, "use_packed_rows", lambda n, d: False)
    params = Word2VecParams(min_count=1, vector_size=64, max_iter=2,
                            batch_walks=64, **params_kw)
    return Word2VecTPU(params).fit(walks, n_vertices=g.n_vertices)


@pytest.mark.parametrize("params_kw", [
    dict(negative=0),           # skip-gram HS
    dict(sg=0),                 # CBOW NS
    dict(sg=0, negative=0),     # CBOW HS
], ids=["hs", "cbow_ns", "cbow_hs"])
def test_fit_dim64_heads_transparent(corpus64, monkeypatch, params_kw):
    """fit() at dim 64 packs internally on every objective and yields
    identical logical results to the unpacked path."""
    g, walks = corpus64
    m_pk = _fit(g, walks, monkeypatch, enabled=True, **params_kw)
    m_ref = _fit(g, walks, monkeypatch, enabled=False, **params_kw)
    assert m_pk.emb_in.shape == (g.n_vertices, 64)
    _close(m_pk.emb_in, m_ref.emb_in)
    _close(m_pk.emb_out, m_ref.emb_out)


def test_fit_host_and_streaming_dim64_hs(corpus64):
    """The host-corpus and streaming paths run the packed HS head end to
    end with logical outputs (shape + finiteness + learning signal)."""
    from node2vec_tpu.walk.engine import WalkEngine

    g, walks = corpus64
    params = Word2VecParams(min_count=1, vector_size=64, max_iter=2,
                            batch_walks=64, negative=0)
    m = Word2VecTPU(params).fit_host(
        walks, n_vertices=g.n_vertices, slab_walks=512
    )
    assert m.emb_in.shape == (g.n_vertices, 64)
    assert m.emb_out.shape[1] == 64  # logical theta layout
    assert np.all(np.isfinite(m.emb_in))
    assert m._losses[-1] < m._losses[0]

    eng = WalkEngine(
        g, Node2VecParams(num_walks=2, walk_length=8, walker_chunk=256)
    )
    n_chunks, chunk, source = eng.chunk_source(seed=0)
    m2 = Word2VecTPU(params).fit_streaming(source, n_chunks, g.n_vertices)
    assert m2.emb_in.shape == (g.n_vertices, 64)
    assert np.all(np.isfinite(m2.emb_in))
