"""CBOW (sg=0) trainer tests — the gensim default architecture, part of the
reference's reachable surface (its gensim backend forwards user params
straight into gensim.models.Word2Vec, reference embedding.py:105-126)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from node2vec_tpu.constants import Word2VecParams
from node2vec_tpu.models import Word2VecTPU
from node2vec_tpu.models.cbow import (
    cbow_hs_step,
    cbow_walk_step,
)
from node2vec_tpu.models.skipgram import init_embeddings, sgns_walk_step
from node2vec_tpu.models.vocab import build_vocab


def _community_walks(rng, n_comm=3, size=10, n_walks=60, length=12):
    """Walks confined to one community each — embeddings must separate them."""
    walks = []
    for c in range(n_comm):
        for _ in range(n_walks):
            walks.append(rng.integers(c * size, (c + 1) * size, length))
    return np.array(walks, dtype=np.int32)


def _separation(emb, n_comm=3, size=10):
    e = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sim = e @ e.T
    n = n_comm * size
    intra, inter = [], []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            (intra if i // size == j // size else inter).append(sim[i, j])
    return float(np.mean(intra)), float(np.mean(inter))


def test_cbow_equals_sgns_on_two_token_walks():
    """On 2-token walks each center has exactly ONE context, so CBOW's hidden
    vector h degenerates to that context's input vector and the loss equals
    skip-gram's with center/context roles swapped — which on a symmetric pair
    set is the identical loss.  Both steps split the key the same way, so the
    shared negative draws match too."""
    rng = np.random.default_rng(3)
    n_v, dim = 20, 32
    walks = jnp.asarray(rng.integers(0, n_v, (16, 2)).astype(np.int32))
    vocab_mask = jnp.ones((n_v,), bool)
    ns_alias = jnp.arange(n_v, dtype=jnp.int32)
    ns_prob = jnp.ones((n_v,), jnp.float32)
    key = jax.random.PRNGKey(7)
    lr = jnp.float32(0.025)
    kw = dict(window=5, negatives=5, shared_negatives=16, shrink_window=False)

    st = init_embeddings(n_v, dim, seed=1)
    # break the zero-output-table symmetry so logits are nonzero
    k = jax.random.PRNGKey(9)
    emb_out = jax.random.normal(k, (n_v, dim)) * 0.1
    # steps donate their table args — hand each call its own copies
    a = sgns_walk_step(st[0] + 0, emb_out + 0, st[2] + 0, st[3] + 0, walks,
                       key, lr, ns_alias, ns_prob, vocab_mask, **kw)
    b = cbow_walk_step(st[0] + 0, emb_out + 0, st[2] + 0, st[3] + 0, walks,
                       key, lr, ns_alias, ns_prob, vocab_mask,
                       cbow_mean=True, **kw)
    np.testing.assert_allclose(float(a[4]), float(b[4]), rtol=1e-6)


def test_cbow_ns_trains_communities():
    rng = np.random.default_rng(0)
    walks = _community_walks(rng)
    # 8 epochs: the small-corpus batch cap (word2vec._effective_batch) gives
    # this 180-walk toy 3 batches/epoch instead of 1 — separation at
    # convergence improves (+0.25 vs +0.17 measured) but the first few
    # epochs move less per Adagrad step
    p = Word2VecParams(min_count=1, max_iter=8, vector_size=32, sg=0)
    m = Word2VecTPU(p).fit(walks, n_vertices=30)
    intra, inter = _separation(m.emb_in)
    assert intra > inter + 0.1
    assert m._losses[-1] < m._losses[0]


def test_cbow_hs_trains_communities():
    rng = np.random.default_rng(1)
    walks = _community_walks(rng)
    p = Word2VecParams(min_count=1, max_iter=4, vector_size=32, sg=0, negative=0)
    m = Word2VecTPU(p).fit(walks, n_vertices=30)
    intra, inter = _separation(m.emb_in)
    assert intra > inter + 0.1
    assert m._losses[-1] < m._losses[0]


def test_cbow_sum_mode():
    """cbow_mean=False (gensim sum mode) trains and differs from mean mode."""
    rng = np.random.default_rng(2)
    walks = _community_walks(rng)
    p = Word2VecParams(
        min_count=1, max_iter=3, vector_size=32, sg=0, cbow_mean=False
    )
    m = Word2VecTPU(p).fit(walks, n_vertices=30)
    p2 = Word2VecParams(min_count=1, max_iter=3, vector_size=32, sg=0)
    m2 = Word2VecTPU(p2).fit(walks, n_vertices=30)
    assert m._losses[-1] < m._losses[0]
    assert not np.allclose(m.emb_in, m2.emb_in)


def test_cbow_hs_step_masks_invalid_positions():
    """-1 padding and isolated centers (no valid context) contribute nothing:
    loss is finite and rows of untouched vertices keep their init values."""
    n_v, dim = 10, 32
    walks = jnp.asarray(
        np.array([[0, 1, 2, -1, -1, -1], [-1, -1, -1, -1, -1, -1]], np.int32)
    )
    vocab = build_vocab(np.array(walks), n_vertices=n_v, min_count=1)
    from node2vec_tpu.models.hsoftmax import build_huffman

    tree = build_huffman(vocab.counts)
    emb_in, _, acc_in, _ = init_embeddings(n_v, dim, seed=1)
    theta = jnp.zeros((tree.n_inner, dim))
    acc_t = jnp.zeros((tree.n_inner,))
    out = cbow_hs_step(
        emb_in, theta, acc_in, acc_t, walks, jax.random.PRNGKey(0),
        jnp.float32(0.025), jnp.asarray(tree.points), jnp.asarray(tree.codes),
        jnp.asarray(tree.lengths), jnp.asarray(vocab.mask),
        window=5, shrink_window=False, cbow_mean=True,
    )
    assert np.isfinite(float(out[4]))
    # vertices 5..9 never appear: their input rows must be untouched
    ref = init_embeddings(n_v, dim, seed=1)[0]
    np.testing.assert_array_equal(np.asarray(out[0][5:]), np.asarray(ref[5:]))


def test_cbow_streaming_matches_quality():
    """fit_streaming dispatches CBOW epochs per chunk (sg=0)."""
    rng = np.random.default_rng(4)
    walks = _community_walks(rng)
    chunks = np.split(walks, 3)

    def source(i):
        return jnp.asarray(chunks[i])

    p = Word2VecParams(min_count=1, max_iter=3, vector_size=32, sg=0)
    m = Word2VecTPU(p).fit_streaming(source, 3, n_vertices=30)
    intra, inter = _separation(m.emb_in)
    assert intra > inter + 0.05


def test_cbow_sharded_raises():
    from node2vec_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_model=2)
    p = Word2VecParams(min_count=1, max_iter=1, vector_size=32, sg=0)
    walks = _community_walks(np.random.default_rng(5))
    with pytest.raises(ValueError, match="CBOW"):
        Word2VecTPU(p).fit_sharded(walks, mesh, n_vertices=30)


def test_cbow_checkpoint_resume(tmp_path):
    """Resume at max_iter loads the trained state straight from disk (the
    established trainer resume contract, tests/test_checkpoint.py)."""
    rng = np.random.default_rng(6)
    walks = _community_walks(rng)
    for negative in (5, 0):  # CBOW-NS and CBOW-HS both checkpoint
        ckpt = str(tmp_path / f"n{negative}")
        p = Word2VecParams(
            min_count=1, max_iter=3, vector_size=32, sg=0, negative=negative
        )
        full = Word2VecTPU(p).fit(walks, n_vertices=30, checkpoint_dir=ckpt)
        resumed = Word2VecTPU(p).fit(walks, n_vertices=30, checkpoint_dir=ckpt)
        np.testing.assert_allclose(resumed.emb_in, full.emb_in)
        np.testing.assert_allclose(resumed.emb_out, full.emb_out)
