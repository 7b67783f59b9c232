"""Row-sharded hierarchical-softmax tests on the 8-device CPU mesh.

HS is the reference's default objective (gensim negative=0,
/root/reference/node2vec/constants.py:65; spark.ml is HS-only) — here it
trains with BOTH tables (emb_in and the Huffman inner-node table) mod-sharded
across devices and all-to-all row routing per step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from node2vec_tpu.constants import Node2VecParams, Word2VecParams
from node2vec_tpu.graph import from_edge_arrays
from node2vec_tpu.models import Word2VecTPU
from node2vec_tpu.models.hsoftmax import build_huffman, head_level_offsets
from node2vec_tpu.models.vocab import build_vocab
from node2vec_tpu.parallel.rowsharded_hs import (
    init_hs_row_state,
    row_hs_epoch,
    unshard_hs_rows,
)
from node2vec_tpu.walk import random_walks


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("data", "model"))


def _two_clique_graph(k: int = 12):
    blocks = []
    for b in range(2):
        vs = np.arange(k) + k * b
        s, d = np.meshgrid(vs, vs)
        keep = s != d
        blocks.append((s[keep], d[keep]))
    src = np.concatenate([b[0] for b in blocks] + [[0]]).astype(np.int32)
    dst = np.concatenate([b[1] for b in blocks] + [[k]]).astype(np.int32)
    return from_edge_arrays(src, dst, directed=False), k


def test_hs_state_roundtrip(mesh):
    state = init_hs_row_state(mesh, n_vertices=100, n_inner=99, dim=16, seed=3)
    emb_in, theta = unshard_hs_rows(state, 8)
    assert emb_in.shape == (100, 16)
    assert theta.shape == (99, 16)
    # same init as the single-device HS trainer
    key = jax.random.PRNGKey(3)
    ref = jax.random.uniform(key, (100, 16), jnp.float32, -0.5 / 16, 0.5 / 16)
    np.testing.assert_allclose(emb_in, np.asarray(ref))
    np.testing.assert_array_equal(theta, 0.0)


def test_hs_row_epoch_trains(mesh):
    """Routed HS must reduce loss and separate a two-clique graph."""
    g, k = _two_clique_graph()
    walks = random_walks(g, Node2VecParams(num_walks=40, walk_length=8), seed=0)
    vocab = build_vocab(walks, g.n_vertices, min_count=1)
    tree = build_huffman(vocab.counts)

    n_walks = len(walks)
    batch_local = 24
    n_dev = 8
    n_batches = n_walks // (batch_local * n_dev)
    corpus = jnp.asarray(walks[: n_batches * batch_local * n_dev])

    state = init_hs_row_state(mesh, g.n_vertices, tree.n_inner, dim=32, seed=1)
    hs_points = jnp.asarray(tree.points)
    hs_codes = jnp.asarray(tree.codes)
    hs_len = jnp.asarray(tree.lengths)
    mask = jnp.asarray(vocab.mask)

    # head levels replicated (hot-row replication) — the production config;
    # max_rows=8 keeps part of the tree routed so BOTH paths are exercised
    head = head_level_offsets(tree, max_rows=8)
    assert 1 < len(head) - 1 < hs_points.shape[1]

    losses_first = losses_last = None
    total = 5 * n_batches
    for epoch in range(5):
        state, losses, dropped = row_hs_epoch(
            mesh, state, corpus, jax.random.PRNGKey(7), epoch * n_batches,
            0.05, 0.05 / total, hs_points, hs_codes, hs_len, mask,
            batch_local=batch_local, n_batches=n_batches, window=5,
            shrink_window=True, min_lr=1e-3, head_offsets=head,
        )
        assert int(dropped) == 0
        if losses_first is None:
            losses_first = float(losses[0])
        losses_last = float(losses.mean())
    assert losses_last < losses_first

    emb_in, _ = unshard_hs_rows(state, n_dev)
    emb = emb_in / np.maximum(
        np.linalg.norm(emb_in, axis=1, keepdims=True), 1e-9
    )
    sim = emb @ emb.T
    intra = (sim[:k, :k].sum() - k) / (k * (k - 1))
    inter = sim[:k, k:].mean()
    assert intra - inter > 0.2, (intra, inter)


def test_fit_sharded_hs_row_mode(mesh):
    """Word2VecTPU.fit_sharded(negative=0, table_sharding='row') end to end."""
    g, k = _two_clique_graph(10)
    walks = random_walks(g, Node2VecParams(num_walks=40, walk_length=8), seed=0)
    params = Word2VecParams(
        min_count=1, vector_size=32, max_iter=5, batch_walks=160,
        step_size=0.05, negative=0,
    )
    m = Word2VecTPU(params).fit_sharded(
        walks, mesh, n_vertices=g.n_vertices, table_sharding="row"
    )
    emb = m.vectors / np.maximum(
        np.linalg.norm(m.vectors, axis=1, keepdims=True), 1e-9
    )
    sim = emb @ emb.T
    intra = (sim[:k, :k].sum() - k) / (k * (k - 1))
    inter = sim[:k, k:].mean()
    assert intra - inter > 0.2, (intra, inter)
    assert m._losses[-1] < m._losses[0]
    # inner-node table came back with the Huffman shape
    assert m.emb_out.shape[0] == g.n_vertices - 1


def test_hs_dropped_rows_are_surfaced(mesh):
    """Tiny capacity forces path-row overflow; the count must be non-zero."""
    rng = np.random.default_rng(0)
    walks = (rng.integers(0, 250, (64, 17)) * 8).astype(np.int32)
    vocab = build_vocab(walks, 2000, min_count=1)
    tree = build_huffman(vocab.counts)
    state = init_hs_row_state(mesh, 2000, tree.n_inner, dim=32, seed=1)
    state, losses, dropped = row_hs_epoch(
        mesh, state, jnp.asarray(walks), jax.random.PRNGKey(0), 0, 0.025,
        1e-5, jnp.asarray(tree.points), jnp.asarray(tree.codes),
        jnp.asarray(tree.lengths), jnp.asarray(vocab.mask),
        batch_local=8, n_batches=1, window=5, shrink_window=False,
        min_lr=1e-4, cap_slack=0.01,
    )
    assert int(dropped) > 0
