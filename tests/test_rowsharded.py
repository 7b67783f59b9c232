"""Row-sharded (mod-partitioned table) SGNS tests on the 8-device CPU mesh.

Validates the all-to-all routing machinery piece by piece, then the trainer:
per-step comm is O(batch·D) and the table never exists whole on any device.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from node2vec_tpu.parallel.rowsharded_sgns import (
    RowShardedState,
    _plan_routes,
    init_row_state,
    row_sgns_epoch,
    unshard_rows,
)


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("data", "model"))


def test_plan_routes_dedup_and_buckets():
    ids = jnp.asarray(
        np.array([5, 3, 5, 11, 3, 0, 19, 5], dtype=np.int32)
    )
    plan = jax.jit(lambda i: _plan_routes(i, 4, 4))(ids)
    uniq = np.asarray(plan.uniq)
    inv = np.asarray(plan.inv)
    is_uniq = np.asarray(plan.is_uniq)
    assert sorted(uniq[is_uniq].tolist()) == [0, 3, 5, 11, 19]
    # inverse map reconstructs the request vector
    np.testing.assert_array_equal(uniq[inv], np.asarray(ids))
    # bucket layout: each live id appears once in its owner's row
    send = np.asarray(plan.send_ids)
    for v in [0, 3, 5, 11, 19]:
        assert (send[v % 4] == v).sum() == 1
    assert int(plan.n_dropped) == 0


def test_plan_routes_overflow_counted():
    # 6 ids all owned by device 0, capacity 2 -> 4 dropped
    ids = jnp.asarray(np.array([0, 4, 8, 12, 16, 20], dtype=np.int32))
    plan = jax.jit(lambda i: _plan_routes(i, 4, 2))(ids)
    assert int(plan.n_dropped) == 4
    send = np.asarray(plan.send_ids)
    assert (send[0] >= 0).all()  # bucket full with 2 survivors
    assert (send[1:] == -1).all()


def test_state_roundtrip(mesh):
    state = init_row_state(mesh, n_vertices=100, dim=16, seed=3)
    emb_in, emb_out = unshard_rows(state, 8)
    assert emb_in.shape == (100, 16)
    # matches the unsharded init exactly
    from node2vec_tpu.models.skipgram import init_embeddings

    ref_in, ref_out, _, _ = init_embeddings(100, 16, seed=3)
    np.testing.assert_allclose(emb_in, np.asarray(ref_in))
    np.testing.assert_allclose(emb_out, np.asarray(ref_out))


def test_row_epoch_trains_and_matches_density(mesh):
    """The routed trainer must reduce loss and produce embeddings whose
    quality matches the single-device trainer on the same corpus."""
    from node2vec_tpu.constants import Node2VecParams
    from node2vec_tpu.graph import from_edge_arrays
    from node2vec_tpu.models.vocab import build_vocab
    from node2vec_tpu.walk import random_walks

    # two dense 12-cliques joined by one edge: embeddings must separate them
    blocks = []
    for b in range(2):
        vs = np.arange(12) + 12 * b
        s, d = np.meshgrid(vs, vs)
        keep = s != d
        blocks.append((s[keep], d[keep]))
    src = np.concatenate([b[0] for b in blocks] + [[0]]).astype(np.int32)
    dst = np.concatenate([b[1] for b in blocks] + [[12]]).astype(np.int32)
    g = from_edge_arrays(src, dst, directed=False)
    walks = random_walks(
        g, Node2VecParams(num_walks=40, walk_length=8), seed=0
    )
    vocab = build_vocab(walks, g.n_vertices, min_count=1)

    n_walks = len(walks)
    batch_local = 24
    n_dev = 8
    n_batches = n_walks // (batch_local * n_dev)
    corpus = jnp.asarray(walks[: n_batches * batch_local * n_dev])

    state = init_row_state(mesh, g.n_vertices, dim=32, seed=1)
    losses_first = losses_last = None
    step0 = 0
    total = 5 * n_batches
    for epoch in range(5):
        state, losses, dropped = row_sgns_epoch(
            mesh, state, corpus, jax.random.PRNGKey(7), step0,
            0.05, 0.05 / total, jnp.asarray(vocab.ns_alias),
            jnp.asarray(vocab.ns_prob), jnp.asarray(vocab.mask),
            batch_local=batch_local, n_batches=n_batches, window=5,
            negatives=5, shared_negatives=16, shrink_window=True,
            min_lr=1e-3,
        )
        step0 += n_batches
        assert int(dropped) == 0
        if losses_first is None:
            losses_first = float(losses[0])
        losses_last = float(losses.mean())
    assert losses_last < losses_first

    emb_in, _ = unshard_rows(state, n_dev)
    emb = emb_in / np.maximum(
        np.linalg.norm(emb_in, axis=1, keepdims=True), 1e-9
    )
    sim = emb @ emb.T
    intra = (sim[:12, :12].sum() - 12) / (12 * 11)
    inter = sim[:12, 12:].mean()
    assert intra - inter > 0.2, (intra, inter)


def test_fit_sharded_row_mode(mesh):
    """Word2VecTPU.fit_sharded(table_sharding='row') end to end: separates a
    two-clique graph like the other trainers."""
    from node2vec_tpu.constants import Node2VecParams, Word2VecParams
    from node2vec_tpu.graph import from_edge_arrays
    from node2vec_tpu.models import Word2VecTPU
    from node2vec_tpu.walk import random_walks

    blocks = []
    for b in range(2):
        vs = np.arange(10) + 10 * b
        s, d = np.meshgrid(vs, vs)
        keep = s != d
        blocks.append((s[keep], d[keep]))
    src = np.concatenate([b[0] for b in blocks] + [[0]]).astype(np.int32)
    dst = np.concatenate([b[1] for b in blocks] + [[10]]).astype(np.int32)
    g = from_edge_arrays(src, dst, directed=False)
    walks = random_walks(g, Node2VecParams(num_walks=40, walk_length=8), seed=0)
    params = Word2VecParams(
        min_count=1, vector_size=32, max_iter=5, batch_walks=160,
        step_size=0.05,
    )
    m = Word2VecTPU(params).fit_sharded(
        walks, mesh, n_vertices=g.n_vertices, table_sharding="row"
    )
    emb = m.vectors / np.maximum(
        np.linalg.norm(m.vectors, axis=1, keepdims=True), 1e-9
    )
    sim = emb @ emb.T
    intra = (sim[:10, :10].sum() - 10) / 90
    inter = sim[:10, 10:].mean()
    assert intra - inter > 0.2, (intra, inter)
    assert m._losses[-1] < m._losses[0]


def test_dropped_rows_are_surfaced(mesh):
    """Tiny capacity forces overflow; the count must come back non-zero."""
    from node2vec_tpu.models.vocab import build_vocab

    rng = np.random.default_rng(0)
    # all vertices ≡ 0 (mod 8): every row routes to one owner, whose bucket
    # (capacity floor 64) must overflow on ~150 distinct rows
    walks = (rng.integers(0, 250, (64, 17)) * 8).astype(np.int32)
    vocab = build_vocab(walks, 2000, min_count=1)
    state = init_row_state(mesh, 2000, dim=32, seed=1)
    state, losses, dropped = row_sgns_epoch(
        Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model")),
        state, jnp.asarray(walks), jax.random.PRNGKey(0), 0, 0.025, 1e-5,
        jnp.asarray(vocab.ns_alias), jnp.asarray(vocab.ns_prob),
        jnp.asarray(vocab.mask),
        batch_local=8, n_batches=1, window=5, negatives=5,
        shared_negatives=16, shrink_window=False, min_lr=1e-4,
        cap_slack=0.05,
    )
    assert int(dropped) > 0
