"""Multi-device tests on the virtual 8-device CPU mesh: sharded walks and the
TP×DP SGNS step (the reference's "cluster" tests run on local-mode Spark the
same way, ``/root/reference/tests/test_fugue.py:30,82``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from node2vec_tpu.constants import Node2VecParams
from node2vec_tpu.graph import from_edge_arrays
from node2vec_tpu.models import build_vocab
from node2vec_tpu.models.skipgram import init_embeddings, sgns_train_step
from node2vec_tpu.parallel import make_mesh, sharded_walk_chunk, sharded_sgns_step
from node2vec_tpu.parallel.sharded_sgns import init_sharded_state
from node2vec_tpu.walk import random_walks


@pytest.fixture(scope="module")
def mesh8():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual CPU devices"
    return make_mesh(n_data=4, n_model=2)


@pytest.fixture(scope="module")
def mesh_flat():
    return make_mesh(n_data=8, n_model=1)


def test_make_mesh_validation():
    pytest.raises(ValueError, make_mesh, n_data=100, n_model=100)
    m = make_mesh(n_model=2)
    assert m.shape == {"data": jax.device_count() // 2, "model": 2}


def test_sharded_walks_valid(mesh_flat, karate_edges):
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    dg = g.to_device()
    starts = jnp.arange(32, dtype=jnp.int32)  # 4 walkers per device
    paths = sharded_walk_chunk(
        mesh_flat,
        dg.indptr,
        dg.indices,
        dg.weights,
        dg.alias,
        dg.prob,
        dg.wtot,
        starts,
        jnp.arange(32, dtype=jnp.int32),
        jnp.uint32(0),
        walk_length=6,
        return_param=0.5,
        inout_param=2.0,
        search_iters=6,
    )
    paths = np.asarray(paths)
    assert paths.shape == (32, 7)
    np.testing.assert_array_equal(paths[:, 0], np.arange(32))
    adj = {v: set(g.neighbors(v)[0].tolist()) for v in range(g.n_vertices)}
    for row in paths:
        for a, b in zip(row[:-1], row[1:]):
            if a >= 0 and b >= 0:
                assert b in adj[int(a)]


def test_sharded_walks_shards_differ(mesh_flat, karate_edges):
    """Different shards must not produce identical (copy-pasted) randomness."""
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False).to_device()
    starts = jnp.zeros(32, dtype=jnp.int32)  # all walkers start at vertex 0
    paths = np.asarray(
        sharded_walk_chunk(
            mesh_flat, g.indptr, g.indices, g.weights, g.alias, g.prob,
            g.wtot, starts, jnp.arange(32, dtype=jnp.int32),
            jnp.uint32(3), walk_length=8, return_param=1.0,
            inout_param=1.0, search_iters=6,
        )
    )
    # walkers on different devices took different trajectories
    assert len({tuple(r) for r in paths}) > 8


def test_sharded_csr_walks_bit_match_single_device(mesh_flat, karate_edges):
    """The CSR engine's counter-keyed RNG makes sharded output bit-identical
    to the single-device engine for the same gids (round-4: the fallback
    joined the dense/blocked layout-invariance contract)."""
    from node2vec_tpu.walk.engine import walk_chunk

    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False).to_device()
    starts = jnp.arange(32, dtype=jnp.int32) % 34
    gids = jnp.arange(32, dtype=jnp.int32)
    kw = dict(
        walk_length=6, return_param=0.25, inout_param=4.0, search_iters=6,
        max_trials=64,
    )
    sharded = sharded_walk_chunk(
        mesh_flat, g.indptr, g.indices, g.weights, g.alias, g.prob, g.wtot,
        starts, gids, jnp.uint32(11), **kw,
    )
    single = walk_chunk(
        g.indptr, g.indices, g.weights, g.alias, g.prob, g.wtot,
        starts, gids, jnp.uint32(11), **kw,
    )
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(single))


def test_sharded_dense_walks_valid(mesh_flat, karate_edges):
    from node2vec_tpu.parallel import sharded_dense_walk_chunk
    from node2vec_tpu.walk.engine import WalkEngine

    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    engine = WalkEngine(g, Node2VecParams(walk_length=6))
    starts = jnp.arange(32, dtype=jnp.int32)
    paths = np.asarray(
        sharded_dense_walk_chunk(
            mesh_flat, engine.packed_adj, starts,
            jnp.arange(32, dtype=jnp.int32), jnp.uint32(1),
            walk_length=6, return_param=0.25, inout_param=4.0,
        )
    )
    assert paths.shape == (32, 7)
    adj = {v: set(g.neighbors(v)[0].tolist()) for v in range(g.n_vertices)}
    for row in paths:
        for a, b in zip(row[:-1], row[1:]):
            if a >= 0 and b >= 0:
                assert b in adj[int(a)]


def test_sharded_sgns_matches_single_device_semantics(mesh8, karate_edges):
    """TP×DP step must produce finite decreasing loss and keep replicas synced."""
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    walks = random_walks(g, Node2VecParams(num_walks=8, walk_length=10), seed=0)
    vocab = build_vocab(walks, g.n_vertices, min_count=1)

    state = init_sharded_state(mesh8, g.n_vertices, 64, seed=1)
    ns_alias = jnp.asarray(vocab.ns_alias)
    ns_prob = jnp.asarray(vocab.ns_prob)
    mask = jnp.asarray(vocab.mask)

    wb = jnp.asarray(walks[:64])  # 16 walks per data shard
    losses = []
    for i in range(25):
        state, loss = sharded_sgns_step(
            mesh8, state, wb, jax.random.PRNGKey(i), jnp.float32(0.05),
            ns_alias, ns_prob, mask,
            window=5, negatives=5, shared_negatives=16, shrink_window=True,
        )
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    emb = np.asarray(state.emb_in)
    assert np.isfinite(emb).all()
    assert emb.shape == (34, 64)


def test_fit_sharded_trains_on_mesh(mesh8, karate_edges):
    from node2vec_tpu.constants import Word2VecParams
    from node2vec_tpu.models import Word2VecTPU

    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    walks = random_walks(g, Node2VecParams(num_walks=6, walk_length=10), seed=0)
    params = Word2VecParams(
        min_count=1, vector_size=32, max_iter=4, batch_walks=64, step_size=0.05
    )
    model = Word2VecTPU(params, shared_negatives=16).fit_sharded(
        walks, mesh8, n_vertices=g.n_vertices
    )
    assert model.vectors.shape == (34, 32)
    assert np.isfinite(model.vectors).all()
    assert len(model._losses) == 4
    # divisibility guard: dim 33 cannot split across the 2-way model axis
    bad = Word2VecTPU(Word2VecParams(min_count=1, vector_size=33, max_iter=1))
    pytest.raises(ValueError, bad.fit_sharded, walks, mesh8)


def test_node2vec_full_pipeline_on_mesh(mesh8, karate_edges):
    """Top-level API with a mesh: sharded walks + sharded training end to end."""
    import pandas as pd

    from node2vec_tpu import Node2Vec

    src, dst = karate_edges
    df = pd.DataFrame({"src": src, "dst": dst})
    n2v = Node2Vec(
        n2v_params={"num_walks": 4, "walk_length": 6},
        w2v_params={"min_count": 1, "vector_size": 32, "max_iter": 2,
                    "batch_walks": 64},
        random_seed=3,
        mesh=mesh8,
    )
    n2v.preprocess_input_graph(df, indexed=True, directed=False)
    walks = n2v.random_walk()
    assert walks.shape == (34 * 4, 7)
    adj = {v: set(n2v.graph.neighbors(v)[0].tolist()) for v in range(34)}
    for row in walks:
        for a, b in zip(row[:-1], row[1:]):
            if a >= 0 and b >= 0:
                assert b in adj[int(a)]
    n2v.fit()
    emb = n2v.embedding()
    assert len(emb) == 34
    assert np.isfinite(np.stack(emb["vector"].to_numpy())).all()

    # device-resident pipeline must respect the mesh too
    model = n2v.run_pipeline()
    assert np.isfinite(model.vectors).all()


def test_node2vec_row_sharded_table_via_driver(mesh8, karate_edges):
    """table_sharding='row' reachable from the public driver (VERDICT item 2:
    row-sharded training must not be an internal-only path)."""
    import pandas as pd

    from node2vec_tpu import Node2Vec

    src, dst = karate_edges
    df = pd.DataFrame({"src": src, "dst": dst})
    n2v = Node2Vec(
        n2v_params={"num_walks": 4, "walk_length": 6},
        w2v_params={"min_count": 1, "vector_size": 32, "max_iter": 2,
                    "batch_walks": 64},
        random_seed=3,
        mesh=mesh8,
        table_sharding="row",
    )
    n2v.preprocess_input_graph(df, indexed=True, directed=False)
    n2v.random_walk()
    n2v.fit()
    emb = n2v.embedding()
    assert len(emb) == 34
    assert np.isfinite(np.stack(emb["vector"].to_numpy())).all()

    with pytest.raises(ValueError):
        Node2Vec(table_sharding="diagonal")


def test_sharded_sgns_tp_only_equals_single_device(karate_edges):
    """With n_data=1 the TP-sharded step must match the single-device step
    bit-for-bit (column sharding only splits the dim axis)."""
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    walks = random_walks(g, Node2VecParams(num_walks=4, walk_length=8), seed=0)
    vocab = build_vocab(walks, g.n_vertices, min_count=1)
    wb = jnp.asarray(walks[:32])
    args = dict(window=5, negatives=5, shared_negatives=16, shrink_window=False)

    mesh = make_mesh(n_data=1, n_model=4, devices=jax.devices()[:4])
    state = init_sharded_state(mesh, g.n_vertices, 64, seed=1)
    key = jax.random.PRNGKey(5)
    # fold_in(key, 0) inside the shard matches what we pass to the single-dev step
    state2, loss_sh = sharded_sgns_step(
        mesh, state, wb, key, jnp.float32(0.05),
        jnp.asarray(vocab.ns_alias), jnp.asarray(vocab.ns_prob),
        jnp.asarray(vocab.mask), **args,
    )

    emb_in, emb_out, acc_in, acc_out = init_embeddings(g.n_vertices, 64, seed=1)
    e1, e2, a1, a2, loss_1d = sgns_train_step(
        emb_in, emb_out, acc_in, acc_out, wb,
        jax.random.fold_in(key, 0), jnp.float32(0.05),
        jnp.asarray(vocab.ns_alias), jnp.asarray(vocab.ns_prob),
        jnp.asarray(vocab.mask), **args,
    )
    np.testing.assert_allclose(float(loss_sh), float(loss_1d), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state2.emb_in), np.asarray(e1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state2.emb_out), np.asarray(e2), atol=1e-6)


def test_sharded_dense_bitmatch_single_device(mesh_flat, karate_edges):
    """gid-keyed RNG: dense walks are bit-identical between the single-device
    engine and the mesh-sharded path for the same (seed, gids)."""
    from node2vec_tpu.parallel import sharded_dense_walk_chunk
    from node2vec_tpu.walk.dense import dense_walk_chunk
    from node2vec_tpu.walk.engine import WalkEngine

    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    engine = WalkEngine(g, Node2VecParams(walk_length=6))
    starts = jnp.arange(32, dtype=jnp.int32)
    gids = jnp.arange(32, dtype=jnp.int32)
    single = dense_walk_chunk(
        engine.packed_adj, starts, gids, jnp.uint32(9),
        walk_length=6, return_param=0.25, inout_param=4.0,
    )
    sharded = sharded_dense_walk_chunk(
        mesh_flat, engine.packed_adj, starts, gids, jnp.uint32(9),
        walk_length=6, return_param=0.25, inout_param=4.0,
    )
    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))
