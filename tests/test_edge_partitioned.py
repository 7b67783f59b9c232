"""Edge-partitioned (graph-sharded) walk tests on the 8-device CPU mesh.

This is the layout where the graph itself is range-sharded across devices and
walk frontiers cross shards via all-to-all — the TPU replacement for the
reference's per-step shuffle joins (SURVEY.md §2.3)."""

import numpy as np
import pytest
from scipy import stats

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from node2vec_tpu.constants import Node2VecParams
from node2vec_tpu.graph import from_edge_arrays
from node2vec_tpu.parallel import make_mesh
from node2vec_tpu.parallel.edge_partitioned import (
    edge_partitioned_walk,
    partition_packed_adjacency,
)
from node2vec_tpu.walk.engine import WalkEngine


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(n_data=8, n_model=1)


def _setup(mesh, g, n_walkers):
    engine = WalkEngine(g, Node2VecParams())
    padded, rows_per_shard = partition_packed_adjacency(
        np.asarray(engine.packed_adj), mesh.shape["data"]
    )
    sharding = NamedSharding(mesh, P("data", None))
    adj = jax.device_put(jnp.asarray(padded), sharding)
    starts = jax.device_put(
        jnp.arange(n_walkers, dtype=jnp.int32) % g.n_vertices,
        NamedSharding(mesh, P("data")),
    )
    return adj, rows_per_shard, starts


def test_edge_partitioned_walk_validity(mesh8, karate_edges):
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    adj, rps, starts = _setup(mesh8, g, 64)
    paths = np.asarray(
        edge_partitioned_walk(
            mesh8, adj, rps, starts, jax.random.PRNGKey(0),
            walk_length=8, return_param=0.5, inout_param=2.0,
        )
    )
    assert paths.shape == (64, 9)
    np.testing.assert_array_equal(paths[:, 0], np.arange(64) % 34)
    adj_sets = {v: set(g.neighbors(v)[0].tolist()) for v in range(g.n_vertices)}
    for row in paths:
        for a, b in zip(row[:-1], row[1:]):
            if a >= 0 and b >= 0:
                assert b in adj_sets[int(a)], row
    # connected undirected graph, full capacity: nobody dies or defers
    assert (paths >= 0).all()


def test_edge_partitioned_walk_sinks(mesh8):
    # chain 0->1->2 (sink), plus isolated ids up to 7 so each shard owns one row
    src = np.array([0, 1], dtype=np.int32)
    dst = np.array([1, 2], dtype=np.int32)
    g = from_edge_arrays(src, dst, n_vertices=8, directed=True)
    adj, rps, starts = _setup(mesh8, g, 8)
    paths = np.asarray(
        edge_partitioned_walk(
            mesh8, adj, rps, starts, jax.random.PRNGKey(1),
            walk_length=4, return_param=1.0, inout_param=1.0,
        )
    )
    np.testing.assert_array_equal(paths[0], [0, 1, 2, -1, -1])
    np.testing.assert_array_equal(paths[1], [1, 2, -1, -1, -1])
    np.testing.assert_array_equal(paths[2], [2, -1, -1, -1, -1])


def test_edge_partitioned_capacity_deferral(mesh8, karate_edges):
    """With a tiny per-owner capacity, walkers defer but every path still
    completes contiguously (per-walker step cursors)."""
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    adj, rps, starts = _setup(mesh8, g, 64)
    paths = np.asarray(
        edge_partitioned_walk(
            mesh8, adj, rps, starts, jax.random.PRNGKey(5),
            walk_length=6, return_param=0.5, inout_param=2.0,
            capacity=2,  # 8 walkers/shard but only 2 requests per owner/step
        )
    )
    assert paths.shape == (64, 7)
    # connected graph: every walk completes despite deferrals, no -1 holes
    assert (paths >= 0).all()
    adj_sets = {v: set(g.neighbors(v)[0].tolist()) for v in range(g.n_vertices)}
    for row in paths:
        for a, b in zip(row[:-1], row[1:]):
            assert b in adj_sets[int(a)], row


def test_edge_partitioned_matches_analytic_distribution(mesh8):
    """Sharded frontier exchange must preserve the exact p/q distribution."""
    src = np.array([0, 0, 1, 1, 1, 2, 2, 3], dtype=np.int32)
    dst = np.array([1, 2, 0, 2, 3, 1, 0, 1], dtype=np.int32)
    w = np.array([1.0, 1.0, 1.0, 2.0, 1.5, 1, 1, 1], dtype=np.float32)
    g = from_edge_arrays(src, dst, w, directed=True)
    p, q = 0.5, 2.0

    engine = WalkEngine(g, Node2VecParams())
    padded, rps = partition_packed_adjacency(
        np.asarray(engine.packed_adj), mesh8.shape["data"]
    )
    adj = jax.device_put(
        jnp.asarray(padded), NamedSharding(mesh8, P("data", None))
    )
    n_walkers = 8192
    starts = jax.device_put(
        jnp.zeros(n_walkers, dtype=jnp.int32),
        NamedSharding(mesh8, P("data")),
    )
    paths = np.asarray(
        edge_partitioned_walk(
            mesh8, adj, rps, starts, jax.random.PRNGKey(3),
            walk_length=2, return_param=p, inout_param=q,
        )
    )
    took = paths[:, 1] == 1
    nxt = paths[took, 2]
    # N(1) = {0 back, 2 shared with N(0)={1,2}, 3 far}, weights 1/2/1.5
    target = np.array([1.0 / p, 2.0, 1.5 / q])
    target /= target.sum()
    counts = np.array([(nxt == v).sum() for v in (0, 2, 3)], dtype=np.float64)
    res = stats.chisquare(counts, target * counts.sum())
    assert res.pvalue > 1e-4, (counts, target * counts.sum())
