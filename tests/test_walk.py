"""Walk-engine tests: validity, determinism, sinks, and the statistical
transition tests the reference lacks (SURVEY.md §4 flags this gap: empirical
walk transitions are checked against the analytic p/q distribution)."""

import numpy as np
import pytest
from scipy import stats

from node2vec_tpu.constants import Node2VecParams
from node2vec_tpu.graph import from_edge_arrays
from node2vec_tpu.walk import WalkEngine, random_walks


def _edges_valid(g, walks):
    """Every consecutive pair in every walk must be a graph edge."""
    adj = {
        v: set(g.neighbors(v)[0].tolist()) for v in range(g.n_vertices)
    }
    for row in walks:
        path = row[row >= 0]
        assert len(path) >= 1
        for a, b in zip(path[:-1], path[1:]):
            assert b in adj[int(a)], (path, a, b)
        # once dead, stays dead (suffix of -1s only)
        tail = row[len(path):]
        assert (tail == -1).all()


def test_walks_shape_and_validity(karate_edges):
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    params = Node2VecParams(num_walks=3, walk_length=8)
    walks = random_walks(g, params, seed=1)
    assert walks.shape == (3 * 34, 9)
    # walk row layout: copy i of vertex v at row i*V + v; start vertex = walk[0]
    np.testing.assert_array_equal(walks[:, 0], np.tile(np.arange(34), 3))
    _edges_valid(g, walks)
    # connected undirected graph: no walker ever dies
    assert (walks >= 0).all()


def test_walks_deterministic(karate_edges):
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    params = Node2VecParams(num_walks=2, walk_length=6)
    w1 = random_walks(g, params, seed=42)
    w2 = random_walks(g, params, seed=42)
    np.testing.assert_array_equal(w1, w2)
    w3 = random_walks(g, params, seed=43)
    assert (w1 != w3).any()


def test_walks_chunking_invariance(karate_edges):
    """ALL engines key draws on the GLOBAL walker id, so walk content is
    bit-invariant to walker_chunk (VERDICT round-1 weak item 6; the CSR
    fallback adopted the counter-keyed contract in round 4)."""
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    for strategy in ("auto", "csr"):
        for p, q in [(1.0, 1.0), (0.25, 4.0)]:
            p_small = Node2VecParams(
                num_walks=2, walk_length=5, walker_chunk=16,
                return_param=p, inout_param=q,
            )
            p_big = Node2VecParams(
                num_walks=2, walk_length=5, walker_chunk=1 << 16,
                return_param=p, inout_param=q,
            )
            w_small = WalkEngine(g, p_small, strategy=strategy).run(seed=7)
            w_big = WalkEngine(g, p_big, strategy=strategy).run(seed=7)
            np.testing.assert_array_equal(
                w_small, w_big, err_msg=f"strategy={strategy} p={p} q={q}"
            )


def test_sink_vertices_end_walks():
    # 0 -> 1 -> 2 (sink)
    src = np.array([0, 1], dtype=np.int32)
    dst = np.array([1, 2], dtype=np.int32)
    g = from_edge_arrays(src, dst, n_vertices=3, directed=True)
    walks = random_walks(g, Node2VecParams(num_walks=1, walk_length=5), seed=0)
    np.testing.assert_array_equal(walks[0], [0, 1, 2, -1, -1, -1])
    np.testing.assert_array_equal(walks[1], [1, 2, -1, -1, -1, -1])
    np.testing.assert_array_equal(walks[2], [2, -1, -1, -1, -1, -1])


def test_start_vertices_restriction(karate_edges):
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    starts = np.array([5, 7], dtype=np.int32)
    walks = random_walks(
        g, Node2VecParams(num_walks=4, walk_length=3), seed=0, start_vertices=starts
    )
    assert walks.shape == (8, 4)
    np.testing.assert_array_equal(walks[:, 0], np.tile(starts, 4))


def test_first_order_transition_distribution():
    """p=q=1 step-0 transitions must follow edge weights (chi-square)."""
    # star: 0 -> {1,2,3} with weights 1,2,4
    src = np.array([0, 0, 0, 1, 2, 3], dtype=np.int32)
    dst = np.array([1, 2, 3, 0, 0, 0], dtype=np.int32)
    w = np.array([1.0, 2.0, 4.0, 1, 1, 1], dtype=np.float32)
    g = from_edge_arrays(src, dst, w, directed=True)
    params = Node2VecParams(num_walks=6000, walk_length=1, walker_chunk=1 << 14)
    walks = random_walks(g, params, seed=3, start_vertices=np.array([0], dtype=np.int32))
    nxt = walks[:, 1]
    counts = np.array([(nxt == v).sum() for v in (1, 2, 3)], dtype=np.float64)
    probs = np.array([1.0, 2.0, 4.0]) / 7.0
    res = stats.chisquare(counts, probs * counts.sum())
    assert res.pvalue > 1e-4, counts


@pytest.mark.parametrize("p,q", [(1.0, 1.0), (0.25, 4.0), (4.0, 0.25), (2.0, 0.5)])
def test_second_order_transition_distribution(p, q):
    """Empirical (prev,cur)->next frequencies vs the analytic node2vec bias.

    Graph is built so all three bias classes occur from the probed edge:
    back-edge (1/p), shared neighbor (1), and distance-2 vertex (1/q).
    """
    # vertices: u=0, v=1, shared s=2 (nbr of both), far f=3 (nbr of v only)
    src = np.array([0, 0, 1, 1, 1, 2, 2, 3], dtype=np.int32)
    dst = np.array([1, 2, 0, 2, 3, 0, 1, 1], dtype=np.int32)
    w = np.array([1.0, 1.0, 1.0, 2.0, 1.5, 1, 1, 1], dtype=np.float32)
    g = from_edge_arrays(src, dst, w, directed=True)

    params = Node2VecParams(
        num_walks=8000,
        walk_length=2,
        return_param=p,
        inout_param=q,
        walker_chunk=1 << 14,
    )
    walks = random_walks(g, params, seed=11, start_vertices=np.array([0], dtype=np.int32))
    # step 0 is first-order from 0; probe walks that moved 0 -> 1
    took_edge = walks[:, 1] == 1
    nxt = walks[took_edge, 2]
    # N(1) = {0 (back), 2 (shared with N(0)={1,2}), 3 (far)}, weights 1.0/2.0/1.5
    target = np.array([1.0 / p, 2.0 * 1.0, 1.5 / q])
    target = target / target.sum()
    counts = np.array([(nxt == v).sum() for v in (0, 2, 3)], dtype=np.float64)
    assert counts.sum() == len(nxt)
    res = stats.chisquare(counts, target * counts.sum())
    assert res.pvalue > 1e-4, (counts, target * counts.sum(), p, q)


@pytest.mark.parametrize("strategy", ["dense", "csr"])
def test_both_strategies_match_analytic_distribution(strategy):
    """Engine matrix: dense exact sampler and CSR rejection sampler must both
    reproduce the analytic second-order distribution."""
    src = np.array([0, 0, 1, 1, 1, 2, 2, 3], dtype=np.int32)
    dst = np.array([1, 2, 0, 2, 3, 1, 0, 1], dtype=np.int32)
    w = np.array([1.0, 1.0, 1.0, 2.0, 1.5, 1, 1, 1], dtype=np.float32)
    g = from_edge_arrays(src, dst, w, directed=True)
    p, q = 0.5, 2.0
    params = Node2VecParams(
        num_walks=6000, walk_length=2, return_param=p, inout_param=q,
        walker_chunk=1 << 14,
    )
    engine = WalkEngine(g, params, strategy=strategy)
    assert engine.strategy == strategy
    walks = engine.run(seed=13, start_vertices=np.array([0], dtype=np.int32))
    took = walks[:, 1] == 1
    nxt = walks[took, 2]
    target = np.array([1.0 / p, 2.0, 1.5 / q])
    target /= target.sum()
    counts = np.array([(nxt == v).sum() for v in (0, 2, 3)], dtype=np.float64)
    res = stats.chisquare(counts, target * counts.sum())
    assert res.pvalue > 1e-4, (strategy, counts, target * counts.sum())


@pytest.mark.parametrize("p,q", [(4.0, 0.25), (0.25, 4.0)])
def test_csr_degree_one_back_edge_forced(p, q):
    """A degree-1 vertex whose sole neighbor is prev has exactly one legal
    move; the CSR engine must take it directly instead of spinning the
    rejection loop (branch B can never accept there — the deg-1 spiral that
    faulted the runtime at extreme p/q, ROADMAP round-2 item 4)."""
    # pendant chain: 0 - 1 (deg(0)=1), plus 1 - 2 so walks keep going
    src = np.array([0, 1, 1, 2], dtype=np.int32)
    dst = np.array([1, 0, 2, 1], dtype=np.int32)
    g = from_edge_arrays(src, dst, directed=True)
    params = Node2VecParams(
        num_walks=200, walk_length=8, return_param=p, inout_param=q,
        walker_chunk=1 << 10,
    )
    engine = WalkEngine(g, params, strategy="csr")
    walks = engine.run(seed=5, start_vertices=np.array([0], dtype=np.int32))
    assert (walks >= 0).all()  # chain has no sinks: every step must advance
    # any arrival at 0 (from 1) must bounce straight back to 1
    at0 = walks[:, :-1] == 0
    assert (walks[:, 1:][at0] == 1).all()


def test_run_device_matches_run(karate_edges):
    """Host-returning and device-resident walk paths must agree exactly."""
    src, dst = karate_edges
    g = from_edge_arrays(src, dst, directed=False)
    params = Node2VecParams(num_walks=3, walk_length=7, walker_chunk=40)
    engine = WalkEngine(g, params)
    w_host = engine.run(seed=5)
    w_dev = np.asarray(engine.run_device(seed=5))
    np.testing.assert_array_equal(w_host, w_dev)


def test_heavy_tail_auto_selects_blocked_engine():
    """A hub vertex above the dense cap must route to the blocked heavy-tail
    engine automatically, end to end."""
    hub_degree = 300
    src = np.concatenate([np.zeros(hub_degree, np.int32),
                          np.arange(1, hub_degree + 1, dtype=np.int32)])
    dst = np.concatenate([np.arange(1, hub_degree + 1, dtype=np.int32),
                          np.zeros(hub_degree, np.int32)])
    g = from_edge_arrays(src, dst, directed=True)
    params = Node2VecParams(num_walks=2, walk_length=5,
                            return_param=0.5, inout_param=2.0)
    engine = WalkEngine(g, params)
    assert engine.strategy == "blocked"
    walks = engine.run(seed=1)
    assert walks.shape == (2 * (hub_degree + 1), 6)
    _edges_valid(g, walks)


def test_isolated_start_dies_immediately():
    src = np.array([0], dtype=np.int32)
    dst = np.array([1], dtype=np.int32)
    g = from_edge_arrays(src, dst, n_vertices=3, directed=True)  # vertex 2 isolated
    walks = random_walks(g, Node2VecParams(num_walks=1, walk_length=3), seed=0)
    np.testing.assert_array_equal(walks[2], [2, -1, -1, -1])
