"""Blocked-CSR heavy-tail engine tests (walk/blocked.py).

Covers the builder's structural invariants, exact-distribution chi-square
checks with heavy vertices in every role (proposal source, membership target,
multi-block hub), the chunk-invariance property the other engines lack, the
trial-cap fallback accounting, and sharded-vs-single-device bit-match.
"""

import numpy as np
import pytest
from scipy import stats

import jax
import jax.numpy as jnp

from node2vec_tpu.constants import Node2VecParams
from node2vec_tpu.graph import from_edge_arrays
from node2vec_tpu.walk import WalkEngine
from node2vec_tpu.walk.blocked import (
    MAG,
    PAD_ID,
    BlockedGraph,
    _max_blocks,
    build_blocked_graph,
    blocked_walk_chunk,
    slq_or_dummy,
)


def _hub_graph(hub_deg=600, seed=0, with_far=False):
    """Hub 0 with ``hub_deg`` weighted out/in edges + a light ring; the hub
    spans multiple 256-wide blocks.  ``with_far`` adds a vertex F=hub_deg+1
    reachable from every ring vertex but NOT a neighbor of the hub, so
    hub->x->F transitions exercise the 1/q (non-shared) class."""
    rng = np.random.default_rng(seed)
    nbrs = np.arange(1, hub_deg + 1, dtype=np.int32)
    src = np.concatenate([np.zeros(hub_deg, np.int32), nbrs])
    dst = np.concatenate([nbrs, np.zeros(hub_deg, np.int32)])
    ring_src = nbrs
    ring_dst = (nbrs % hub_deg) + 1
    src = np.concatenate([src, ring_src, ring_dst])
    dst = np.concatenate([dst, ring_dst, ring_src])
    if with_far:
        far = np.int32(hub_deg + 1)
        src = np.concatenate([src, nbrs, [far]])
        dst = np.concatenate([dst, np.full(hub_deg, far, np.int32), [1]])
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    return from_edge_arrays(src, dst, w, directed=True)


def test_builder_structure_roundtrip():
    g = _hub_graph()
    bg = build_blocked_graph(g.indptr, g.indices, g.weights)
    assert isinstance(bg, BlockedGraph)
    assert bg.has_heavy
    light = np.asarray(bg.light)
    biw = np.asarray(bg.biw)
    bids = np.asarray(bg.bids)
    p_l, c = bg.light_width, bg.block_width
    maxb = _max_blocks(p_l)
    deg = g.out_degrees()

    for v in [0, 1, 2, 17, 300]:
        ids, w = g.neighbors(v)
        if deg[v] <= p_l:  # light: row must reproduce the CSR segment
            row_ids = light[v, :p_l]
            np.testing.assert_array_equal(row_ids[: len(ids)], ids)
            assert (row_ids[len(ids):] == PAD_ID).all()
            row_w = light[v, p_l : p_l + len(ids)].view(np.float32)
            np.testing.assert_allclose(row_w, w)
        else:  # heavy: header + blocks must reproduce the CSR segment
            hdr = light[v]
            assert hdr[0] == -2 and hdr[4] == deg[v]
            bs, nb = hdr[1], hdr[2]
            got = np.concatenate([biw[bs + b, :c] for b in range(nb)])[: deg[v]]
            np.testing.assert_array_equal(got, ids)
            np.testing.assert_array_equal(
                np.concatenate([bids[bs + b] for b in range(nb)])[: deg[v]], ids
            )
            gw = np.concatenate(
                [biw[bs + b, c:] for b in range(nb)]
            )[: deg[v]].view(np.float32)
            np.testing.assert_allclose(gw, w)
            # header CDF ends at wtot; block mins match block firsts
            cdf = hdr[5 + maxb : 5 + 2 * maxb].view(np.float32)
            np.testing.assert_allclose(cdf[nb - 1], w.sum(), rtol=1e-5)
            np.testing.assert_allclose(hdr[3:4].view(np.float32)[0], cdf[nb - 1])
            for b in range(nb):
                assert hdr[5 + b] == ids[b * c]
            assert (hdr[5 + nb : 5 + maxb] == PAD_ID).all()


def test_builder_reverse_metadata():
    """rev_w = weight of the reverse edge (0 if absent); pfx = CDF prefix of
    the reverse vertex; has_shared triangle bit lives in the rev sign."""
    # 0->1 (rev 7.0), 0->2 (no rev), 1->0, 2->3; triangle on {0,1,4}: 0->4,
    # 1->4 makes edge 0->1 triangle-closing
    src = np.array([0, 0, 1, 2, 0, 1, 4, 4], dtype=np.int32)
    dst = np.array([1, 2, 0, 3, 4, 4, 0, 1], dtype=np.int32)
    w = np.array([1.5, 2.5, 7.0, 3.0, 1.0, 1.0, 1.0, 1.0], dtype=np.float32)
    g = from_edge_arrays(src, dst, w, directed=True)
    bg = build_blocked_graph(g.indptr, g.indices, g.weights, light_width=8)
    light = np.asarray(bg.light)
    p_l = bg.light_width
    row0 = light[0]
    ids0 = row0[:p_l]
    rev0_bits = row0[2 * p_l : 3 * p_l]
    rev0 = (rev0_bits & MAG).view(np.float32)
    shared0 = rev0_bits < 0
    pfx0 = row0[3 * p_l :].view(np.float32)
    i01 = np.where(ids0 == 1)[0][0]
    i02 = np.where(ids0 == 2)[0][0]
    assert rev0[i01] == 7.0
    assert rev0[i02] == 0.0
    assert shared0[i01]  # 4 ∈ N(0) ∩ N(1)
    assert not shared0[i02]  # N(0) ∩ N(2) = ∅
    # pfx of edge 0->1: prefix of 0 within N(1) = {0, 4}: 0 sorts first -> 0.0
    assert pfx0[i01] == 0.0


def test_capacity_guard():
    hub_deg = 2000
    nbrs = np.arange(1, hub_deg + 1, dtype=np.int32)
    g = from_edge_arrays(np.zeros(hub_deg, np.int32), nbrs, directed=True)
    with pytest.raises(ValueError, match="capacity"):
        build_blocked_graph(
            g.indptr, g.indices, g.weights, light_width=8, block_width=64
        )
    assert _max_blocks(8) * 64 < hub_deg


@pytest.mark.parametrize("sl", [False, True])
@pytest.mark.parametrize("p,q", [(1.0, 1.0), (0.25, 4.0), (4.0, 0.25), (2.0, 0.5)])
def test_heavy_cur_transition_distribution(p, q, sl):
    """Transitions OUT of a multi-block hub must follow the analytic p/q
    law: hierarchical CDF proposal + membership against a light prev.
    Run in both sampler modes: rejection-bound (default) and the exact
    3-atom shared-list mixture (sl=True; this graph has no overflow edges,
    so it also covers the sl_exhaustive no-membership path)."""
    g = _hub_graph()
    params = Node2VecParams(
        num_walks=12000, walk_length=2, return_param=p, inout_param=q,
        walker_chunk=1 << 14,
    )
    engine = WalkEngine(g, params, strategy="blocked", shared_lists=sl)
    assert engine.bgraph.shared_lists == sl
    if sl:
        assert engine.bgraph.sl_exhaustive
    walks = engine.run(seed=11, start_vertices=np.array([5], dtype=np.int32))
    # step 0: first-order from light vertex 5; probe walks that went 5 -> 0
    took = walks[:, 1] == 0
    nxt = walks[took, 2]
    assert took.sum() > 3000
    # analytic target over N(0) = 1..600: back-edge 5 gets 1/p; shared =
    # N(5)\{0} = ring neighbors of 5; everything else 1/q
    ids, w = g.neighbors(0)
    n5 = set(g.neighbors(5)[0].tolist()) - {0}
    bias = np.where(
        ids == 5, 1.0 / p, np.where(np.isin(ids, list(n5)), 1.0, 1.0 / q)
    )
    target = w * bias
    target = target / target.sum()
    # coarse bins: back | shared | 8 groups of the rest (keeps expected>5)
    rest = ~np.isin(ids, [5] + list(n5))
    bins = [np.isin(ids, [5]), np.isin(ids, list(n5))]
    rest_idx = np.where(rest)[0]
    for grp in np.array_split(rest_idx, 8):
        m = np.zeros(len(ids), bool)
        m[grp] = True
        bins.append(m)
    counts = np.array(
        [np.isin(nxt, ids[m]).sum() for m in bins], dtype=np.float64
    )
    expected = np.array([target[m].sum() for m in bins]) * counts.sum()
    res = stats.chisquare(counts, expected)
    assert res.pvalue > 1e-4, (p, q, counts, expected)


@pytest.mark.parametrize("sl", [False, True])
@pytest.mark.parametrize("p,q", [(0.25, 4.0), (2.0, 0.5)])
def test_heavy_prev_membership_distribution(p, q, sl):
    """Transitions FROM a light vertex with a heavy prev exercise the
    block-min membership search against the hub's neighbor set.

    Aggregated over all first hops x: from each ring vertex x (prev = hub),
    the next step is back (hub, 1/p), a ring neighbor (∈ N(hub) ⇒ shared, 1),
    or the far vertex (∉ N(hub) ⇒ 1/q).
    """
    hub_deg = 600
    far = hub_deg + 1
    g = _hub_graph(hub_deg, with_far=True)
    params = Node2VecParams(
        num_walks=20000, walk_length=2, return_param=p, inout_param=q,
        walker_chunk=1 << 15,
    )
    engine = WalkEngine(g, params, strategy="blocked", shared_lists=sl)
    walks = engine.run(seed=17, start_vertices=np.array([0], dtype=np.int32))
    x = walks[:, 1]
    y = walks[:, 2]
    # per first-hop vertex: analytic class probabilities from its weights
    p_back = np.zeros(far + 1)
    p_far = np.zeros(far + 1)
    for v in range(1, hub_deg + 1):
        ids, w = g.neighbors(v)
        bias = np.where(
            ids == 0, 1.0 / p, np.where(ids == far, 1.0 / q, 1.0)
        )
        tw = w * bias
        tw = tw / tw.sum()
        p_back[v] = tw[ids == 0].sum()
        p_far[v] = tw[ids == far].sum()
    n_x = np.bincount(x, minlength=far + 1).astype(np.float64)
    exp_back = float((n_x * p_back).sum())
    exp_far = float((n_x * p_far).sum())
    exp_shared = n_x[1 : hub_deg + 1].sum() - exp_back - exp_far
    counts = np.array(
        [(y == 0).sum(), ((y >= 1) & (y <= hub_deg)).sum(), (y == far).sum()],
        dtype=np.float64,
    )
    res = stats.chisquare(counts, [exp_back, exp_shared, exp_far])
    assert res.pvalue > 1e-4, (p, q, counts, [exp_back, exp_shared, exp_far])


def test_chunk_invariance():
    """The blocked engine's counter-based RNG makes walks BIT-IDENTICAL
    across walker_chunk sizes — the property the other engines lack."""
    g = _hub_graph()
    kw = dict(num_walks=3, walk_length=6, return_param=0.5, inout_param=2.0)
    w_small = WalkEngine(
        g, Node2VecParams(walker_chunk=128, **kw), strategy="blocked"
    ).run(seed=5)
    w_big = WalkEngine(
        g, Node2VecParams(walker_chunk=1 << 15, **kw), strategy="blocked"
    ).run(seed=5)
    np.testing.assert_array_equal(w_small, w_big)


def test_tail_compaction_bit_matches_uncompacted():
    """Chunks >= 16384 lanes trigger the straggler-compaction cascade; the
    counter-keyed RNG must make compacted walks bit-identical to the same
    walks run in small chunks (which never compact)."""
    rng = np.random.default_rng(7)
    n_v = 3000
    src = rng.integers(0, n_v, 24000).astype(np.int32)
    dst = rng.integers(0, n_v, 24000).astype(np.int32)
    keep = src != dst
    g = from_edge_arrays(src[keep], dst[keep], directed=False)
    kw = dict(num_walks=6, walk_length=8, return_param=0.25, inout_param=4.0)
    w_casc = WalkEngine(
        g, Node2VecParams(walker_chunk=1 << 15, **kw), strategy="blocked"
    ).run(seed=9)  # 18000 lanes in one chunk -> cascade active
    w_small = WalkEngine(
        g, Node2VecParams(walker_chunk=4096, **kw), strategy="blocked"
    ).run(seed=9)  # 4096-lane chunks -> single level
    np.testing.assert_array_equal(w_casc, w_small)


def test_attempt_count_exact():
    """The attempt counter must count EVERY draw, including each walker's
    final accepted one (it used to stop one short per completed walker,
    deflating bench's attempts/step to (L-1)/L).  With uniform bias (no
    rejection) and with max_trials=1 (every attempt forced to advance),
    attempts == steps exactly."""
    g = _hub_graph()  # no sinks: every vertex has out-edges
    bg = build_blocked_graph(g.indptr, g.indices, g.weights)
    starts = np.arange(64, dtype=np.int32) % g.n_vertices
    gids = np.arange(64, dtype=np.int32)
    for p, q, trials in [(1.0, 1.0, 64), (0.25, 4.0, 1)]:
        paths, n_fb, n_att = blocked_walk_chunk(
            bg.light, bg.biw, bg.bids, bg.brp, slq_or_dummy(bg),
            jnp.asarray(starts), jnp.asarray(gids), jnp.uint32(11),
            walk_length=7, return_param=p, inout_param=q,
            max_trials=trials, light_width=bg.light_width,
            block_width=bg.block_width, has_heavy=bg.has_heavy,
            shared_lists=bg.shared_lists,
        )
        steps = int((np.asarray(paths) >= 0).sum()) - len(starts)
        assert steps == 7 * len(starts)  # no sinks -> all walks complete
        assert int(n_att) == steps, (p, q, int(n_att), steps)


def test_determinism_and_seed_variation():
    g = _hub_graph()
    params = Node2VecParams(num_walks=2, walk_length=5, return_param=0.5,
                            inout_param=2.0)
    e = WalkEngine(g, params, strategy="blocked")
    w1 = e.run(seed=3)
    w2 = e.run(seed=3)
    np.testing.assert_array_equal(w1, w2)
    assert (e.run(seed=4) != w1).any()


def test_sink_death_and_padding():
    # 0 -> 1 -> (sink 2); vertex 3 isolated
    src = np.array([0, 1], dtype=np.int32)
    dst = np.array([1, 2], dtype=np.int32)
    g = from_edge_arrays(src, dst, n_vertices=4, directed=True)
    bg = build_blocked_graph(g.indptr, g.indices, g.weights, light_width=8)
    starts = jnp.asarray(np.array([0, 3, -1], dtype=np.int32))
    gids = jnp.arange(3, dtype=jnp.int32)
    paths, n_fb, _ = blocked_walk_chunk(
        bg.light, bg.biw, bg.bids, bg.brp, slq_or_dummy(bg), starts, gids,
        jnp.uint32(0),
        walk_length=4, return_param=1.0, inout_param=1.0, max_trials=16,
        light_width=bg.light_width, block_width=bg.block_width,
        has_heavy=bg.has_heavy, shared_lists=bg.shared_lists,
    )
    paths = np.asarray(paths)
    np.testing.assert_array_equal(paths[0], [0, 1, 2, -1, -1])  # dies at sink
    np.testing.assert_array_equal(paths[1], [3, -1, -1, -1, -1])  # isolated
    np.testing.assert_array_equal(paths[2], [-1, -1, -1, -1, -1])  # padding
    assert int(n_fb) == 0


def test_fallback_counting():
    """With a 1-trial cap and q>>1, some lanes must take the ∝w fallback and
    the engine must surface the count."""
    g = _hub_graph()
    params = Node2VecParams(
        num_walks=50, walk_length=8, return_param=1.0, inout_param=8.0,
        max_rejection_trials=1,
    )
    e = WalkEngine(g, params, strategy="blocked")
    e.run(seed=2)
    assert e.fallback_count > 0


def test_prebuilt_blocked_graph_reuse():
    """WalkEngine(blocked_graph=...) reuses prebuilt tables (bench packs
    once for four param configs) and walks bit-match a fresh build."""
    g = _hub_graph()
    bg = build_blocked_graph(g.indptr, g.indices, g.weights)
    kw = dict(num_walks=2, walk_length=5, return_param=0.5, inout_param=2.0)
    e1 = WalkEngine(g, Node2VecParams(**kw), strategy="blocked",
                    blocked_graph=bg)
    assert e1.bgraph is bg  # no rebuild
    w1 = e1.run(seed=3)
    w2 = WalkEngine(g, Node2VecParams(**kw), strategy="blocked").run(seed=3)
    np.testing.assert_array_equal(w1, w2)


def test_approx_mode_valid_edges_and_chunk_invariant():
    """Approximate mode (cap=1): forced acceptances still traverse real
    edges (the proposal is an exact ∝w draw), and the counter-keyed RNG
    keeps walks bit-invariant to chunking."""
    g = _hub_graph()
    kw = dict(
        num_walks=4, walk_length=6, return_param=0.25, inout_param=4.0,
        max_rejection_trials=1,
    )
    e = WalkEngine(
        g, Node2VecParams(walker_chunk=1 << 15, **kw), strategy="blocked"
    )
    walks = np.asarray(e.run(seed=13))
    assert e.fallback_count > 0  # the cap actually bit

    edges = set(zip(
        np.repeat(np.arange(g.n_vertices), np.diff(g.indptr)).tolist(),
        g.indices.tolist(),
    ))
    for row in walks:
        for a, b in zip(row[:-1], row[1:]):
            if a >= 0 and b >= 0:
                assert (int(a), int(b)) in edges

    w_small = WalkEngine(
        g, Node2VecParams(walker_chunk=256, **kw), strategy="blocked"
    ).run(seed=13)
    np.testing.assert_array_equal(walks, w_small)


def test_sharded_matches_single_device():
    """8-way sharded blocked walks must be bit-identical to single-device
    (counter-based RNG ⇒ layout invariance)."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devs, ("data", "model"))
    g = _hub_graph()
    params = Node2VecParams(num_walks=2, walk_length=5, return_param=0.5,
                            inout_param=2.0)
    w_single = WalkEngine(g, params, strategy="blocked").run(seed=7)
    w_sharded = WalkEngine(g, params, strategy="blocked", mesh=mesh).run(seed=7)
    np.testing.assert_array_equal(w_single, w_sharded)


def test_hashrng_uniformity():
    from node2vec_tpu.ops.hashrng import hash_uniform

    gids = jnp.arange(20000, dtype=jnp.int32)
    u = np.asarray(hash_uniform(jnp.uint32(42), gids.astype(jnp.uint32), 7))
    assert (u >= 0).all() and (u < 1).all()
    counts, _ = np.histogram(u, bins=20, range=(0, 1))
    res = stats.chisquare(counts)
    assert res.pvalue > 1e-4, counts
    # draws at different counters decorrelate
    u2 = np.asarray(hash_uniform(jnp.uint32(42), gids.astype(jnp.uint32), 8))
    assert abs(np.corrcoef(u, u2)[0, 1]) < 0.05


def _two_hub_graph(n_shared=20, n_spokes=300):
    """Two heavy hubs A=0, B=1 sharing ``n_shared`` common neighbors: the
    edge A->B has > SL_K shared entries, so its slist OVERFLOWS and lanes
    arriving at B from A must take the rejection-bound fallback while other
    lanes use the 3-atom shared-list path."""
    shared = np.arange(2, 2 + n_shared, dtype=np.int32)
    a_only = np.arange(2 + n_shared, 2 + n_shared + n_spokes, dtype=np.int32)
    b_only = a_only + n_spokes
    src = np.concatenate([
        np.zeros(1, np.int32),                       # A - B
        np.zeros(n_shared, np.int32), shared,        # A - shared (both dirs via undirected)
        np.ones(n_shared, np.int32),                 # B - shared
        np.zeros(n_spokes, np.int32),                # A - a_only
        np.ones(n_spokes, np.int32),                 # B - b_only
    ])
    dst = np.concatenate([
        np.ones(1, np.int32),
        shared, np.full(n_shared, 1, np.int32),
        shared,
        a_only,
        b_only,
    ])
    # wait: row 2 above (shared -> 1) duplicates row 3 (1 -> shared) after
    # undirected mirroring; from_edge_arrays dedups mirrored duplicates
    rng = np.random.default_rng(3)
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    w[0] = 60.0  # A - B heavy weight: most step-0 hops take the hub-hub edge
    return from_edge_arrays(src, dst, w, directed=False)


def test_shared_list_overflow_edge_distribution():
    """The A->B hub-hub edge overflows SL_K shared entries; transitions out
    of B with prev=A must STILL follow the analytic p/q law (fallback path),
    while non-overflow lanes run the 3-atom sampler in the same kernel."""
    from node2vec_tpu.walk.blocked import SL_EDGES_PER_ROW, SL_K, SL_LANES

    p, q = 0.25, 4.0
    g = _two_hub_graph()
    bg = build_blocked_graph(g.indptr, g.indices, g.weights, shared_lists=True)
    assert bg.slq is not None
    # locate edge A(0) -> B(1): row 0's slot of id 1
    ids0, _ = g.neighbors(0)
    e_ab = int(g.indptr[0] + np.where(ids0 == 1)[0][0])
    slq = np.asarray(bg.slq)
    lanes = slq[e_ab // SL_EDGES_PER_ROW][
        (e_ab % SL_EDGES_PER_ROW) * SL_LANES :
        (e_ab % SL_EDGES_PER_ROW + 1) * SL_LANES
    ]
    assert lanes[13] & 1, "A->B must overflow (20 shared > K=8)"
    # and a hub->shared-neighbor edge must NOT overflow
    e_as = int(g.indptr[0] + np.where(ids0 == 2)[0][0])
    lanes2 = slq[e_as // SL_EDGES_PER_ROW][
        (e_as % SL_EDGES_PER_ROW) * SL_LANES :
        (e_as % SL_EDGES_PER_ROW + 1) * SL_LANES
    ]
    assert not (lanes2[13] & 1)

    params = Node2VecParams(
        num_walks=30000, walk_length=2, return_param=p, inout_param=q,
        walker_chunk=1 << 15,
    )
    engine = WalkEngine(g, params, strategy="blocked", shared_lists=True)
    assert engine.bgraph.shared_lists and not engine.bgraph.sl_exhaustive
    walks = engine.run(seed=23, start_vertices=np.array([0], dtype=np.int32))
    took = walks[:, 1] == 1  # first hop A -> B
    nxt = walks[took, 2]
    assert took.sum() > 1000
    ids, w = g.neighbors(1)
    shared = set(g.neighbors(0)[0].tolist()) - {1}
    bias = np.where(
        ids == 0, 1.0 / p, np.where(np.isin(ids, list(shared)), 1.0, 1.0 / q)
    )
    target = w * bias
    target = target / target.sum()
    is_back = ids == 0
    is_shared = np.isin(ids, list(shared))
    rest_idx = np.where(~is_back & ~is_shared)[0]
    bins = [is_back, is_shared]
    for grp in np.array_split(rest_idx, 6):
        m = np.zeros(len(ids), bool)
        m[grp] = True
        bins.append(m)
    counts = np.array(
        [np.isin(nxt, ids[m]).sum() for m in bins], dtype=np.float64
    )
    expected = np.array([target[m].sum() for m in bins]) * counts.sum()
    res = stats.chisquare(counts, expected)
    assert res.pvalue > 1e-4, (counts, expected)


def test_shared_lists_cut_attempts():
    """On a triangle-rich graph at q>1 the 3-atom sampler must need fewer
    attempts/step than the rejection-bound sampler — and both stay exact
    (distribution equality is covered by the chi-square tests above)."""
    g = _hub_graph()  # ring edges close triangles with the hub
    kw = dict(num_walks=8, walk_length=8, return_param=0.25, inout_param=4.0)
    e_on = WalkEngine(
        g, Node2VecParams(**kw), strategy="blocked", shared_lists=True
    )
    assert e_on.bgraph.shared_lists
    e_on.run(seed=2)
    bg_off = build_blocked_graph(
        g.indptr, g.indices, g.weights, shared_lists=False
    )
    e_off = WalkEngine(
        g, Node2VecParams(**kw), strategy="blocked", blocked_graph=bg_off
    )
    e_off.run(seed=2)
    assert e_on.attempt_count < e_off.attempt_count, (
        e_on.attempt_count, e_off.attempt_count
    )


def test_shared_lists_chunk_invariance():
    """Chunk invariance must hold with the shared-list sampler active (the
    slq fetch and 3-atom draws are keyed on the same global counters)."""
    g = _two_hub_graph()
    kw = dict(num_walks=3, walk_length=6, return_param=0.25, inout_param=4.0)
    w_small = WalkEngine(
        g, Node2VecParams(walker_chunk=128, **kw), strategy="blocked",
        shared_lists=True,
    ).run(seed=5)
    w_big = WalkEngine(
        g, Node2VecParams(walker_chunk=1 << 15, **kw), strategy="blocked",
        shared_lists=True,
    ).run(seed=5)
    np.testing.assert_array_equal(w_small, w_big)


def test_light_row_width_ebase_only_for_shared_lists():
    """The ebase lane (global CSR edge base, read only by the shared-list
    kernel) must not widen the light row when shared lists are off — an
    explicit light_width=32 (4P=128) previously rounded 129 lanes up to a
    second 128-lane tile, doubling light-table HBM (round-3 advisor)."""
    from node2vec_tpu.walk.blocked import _light_row_width

    assert _light_row_width(31) == 128
    assert _light_row_width(31, ebase=True) == 128  # rides the tile padding
    assert _light_row_width(32) == 128  # was 256 before the fix
    assert _light_row_width(32, ebase=True) == 256

    g = _hub_graph(hub_deg=60)
    bg = build_blocked_graph(g.indptr, g.indices, g.weights, light_width=32)
    assert bg.light.shape[1] == 128
    bg_sl = build_blocked_graph(
        g.indptr, g.indices, g.weights, light_width=32, shared_lists=True
    )
    assert bg_sl.light.shape[1] == 256
    # the ebase-free P=32 layout must still produce valid biased walks
    params = Node2VecParams(
        num_walks=6, walk_length=6, return_param=0.5, inout_param=2.0
    )
    walks = WalkEngine(
        g, params, strategy="blocked", blocked_graph=bg
    ).run(seed=3)
    edge_set = {
        (int(s), int(d))
        for s in range(g.n_vertices)
        for d in g.neighbors(s)[0]
    }
    for row in np.asarray(walks):
        for a, b in zip(row[:-1], row[1:]):
            if a >= 0 and b >= 0:
                assert (int(a), int(b)) in edge_set


def test_effective_chunk_headroom_keyed_on_applied_flags():
    """The +144/walker shared-list headroom must key on the APPLIED sampler
    flags, not mere table presence: shared_lists='auto' with a high-overflow
    prebuilt table compiles the sampler OFF, so chunks must not shrink for
    state the kernel does not carry (round-3 advisor)."""
    g = _hub_graph(hub_deg=60)
    bg = build_blocked_graph(
        g.indptr, g.indices, g.weights, shared_lists=True
    )
    bg_high = bg._replace(sl_ovf_wfrac=0.5)  # above the 0.15 auto threshold
    params = Node2VecParams(
        num_walks=2, walk_length=20, walker_chunk=1 << 30, inout_param=2.0
    )
    e_auto = WalkEngine(
        g, params, strategy="blocked", blocked_graph=bg_high,
        shared_lists="auto",
    )
    assert not e_auto._sl_flags()[0]  # policy compiled the sampler off
    e_on = WalkEngine(
        g, params, strategy="blocked", blocked_graph=bg_high,
        shared_lists=True,
    )
    assert e_on._sl_flags()[0]
    big = 1 << 30
    assert e_auto._effective_chunk(big) > e_on._effective_chunk(big)
