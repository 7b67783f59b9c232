"""TPU-native second-order biased random-walk engine.

The reference grows walks with a Spark superstep loop: per step it JOINs the
walker frontier with the adjacency table (two cluster-wide shuffles), builds a
fresh per-walker alias table in Python, and draws one hop
(``/root/reference/node2vec/spark.py:588-601``, ``fugue.py:146-150``,
``randomwalk.py:300-339``).

The TPU design replaces all of that with one jit-compiled program over
fixed-shape arrays:

* Graph = CSR + **precomputed first-order alias tables** (one entry per edge,
  built once on the host/C++ — not per step).
* One walk step for W walkers = O(1) vectorized work per walker via
  **rejection sampling** (ThunderRW/KnightKing style): propose a neighbor from
  the static alias table (distribution ∝ edge weight), then accept with
  probability bias/bias_max where bias ∈ {1/p, 1, 1/q} is the node2vec
  second-order factor.  Accepted samples are *exactly* distributed as the
  reference's per-step alias tables (``randomwalk.py:218-231``), because
  target ∝ weight × bias.
* The bias class test ``candidate ∈ N(prev)`` is a batched binary search over
  the sorted CSR rows (the reference's per-walker Python ``set`` lookup,
  ``spark.py:143``; rows are sorted in both designs, ``spark.py:298``).
* The proposal loop is a ``lax.while_loop`` that exits as soon as every live
  walker has accepted (immediately when p=q=1, since bias_max=1).  Walkers
  still unaccepted after ``max_rejection_trials`` rounds keep their last
  proposal (∝ weight) — probability ≤ (1 - α_min/α_max)^trials, negligible at
  the default 64 rounds.

Semantics parity (SURVEY.md §2.6):
* step 0 samples **first-order** (reference's negative-sentinel rule,
  ``randomwalk.py:320-321``);
* sink vertices end walks: the path is padded with -1 from the step where the
  walker died (the reference's inner join silently drops them mid-walk,
  ``fugue.py:147``; we keep the prefix, which is strictly more informative);
* walks can be restricted to seed start vertices (``fugue.py:132-134``).
"""

from __future__ import annotations

import contextlib
import functools
import logging
import math
import time
from typing import Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from node2vec_tpu.constants import Node2VecParams
from node2vec_tpu.graph.csr import DeviceGraph, Graph
from node2vec_tpu.ops.sampling import contains_in_segments


logger = logging.getLogger(__name__)


@contextlib.contextmanager
def _null_ctx():
    yield


def walk_chunk_impl(
    indptr: jax.Array,
    indices: jax.Array,
    weights: jax.Array,
    alias: jax.Array,
    prob: jax.Array,
    wtot: jax.Array,
    starts: jax.Array,
    gids: jax.Array,
    seed: jax.Array,
    *,
    walk_length: int,
    return_param: float,
    inout_param: float,
    max_trials: int,
    search_iters: int,
) -> jax.Array:
    """Run full walks for one chunk of walkers.

    Sampling is an exact mixture decomposition (the back-edge — the only
    1/p-class candidate — is a single atom whose mass ``w(cur,prev)/p`` is
    computed with ONE binary search per step, so rejection only has to cover
    the {1, 1/q} classes with bound max(1, 1/q) instead of
    max(1/p, 1, 1/q)):

      * branch A, prob ∝ w_back/p: next = prev, accepted unconditionally;
      * branch B, prob ∝ Wtot(cur)·max(1,1/q): propose ∝ weight from the
        alias table, reject prev outright, accept others with
        bias/max(1,1/q), retry the WHOLE mixture on failure.

    Accepted draws are exactly the node2vec distribution; expected trials are
    ~max(q, 1/q) worst case (vs p·q-dependent before).

    RNG: every uniform is derived from ``(seed, global walker id, per-walker
    attempt counter)`` via the counter hash (ops/hashrng.py) — the same
    contract as the dense/blocked engines, so walk content is bit-invariant
    to ``walker_chunk``, padding, and sharding layout (round-3 VERDICT weak
    item 2: the fallback previously folded jax.random keys per chunk).

    Args:
      indptr: [V+1] int32 CSR row pointers.
      indices: [E] int32 neighbor ids, sorted per row.
      weights: [E] float32 edge weights (CSR order).
      alias/prob: [E] first-order alias tables (segment-local slots).
      wtot: [V] float32 per-vertex total out-weight.
      starts: [W] int32 start vertices; negative entries are padding lanes.
      gids: [W] int32 global walker ids (RNG identity, layout-invariant).
      seed: uint32 scalar run seed.

    Returns: paths [W, walk_length+1] int32; -1 marks padding/dead tail.
    """
    from node2vec_tpu.ops.hashrng import hash_uniform
    from node2vec_tpu.ops.sampling import searchsorted_in_segments

    n_walkers = starts.shape[0]
    inv_p = 1.0 / return_param
    inv_q = 1.0 / inout_param
    alpha2_max = max(1.0, inv_q)
    alpha2_min = min(1.0, inv_q)
    uniform_bias = return_param == 1.0 and inout_param == 1.0
    # K proposals per rejection round, sized by the branch-B acceptance bound
    # (wider rounds waste work once a lane accepts; measured optimum ~ratio/2)
    k_prop_batch = int(min(8, max(1, round((alpha2_max / alpha2_min) / 2))))
    n_rounds = max(1, -(-max_trials // k_prop_batch))

    alive0 = starts >= 0
    paths0 = jnp.full((n_walkers, walk_length + 1), -1, dtype=jnp.int32)
    paths0 = paths0.at[:, 0].set(jnp.where(alive0, starts, -1))
    gid_col = gids.astype(jnp.uint32)[:, None]
    k_ctr = jnp.arange(k_prop_batch, dtype=jnp.uint32)[None, :]

    def one_step(t, carry):
        paths, cur, prev, alive, att = carry
        cur_safe = jnp.where(alive, cur, 0)
        seg_start = indptr[cur_safe]
        degree = indptr[cur_safe + 1] - seg_start
        alive = alive & (degree > 0)

        prev_safe = jnp.where(prev >= 0, prev, 0)
        prev_start = indptr[prev_safe]
        prev_degree = indptr[prev_safe + 1] - prev_start
        first_order = prev < 0  # step 0: no bias (reference sentinel rule)

        safe_deg = jnp.maximum(degree, 1)
        kb = k_prop_batch

        if uniform_bias:
            m1 = jnp.zeros((n_walkers,), jnp.float32)
            only_back = jnp.zeros((n_walkers,), bool)
        else:
            # branch-A mass: weight of the back-edge (cur -> prev), if any
            pos = searchsorted_in_segments(
                prev_safe, seg_start, degree, indices, n_iters=search_iters
            )
            pos_safe = jnp.clip(pos, 0, indices.shape[0] - 1)
            has_back = (
                (pos < seg_start + degree)
                & (indices[pos_safe] == prev_safe)
                & ~first_order
            )
            w_back = jnp.where(has_back, weights[pos_safe], 0.0)
            m1 = w_back * inv_p
            # degree-1 vertex whose sole neighbor is prev: the back edge is
            # the ONLY candidate — force the move instead of spinning the
            # rejection loop (branch B can never accept there; at extreme
            # p/q every round failed, ROADMAP round-2 item 4)
            only_back = has_back & (degree == 1)
        m2 = wtot[cur_safe] * alpha2_max
        p_branch1 = m1 / jnp.maximum(m1 + m2, 1e-30)

        def propose(r1, r2):
            """K alias draws per walker: slot + coin -> neighbor ids [W, K]."""
            deg_b = safe_deg[:, None]
            slot = jnp.minimum((r1 * deg_b).astype(jnp.int32), deg_b - 1)
            e = seg_start[:, None] + slot
            j = jnp.where(r2 < prob[e], slot, alias[e])
            return indices[seg_start[:, None] + j]

        def cond_fn(state):
            _, accepted, _, rounds = state
            return (rounds < n_rounds) & jnp.any(alive & ~accepted)

        def body_fn(state):
            cand, accepted, att, rounds = state
            # 4 counter slots per proposal: r1/r2 (alias draw), branch coin,
            # acceptance.  The counter advances per-walker only while that
            # walker is attempting, so draw sequences are lane-independent.
            ctr = (att[:, None] + k_ctr) * jnp.uint32(4)
            r1 = hash_uniform(seed, gid_col, ctr)
            r2 = hash_uniform(seed, gid_col, ctr + jnp.uint32(1))
            proposal = propose(r1, r2)  # [W, K]
            if uniform_bias:
                accept_now = jnp.ones((n_walkers, kb), dtype=bool)
            else:
                take_back = (
                    hash_uniform(seed, gid_col, ctr + jnp.uint32(2))
                    < p_branch1[:, None]
                )
                proposal = jnp.where(take_back, prev[:, None], proposal)
                is_return = proposal == prev[:, None]
                is_shared = contains_in_segments(
                    proposal.reshape(-1),
                    jnp.broadcast_to(prev_start[:, None], (n_walkers, kb)).reshape(-1),
                    jnp.broadcast_to(prev_degree[:, None], (n_walkers, kb)).reshape(-1),
                    indices,
                    n_iters=search_iters,
                ).reshape(n_walkers, kb)
                bias2 = jnp.where(is_shared, 1.0, inv_q)
                u = hash_uniform(seed, gid_col, ctr + jnp.uint32(3))
                # branch A accepts outright; branch B rejects prev, thins by bias2
                accept_now = jnp.where(
                    take_back,
                    True,
                    ~is_return & (u * alpha2_max <= bias2),
                )
                # step 0 is first-order: plain weight-proportional, accept all
                accept_now = jnp.where(first_order[:, None], True, accept_now)
            # first accepted proposal this round; else keep the last draw as
            # the bounded-trials fallback (distribution ∝ weight)
            first_idx = jnp.argmax(accept_now, axis=1)
            k_iota = jax.lax.broadcasted_iota(jnp.int32, (n_walkers, kb), 1)
            chosen = jnp.sum(
                jnp.where(k_iota == first_idx[:, None], proposal, 0), axis=1
            )  # one-hot select (take_along_axis lowers poorly on TPU)
            any_new = accept_now.any(axis=1)
            fallback = proposal[:, kb - 1]
            cand = jnp.where(accepted, cand, jnp.where(any_new, chosen, fallback))
            # counter advances by the round's K proposals, only for lanes
            # that attempted this round (entry-state accepted/alive)
            att = jnp.where(alive & ~accepted, att + jnp.uint32(kb), att)
            accepted = accepted | any_new
            return cand, accepted, att, rounds + 1

        init = (
            jnp.where(only_back, prev, 0).astype(jnp.int32),
            only_back,
            att,
            jnp.int32(0),
        )
        nxt, _, att, _ = jax.lax.while_loop(cond_fn, body_fn, init)

        paths = jax.lax.dynamic_update_index_in_dim(
            paths, jnp.where(alive, nxt, -1), t + 1, axis=1
        )
        prev = jnp.where(alive, cur, prev)
        cur = jnp.where(alive, nxt, cur)
        return paths, cur, prev, alive, att

    prev0 = jnp.full((n_walkers,), -1, dtype=jnp.int32)
    cur0 = jnp.where(alive0, starts, 0)
    att0 = jnp.zeros((n_walkers,), dtype=jnp.uint32)
    paths, _, _, _, _ = jax.lax.fori_loop(
        0, walk_length, one_step, (paths0, cur0, prev0, alive0, att0)
    )
    return paths


walk_chunk = jax.jit(
    walk_chunk_impl,
    static_argnames=(
        "walk_length",
        "return_param",
        "inout_param",
        "max_trials",
        "search_iters",
    ),
)


class WalkEngine:
    """Chunked walk driver: replicates each start vertex num_walks times and
    sweeps fixed-size walker chunks through the jit-compiled step program.

    Three jit-compiled strategies (selected by ``strategy="auto"``):

    * ``dense`` — padded-adjacency exact sampler (walk.dense); the fast path
      whenever max degree <= ``dense_max_degree``.
    * ``blocked`` — two-table blocked-CSR async engine (walk.blocked); the
      heavy-tail fast path, selected automatically above ``dense_max_degree``.
    * ``csr`` — alias-table rejection sampler over CSR (this module); kept as
      the reference-style fallback and for engine-matrix tests.
    """

    def __init__(
        self,
        graph: Union[Graph, DeviceGraph],
        params: Node2VecParams,
        strategy: str = "auto",
        dense_max_degree: int = 256,
        mesh=None,
        graph_sharded: bool = False,
        partitioned_graph=None,
        blocked_graph=None,
        shared_lists="auto",
    ):
        """``graph_sharded=True`` (requires ``mesh``): the adjacency itself is
        range-partitioned across the mesh's 'data' axis (each device holds
        only its vertex range) and supersteps exchange sampling requests via
        all-to-all — the layout for graphs beyond one device's HBM
        (parallel.edge_partitioned_blocked).  Without it the graph is
        replicated per device and only walkers are sharded.

        ``blocked_graph`` / ``partitioned_graph``: prebuilt device tables to
        reuse across engines over the same graph (host packing + upload of a
        multi-million-edge graph costs seconds; p/q/trial params live in the
        kernels, not the tables).

        ``shared_lists``: the blocked engine's exact 3-atom shared-list
        sampler (walk/blocked.py design note 6).  True builds the per-edge
        table and uses it; "auto" (default) only uses a PREBUILT table
        (``blocked_graph=``) and only when its overflow weight fraction is
        <= 0.15 — on heavy-tail graphs hub-hub edges overflow the lists and
        the extra slq gather is a measured net loss (0.92-0.94x,
        experiments/shared_list_bench.py), so auto never builds one.
        """
        self.params = params
        self.mesh = mesh  # optional jax Mesh: chunks run sharded over 'data'
        # the CSR DeviceGraph (indices/weights/alias/prob, ~16B/edge of HBM)
        # is only needed by the CSR fallback strategy — upload it LAZILY so
        # the dense/blocked/ep engines don't carry a dead multi-GB copy at
        # 100M+ edges (found by the north-star scale run, round 4)
        self._graph_host = graph if isinstance(graph, Graph) else None
        self._dgraph = None if isinstance(graph, Graph) else graph
        self.n_vertices = int(graph.n_vertices)
        host_indptr = (
            graph.indptr if isinstance(graph, Graph) else np.asarray(graph.indptr)
        )
        max_deg = int(np.max(np.diff(host_indptr))) if len(host_indptr) > 1 else 0
        self.max_degree = max_deg
        # binary-search depth: ceil(log2(max_degree)) + 1, min 1
        self.search_iters = max(1, math.ceil(math.log2(max_deg + 1)) + 1)
        if graph_sharded:
            if mesh is None:
                raise ValueError("graph_sharded=True requires a mesh")
            strategy = "ep_blocked"
        elif strategy == "auto":
            strategy = "dense" if max_deg <= dense_max_degree else "blocked"
        self.strategy = strategy
        self.packed_adj = None
        self.bgraph = None
        self.pgraph = None
        # blocked engines: trial-capped ∝w accepts / total sampling attempts.
        # Counter updates are collected as DEVICE scalars and only read back
        # when the property is accessed — an eager int() here would block the
        # host on every walk chunk and kill fit_streaming's walk/train
        # overlap (the kernel must finish before the next chunk dispatches).
        self._fb_base = 0
        self._att_base = 0
        self._fb_parts: list = []
        self._att_parts: list = []
        self.unfinished_count = 0  # ep_blocked: walkers stopped at the bound
        if isinstance(graph, Graph):
            indptr, indices, weights = graph.indptr, graph.indices, graph.weights
        else:
            indptr = np.asarray(graph.indptr)
            indices = np.asarray(graph.indices)
            weights = np.asarray(graph.weights)
        self._sl_policy = shared_lists
        from node2vec_tpu.utils.checkpoint import graph_digest

        # checkpoint fingerprints must change when the EDGES change, not
        # just the vertex count — computed here while host arrays are cheap
        self.graph_token = graph_digest(indices, weights)
        if strategy == "dense":
            from node2vec_tpu.walk.dense import build_padded_adjacency

            self.packed_adj = jnp.asarray(
                build_padded_adjacency(indptr, indices, weights)
            )
        elif strategy == "blocked":
            if blocked_graph is not None:
                self.bgraph = blocked_graph
            else:
                from node2vec_tpu.walk.blocked import build_blocked_graph

                self.bgraph = build_blocked_graph(
                    indptr, indices, weights,
                    shared_lists=shared_lists is True,
                )
        elif strategy == "ep_blocked":
            if partitioned_graph is not None:
                # pre-packed shards (load_partitioned_graph) — per-host
                # loading never rebuilds the full adjacency
                self.pgraph = partitioned_graph
            else:
                from node2vec_tpu.parallel.edge_partitioned_blocked import (
                    partition_blocked_graph,
                )

                self.pgraph = partition_blocked_graph(
                    indptr, indices, weights, mesh.shape["data"], mesh=mesh
                )

    @property
    def dgraph(self) -> DeviceGraph:
        """Device CSR (lazy upload — only the CSR strategy reads it)."""
        if self._dgraph is None:
            self._dgraph = self._graph_host.to_device()
        return self._dgraph

    @property
    def fallback_count(self) -> int:
        """Trial-capped ∝weight accepts (approximate-mode forced steps).
        Reading drains any pending device counters (may block)."""
        if self._fb_parts:
            self._fb_base += int(
                sum(int(np.asarray(x).sum()) for x in self._fb_parts)
            )
            self._fb_parts = []
        return self._fb_base

    @fallback_count.setter
    def fallback_count(self, value: int) -> None:
        self._fb_parts = []
        self._fb_base = int(value)

    @property
    def attempt_count(self) -> int:
        """Total sampling attempts (blocked engines). Reading drains any
        pending device counters (may block)."""
        if self._att_parts:
            self._att_base += int(
                sum(int(np.asarray(x).sum()) for x in self._att_parts)
            )
            self._att_parts = []
        return self._att_base

    @attempt_count.setter
    def attempt_count(self, value: int) -> None:
        self._att_parts = []
        self._att_base = int(value)

    def _sl_flags(self):
        """(shared_lists, sl_exhaustive) for the blocked kernel, applying
        the auto policy (see __init__ docstring)."""
        bg = self.bgraph
        if bg is None or bg.slq is None:
            return False, False
        pol = self._sl_policy
        on = pol if isinstance(pol, bool) else bg.sl_ovf_wfrac <= 0.15
        return on, on and bg.sl_exhaustive

    def _strategy_token(self) -> str:
        """Strategy string for walk fingerprints: folds in the APPLIED
        shared-list sampler flags (round-3 advisor finding — toggling
        shared_lists changes the bit-stream, so checkpoints must not be
        shared across the toggle).  Mirrors the kernel: with q == 1 the
        sampler is compiled out and walks are bit-identical either way."""
        tok = self.strategy
        if self.strategy == "blocked" and self.params.inout_param != 1.0:
            use_sl, sl_ex = self._sl_flags()
            if use_sl:
                tok += "+slx" if sl_ex else "+sl"
        return tok

    def _effective_chunk(self, n_total: int) -> int:
        chunk = min(self.params.walker_chunk, max(n_total, 1))
        if self.strategy == "dense":
            # bound the [W, P] working set: W * P <= 2^24 elements
            w_cap = max(1024, (1 << 25) // self.packed_adj.shape[1])
            chunk = min(chunk, w_cap)
        elif self.strategy == "blocked":
            # bound the carried per-walker state (row + prev_mem + path,
            # + the shared-list row and its 128-lane fetch when enabled)
            per_walker = 6 * self.bgraph.light_width + self.params.walk_length
            if self._sl_flags()[0]:
                per_walker += 144
            w_cap = max(1024, (1 << 26) // per_walker)
            chunk = min(chunk, w_cap)
        return chunk

    def _run_chunk(
        self, chunk_starts: np.ndarray, gid_base: int = 0, seed: int = 0
    ) -> jnp.ndarray:
        p = self.params
        if self.strategy == "ep_blocked":
            return self._run_chunk_ep(chunk_starts, gid_base, seed)
        if self.mesh is not None:
            return self._run_chunk_sharded(chunk_starts, gid_base, seed)
        if self.strategy == "dense":
            from node2vec_tpu.walk.dense import dense_walk_chunk

            gids = jnp.arange(gid_base, gid_base + len(chunk_starts), dtype=jnp.int32)
            return dense_walk_chunk(
                self.packed_adj,
                jnp.asarray(chunk_starts),
                gids,
                jnp.uint32(seed & 0xFFFFFFFF),
                walk_length=p.walk_length,
                return_param=float(p.return_param),
                inout_param=float(p.inout_param),
            )
        if self.strategy == "blocked":
            from node2vec_tpu.walk.blocked import blocked_walk_chunk, slq_or_dummy

            bg = self.bgraph
            use_sl, sl_ex = self._sl_flags()
            gids = jnp.arange(gid_base, gid_base + len(chunk_starts), dtype=jnp.int32)
            paths, n_fb, n_att = blocked_walk_chunk(
                bg.light,
                bg.biw,
                bg.bids,
                bg.brp,
                slq_or_dummy(bg),
                jnp.asarray(chunk_starts),
                gids,
                jnp.uint32(seed & 0xFFFFFFFF),
                walk_length=p.walk_length,
                return_param=float(p.return_param),
                inout_param=float(p.inout_param),
                max_trials=p.max_rejection_trials,
                light_width=bg.light_width,
                block_width=bg.block_width,
                has_heavy=bg.has_heavy,
                shared_lists=use_sl,
                sl_exhaustive=sl_ex,
            )
            self._fb_parts.append(n_fb)  # device scalars; drained lazily
            self._att_parts.append(n_att)
            return paths
        g = self.dgraph
        gids = jnp.arange(gid_base, gid_base + len(chunk_starts), dtype=jnp.int32)
        return walk_chunk(
            g.indptr,
            g.indices,
            g.weights,
            g.alias,
            g.prob,
            g.wtot,
            jnp.asarray(chunk_starts),
            gids,
            jnp.uint32(seed & 0xFFFFFFFF),
            walk_length=p.walk_length,
            return_param=float(p.return_param),
            inout_param=float(p.inout_param),
            max_trials=p.max_rejection_trials,
            search_iters=self.search_iters,
        )

    def _run_chunk_ep(
        self, chunk_starts: np.ndarray, gid_base: int, seed: int
    ) -> jnp.ndarray:
        """Graph-sharded chunk: adjacency partitioned, frontier all-to-all."""
        from node2vec_tpu.parallel.edge_partitioned_blocked import (
            edge_partitioned_blocked_walk,
        )

        p = self.params
        n_data = self.mesh.shape["data"]
        n = len(chunk_starts)
        if n % n_data:
            pad = n_data - n % n_data
            chunk_starts = np.concatenate(
                [chunk_starts, np.full(pad, -1, np.int32)]
            )
        gids = jnp.arange(
            gid_base, gid_base + len(chunk_starts), dtype=jnp.int32
        )
        paths, unfinished, n_fb = edge_partitioned_blocked_walk(
            self.mesh,
            self.pgraph,
            jnp.asarray(chunk_starts),
            gids,
            jnp.uint32(seed & 0xFFFFFFFF),
            walk_length=p.walk_length,
            return_param=float(p.return_param),
            inout_param=float(p.inout_param),
            max_trials=p.max_rejection_trials,
        )
        unfin = int(np.asarray(unfinished).sum())
        self.unfinished_count += unfin
        self._fb_parts.append(n_fb)
        if unfin:
            logger.warning(
                "edge-partitioned walk: %d walkers unfinished at the "
                "superstep bound (paths truncated but contiguous); raise "
                "capacity or slack", unfin,
            )
        return paths[:n]

    def _run_chunk_sharded(
        self, chunk_starts: np.ndarray, gid_base: int = 0, seed: int = 0
    ) -> jnp.ndarray:
        """Chunk sharded over the mesh's 'data' axis (graph replicated)."""
        from node2vec_tpu.parallel.sharded_walk import (
            sharded_blocked_walk_chunk,
            sharded_dense_walk_chunk,
            sharded_walk_chunk,
        )

        p = self.params
        n_data = self.mesh.shape["data"]
        n = len(chunk_starts)
        if n % n_data:  # pad dead lanes so the shard split is even
            pad = n_data - n % n_data
            chunk_starts = np.concatenate(
                [chunk_starts, np.full(pad, -1, np.int32)]
            )
        starts = jnp.asarray(chunk_starts)
        if self.strategy == "dense":
            gids = jnp.arange(
                gid_base, gid_base + len(chunk_starts), dtype=jnp.int32
            )
            out = sharded_dense_walk_chunk(
                self.mesh,
                self.packed_adj,
                starts,
                gids,
                jnp.uint32(seed & 0xFFFFFFFF),
                walk_length=p.walk_length,
                return_param=float(p.return_param),
                inout_param=float(p.inout_param),
            )
        elif self.strategy == "blocked":
            from node2vec_tpu.walk.blocked import slq_or_dummy

            bg = self.bgraph
            use_sl, sl_ex = self._sl_flags()
            gids = jnp.arange(
                gid_base, gid_base + len(chunk_starts), dtype=jnp.int32
            )
            out, n_fb, n_att = sharded_blocked_walk_chunk(
                self.mesh,
                bg.light,
                bg.biw,
                bg.bids,
                bg.brp,
                slq_or_dummy(bg),
                starts,
                gids,
                jnp.uint32(seed & 0xFFFFFFFF),
                walk_length=p.walk_length,
                return_param=float(p.return_param),
                inout_param=float(p.inout_param),
                max_trials=p.max_rejection_trials,
                light_width=bg.light_width,
                block_width=bg.block_width,
                has_heavy=bg.has_heavy,
                shared_lists=use_sl,
                sl_exhaustive=sl_ex,
            )
            self._fb_parts.append(n_fb)  # device arrays; drained lazily
            self._att_parts.append(n_att)
        else:
            g = self.dgraph
            gids = jnp.arange(
                gid_base, gid_base + len(chunk_starts), dtype=jnp.int32
            )
            out = sharded_walk_chunk(
                self.mesh,
                g.indptr,
                g.indices,
                g.weights,
                g.alias,
                g.prob,
                g.wtot,
                starts,
                gids,
                jnp.uint32(seed & 0xFFFFFFFF),
                walk_length=p.walk_length,
                return_param=float(p.return_param),
                inout_param=float(p.inout_param),
                max_trials=p.max_rejection_trials,
                search_iters=self.search_iters,
            )
        return out[:n]

    def run(
        self,
        seed: int = 0,
        start_vertices: Optional[np.ndarray] = None,
        checkpoint_dir: Optional[str] = None,
        timer=None,
        readback_threads: int = 16,
    ) -> np.ndarray:
        """All walks as a host array [num_starts * num_walks, walk_length+1].

        Row layout: walk copy ``i`` of start vertex ``v`` is row
        ``i * num_starts + v``.  ALL engines (dense, blocked, CSR fallback,
        edge-partitioned) key every draw on (seed, GLOBAL walker id,
        counter), so results are bit-deterministic under (seed, params)
        INCLUDING ``walker_chunk`` and sharding layout.  With
        ``checkpoint_dir``, completed chunks are
        persisted and a restarted run with the same configuration skips them
        (the reference's every-10-steps lineage checkpoint analogue,
        spark.py:597-598); a changed configuration is detected by fingerprint
        and ignores stale chunks.

        Device->host readback is PIPELINED: chunk k+1's walk kernel is
        dispatched before chunk k's rows are fetched, and each fetch is
        striped over ``readback_threads`` concurrent streams — the
        attached-TPU tunnel's d2h path is per-stream throttled (~10 MB/s a
        stream, aggregates roughly linearly; measured round 5), so at
        north-star corpus sizes the readback hides behind the walk compute
        instead of serializing after it.
        """
        from concurrent.futures import ThreadPoolExecutor

        from node2vec_tpu.utils.checkpoint import (
            load_walk_chunks,
            save_walk_chunk,
            walk_fingerprint,
        )

        p = self.params
        if start_vertices is None:
            starts_one = np.arange(self.n_vertices, dtype=np.int32)
        else:
            starts_one = np.asarray(start_vertices, dtype=np.int32)
        starts = np.tile(starts_one, p.num_walks)
        n_total = len(starts)
        chunk = self._effective_chunk(n_total)

        fp = walk_fingerprint(
            p, seed, starts_one, self.n_vertices,
            graph_token=self.graph_token, strategy=self._strategy_token(),
        )
        done = load_walk_chunks(checkpoint_dir, fingerprint=fp)
        out = np.empty((n_total, p.walk_length + 1), dtype=np.int32)
        pool = (
            ThreadPoolExecutor(readback_threads)
            if readback_threads > 1
            else None
        )

        def fetch_rows(paths, n_rows: int, dst: np.ndarray) -> None:
            if pool is None or n_rows < 4 * readback_threads:
                dst[:n_rows] = np.asarray(paths)[:n_rows]
                return
            band = -(-n_rows // readback_threads)

            def one(t):
                a, b = t * band, min((t + 1) * band, n_rows)
                if a < b:
                    dst[a:b] = np.asarray(paths[a:b])

            list(pool.map(one, range(readback_threads)))

        pending = None  # (device paths, lo, hi, c_idx, dispatch time)

        def drain() -> None:
            nonlocal pending
            if pending is None:
                return
            paths, lo, hi, c_idx, t0 = pending
            pending = None
            fetch_rows(paths, hi - lo, out[lo:hi])
            dt = time.perf_counter() - t0
            steps = int((out[lo:hi] >= 0).sum()) - (hi - lo)
            logger.info(
                "walk chunk %d [%d:%d] strategy=%s %.2fs (%.0f steps/s, "
                "incl. pipelined readback)",
                c_idx, lo, hi, self.strategy, dt, steps / dt if dt > 0 else 0,
            )
            if checkpoint_dir:
                save_walk_chunk(checkpoint_dir, c_idx, out[lo:hi], fingerprint=fp)

        try:
            for c_idx, lo in enumerate(range(0, n_total, chunk)):
                hi = min(lo + chunk, n_total)
                if c_idx in done and done[c_idx].shape == (hi - lo, p.walk_length + 1):
                    drain()
                    out[lo:hi] = done[c_idx]
                    continue
                chunk_starts = np.full(chunk, -1, dtype=np.int32)
                chunk_starts[: hi - lo] = starts[lo:hi]
                ctx = timer.measure("walk_chunk") if timer is not None else _null_ctx()
                t0 = time.perf_counter()
                with ctx:
                    paths = self._run_chunk(chunk_starts, gid_base=lo, seed=seed)
                    drain()  # fetch the PREVIOUS chunk while this one computes
                pending = (paths, lo, hi, c_idx, t0)
            drain()
        finally:
            if pool is not None:
                pool.shutdown(wait=True)
        return out


    def chunk_source(
        self,
        seed: int = 0,
        start_vertices: Optional[np.ndarray] = None,
    ):
        """Virtual-corpus interface: (n_chunks, chunk_size, source) where
        ``source(i)`` regenerates walk chunk i ON DEVICE, deterministically.

        Because chunks are pure functions of (seed, chunk index), a corpus of
        any size can stream through fixed device memory — the walks are
        "stored" as a seed.  Used by Word2VecTPU.fit_streaming for
        producer/consumer pipelining (walk chunk k+1 dispatches while chunk k
        trains) and for corpora larger than HBM.
        """
        p = self.params
        if start_vertices is None:
            starts_one = np.arange(self.n_vertices, dtype=np.int32)
        else:
            starts_one = np.asarray(start_vertices, dtype=np.int32)
        starts = np.tile(starts_one, p.num_walks)
        n_total = len(starts)
        chunk = self._effective_chunk(n_total)
        n_chunks = -(-n_total // chunk)

        def source(c_idx: int) -> jnp.ndarray:
            lo = c_idx * chunk
            hi = min(lo + chunk, n_total)
            chunk_starts = np.full(chunk, -1, dtype=np.int32)
            chunk_starts[: hi - lo] = starts[lo:hi]
            return self._run_chunk(chunk_starts, gid_base=lo, seed=seed)

        return n_chunks, chunk, source

    def run_device(
        self,
        seed: int = 0,
        start_vertices: Optional[np.ndarray] = None,
    ) -> jnp.ndarray:
        """Like run(), but the walk corpus STAYS on device (jnp array) —
        feed it straight into Word2VecTPU.fit for a host-free pipeline."""
        p = self.params
        if start_vertices is None:
            starts_one = np.arange(self.n_vertices, dtype=np.int32)
        else:
            starts_one = np.asarray(start_vertices, dtype=np.int32)
        starts = np.tile(starts_one, p.num_walks)
        n_total = len(starts)
        chunk = self._effective_chunk(n_total)

        parts = []
        for c_idx, lo in enumerate(range(0, n_total, chunk)):
            hi = min(lo + chunk, n_total)
            chunk_starts = np.full(chunk, -1, dtype=np.int32)
            chunk_starts[: hi - lo] = starts[lo:hi]
            parts.append(
                self._run_chunk(chunk_starts, gid_base=lo, seed=seed)[: hi - lo]
            )
            if (c_idx + 1) % 4 == 0:
                # bound async enqueue depth: every pending chunk's walk
                # working set is resident until it executes — at north-star
                # scale (dozens of chunks on a chip already holding the
                # graph tables) an unbounded queue OOMs (same class as the
                # _streaming_counts fix in models/word2vec.py)
                jax.block_until_ready(parts[-1])
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)


def random_walks(
    graph: Union[Graph, DeviceGraph],
    params: Optional[Node2VecParams] = None,
    seed: int = 0,
    start_vertices: Optional[np.ndarray] = None,
    checkpoint_dir: Optional[str] = None,
) -> np.ndarray:
    """Functional form mirroring reference ``fugue.py:81-155`` ``random_walk``."""
    return WalkEngine(graph, params or Node2VecParams()).run(
        seed, start_vertices, checkpoint_dir
    )
