"""Edge-partitioned multi-device walks: frontier exchange via all-to-all.

This is the scale-out layout for graphs that exceed one device's HBM — the
direct TPU replacement for the reference's per-step shuffle joins
(``/root/reference/node2vec/spark.py:589-590``, ``fugue.py:147``; SURVEY.md
§2.3 calls this "the single most important architectural replacement").

Layout:
  * the vertex space is range-partitioned: shard ``s`` of ``S`` owns vertices
    ``[s*ceil(V/S), (s+1)*ceil(V/S))`` and holds ONLY their packed adjacency
    rows (``[V/S, 2P]`` per device — the graph is sharded, not replicated);
  * walkers are sharded by walker id and their state (paths, cur, prev, and
    the previous frontier row) stays on their home shard.

One superstep is a request/response round instead of Spark's two shuffles:

  1. each walker's home emits a sampling request ``(cur, prev, u, N(prev))``
     bucketed by owner(cur); requests cross the mesh in ONE
     ``jax.lax.all_to_all`` (fixed per-destination capacity);
  2. the owner gathers the frontier row from its local partition, applies the
     node2vec p/q bias against the carried ``N(prev)``, and draws the next
     hop with the walker's uniform (exact inverse-CDF — deterministic given
     the walker's key, regardless of which shard computes it);
  3. responses ``(next, N(cur))`` return by a second all-to-all; the carried
     row becomes the walker's ``N(prev)`` for the next step, so membership
     never needs a remote lookup.

Capacity: each shard can send up to ``capacity`` requests to each owner per
superstep. Walkers that exceed a destination's capacity are deferred — each
walker advances by its own step CURSOR, so a deferred walker simply retries
on the next superstep and its path stays contiguous (the walk distribution
is unaffected; only scheduling shifts). The superstep loop runs until every
walker finishes or a 4x slack bound is hit. With
``capacity = walkers_per_shard`` nothing ever defers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from node2vec_tpu.ops.sampling import prefix_sums
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from node2vec_tpu.walk.dense import PAD_ID


def partition_packed_adjacency(
    packed_adj: np.ndarray, n_shards: int
) -> Tuple[np.ndarray, int]:
    """Pad the [V, 2P] packed adjacency to a multiple of n_shards rows.

    Returns (padded [S*Vp, 2P] array to feed with sharding P('data', None),
    rows_per_shard). Row r of shard s is vertex ``s*Vp + r``.
    """
    n_vertices, width = packed_adj.shape
    rows_per_shard = -(-n_vertices // n_shards)
    padded = np.full((n_shards * rows_per_shard, width), PAD_ID, packed_adj.dtype)
    padded[:, width // 2 :] = np.float32(0.0).view(np.int32)
    padded[:n_vertices] = packed_adj
    return padded, rows_per_shard


@functools.lru_cache(maxsize=8)
def _build_edge_partitioned_walk(
    mesh: Mesh,
    walk_length: int,
    return_param: float,
    inout_param: float,
    p_cols: int,
    rows_per_shard: int,
    capacity: int,
    axis_name: str,
):
    n_shards = mesh.shape[axis_name]
    inv_p = jnp.float32(1.0 / return_param)
    inv_q = jnp.float32(1.0 / inout_param)
    # request fields: cur | prev | u(bitcast) | prev_row[P]
    req_width = 3 + p_cols
    # response fields: nxt | row[P]
    resp_width = 1 + p_cols

    def owner_of(v):
        return jnp.clip(v // rows_per_shard, 0, n_shards - 1)

    def shard_fn(local_adj, starts_shard, key):
        n_local = starts_shard.shape[0]
        my_shard = jax.lax.axis_index(axis_name)

        alive0 = starts_shard >= 0
        paths0 = jnp.full((n_local, walk_length + 1), -1, jnp.int32)
        paths0 = paths0.at[:, 0].set(jnp.where(alive0, starts_shard, -1))
        prev_rows0 = jnp.full((n_local, p_cols), PAD_ID, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (n_shards * capacity, p_cols), 1)
        walker_ids = jnp.arange(n_local)

        def one_step(carry):
            paths, cur, prev, prev_rows, alive, cursor, key, t = carry
            key, k_u = jax.random.split(key)
            u = jax.random.uniform(k_u, (n_local,))

            # walkers whose path is complete stop requesting
            active = alive & (cursor < walk_length)

            # ---- build requests bucketed by owner(cur) ---- #
            dest = jnp.where(active, owner_of(jnp.maximum(cur, 0)), 0)
            onehot = (
                dest[:, None] == jnp.arange(n_shards)[None, :]
            ) & active[:, None]
            slot_in_dest = jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1
            my_slot = jnp.sum(jnp.where(onehot, slot_in_dest, 0), axis=1)
            sendable = active & (my_slot < capacity)
            flat_slot = jnp.where(
                sendable, dest * capacity + my_slot, n_shards * capacity
            )

            req = jnp.concatenate(
                [
                    cur[:, None],
                    prev[:, None],
                    jax.lax.bitcast_convert_type(u, jnp.int32)[:, None],
                    prev_rows,
                ],
                axis=1,
            )  # [n_local, req_width]
            send = jnp.full(
                (n_shards * capacity + 1, req_width), -1, jnp.int32
            ).at[flat_slot].set(jnp.where(sendable[:, None], req, -1))[:-1]
            send = send.reshape(n_shards, capacity, req_width)

            # ---- exchange: requests go to the owners ---- #
            recv = jax.lax.all_to_all(
                send, axis_name, split_axis=0, concat_axis=0, tiled=False
            ).reshape(n_shards * capacity, req_width)

            # ---- serve requests against the LOCAL partition ---- #
            r_cur = recv[:, 0]
            r_valid = r_cur >= 0
            r_prev = recv[:, 1]
            r_u = jax.lax.bitcast_convert_type(recv[:, 2], jnp.float32)
            r_prev_row = recv[:, 3:]
            local_row = jnp.where(r_valid, r_cur - my_shard * rows_per_shard, 0)
            local_row = jnp.clip(local_row, 0, rows_per_shard - 1)
            packed = local_adj[local_row]  # [S*cap, 2P] local gather
            rows = packed[:, :p_cols]
            wts = jax.lax.bitcast_convert_type(packed[:, p_cols:], jnp.float32)

            from node2vec_tpu.walk.dense import shared_neighbor_mask

            first_order = r_prev < 0
            back = rows == r_prev[:, None]
            shared = shared_neighbor_mask(rows, r_prev_row)
            bias = jnp.where(back, inv_p, jnp.where(shared, 1.0, inv_q))
            bias = jnp.where(first_order[:, None], 1.0, bias)
            bw = wts * bias
            total = jnp.sum(bw, axis=1)
            cdf = prefix_sums(bw)
            # clamp to degree-1 (see walk/dense.py): ulp gaps between the
            # matmul prefix sums and the separate total reduction can land
            # r_u*total above cdf[degree-1], selecting a PAD_ID lane — which
            # would even pass the nxt >= 0 liveness test below
            degree = jnp.sum((rows != PAD_ID).astype(jnp.int32), axis=1)
            pick = jnp.minimum(
                jnp.sum((cdf < (r_u * total)[:, None]).astype(jnp.int32), axis=1),
                jnp.maximum(degree - 1, 0),
            )
            nxt = jnp.sum(jnp.where(lane == pick[:, None], rows, 0), axis=1)
            nxt = jnp.where(r_valid & (total > 0), nxt, -1)

            resp = jnp.concatenate([nxt[:, None], rows], axis=1)
            resp = resp.reshape(n_shards, capacity, resp_width)

            # ---- responses return to the walkers' homes ---- #
            back_recv = jax.lax.all_to_all(
                resp, axis_name, split_axis=0, concat_axis=0, tiled=False
            ).reshape(n_shards * capacity, resp_width)

            # ---- walkers read their slot ---- #
            got = back_recv[jnp.clip(flat_slot, 0, n_shards * capacity - 1)]
            nxt_w = jnp.where(sendable, got[:, 0], cur)  # deferred: retry later
            new_row = got[:, 1:]

            stepped = sendable & (nxt_w >= 0)
            died = sendable & (got[:, 0] < 0)
            alive = alive & ~died
            # per-walker cursor: deferred walkers keep a contiguous path.
            # Non-stepped lanes write out of bounds and are dropped.
            write_col = jnp.where(stepped, cursor + 1, walk_length + 64)
            paths = paths.at[walker_ids, write_col].set(nxt_w, mode="drop")
            cursor = jnp.where(stepped, cursor + 1, cursor)
            prev = jnp.where(stepped, cur, prev)
            cur = jnp.where(stepped, nxt_w, cur)
            prev_rows = jnp.where(stepped[:, None], new_row, prev_rows)
            return paths, cur, prev, prev_rows, alive, cursor, key, t + 1

        def cond(carry):
            paths, cur, prev, prev_rows, alive, cursor, key, t = carry
            # GLOBAL condition (psum over the axis): every shard must agree on
            # the superstep count or the all_to_alls in the body desynchronize
            pending = jax.lax.psum(
                jnp.sum((alive & (cursor < walk_length)).astype(jnp.int32)),
                axis_name,
            )
            # 4x slack over the no-deferral superstep count
            return (t < 4 * walk_length + 4) & (pending > 0)

        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        cur0 = jnp.where(alive0, starts_shard, 0)
        prev0 = jnp.full((n_local,), -1, jnp.int32)
        cursor0 = jnp.zeros((n_local,), jnp.int32)
        paths, *_ = jax.lax.while_loop(
            cond,
            one_step,
            (paths0, cur0, prev0, prev_rows0, alive0, cursor0, key, jnp.int32(0)),
        )
        return paths

    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name), P()),
        out_specs=P(axis_name, None),
        check_vma=False,
    )
    return jax.jit(mapped)


def edge_partitioned_walk(
    mesh: Mesh,
    partitioned_adj: jax.Array,  # [S*rows_per_shard, 2P], sharded P(axis, None)
    rows_per_shard: int,
    starts: jax.Array,  # [W] int32, sharded over axis_name
    key: jax.Array,
    *,
    walk_length: int,
    return_param: float,
    inout_param: float,
    capacity: int = 0,
    axis_name: str = "data",
) -> jax.Array:
    """Walks over a graph whose adjacency is RANGE-SHARDED across the mesh.

    ``capacity`` is the per-(shard, owner) request budget per step; 0 means
    walkers_per_shard (never defers).
    """
    n_shards = mesh.shape[axis_name]
    n_walkers = starts.shape[0]
    if n_walkers % n_shards:
        raise ValueError(f"{n_walkers} walkers not divisible by {n_shards} shards")
    if capacity <= 0:
        capacity = n_walkers // n_shards
    p_cols = partitioned_adj.shape[1] // 2
    fn = _build_edge_partitioned_walk(
        mesh,
        walk_length,
        float(return_param),
        float(inout_param),
        p_cols,
        rows_per_shard,
        capacity,
        axis_name,
    )
    return fn(partitioned_adj, starts, key)
