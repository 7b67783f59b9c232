"""Edge-partitioned BLOCKED walks: the production graph-sharded path.

Round 1's edge-partitioned engine (edge_partitioned.py) shards a pow2-padded
dense adjacency — unusable for the heavy-tail graphs that need sharding most
(VERDICT round 1, missing item 4).  This module shards the blocked v2 layout
(walk/blocked.py) instead: shard ``s`` owns vertex range
``[s·Vp, (s+1)·Vp)`` as its own light table + heavy block tables, so
per-device adjacency memory is O(E/S + V/S·4P) regardless of skew.

The key simplification vs the dense edge-partitioned design: with
vertex-range ownership, OWNERS HOLD EVERYTHING a step needs —
owner(cur) serves the prev-excluded hierarchical-CDF proposal, owner(prev)
serves the shared-neighbor membership test against its local tables.
Walkers carry only scalars (cur, prev, arrival-edge metadata, counters).
One superstep is two fixed-capacity request/response rounds (4
``lax.all_to_all`` ops), replacing the reference's two Spark shuffles per
step (``spark.py:589-590``; SURVEY.md §2.3).

Determinism: draws are keyed on (seed, walker gid, attempt#) exactly like the
single-device blocked engine, and a deferred attempt (capacity overflow)
consumes nothing — it replays with the same counter next superstep and the
owner recomputes the identical proposal.  Edge-partitioned walks therefore
BIT-MATCH the single-device engine (tested), the strongest possible
correctness statement for the comm layer.

Honesty: the superstep loop is bounded; walkers still unfinished at the bound
are REPORTED (per-shard unfinished counts in the return), never silently
truncated.  Trial-capped ∝weight fallbacks are counted the same way.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from node2vec_tpu.ops.hashrng import hash_uniform
from node2vec_tpu.ops.sampling import prefix_sums
from node2vec_tpu.walk.blocked import (
    MAG,
    PAD_ID,
    QUADS_PER_ROW,
    _check_capacity,
    _edge_metadata,
    _max_blocks,
    _pack_range,
)


class PartitionedBlockedGraph(NamedTuple):
    """Per-shard blocked tables, stacked shard-major for P(axis, None)."""

    light: jnp.ndarray  # [S*Vp, 4P]
    biw: jnp.ndarray  # [S*NBp, 2C]
    bids: jnp.ndarray  # [S*NBp, C]
    brp: jnp.ndarray  # [S*NBp*C/64, 128]
    rows_per_shard: int  # Vp
    blocks_per_shard: int  # NBp
    light_width: int
    block_width: int
    n_vertices: int


def partition_blocked_graph(
    indptr: np.ndarray,
    indices: np.ndarray,
    weights: np.ndarray,
    n_shards: int,
    light_width: int | None = None,
    block_width: int | None = None,
    mesh: Mesh | None = None,
    axis_name: str = "data",
    ranged_metadata: bool = False,
) -> PartitionedBlockedGraph:
    """Range-partition a CSR graph into per-shard blocked tables.

    Per-edge reverse metadata is computed globally (reverse edges cross
    shards), then each vertex range is packed independently and padded to
    common shapes.  With ``mesh`` given, arrays are device_put sharded
    ``P(axis_name, None)`` so each device holds ONLY its shard.

    ``ranged_metadata=True`` uses the range-exchange metadata pass
    (``walk.blocked._edge_metadata_ranged``) — one vertex range's working
    set at a time, and since the membership-exchange round its triangle
    bits are EXACT too, so walks bit-match the global pass.
    """
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int32)
    weights = np.asarray(weights, dtype=np.float32)
    n_v = len(indptr) - 1
    deg = np.diff(indptr)
    max_deg = int(deg.max()) if n_v else 0
    p_l = 31 if light_width is None else light_width
    maxb = _max_blocks(p_l)
    if block_width is None:
        need = -(-max_deg // maxb) if (deg > p_l).any() else 1
        block_width = max(256, 1 << int(np.ceil(np.log2(max(need, 1)))))
    c = block_width
    _check_capacity(max_deg, p_l, c)

    if ranged_metadata:
        from node2vec_tpu.walk.blocked import _edge_metadata_ranged

        rev_enc, pfx = _edge_metadata_ranged(indptr, indices, weights, n_shards)
    else:
        rev_enc, pfx = _edge_metadata(indptr, indices, weights)
    v_p = -(-n_v // n_shards)
    # pad the CSR with isolated vertices so every shard covers a full range
    if n_shards * v_p > n_v:
        indptr = np.concatenate(
            [indptr, np.full(n_shards * v_p - n_v, indptr[-1], np.int64)]
        )

    parts = [
        _pack_range(
            indptr, indices, weights, rev_enc, pfx,
            s * v_p, (s + 1) * v_p, p_l, c,
        )
        for s in range(n_shards)
    ]
    nb_p = max(p[1].shape[0] for p in parts)
    zero_bits = np.float32(0.0).view(np.int32)
    light = np.concatenate([p[0] for p in parts])
    biw = np.full((n_shards * nb_p, 2 * c), PAD_ID, np.int32)
    biw[:, c:] = zero_bits
    bids = np.full((n_shards * nb_p, c), PAD_ID, np.int32)
    brp = np.zeros((n_shards * nb_p * c // QUADS_PER_ROW, 128), np.int32)
    qrows_p = nb_p * c // QUADS_PER_ROW
    for s, (_, b_iw, b_ids, b_rp) in enumerate(parts):
        biw[s * nb_p : s * nb_p + b_iw.shape[0]] = b_iw
        bids[s * nb_p : s * nb_p + b_ids.shape[0]] = b_ids
        brp[s * qrows_p : s * qrows_p + b_rp.shape[0]] = b_rp

    out = PartitionedBlockedGraph(
        light=jnp.asarray(light),
        biw=jnp.asarray(biw),
        bids=jnp.asarray(bids),
        brp=jnp.asarray(brp),
        rows_per_shard=v_p,
        blocks_per_shard=nb_p,
        light_width=p_l,
        block_width=c,
        n_vertices=n_v,
    )
    if mesh is not None:
        sh = NamedSharding(mesh, P(axis_name, None))
        out = out._replace(
            light=jax.device_put(out.light, sh),
            biw=jax.device_put(out.biw, sh),
            bids=jax.device_put(out.bids, sh),
            brp=jax.device_put(out.brp, sh),
        )
    return out


def save_partitioned_graph(
    path: str,
    indptr: np.ndarray,
    indices: np.ndarray,
    weights: np.ndarray,
    n_shards: int,
    light_width: int | None = None,
    block_width: int | None = None,
    ranged_metadata: bool = False,
) -> None:
    """Pack per-range blocked shards to disk (one .npz per shard + meta.json).

    This runs once at preprocessing time (like the reference's index-stage
    parquet handoff, ``examples/native_spark.py:39-48``); afterwards each
    host of a multi-host run calls ``load_partitioned_graph(path,
    shards=<its ranges>)`` and holds only O(E/S) — no host ever rebuilds the
    full graph (round-1 VERDICT missing item 5).

    ``ranged_metadata=True`` computes the per-edge reverse metadata with the
    range-exchange algorithm (``walk.blocked._edge_metadata_ranged``) — the
    distributed-pack path whose working set is one vertex range at a time.
    Since the membership-exchange round, its triangle bits are EXACT, so the
    resulting pack walks bit-for-bit like the global-metadata pack.
    """
    import json
    import os

    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int32)
    weights = np.asarray(weights, dtype=np.float32)
    n_v = len(indptr) - 1
    deg = np.diff(indptr)
    max_deg = int(deg.max()) if n_v else 0
    p_l = 31 if light_width is None else light_width
    maxb = _max_blocks(p_l)
    if block_width is None:
        need = -(-max_deg // maxb) if (deg > p_l).any() else 1
        block_width = max(256, 1 << int(np.ceil(np.log2(max(need, 1)))))
    c = block_width
    _check_capacity(max_deg, p_l, c)

    if ranged_metadata:
        from node2vec_tpu.walk.blocked import _edge_metadata_ranged

        rev_enc, pfx = _edge_metadata_ranged(indptr, indices, weights, n_shards)
    else:
        rev_enc, pfx = _edge_metadata(indptr, indices, weights)
    v_p = -(-n_v // n_shards)
    if n_shards * v_p > n_v:
        indptr = np.concatenate(
            [indptr, np.full(n_shards * v_p - n_v, indptr[-1], np.int64)]
        )
        deg = np.diff(indptr)
    # common blocks-per-shard, computed analytically before packing
    heavy_blocks = np.where(deg > p_l, -(-deg // c), 0)
    nb_p = max(
        int(max(heavy_blocks[s * v_p : (s + 1) * v_p].sum() for s in range(n_shards))),
        1,
    )

    os.makedirs(path, exist_ok=True)
    zero_bits = np.float32(0.0).view(np.int32)
    for s in range(n_shards):
        light, b_iw, b_ids, b_rp = _pack_range(
            indptr, indices, weights, rev_enc, pfx,
            s * v_p, (s + 1) * v_p, p_l, c,
        )
        biw = np.full((nb_p, 2 * c), PAD_ID, np.int32)
        biw[:, c:] = zero_bits
        biw[: b_iw.shape[0]] = b_iw
        bids = np.full((nb_p, c), PAD_ID, np.int32)
        bids[: b_ids.shape[0]] = b_ids
        brp = np.zeros((nb_p * c // QUADS_PER_ROW, 128), np.int32)
        brp[: b_rp.shape[0]] = b_rp
        np.savez_compressed(
            os.path.join(path, f"shard_{s:05d}.npz"),
            light=light, biw=biw, bids=bids, brp=brp,
        )
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "n_vertices": n_v, "n_shards": n_shards,
                "rows_per_shard": v_p, "blocks_per_shard": nb_p,
                "light_width": p_l, "block_width": c,
            },
            f,
        )


def load_partitioned_graph(
    path: str,
    mesh: Mesh | None = None,
    shards=None,
    axis_name: str = "data",
) -> PartitionedBlockedGraph:
    """Load packed shards from ``save_partitioned_graph`` output.

    ``shards`` restricts which shard files are read (default: all) — a
    multi-host process passes the ranges owned by its local devices and never
    touches the rest; memory is O(E/S) per shard loaded.  With ``mesh``, the
    stacked tables are device_put sharded ``P(axis_name, None)``.
    """
    import json
    import os

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    n_shards = meta["n_shards"]
    if shards is None:
        shards = range(n_shards)
    loads = [
        np.load(os.path.join(path, f"shard_{s:05d}.npz")) for s in shards
    ]
    out = PartitionedBlockedGraph(
        light=jnp.asarray(np.concatenate([d["light"] for d in loads])),
        biw=jnp.asarray(np.concatenate([d["biw"] for d in loads])),
        bids=jnp.asarray(np.concatenate([d["bids"] for d in loads])),
        brp=jnp.asarray(np.concatenate([d["brp"] for d in loads])),
        rows_per_shard=meta["rows_per_shard"],
        blocks_per_shard=meta["blocks_per_shard"],
        light_width=meta["light_width"],
        block_width=meta["block_width"],
        n_vertices=meta["n_vertices"],
    )
    if mesh is not None:
        sh = NamedSharding(mesh, P(axis_name, None))
        out = out._replace(
            light=jax.device_put(out.light, sh),
            biw=jax.device_put(out.biw, sh),
            bids=jax.device_put(out.bids, sh),
            brp=jax.device_put(out.brp, sh),
        )
    return out


def _bucket_by_dest(dest, active, n_shards, capacity):
    """(flat_slot, sendable): rank each active lane within its destination
    bucket; lanes beyond capacity are NOT sendable (deferred)."""
    onehot = (dest[:, None] == jnp.arange(n_shards)[None, :]) & active[:, None]
    slot_in_dest = jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1
    my_slot = jnp.sum(jnp.where(onehot, slot_in_dest, 0), axis=1)
    sendable = active & (my_slot < capacity)
    flat_slot = jnp.where(
        sendable, dest * capacity + my_slot, n_shards * capacity
    )
    return flat_slot, sendable


def _exchange(buf, n_shards, axis_name):
    """all_to_all a [S*cap, F] request/response buffer."""
    cap = buf.shape[0] // n_shards
    return jax.lax.all_to_all(
        buf.reshape(n_shards, cap, -1), axis_name,
        split_axis=0, concat_axis=0, tiled=False,
    ).reshape(n_shards * cap, -1)


@functools.lru_cache(maxsize=8)
def _build_ep_blocked_walk(
    mesh: Mesh,
    walk_length: int,
    return_param: float,
    inout_param: float,
    max_trials: int,
    p_l: int,
    c: int,
    rows_per_shard: int,
    blocks_per_shard: int,
    capacity: int,
    max_supersteps: int,
    axis_name: str,
):
    n_shards = mesh.shape[axis_name]
    maxb = _max_blocks(p_l)
    inv_p = jnp.float32(1.0 / return_param)
    inv_q = jnp.float32(1.0 / inout_param)
    uniform_bias = return_param == 1.0 and inout_param == 1.0
    need_membership = inout_param != 1.0
    alpha_hi = jnp.float32(max(1.0, 1.0 / inout_param))
    el = walk_length
    n_req = n_shards * capacity

    def owner_of(v):
        return jnp.clip(v // rows_per_shard, 0, n_shards - 1)

    def shard_fn(light, biw, bids, brp, starts_shard, gids_shard, seed):
        n_local = starts_shard.shape[0]
        my = jax.lax.axis_index(axis_name)
        gidsu = gids_shard.astype(jnp.uint32)
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (n_req, c), 1)
        lane_p = jax.lax.broadcasted_iota(jnp.int32, (n_req, p_l), 1)
        lane_b = jax.lax.broadcasted_iota(jnp.int32, (n_req, maxb), 1)
        lane_q = jax.lax.broadcasted_iota(jnp.int32, (n_req, 128), 1)
        walker_ids = jnp.arange(n_local)

        def select(row, iota, idx):
            return jnp.sum(jnp.where(iota == idx[:, None], row, 0), axis=1)

        def bc_f32(x):
            return jax.lax.bitcast_convert_type(x, jnp.float32)

        alive0 = starts_shard >= 0
        paths0 = jnp.full((n_local, el + 1), -1, jnp.int32)
        paths0 = paths0.at[:, 0].set(jnp.where(alive0, starts_shard, -1))

        def superstep(carry):
            (paths, t, cur, prev, w_fwd, fwd_pfx, w_back_enc, back_pfx,
             alive, trials, att, n_fb, it) = carry
            w_back = bc_f32(w_back_enc & MAG)
            back_shared = w_back_enc < 0

            active = alive & (t < el)
            first_order = t == 0
            ctr = att * jnp.uint32(4)
            u_branch = hash_uniform(seed, gidsu, ctr)
            u_prop = hash_uniform(seed, gidsu, ctr + jnp.uint32(1))
            u_acc = hash_uniform(seed, gidsu, ctr + jnp.uint32(2))

            # ---- phase A: proposal request to owner(cur) ------------------
            dest_a = jnp.where(active, owner_of(jnp.maximum(cur, 0)), 0)
            slot_a, send_a = _bucket_by_dest(dest_a, active, n_shards, capacity)
            req = jnp.stack(
                [
                    jnp.where(send_a, cur, -1),
                    prev,
                    w_back_enc,
                    jax.lax.bitcast_convert_type(back_pfx, jnp.int32),
                    jax.lax.bitcast_convert_type(u_branch, jnp.int32),
                    jax.lax.bitcast_convert_type(u_prop, jnp.int32),
                    t,
                ],
                axis=1,
            )  # [n_local, 7]
            send = jnp.full((n_req + 1, 7), -1, jnp.int32)
            send = send.at[slot_a].set(
                jnp.where(send_a[:, None], req, -1)
            )[:-1]
            recv = _exchange(send, n_shards, axis_name)

            # ---- owner(cur) serves the proposal ---------------------------
            r_cur = recv[:, 0]
            r_valid = r_cur >= 0
            r_prev = recv[:, 1]
            r_wb = bc_f32(recv[:, 2] & MAG)
            r_bpfx = bc_f32(recv[:, 3])
            r_ub = bc_f32(recv[:, 4])
            r_up = bc_f32(recv[:, 5])
            r_first = recv[:, 6] == 0

            local_v = jnp.clip(
                jnp.where(r_valid, r_cur - my * rows_per_shard, 0),
                0, rows_per_shard - 1,
            )
            row = light[local_v]  # [n_req, 4P] local gather
            ids = row[:, :p_l]
            w_light = bc_f32(row[:, p_l : 2 * p_l])
            is_heavy = row[:, 0] < -1
            h_nb = row[:, 2]
            h_cum = bc_f32(row[:, 5 + maxb : 5 + 2 * maxb])
            light_deg = jnp.sum((ids != PAD_ID) & (ids >= 0), axis=1)
            degree = jnp.where(is_heavy, row[:, 4], light_deg)
            wtot = jnp.where(
                is_heavy, bc_f32(row[:, 3]), jnp.sum(w_light, axis=1)
            )

            if uniform_bias:
                take_back = jnp.zeros((n_req,), bool)
                target = r_up * wtot
            else:
                m1 = jnp.where(r_first, 0.0, r_wb * inv_p)
                alpha2_srv = jnp.where(recv[:, 2] < 0, alpha_hi, inv_q)
                rest = jnp.maximum(wtot - r_wb, 0.0)
                m2 = rest * alpha2_srv
                take_back = (~r_first) & (
                    r_ub < m1 / jnp.maximum(m1 + m2, 1e-30)
                )
                u2 = r_up * rest
                target = jnp.where(u2 < r_bpfx, u2, u2 + r_wb)

            cdf_l = prefix_sums(w_light)
            slot_l = jnp.sum((cdf_l < target[:, None]).astype(jnp.int32), axis=1)
            slot_l = jnp.minimum(slot_l, jnp.maximum(degree - 1, 0))
            cand_l = select(ids, lane_p, slot_l)
            w_l = select(row[:, p_l : 2 * p_l], lane_p, slot_l)
            rev_l = select(row[:, 2 * p_l : 3 * p_l], lane_p, slot_l)
            pfx_l = select(row[:, 3 * p_l : 4 * p_l], lane_p, slot_l)
            ppfx_l = jnp.where(
                slot_l > 0, select(cdf_l, lane_p, slot_l - 1), 0.0
            )

            blk = jnp.sum((h_cum < target[:, None]).astype(jnp.int32), axis=1)
            blk = jnp.minimum(blk, jnp.maximum(h_nb - 1, 0))
            base = jnp.where(
                blk > 0,
                bc_f32(select(row[:, 5 + maxb : 5 + 2 * maxb], lane_b, blk - 1)),
                0.0,
            )
            resid = target - base
            local_b = jnp.where(r_valid & is_heavy, row[:, 1] + blk, 0)
            brow = biw[jnp.clip(local_b, 0, biw.shape[0] - 1)]
            bw = bc_f32(brow[:, c:])
            nvalid = jnp.sum(brow[:, :c] != PAD_ID, axis=1)
            cdf_b = prefix_sums(bw)
            slot_b = jnp.sum((cdf_b < resid[:, None]).astype(jnp.int32), axis=1)
            slot_b = jnp.minimum(slot_b, jnp.maximum(nvalid - 1, 0))
            cand_h = select(brow[:, :c], lane_c, slot_b)
            w_h = select(brow[:, c:], lane_c, slot_b)
            gslot = local_b * c + slot_b
            qrow = brp[jnp.clip(gslot // QUADS_PER_ROW, 0, brp.shape[0] - 1)]
            qpos = 2 * (gslot % QUADS_PER_ROW)
            rev_h = select(qrow, lane_q, qpos)
            pfx_h = select(qrow, lane_q, qpos + 1)
            ppfx_h = base + jnp.where(
                slot_b > 0, select(cdf_b, lane_c, slot_b - 1), 0.0
            )

            cand = jnp.where(is_heavy, cand_h, cand_l)
            w_cand = jnp.where(is_heavy, w_h, w_l)
            rev_enc_c = jnp.where(is_heavy, rev_h, rev_l)
            pfx_c = jnp.where(
                is_heavy,
                bc_f32(pfx_h),
                bc_f32(pfx_l),
            )
            ppfx_c = jnp.where(is_heavy, ppfx_h, ppfx_l)
            dead = r_valid & (degree == 0)

            resp = jnp.stack(
                [
                    jnp.where(dead, -1, cand),
                    jnp.where(is_heavy, w_h, w_l),  # w bits
                    rev_enc_c,
                    jax.lax.bitcast_convert_type(pfx_c, jnp.int32),
                    jax.lax.bitcast_convert_type(ppfx_c, jnp.int32),
                    take_back.astype(jnp.int32),
                ],
                axis=1,
            )
            back = _exchange(resp, n_shards, axis_name)

            got = back[jnp.clip(slot_a, 0, n_req - 1)]
            a_cand = got[:, 0]
            a_w = bc_f32(got[:, 1])
            a_rev = got[:, 2]
            a_pfx = bc_f32(got[:, 3])
            a_ppfx = bc_f32(got[:, 4])
            a_take = got[:, 5] > 0
            died = send_a & (a_cand < 0) & ~a_take

            # ---- phase B: membership request to owner(prev) ---------------
            if need_membership:
                need_b = (
                    send_a & ~died & ~a_take & ~first_order
                )
                dest_b = jnp.where(need_b, owner_of(jnp.maximum(prev, 0)), 0)
                slot_b2, send_b = _bucket_by_dest(
                    dest_b, need_b, n_shards, capacity
                )
                reqb = jnp.stack(
                    [jnp.where(send_b, prev, -1), a_cand], axis=1
                )
                sendb = jnp.full((n_req + 1, 2), -1, jnp.int32)
                sendb = sendb.at[slot_b2].set(
                    jnp.where(send_b[:, None], reqb, -1)
                )[:-1]
                recvb = _exchange(sendb, n_shards, axis_name)
                b_prev = recvb[:, 0]
                b_cand = recvb[:, 1]
                b_valid = b_prev >= 0
                local_p = jnp.clip(
                    jnp.where(b_valid, b_prev - my * rows_per_shard, 0),
                    0, rows_per_shard - 1,
                )
                prow = light[local_p]
                p_heavy = prow[:, 0] < -1
                shared_light = jnp.any(
                    prow[:, :p_l] == b_cand[:, None], axis=1
                )
                mins = prow[:, 5 : 5 + maxb]
                jm = (
                    jnp.sum((mins <= b_cand[:, None]).astype(jnp.int32), axis=1)
                    - 1
                )
                jm = jnp.clip(jm, 0, jnp.maximum(prow[:, 2] - 1, 0))
                local_pb = jnp.where(b_valid & p_heavy, prow[:, 1] + jm, 0)
                mrow = bids[jnp.clip(local_pb, 0, bids.shape[0] - 1)]
                shared_h = jnp.any(mrow == b_cand[:, None], axis=1)
                shared_srv = jnp.where(p_heavy, shared_h, shared_light)
                respb = _exchange(
                    shared_srv.astype(jnp.int32)[:, None], n_shards, axis_name
                )
                shared = respb[jnp.clip(slot_b2, 0, n_req - 1), 0] > 0
                # lanes that needed membership but could not send defer the
                # whole attempt (phase A result is discarded; same counter
                # replays next superstep)
                attempted = send_a & (send_b | ~need_b)
            else:
                shared = jnp.zeros((n_local,), bool)
                attempted = send_a

            # ---- acceptance at home ---------------------------------------
            if uniform_bias:
                accept = attempted
            elif not need_membership:
                accept = attempted & (
                    a_take | first_order | (a_cand != prev)
                )
            else:
                alpha2 = jnp.where(back_shared, alpha_hi, inv_q)
                bias2 = jnp.where(shared, 1.0, inv_q)
                accept = attempted & (
                    a_take
                    | first_order
                    | ((a_cand != prev) & (u_acc * alpha2 <= bias2))
                )
            alive = alive & ~died

            trials = jnp.where(
                attempted, jnp.where(accept, 0, trials + 1), trials
            )
            force = attempted & alive & (trials >= max_trials)
            n_fb = n_fb + jnp.sum(force & ~accept, dtype=jnp.int32)
            accept = (accept | force) & alive

            # ---- advance --------------------------------------------------
            adv = accept
            take = a_take & ~force
            nxt = jnp.where(take, prev, a_cand)
            write_col = jnp.where(adv, t + 1, el + 64)
            paths = paths.at[walker_ids, write_col].set(nxt, mode="drop")
            nw_fwd = jnp.where(take, w_back, a_w)
            nf_pfx = jnp.where(take, back_pfx, a_ppfx)
            nw_back_enc = jnp.where(take,
                jax.lax.bitcast_convert_type(w_fwd, jnp.int32)
                | jnp.where(back_shared, jnp.int32(-2147483648), 0),
                a_rev,
            )
            nb_pfx = jnp.where(take, fwd_pfx, a_pfx)
            w_fwd = jnp.where(adv, nw_fwd, w_fwd)
            fwd_pfx = jnp.where(adv, nf_pfx, fwd_pfx)
            w_back_enc = jnp.where(adv, nw_back_enc, w_back_enc)
            back_pfx = jnp.where(adv, nb_pfx, back_pfx)
            prev = jnp.where(adv, cur, prev)
            cur = jnp.where(adv, nxt, cur)
            t = jnp.where(adv, t + 1, t)
            trials = jnp.where(adv, 0, trials)
            att = jnp.where(attempted & alive, att + jnp.uint32(1), att)
            return (paths, t, cur, prev, w_fwd, fwd_pfx, w_back_enc, back_pfx,
                    alive, trials, att, n_fb, it + 1)

        def cond(carry):
            t = carry[1]
            alive = carry[8]
            it = carry[12]
            pending = jax.lax.psum(
                jnp.sum((alive & (t < el)).astype(jnp.int32)), axis_name
            )
            return (it < max_supersteps) & (pending > 0)

        init = (
            paths0,
            jnp.zeros((n_local,), jnp.int32),  # t
            jnp.where(alive0, starts_shard, 0),  # cur
            jnp.full((n_local,), -1, jnp.int32),  # prev
            jnp.zeros((n_local,), jnp.float32),  # w_fwd
            jnp.zeros((n_local,), jnp.float32),  # fwd_pfx
            jnp.zeros((n_local,), jnp.int32),  # w_back_enc
            jnp.zeros((n_local,), jnp.float32),  # back_pfx
            alive0,
            jnp.zeros((n_local,), jnp.int32),  # trials
            jnp.zeros((n_local,), jnp.uint32),  # att
            jnp.int32(0),  # n_fb
            jnp.int32(0),  # it
        )
        out = jax.lax.while_loop(cond, superstep, init)
        paths, t, alive = out[0], out[1], out[8]
        unfinished = jnp.sum((alive & (t < el)).astype(jnp.int32))
        return paths, unfinished.reshape((1,)), out[11].reshape((1,))

    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(axis_name, None), P(axis_name, None), P(axis_name, None),
            P(axis_name, None), P(axis_name), P(axis_name), P(),
        ),
        out_specs=(P(axis_name, None), P(axis_name), P(axis_name)),
        check_vma=False,
    )
    return jax.jit(mapped)


def edge_partitioned_blocked_walk(
    mesh: Mesh,
    graph: PartitionedBlockedGraph,
    starts: jax.Array,  # [W] int32 sharded over axis_name, -1 padding
    gids: jax.Array,  # [W] int32 global walker ids
    seed: jax.Array,  # uint32 scalar
    *,
    walk_length: int,
    return_param: float,
    inout_param: float,
    max_trials: int = 64,
    capacity: int = 0,
    slack: int = 4,
    axis_name: str = "data",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Graph-sharded blocked walks.

    Returns (paths [W, L+1], unfinished [S], fallbacks [S]) — per-shard
    counts of walkers stopped at the superstep bound and of trial-capped
    ∝weight accepts.
    """
    n_shards = mesh.shape[axis_name]
    n_walkers = starts.shape[0]
    if n_walkers % n_shards:
        raise ValueError(f"{n_walkers} walkers not divisible by {n_shards}")
    if capacity <= 0:
        capacity = n_walkers // n_shards
    # expected supersteps ~ walk_length * mean-attempts; bound generously but
    # finitely, then REPORT what did not finish
    max_supersteps = slack * walk_length * (1 if inout_param <= 1 else 4) + 16
    fn = _build_ep_blocked_walk(
        mesh,
        walk_length,
        float(return_param),
        float(inout_param),
        max_trials,
        graph.light_width,
        graph.block_width,
        graph.rows_per_shard,
        graph.blocks_per_shard,
        capacity,
        max_supersteps,
        axis_name,
    )
    return fn(
        graph.light, graph.biw, graph.bids, graph.brp, starts, gids, seed
    )
