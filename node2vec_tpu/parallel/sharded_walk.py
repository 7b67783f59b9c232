"""Multi-device walk generation: walkers sharded over the mesh.

Replaces the reference's frontier-shuffle supersteps (``fugue.py:146-150``,
``spark.py:588-601``): instead of routing walker rows to the partition holding
their frontier vertex (two cluster shuffles per step), walkers are sharded by
**walker id** and every shard samples against the graph arrays.  With the
graph replicated per device (this round's layout) the step needs **zero
collectives** — each device runs the identical rejection-sampling program on
its walker slice; per-(walker,step) PRNG keys keep results independent of the
layout.  Edge-partitioned graphs with ragged frontier all-to-all are the
planned layout for graphs that exceed one device's HBM (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from node2vec_tpu.walk.engine import walk_chunk_impl


@functools.lru_cache(maxsize=16)
def _build_sharded_dense_walk(
    mesh: Mesh,
    walk_length: int,
    return_param: float,
    inout_param: float,
    axis_name: str,
):
    from node2vec_tpu.walk.dense import dense_walk_chunk_impl

    def shard_fn(packed_adj, starts_shard, gids_shard, seed):
        return dense_walk_chunk_impl(
            packed_adj,
            starts_shard,
            gids_shard,
            seed,
            walk_length=walk_length,
            return_param=return_param,
            inout_param=inout_param,
        )

    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P()),
        out_specs=P(axis_name, None),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_dense_walk_chunk(
    mesh: Mesh,
    packed_adj: jax.Array,
    starts: jax.Array,
    gids: jax.Array,
    seed: jax.Array,
    *,
    walk_length: int,
    return_param: float,
    inout_param: float,
    axis_name: str = "data",
) -> jax.Array:
    """Dense-engine sharded walk: walkers over ``axis_name``, packed adjacency
    replicated per device.  Draws are keyed on (seed, global walker id,
    step), so output is bit-identical to the single-device engine for the
    same gids regardless of mesh layout."""
    fn = _build_sharded_dense_walk(
        mesh, walk_length, float(return_param), float(inout_param), axis_name
    )
    return fn(packed_adj, starts, gids, seed)


@functools.lru_cache(maxsize=16)
def _build_sharded_blocked_walk(
    mesh: Mesh,
    walk_length: int,
    return_param: float,
    inout_param: float,
    max_trials: int,
    light_width: int,
    block_width: int,
    has_heavy: bool,
    shared_lists: bool,
    sl_exhaustive: bool,
    axis_name: str,
):
    from node2vec_tpu.walk.blocked import blocked_walk_chunk_impl

    def shard_fn(light, biw, bids, brp, slq, starts_shard, gids_shard, seed):
        # no per-shard key fold needed: the blocked engine's RNG is counter-
        # based on global walker ids, so results are layout-invariant
        paths, n_fb, n_att = blocked_walk_chunk_impl(
            light,
            biw,
            bids,
            brp,
            slq,
            starts_shard,
            gids_shard,
            seed,
            walk_length=walk_length,
            return_param=return_param,
            inout_param=inout_param,
            max_trials=max_trials,
            light_width=light_width,
            block_width=block_width,
            has_heavy=has_heavy,
            shared_lists=shared_lists,
            sl_exhaustive=sl_exhaustive,
        )
        return paths, n_fb.reshape((1,)), n_att.reshape((1,))

    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(axis_name), P(axis_name), P()),
        out_specs=(P(axis_name, None), P(axis_name), P(axis_name)),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_blocked_walk_chunk(
    mesh: Mesh,
    light: jax.Array,
    biw: jax.Array,
    bids: jax.Array,
    brp: jax.Array,
    slq: jax.Array,
    starts: jax.Array,
    gids: jax.Array,
    seed: jax.Array,
    *,
    walk_length: int,
    return_param: float,
    inout_param: float,
    max_trials: int = 64,
    light_width: int = 31,
    block_width: int = 256,
    has_heavy: bool = True,
    shared_lists: bool = False,
    sl_exhaustive: bool = False,
    axis_name: str = "data",
):
    """Blocked-engine sharded walk: walkers over ``axis_name``, the adjacency
    tables (including the shared-list table) replicated per device.  Returns
    (paths, per-shard fallback counts, per-shard attempt counts)."""
    fn = _build_sharded_blocked_walk(
        mesh,
        walk_length,
        float(return_param),
        float(inout_param),
        max_trials,
        light_width,
        block_width,
        has_heavy,
        shared_lists,
        sl_exhaustive,
        axis_name,
    )
    return fn(light, biw, bids, brp, slq, starts, gids, seed)


@functools.lru_cache(maxsize=16)
def _build_sharded_walk(
    mesh: Mesh,
    walk_length: int,
    return_param: float,
    inout_param: float,
    max_trials: int,
    search_iters: int,
    axis_name: str,
):
    def shard_fn(
        indptr, indices, weights, alias, prob, wtot, starts_shard, gids_shard,
        seed,
    ):
        # no per-shard key fold needed: the CSR engine's RNG is counter-based
        # on global walker ids, so results are layout-invariant
        return walk_chunk_impl(
            indptr,
            indices,
            weights,
            alias,
            prob,
            wtot,
            starts_shard,
            gids_shard,
            seed,
            walk_length=walk_length,
            return_param=return_param,
            inout_param=inout_param,
            max_trials=max_trials,
            search_iters=search_iters,
        )

    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), P(axis_name), P(axis_name), P()),
        out_specs=P(axis_name, None),
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_walk_chunk(
    mesh: Mesh,
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
    max_trials: int = 64,
    search_iters: int = 32,
    axis_name: str = "data",
) -> jax.Array:
    """Jit-compiled sharded walk: ``starts`` split over ``axis_name``, graph
    replicated, paths returned with the same walker sharding.  Draws are
    keyed on (seed, global walker id, counter), so output is bit-identical
    to the single-device engine for the same gids regardless of mesh layout.

    ``len(starts)`` must divide evenly by the axis size.
    """
    fn = _build_sharded_walk(
        mesh,
        walk_length,
        float(return_param),
        float(inout_param),
        max_trials,
        search_iters,
        axis_name,
    )
    return fn(indptr, indices, weights, alias, prob, wtot, starts, gids, seed)
