"""Row-sharded hierarchical softmax: the reference's DEFAULT objective at
vertex counts beyond one device's HBM.

Both reference backends default to HS (gensim ``negative=0``,
``/root/reference/node2vec/constants.py:65``; spark.ml Word2Vec is HS-only,
``embedding.py:240``, ``spark.py:629``), and the reference's scaling story is
spark.ml's data-parallel HS over ``numPartitions`` sentence partitions.  This
module is the TPU-native equivalent of *that* combination: the input table
AND the Huffman inner-node table (word2vec's syn1) are mod-sharded over all
mesh devices, and every step routes the touched rows to/from their owners
with the same dedup + fixed-capacity all-to-all machinery as row-sharded
SGNS (parallel/rowsharded_sgns.py — reused, not duplicated).

Per step, per device:
* center rows: ``[B·L1]`` requests against the emb_in shards;
* tree-top rows (the first H Huffman levels, ≤512 nodes holding ~60% of the
  count-weighted path mass): NOT routed — hot-row replication.  Each device
  all-gathers the head slice (≤256KB), scores it through MXU matmuls, and
  the pre-aggregated ``[K, D]`` head gradient is psum'd; owners apply their
  own rows (see models/hsoftmax.py level renumbering);
* remaining path rows: ``[B·L1·(CODE_LEN−H)]`` requests against the theta
  shards (dedup collapses repeats);
* gradients pre-aggregate per unique row, route back, and owners apply
  row-wise Adagrad — duplicate-safe two-pass, identical to the SGNS path.

The Huffman path tables (points/codes/lengths, ``[V, CODE_LEN]``) are
replicated like the negative-sampling alias tables: they are static int
metadata an order of magnitude smaller than the fp32 tables being sharded.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from node2vec_tpu.models.skipgram import _log_sigmoid, window_shift
from node2vec_tpu.parallel.rowsharded_sgns import (
    AXES,
    host_copy,
    _pad_to,
    _plan_routes,
    _routed_apply,
    _routed_gather,
)


class RowHSState(NamedTuple):
    emb_in: jax.Array  # [Vp, D] sharded P(AXES, None); logical row v at v % N
    theta: jax.Array  # [Ip, D] inner-node vectors, same mod-sharding
    acc_in: jax.Array  # [Vp, 1] row-wise Adagrad accumulators
    acc_theta: jax.Array  # [Ip, 1]
    n_vertices: int
    n_inner: int


def _interleave(table: jnp.ndarray, n_dev: int) -> jnp.ndarray:
    """Mod-shard layout: position (v % N) * (Vp/N) + v // N holds row v."""
    v_pad = table.shape[0]
    perm = np.arange(v_pad).reshape(v_pad // n_dev, n_dev).T.reshape(-1)
    return table[perm]


def init_hs_row_state(
    mesh: Mesh, n_vertices: int, n_inner: int, dim: int, seed: int = 1
) -> RowHSState:
    """Same init as the single-device HS trainer (word2vec-standard:
    input ~ U(±0.5/dim), inner nodes zero), then mod-sharded."""
    n_dev = int(np.prod([mesh.shape[a] for a in AXES]))
    v_pad = _pad_to(n_vertices, n_dev)
    i_pad = _pad_to(n_inner, n_dev)
    key = jax.random.PRNGKey(seed)
    emb_in = jax.random.uniform(
        key, (n_vertices, dim), jnp.float32, -0.5 / dim, 0.5 / dim
    )
    emb_in = jnp.pad(emb_in, ((0, v_pad - n_vertices), (0, 0)))
    sh = NamedSharding(mesh, P(AXES, None))
    return RowHSState(
        emb_in=jax.device_put(_interleave(emb_in, n_dev), sh),
        theta=jax.device_put(jnp.zeros((i_pad, dim), jnp.float32), sh),
        acc_in=jax.device_put(jnp.zeros((v_pad, 1), jnp.float32), sh),
        acc_theta=jax.device_put(jnp.zeros((i_pad, 1), jnp.float32), sh),
        n_vertices=n_vertices,
        n_inner=n_inner,
    )


def unshard_hs_rows(
    state: RowHSState, n_devices: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Logical ([V, D] emb_in, [n_inner, D] theta) from the mod layout."""

    def undo(arr, n_keep):
        n_pad = arr.shape[0]
        inv = np.arange(n_pad).reshape(n_devices, n_pad // n_devices).T.reshape(-1)
        return host_copy(arr)[inv][:n_keep]

    return undo(state.emb_in, state.n_vertices), undo(state.theta, state.n_inner)


def hs_state_to_host(
    state: RowHSState, n_devices: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Full logical host copy (tables + accumulators) for checkpointing."""

    def undo(arr, n_keep):
        n_pad = arr.shape[0]
        inv = np.arange(n_pad).reshape(n_devices, n_pad // n_devices).T.reshape(-1)
        return host_copy(arr)[inv][:n_keep]

    return (
        undo(state.emb_in, state.n_vertices),
        undo(state.theta, state.n_inner),
        undo(state.acc_in, state.n_vertices)[:, 0],
        undo(state.acc_theta, state.n_inner)[:, 0],
    )


def hs_state_from_host(
    mesh: Mesh,
    emb_in: np.ndarray,
    theta: np.ndarray,
    acc_in: np.ndarray,
    acc_theta: np.ndarray,
) -> RowHSState:
    """Rebuild the mod-sharded device state from a checkpointed host copy."""
    n_dev = int(np.prod([mesh.shape[a] for a in AXES]))
    n_v, n_inner = emb_in.shape[0], theta.shape[0]
    sh = NamedSharding(mesh, P(AXES, None))

    def put(arr, n):
        a = np.asarray(arr, dtype=np.float32)
        if a.ndim == 1:
            a = a[:, None]
        n_pad = _pad_to(n, n_dev)
        a = np.pad(a, ((0, n_pad - n), (0, 0)))
        perm = np.arange(n_pad).reshape(n_pad // n_dev, n_dev).T.reshape(-1)
        return jax.device_put(jnp.asarray(a[perm]), sh)

    return RowHSState(
        emb_in=put(emb_in, n_v),
        theta=put(theta, n_inner),
        acc_in=put(acc_in, n_v),
        acc_theta=put(acc_theta, n_inner),
        n_vertices=n_v,
        n_inner=n_inner,
    )


def _row_hs_step(
    emb_in_l, theta_l, acc_in_l, acc_th_l,
    walks_shard, key, lr, hs_points, hs_codes, hs_len, vocab_mask,
    *, n_dev, cap_in, cap_th, window, shrink_window, axis_name,
    head_offsets=(0,),
):
    """One routed HS step on one device's walk slice (inside shard_map).

    Pair math is identical to the single-device kernel
    (models/hsoftmax.py hs_walk_step_impl): for each (center i, context i+d),
    loss -= Σ_j mask_j · log σ((1-2·code_j) · v_in[center] · θ[point_j(ctx)]).

    With ``head_offsets`` (BFS level prefix, see hsoftmax.head_level_offsets)
    the hottest inner nodes — the tree top, requested by EVERY pair — are not
    routed at all: each device all-gathers the ≤512-row head slice once per
    step (hot-row replication), scores it through MXU matmuls, and psums the
    pre-aggregated [K, D] head gradient; owners apply their own rows.  Only
    path levels >= H go through the all-to-all, so routed traffic and
    capacity pressure drop by the head fraction (~60% of count-weighted
    requests) and head rows can never be capacity-dropped.
    """
    n_walks, length = walks_shard.shape
    dim = emb_in_l.shape[1]
    cl = hs_points.shape[1]
    n_head = min(len(head_offsets) - 1, cl)
    k_rows = int(head_offsets[n_head])
    clt = cl - n_head
    my = jax.lax.axis_index(axis_name)
    k_shrink = jax.random.fold_in(key, my)

    walks_safe = jnp.where(walks_shard >= 0, walks_shard, 0)
    valid_pos = (walks_shard >= 0) & vocab_mask[walks_safe]

    rows = walks_safe.reshape(-1)  # [B*L1] center requests
    pts = hs_points[walks_safe]  # [B, L1, CL] replicated metadata lookup
    cds = hs_codes[walks_safe].astype(jnp.float32)
    plen = hs_len[walks_safe]
    pts_t = pts[:, :, n_head:]
    prow = pts_t.reshape(-1)  # [B*L1*CLT] routed tail theta requests

    plan_in = _plan_routes(rows, n_dev, cap_in)
    x_in = _routed_gather(emb_in_l, plan_in, n_dev, axis_name)[plan_in.inv]
    x_in = x_in.reshape(n_walks, length, dim)
    valid_pos = valid_pos & plan_in.ok[plan_in.inv].reshape(n_walks, length)

    pm_all = (
        jax.lax.broadcasted_iota(jnp.int32, (n_walks, length, cl), 2)
        < plen[..., None]
    ).astype(jnp.float32)
    if clt:
        plan_th = _plan_routes(prow, n_dev, cap_th)
        th = _routed_gather(theta_l, plan_th, n_dev, axis_name)[plan_th.inv]
        th = th.reshape(n_walks, length, clt, dim)
        pmask_t = pm_all[:, :, n_head:] * plan_th.ok[plan_th.inv].reshape(
            n_walks, length, clt
        ).astype(jnp.float32)
    if n_head:
        # hot-row replication: local head rows are the first ceil(K/N) mod
        # positions (row k lives on device k%N at position k//N)
        kp_local = -(-k_rows // n_dev)
        gathered = jax.lax.all_gather(
            jax.lax.slice_in_dim(theta_l, 0, kp_local, axis=0), axis_name
        )  # [N, kp, D]; logical row j = gathered[j % N, j // N]
        t_head = gathered.transpose(1, 0, 2).reshape(
            kp_local * n_dev, dim
        )[:k_rows]
        l_head = jnp.einsum(
            "bld,kd->blk", x_in, t_head, preferred_element_type=jnp.float32
        )
        dl_sum = jnp.zeros((n_walks, length, k_rows), jnp.float32)
    sgn = 1.0 - 2.0 * cds

    offsets = [d for d in range(-window, window + 1) if d != 0]
    if shrink_window:
        b_sh = jax.random.randint(k_shrink, (n_walks, length), 1, window + 1)
    else:
        b_sh = jnp.full((n_walks, length), window, dtype=jnp.int32)

    def shift(x, d, fill=0):
        return window_shift(x, d, window, length, fill)

    g_in = jnp.zeros_like(x_in)
    g_th = jnp.zeros_like(th) if clt else None
    loss = jnp.float32(0.0)
    n_pairs = jnp.float32(0.0)
    for d in offsets:
        sgn_c = shift(sgn, d)
        pv = (valid_pos & shift(valid_pos, d) & (abs(d) <= b_sh)).astype(
            jnp.float32
        )
        n_pairs = n_pairs + jnp.sum(pv)

        if clt:
            th_c = shift(th, d)
            pm_c = shift(pmask_t, d)
            logit = jnp.einsum(
                "bld,blcd->blc", x_in, th_c,
                preferred_element_type=jnp.float32,
            )
            sgn_t = sgn_c[:, :, n_head:]
            m = pv[..., None] * pm_c
            loss = loss - jnp.sum(_log_sigmoid(sgn_t * logit) * m)
            g = (jax.nn.sigmoid(logit) - (1.0 + sgn_t) / 2.0) * m
            g_in = g_in + jnp.einsum(
                "blc,blcd->bld", g, th_c, preferred_element_type=jnp.float32
            )
            g_th = g_th + shift(
                jnp.einsum("blc,bld->blcd", g, x_in,
                           preferred_element_type=jnp.float32),
                -d,
            )

        if n_head:
            sel = shift(pts[:, :, :n_head], d)
            pm_h = shift(pm_all[:, :, :n_head], d)
            dl_levels = []
            for j in range(n_head):
                lo, hi = int(head_offsets[j]), int(head_offsets[j + 1])
                idx = sel[:, :, j] - lo
                oh = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (n_walks, length, hi - lo), 2
                    )
                    == idx[..., None]
                )
                lj = jax.lax.slice_in_dim(l_head, lo, hi, axis=2)
                logit_j = jnp.sum(jnp.where(oh, lj, 0.0), axis=-1)
                sgn_j = sgn_c[:, :, j]
                m_j = pv * pm_h[:, :, j]
                loss = loss - jnp.sum(_log_sigmoid(sgn_j * logit_j) * m_j)
                g_j = (jax.nn.sigmoid(logit_j) - (1.0 + sgn_j) / 2.0) * m_j
                dl_levels.append(jnp.where(oh, g_j[..., None], 0.0))
            dl_sum = dl_sum + jnp.concatenate(dl_levels, axis=2)

    n_pairs = jnp.maximum(jax.lax.psum(n_pairs, axis_name), 1.0)
    loss = jax.lax.psum(loss, axis_name) / n_pairs

    eps = 1e-12
    row_live = (walks_shard >= 0).reshape(-1).astype(jnp.float32)

    if n_head:
        g_in = g_in + jnp.einsum(
            "blk,kd->bld", dl_sum, t_head, preferred_element_type=jnp.float32
        )
        d_head = jax.lax.psum(
            jnp.einsum("blk,bld->kd", dl_sum, x_in,
                       preferred_element_type=jnp.float32),
            axis_name,
        )  # [K, D] globally aggregated head gradient
        d_pad = jnp.pad(d_head, ((0, kp_local * n_dev - k_rows), (0, 0)))
        d_mine = d_pad.reshape(kp_local, n_dev, dim)[:, my]  # my local rows
        sq_mine = jnp.mean(d_mine * d_mine, axis=-1, keepdims=True)
        acc_head = jax.lax.slice_in_dim(acc_th_l, 0, kp_local, axis=0) + sq_mine
        acc_th_l = acc_th_l.at[:kp_local].set(acc_head)
        theta_l = theta_l.at[:kp_local].add(
            -lr * d_mine * jax.lax.rsqrt(acc_head + eps)
        )

    # pre-aggregate per unique row (requester side), then route back
    g_in_flat = g_in.reshape(-1, dim)
    sq_in = jnp.mean(g_in_flat * g_in_flat, axis=-1) * row_live
    r_in = plan_in.uniq.shape[0]
    gu_in = jnp.zeros((r_in, dim), jnp.float32).at[plan_in.inv].add(
        g_in_flat * row_live[:, None]
    )
    squ_in = jnp.zeros((r_in,), jnp.float32).at[plan_in.inv].add(sq_in)
    emb_in_l, acc_in_l = _routed_apply(
        emb_in_l, acc_in_l, plan_in, gu_in, squ_in, lr, n_dev, axis_name
    )
    dropped = plan_in.n_dropped

    if clt:
        g_th_flat = g_th.reshape(-1, dim)
        th_live = (pmask_t.reshape(-1) > 0).astype(jnp.float32) * jnp.repeat(
            row_live, clt
        )
        sq_th = jnp.mean(g_th_flat * g_th_flat, axis=-1) * th_live
        r_th = plan_th.uniq.shape[0]
        gu_th = jnp.zeros((r_th, dim), jnp.float32).at[plan_th.inv].add(
            g_th_flat * th_live[:, None]
        )
        squ_th = jnp.zeros((r_th,), jnp.float32).at[plan_th.inv].add(sq_th)
        theta_l, acc_th_l = _routed_apply(
            theta_l, acc_th_l, plan_th, gu_th, squ_th, lr, n_dev, axis_name
        )
        dropped = dropped + plan_th.n_dropped
    dropped = jax.lax.psum(dropped, axis_name)
    return emb_in_l, theta_l, acc_in_l, acc_th_l, loss, dropped


@functools.lru_cache(maxsize=8)
def _build_hs_row_epoch(
    mesh: Mesh, dim: int, batch_local: int, n_batches: int, window: int,
    shrink_window: bool, min_lr: float, cap_in: int, cap_th: int,
    head_offsets: Tuple[int, ...] = (0,),
):
    n_dev = int(np.prod([mesh.shape[a] for a in AXES]))

    def shard_fn(emb_in_l, theta_l, acc_in_l, acc_th_l, corpus_l, key,
                 step0, lr0, lr_slope, hs_points, hs_codes, hs_len,
                 vocab_mask):
        my = jax.lax.axis_index(AXES)
        k_sh = jax.random.fold_in(jax.random.fold_in(key, my), 0x5F5E1)
        corpus_l = corpus_l[jax.random.permutation(k_sh, corpus_l.shape[0])]

        def body(state, b):
            emb_in_l, theta_l, acc_in_l, acc_th_l, drop = state
            gstep = step0 + b
            lr = jnp.maximum(lr0 - lr_slope * gstep.astype(jnp.float32), min_lr)
            wb = jax.lax.dynamic_slice_in_dim(
                corpus_l, b * batch_local, batch_local, axis=0
            )
            emb_in_l, theta_l, acc_in_l, acc_th_l, loss, d = _row_hs_step(
                emb_in_l, theta_l, acc_in_l, acc_th_l, wb,
                jax.random.fold_in(key, gstep), lr,
                hs_points, hs_codes, hs_len, vocab_mask,
                n_dev=n_dev, cap_in=cap_in, cap_th=cap_th, window=window,
                shrink_window=shrink_window, axis_name=AXES,
                head_offsets=head_offsets,
            )
            return (emb_in_l, theta_l, acc_in_l, acc_th_l, drop + d), loss

        (emb_in_l, theta_l, acc_in_l, acc_th_l, drop), losses = jax.lax.scan(
            body,
            (emb_in_l, theta_l, acc_in_l, acc_th_l, jnp.int32(0)),
            jnp.arange(n_batches, dtype=jnp.int32),
        )
        return emb_in_l, theta_l, acc_in_l, acc_th_l, losses, drop

    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(AXES, None), P(AXES, None), P(AXES, None), P(AXES, None),
            P(AXES, None), P(), P(), P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(
            P(AXES, None), P(AXES, None), P(AXES, None), P(AXES, None),
            P(), P(),
        ),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0, 1, 2, 3))


def row_hs_epoch(
    mesh: Mesh,
    state: RowHSState,
    corpus: jax.Array,  # [B, L+1] sharded P(AXES, None); B % n_dev == 0
    key: jax.Array,
    step0,
    lr0,
    lr_slope,
    hs_points: jax.Array,
    hs_codes: jax.Array,
    hs_len: jax.Array,
    vocab_mask: jax.Array,
    *,
    batch_local: int,
    n_batches: int,
    window: int,
    shrink_window: bool,
    min_lr: float,
    cap_slack: float = 2.0,
    head_offsets: Tuple[int, ...] = (0,),
):
    """One epoch of routed row-sharded HS in a single jit dispatch.

    Returns (new_state, losses [n_batches], dropped_rows scalar).
    ``head_offsets`` (hsoftmax.head_level_offsets) replicates the tree-top
    rows per step instead of routing them — see _row_hs_step.
    """
    n_dev = int(np.prod([mesh.shape[a] for a in AXES]))
    length = corpus.shape[1]
    cl = hs_points.shape[1]
    n_head = min(len(head_offsets) - 1, cl)
    r_in = batch_local * length
    # theta requests dedup hard (the tree top is shared by every pair), but
    # capacity must cover the worst case of distinct deep nodes; only the
    # non-head tail is routed at all
    r_th = batch_local * length * max(cl - n_head, 1)
    cap_in = max(64, int(-(-r_in * cap_slack // n_dev // 64) * 64))
    cap_th = max(64, int(-(-r_th * cap_slack // n_dev // 64) * 64))
    fn = _build_hs_row_epoch(
        mesh, state.emb_in.shape[1], batch_local, n_batches, window,
        shrink_window, float(min_lr), cap_in, cap_th,
        tuple(int(x) for x in head_offsets),
    )
    emb_in, theta, acc_in, acc_th, losses, dropped = fn(
        state.emb_in, state.theta, state.acc_in, state.acc_theta,
        corpus, key, jnp.int32(step0), jnp.float32(lr0),
        jnp.float32(lr_slope), hs_points, hs_codes, hs_len, vocab_mask,
    )
    return (
        RowHSState(
            emb_in, theta, acc_in, acc_th, state.n_vertices, state.n_inner
        ),
        losses,
        dropped,
    )
