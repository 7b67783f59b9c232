"""CBOW (continuous bag-of-words) training steps — the ``sg=0`` architecture.

The reference's gensim backend forwards user params straight into
``gensim.models.Word2Vec`` (``/root/reference/node2vec/embedding.py:105-126``
merges ``GENSIM_PARAMS`` if-absent), and gensim's ``sg`` defaults to 0 —
CBOW is the de-facto default *architecture* of the reference's gensim path
and reachable surface for any ``sg``/``cbow_mean`` a user passes.  This
module provides the TPU-native equivalent: set ``Word2VecParams(sg=0)``.

Objective (gensim CBOW semantics): for each center position, the hidden
vector ``h`` is the mean (``cbow_mean=True``, gensim default) or sum of the
context positions' *input* vectors inside the (shrunk) window; ``h`` is
scored against the center's *output* row plus shared negatives
(``negative>0``) or against the center's Huffman path (``negative=0``, HS).
Gradients flow back to every contributing context's input row (divided by
the context count under ``cbow_mean``, like gensim's ``g /= count``).

Structure mirrors the positional skip-gram steps (models/skipgram.py):
walks gathered once per table ([B, L1, D]), window offsets as shifted
elementwise ops, one scatter per table, row-wise Adagrad.  CBOW is the
parity option — SGNS skip-gram remains the performance default — so the HS
variant keeps the plain per-row path gather (no level-shared dense head).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from node2vec_tpu.models.skipgram import (
    _log_sigmoid,
    _packed_gather,
    _packed_scatter_add,
    window_shift,
)


def _table_ops(packed: bool, dim: int):
    """(gather, scatter-add) pair for logical [N, D] tables that may be
    stored packed-pair [ceil(N/2), 2D] (skipgram.pack_rows — the dim-64
    half-tile gather-relayout fix)."""
    if packed:
        def t_gather(t, idx):
            return _packed_gather(t, idx, dim)

        return t_gather, _packed_scatter_add

    def t_gather(t, idx):
        return t[idx]

    def t_add(t, idx, upd, mode=None):
        return t.at[idx].add(upd)

    return t_gather, t_add


def _context_mean(
    x_in: jnp.ndarray,  # [B, L1, D]
    valid_pos: jnp.ndarray,  # [B, L1] bool
    b_sh: jnp.ndarray,  # [B, L1] int32 per-position shrunk half-window
    window: int,
    length: int,
    cbow_mean: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared CBOW forward prologue.

    Returns (h [B, L1, D], cnt [B, L1] f32 context counts, pv list of
    per-offset validity masks).  ``h`` is the mean (or sum) of valid context
    input vectors around each center; centers with no valid context have
    h=0 and cnt=0 (they are masked out of the loss by the caller).
    """
    offsets = [d for d in range(-window, window + 1) if d != 0]

    def shift(x, d, fill=0):
        return window_shift(x, d, window, length, fill)

    pv = []
    h_sum = jnp.zeros_like(x_in)
    cnt = jnp.zeros(valid_pos.shape, jnp.float32)
    for d in offsets:
        pvd = (
            valid_pos & shift(valid_pos, d) & (abs(d) <= b_sh)
        ).astype(jnp.float32)
        pv.append((d, pvd))
        h_sum = h_sum + shift(x_in, d) * pvd[..., None]
        cnt = cnt + pvd
    h = h_sum / jnp.maximum(cnt, 1.0)[..., None] if cbow_mean else h_sum
    return h, cnt, pv


def _scatter_context_grads(
    g_h: jnp.ndarray,  # [B, L1, D] gradient w.r.t. h, already /cnt if mean
    pv,  # list of (d, [B, L1] f32) per-offset validity
    window: int,
    length: int,
) -> jnp.ndarray:
    """Distribute the hidden-vector gradient back onto context positions:
    g_in[l+d] += g_h[l] for every valid (center l, offset d)."""

    def shift(x, d, fill=0):
        return window_shift(x, d, window, length, fill)

    g_in = jnp.zeros_like(g_h)
    for d, pvd in pv:
        g_in = g_in + shift(g_h * pvd[..., None], -d)
    return g_in


def cbow_walk_step_impl(
    emb_in: jnp.ndarray,
    emb_out: jnp.ndarray,
    acc_in: jnp.ndarray,
    acc_out: jnp.ndarray,
    walks: jnp.ndarray,
    key: jax.Array,
    lr: jnp.ndarray,
    ns_alias: jnp.ndarray,
    ns_prob: jnp.ndarray,
    vocab_mask: jnp.ndarray,
    *,
    window: int,
    negatives: int,
    shared_negatives: int,
    shrink_window: bool,
    cbow_mean: bool = True,
    packed: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One CBOW negative-sampling step over a walk batch.

    loss = -mean_centers[ log σ(h·o⁺) + (K/S) Σ_s log σ(-h·n_s) ], h the
    context mean/sum; negatives shared per batch like sgns_walk_step (the
    key split order matches, so the two objectives draw identical negative
    ids under the same key — exploited by the equivalence test on 2-token
    walks, where CBOW degenerates to SGNS with swapped roles).

    ``packed=True``: both tables arrive/leave packed-pair [ceil(V/2), 2D]
    (skipgram.pack_rows); accumulators stay [V].
    """
    n_vertices = acc_in.shape[0]  # true vocab size (tables may be packed)
    n_walks, length = walks.shape
    dim = emb_in.shape[1] // 2 if packed else emb_in.shape[1]
    t_gather, t_add = _table_ops(packed, dim)
    k_neg1, k_neg2, k_shrink = jax.random.split(key, 3)

    walks_safe = jnp.where(walks >= 0, walks, 0)
    valid_pos = (walks >= 0) & vocab_mask[walks_safe]
    x_in = t_gather(emb_in, walks_safe)
    x_out = t_gather(emb_out, walks_safe)  # center output rows

    if shrink_window:
        b_sh = jax.random.randint(k_shrink, (n_walks, length), 1, window + 1)
    else:
        b_sh = jnp.full((n_walks, length), window, dtype=jnp.int32)

    h, cnt, pv = _context_mean(x_in, valid_pos, b_sh, window, length, cbow_mean)
    w_c = (valid_pos & (cnt > 0)).astype(jnp.float32)  # trainable centers
    n_centers = jnp.maximum(jnp.sum(w_c), 1.0)

    # positive: center's own output row
    pos_logit = jnp.sum(h * x_out, axis=-1)  # [B, L1]
    g_pos = (jax.nn.sigmoid(pos_logit) - 1.0) * w_c

    # shared negatives from the unigram^ns_exponent alias table
    s = shared_negatives
    r1 = jax.random.uniform(k_neg1, (s,))
    r2 = jax.random.uniform(k_neg2, (s,))
    slot = jnp.minimum((r1 * n_vertices).astype(jnp.int32), n_vertices - 1)
    neg_ids = jnp.where(r2 < ns_prob[slot], slot, ns_alias[slot])
    no = t_gather(emb_out, neg_ids)  # [S, D]

    h_flat = h.reshape(-1, dim)
    w_flat = w_c.reshape(-1)
    neg_scale = negatives / s
    nl = jnp.dot(h_flat, no.T, preferred_element_type=jnp.float32)  # [BL, S]
    g_neg = jax.nn.sigmoid(nl) * w_flat[:, None] * neg_scale

    loss = -(
        jnp.sum(_log_sigmoid(pos_logit) * w_c)
        + neg_scale * jnp.sum(_log_sigmoid(-nl) * w_flat[:, None])
    ) / n_centers

    # gradient w.r.t. h, then distributed to contexts (gensim: g /= count)
    g_h = g_pos[..., None] * x_out + jnp.dot(
        g_neg, no, preferred_element_type=jnp.float32
    ).reshape(n_walks, length, dim)
    if cbow_mean:
        g_h = g_h / jnp.maximum(cnt, 1.0)[..., None]
    g_in = _scatter_context_grads(g_h, pv, window, length)

    d_out = g_pos[..., None] * h  # center output rows
    d_no = jnp.dot(
        g_neg.T, h_flat, preferred_element_type=jnp.float32
    )  # [S, D]

    # row-wise Adagrad + one scatter per table (sgns_walk_step recipe)
    eps = 1e-12
    rows = walks_safe.reshape(-1)
    row_valid = (walks >= 0).reshape(-1).astype(jnp.float32)
    g_in_flat = g_in.reshape(-1, dim)
    d_out_flat = d_out.reshape(-1, dim)
    sq_in = jnp.mean(g_in_flat * g_in_flat, axis=-1) * row_valid
    sq_out = jnp.mean(d_out_flat * d_out_flat, axis=-1) * row_valid
    sq_no = jnp.mean(d_no * d_no, axis=-1)
    acc_in = acc_in.at[rows].add(sq_in)
    acc_out = acc_out.at[rows].add(sq_out)
    acc_out = acc_out.at[neg_ids].add(sq_no)
    scale_in = jax.lax.rsqrt(acc_in[rows] + eps) * row_valid
    scale_out = jax.lax.rsqrt(acc_out[rows] + eps) * row_valid
    scale_no = jax.lax.rsqrt(acc_out[neg_ids] + eps)

    emb_in = t_add(emb_in, rows, -lr * g_in_flat * scale_in[:, None])
    emb_out = t_add(emb_out, rows, -lr * d_out_flat * scale_out[:, None])
    emb_out = t_add(emb_out, neg_ids, -lr * d_no * scale_no[:, None])
    return emb_in, emb_out, acc_in, acc_out, loss


cbow_walk_step = functools.partial(
    jax.jit,
    static_argnames=(
        "window", "negatives", "shared_negatives", "shrink_window",
        "cbow_mean", "packed",
    ),
    donate_argnames=("emb_in", "emb_out", "acc_in", "acc_out"),
)(cbow_walk_step_impl)


def cbow_hs_step_impl(
    emb_in: jnp.ndarray,
    theta: jnp.ndarray,  # [n_inner, D] Huffman inner-node vectors
    acc_in: jnp.ndarray,
    acc_theta: jnp.ndarray,
    walks: jnp.ndarray,
    key: jax.Array,
    lr: jnp.ndarray,
    hs_points: jnp.ndarray,  # [V, CL] int32
    hs_codes: jnp.ndarray,  # [V, CL] int8
    hs_len: jnp.ndarray,  # [V] int32
    vocab_mask: jnp.ndarray,
    *,
    window: int,
    shrink_window: bool,
    cbow_mean: bool = True,
    packed: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One CBOW hierarchical-softmax step (gensim ``sg=0, hs=1`` analogue).

    Per center: loss -= Σ_j mask_j · log σ(sgn_j · h · θ[point_j(center)]) —
    the path is the CENTER's own Huffman code (no per-offset path shifting,
    unlike skip-gram HS where each context contributes its path), so the
    path tensors are gathered once per position.

    ``packed=True``: ``emb_in``/``theta`` arrive/leave packed-pair
    [ceil(N/2), 2D] (skipgram.pack_rows); accumulators stay [N].
    """
    n_walks, length = walks.shape
    dim = emb_in.shape[1] // 2 if packed else emb_in.shape[1]
    t_gather, t_add = _table_ops(packed, dim)
    cl = hs_points.shape[1]
    k_shrink = key

    walks_safe = jnp.where(walks >= 0, walks, 0)
    valid_pos = (walks >= 0) & vocab_mask[walks_safe]
    x_in = t_gather(emb_in, walks_safe)

    if shrink_window:
        b_sh = jax.random.randint(k_shrink, (n_walks, length), 1, window + 1)
    else:
        b_sh = jnp.full((n_walks, length), window, dtype=jnp.int32)

    h, cnt, pv = _context_mean(x_in, valid_pos, b_sh, window, length, cbow_mean)
    w_c = (valid_pos & (cnt > 0)).astype(jnp.float32)
    n_centers = jnp.maximum(jnp.sum(w_c), 1.0)

    pts = hs_points[walks_safe]  # [B, L1, CL] — the CENTER's path
    cds = hs_codes[walks_safe].astype(jnp.float32)
    plen = hs_len[walks_safe]
    pmask = (
        jax.lax.broadcasted_iota(jnp.int32, (n_walks, length, cl), 2)
        < plen[..., None]
    ).astype(jnp.float32) * w_c[..., None]
    sgn = 1.0 - 2.0 * cds

    # bf16 path tensors, fp32 logits (models/hsoftmax.py recipe)
    h_bf = h.astype(jnp.bfloat16)
    th = t_gather(theta.astype(jnp.bfloat16), pts)  # [B, L1, CL, D]
    logit = jnp.einsum(
        "bld,blcd->blc", h_bf, th, preferred_element_type=jnp.float32
    )
    loss = -jnp.sum(_log_sigmoid(sgn * logit) * pmask) / n_centers
    g = (jax.nn.sigmoid(logit) - (1.0 + sgn) / 2.0) * pmask  # [B, L1, CL]
    g_bf = g.astype(jnp.bfloat16)

    g_h = jnp.einsum(
        "blc,blcd->bld", g_bf, th, preferred_element_type=jnp.float32
    )
    g_th = jnp.einsum(
        "blc,bld->blcd", g_bf, h_bf, preferred_element_type=jnp.float32
    )
    if cbow_mean:
        g_h = g_h / jnp.maximum(cnt, 1.0)[..., None]
    g_in = _scatter_context_grads(g_h, pv, window, length)

    # row-wise Adagrad
    eps = 1e-12
    rows = walks_safe.reshape(-1)
    row_valid = (walks >= 0).reshape(-1).astype(jnp.float32)
    g_in_flat = g_in.reshape(-1, dim)
    sq_in = jnp.mean(g_in_flat * g_in_flat, axis=-1) * row_valid
    acc_in = acc_in.at[rows].add(sq_in)
    scale_in = jax.lax.rsqrt(acc_in[rows] + eps) * row_valid
    emb_in = t_add(emb_in, rows, -lr * g_in_flat * scale_in[:, None])

    prow = pts.reshape(-1)
    g_th_flat = g_th.reshape(-1, dim)
    th_valid = (pmask.reshape(-1) > 0).astype(jnp.float32)
    sq_th = jnp.mean(g_th_flat * g_th_flat, axis=-1) * th_valid
    acc_theta = acc_theta.at[prow].add(sq_th)
    scale_th = jax.lax.rsqrt(acc_theta[prow] + eps) * th_valid
    theta = t_add(theta, prow, -lr * g_th_flat * scale_th[:, None])
    return emb_in, theta, acc_in, acc_theta, loss


cbow_hs_step = functools.partial(
    jax.jit,
    static_argnames=("window", "shrink_window", "cbow_mean", "packed"),
    donate_argnames=("emb_in", "theta", "acc_in", "acc_theta"),
)(cbow_hs_step_impl)


def _cbow_epoch_impl(
    emb_in, emb_out, acc_in, acc_out, corpus, key, step0, lr0, lr_slope,
    ns_alias, ns_prob, vocab_mask, *,
    batch: int, n_batches: int, window: int, negatives: int,
    shared_negatives: int, shrink_window: bool, min_lr: float,
    cbow_mean: bool = True, packed: bool = False,
):
    """A whole CBOW-NS epoch inside one jit (lax.scan), like sgns_epoch."""

    def body(state, b):
        emb_in, emb_out, acc_in, acc_out = state
        gstep = step0 + b
        lr = jnp.maximum(lr0 - lr_slope * gstep.astype(jnp.float32), min_lr)
        wb = jax.lax.dynamic_slice_in_dim(corpus, b * batch, batch, axis=0)
        emb_in, emb_out, acc_in, acc_out, loss = cbow_walk_step_impl(
            emb_in, emb_out, acc_in, acc_out, wb,
            jax.random.fold_in(key, gstep), lr,
            ns_alias, ns_prob, vocab_mask,
            window=window, negatives=negatives,
            shared_negatives=shared_negatives, shrink_window=shrink_window,
            cbow_mean=cbow_mean, packed=packed,
        )
        return (emb_in, emb_out, acc_in, acc_out), loss

    state, losses = jax.lax.scan(
        body,
        (emb_in, emb_out, acc_in, acc_out),
        jnp.arange(n_batches, dtype=jnp.int32),
    )
    return (*state, losses)


cbow_epoch = functools.partial(
    jax.jit,
    static_argnames=(
        "batch", "n_batches", "window", "negatives", "shared_negatives",
        "shrink_window", "min_lr", "cbow_mean", "packed",
    ),
    donate_argnames=("emb_in", "emb_out", "acc_in", "acc_out"),
)(_cbow_epoch_impl)


def _cbow_hs_epoch_impl(
    emb_in, theta, acc_in, acc_theta, corpus, key, step0, lr0, lr_slope,
    hs_points, hs_codes, hs_len, vocab_mask, *,
    batch: int, n_batches: int, window: int, shrink_window: bool,
    min_lr: float, cbow_mean: bool = True, packed: bool = False,
):
    """A whole CBOW-HS epoch inside one jit (lax.scan), like hs_epoch."""

    def body(state, b):
        emb_in, theta, acc_in, acc_theta = state
        gstep = step0 + b
        lr = jnp.maximum(lr0 - lr_slope * gstep.astype(jnp.float32), min_lr)
        wb = jax.lax.dynamic_slice_in_dim(corpus, b * batch, batch, axis=0)
        emb_in, theta, acc_in, acc_theta, loss = cbow_hs_step_impl(
            emb_in, theta, acc_in, acc_theta, wb,
            jax.random.fold_in(key, gstep), lr,
            hs_points, hs_codes, hs_len, vocab_mask,
            window=window, shrink_window=shrink_window, cbow_mean=cbow_mean,
            packed=packed,
        )
        return (emb_in, theta, acc_in, acc_theta), loss

    state, losses = jax.lax.scan(
        body,
        (emb_in, theta, acc_in, acc_theta),
        jnp.arange(n_batches, dtype=jnp.int32),
    )
    return (*state, losses)


cbow_hs_epoch = functools.partial(
    jax.jit,
    static_argnames=(
        "batch", "n_batches", "window", "shrink_window", "min_lr",
        "cbow_mean", "packed",
    ),
    donate_argnames=("emb_in", "theta", "acc_in", "acc_theta"),
)(_cbow_hs_epoch_impl)
