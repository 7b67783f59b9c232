"""Fused skip-gram negative-sampling (SGNS) training step.

Replaces the reference's delegated word2vec trainers — gensim's C/Cython
kernels (``/root/reference/node2vec/embedding.py:126``) and spark.ml's Scala
hierarchical-softmax trainer (``embedding.py:240``, ``spark.py:629``) — with a
single jit-compiled step designed for the MXU:

* pair generation (window slicing + gensim-style random window shrinking) is
  done on device with static shapes — walks go in, gradients come out;
* negatives are **shared per batch** and drawn from the unigram^0.75 alias
  table: positive and negative logits become dense [P,D]x[D,·] matmuls that
  tile onto the MXU, instead of per-pair gathers of [P,K,D] tensors
  (the loss is scaled by K/S so gradients match per-pair SGNS in expectation);
* updates are applied with scatter-add SGD (duplicate indices accumulate), the
  same hogwild-style accumulation word2vec uses.

The reference's default training objective is hierarchical softmax
(``constants.py:65`` sets negative=0); SGNS is the node2vec paper's objective
and the better TPU fit — quality parity is validated downstream (eval.py), not
bit-for-bit.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def init_embeddings(
    n_vertices: int, dim: int, seed: int = 1
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """word2vec-standard init: input ~ U(-0.5/dim, 0.5/dim), output zeros.

    Also returns the two row-wise Adagrad accumulators (see sgns_train_step).
    """
    key = jax.random.PRNGKey(seed)
    emb_in = jax.random.uniform(
        key, (n_vertices, dim), jnp.float32, -0.5 / dim, 0.5 / dim
    )
    emb_out = jnp.zeros((n_vertices, dim), jnp.float32)
    acc_in = jnp.zeros((n_vertices,), jnp.float32)
    acc_out = jnp.zeros((n_vertices,), jnp.float32)
    return emb_in, emb_out, acc_in, acc_out


def _log_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return -jax.nn.softplus(-x)


# ---------------------------------------------------------------------------
# Packed-pair table layout (the dim-64 anomaly fix, round 5).
#
# Measured (experiments/sgns_memory_probe.py, v5e AOT memory_analysis): any
# gather from a [V, 64] f32 parameter first materializes a full physical
# relayout COPY of the table — 64 floats is a half-lane-tile row, and XLA's
# dynamic-gather wants 128-lane tiles.  At V=8.4M that is 4 GiB of pure-
# forward temporaries (8.37 GiB for the full train step), while dim 32 and
# dim 128 run in place.  The preagg manual apply (sort + segment-sum + one
# scatter per table) does NOT help: temps are identical, because the copy
# is on the GATHER side, not the scatter chain.
#
# Fix: store TWO logical dim-64 rows per physical 128-lane row.  The packed
# [ceil(V/2), 128] parameter gathers in place (temp 0.00 GiB measured);
# gather fetches row id//2 and selects the half by parity, scatter-add
# widens updates to half-masked 128-lane rows.  Bit-identical math: the
# other half receives +0.0.  The packing must live across step boundaries
# (a reshape inside the step is itself the relayout copy — measured).
# ---------------------------------------------------------------------------


def use_packed_rows(n_vertices: int, dim: int) -> bool:
    """Whether the SGNS trainers store tables packed two-rows-per-tile.

    Only dim 64 hits the half-tile relayout pathology (dim 32 and dim 128
    gather in place — experiments/sgns_memory_probe.py), so only dim 64
    packs.  Applied at every V for one tested code path; the pathology's
    temp cost scales with V and is what OOMs north-star graphs.
    """
    return dim == 64


def pack_rows(t: jnp.ndarray) -> jnp.ndarray:
    """[V, D] table -> [ceil(V/2), 2D] packed-pair layout (zero row pad)."""
    n, d = t.shape
    if n % 2:
        t = jnp.concatenate([t, jnp.zeros((1, d), t.dtype)], axis=0)
    return t.reshape(-1, 2 * d)


def unpack_rows(t, n_vertices: int):
    """Inverse of pack_rows; works on numpy or jax arrays."""
    n2, d2 = t.shape
    return t.reshape(n2 * 2, d2 // 2)[:n_vertices]


def _packed_gather(t: jnp.ndarray, idx: jnp.ndarray, dim: int) -> jnp.ndarray:
    rows = t[idx // 2]  # [..., 2D]
    return jnp.where(
        (idx % 2 == 0)[..., None], rows[..., :dim], rows[..., dim:]
    )


def _packed_scatter_add(t, idx, upd, mode=None):
    dim = upd.shape[-1]
    zero = jnp.zeros_like(upd)
    even = jnp.concatenate([upd, zero], axis=-1)
    odd = jnp.concatenate([zero, upd], axis=-1)
    full = jnp.where((idx % 2 == 0)[..., None], even, odd)
    if mode is not None:
        return t.at[idx // 2].add(full, mode=mode)
    return t.at[idx // 2].add(full)


def window_shift(
    x: jnp.ndarray, d: int, window: int, length: int, fill=0
) -> jnp.ndarray:
    """``x`` shifted by ``d`` along axis 1 (the walk-position axis), zero/
    ``fill``-padded at the window borders — the positional trainers' shared
    primitive for pairing each center with its offset-``d`` context."""
    pad_width = [(0, 0), (window, window)] + [(0, 0)] * (x.ndim - 2)
    xp = jnp.pad(x, pad_width, constant_values=fill)
    return jax.lax.dynamic_slice_in_dim(xp, d + window, length, axis=1)


def make_pairs(
    walks: jnp.ndarray,
    key: jax.Array,
    vocab_mask: jnp.ndarray,
    window: int,
    shrink_window: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static-shape (center, context, valid) triple arrays from a walk batch.

    Returns flattened [B*(L+1)*2w] arrays. Invalid lanes (padding, -1 tails,
    out-of-vocab, shrunk window) carry valid=False and id 0.
    """
    n_walks, length = walks.shape
    offsets = [d for d in range(-window, window + 1) if d != 0]
    padded = jnp.pad(walks, ((0, 0), (window, window)), constant_values=-1)
    # ctx[:, o, :] = walk shifted by offsets[o]
    ctx = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(padded, d + window, length, axis=1) for d in offsets],
        axis=1,
    )  # [B, 2w, L+1]
    center = jnp.broadcast_to(walks[:, None, :], ctx.shape)

    valid = (center >= 0) & (ctx >= 0)
    if shrink_window:
        # gensim: per (walk, position) reduced window b ~ uniform{1..w}
        b = jax.random.randint(key, (n_walks, 1, length), 1, window + 1)
        dist = jnp.array([abs(d) for d in offsets], dtype=jnp.int32)[None, :, None]
        valid &= dist <= b
    center_safe = jnp.where(valid, center, 0)
    ctx_safe = jnp.where(valid, ctx, 0)
    valid &= vocab_mask[center_safe] & vocab_mask[ctx_safe]
    return (
        jnp.where(valid, center, 0).reshape(-1),
        jnp.where(valid, ctx, 0).reshape(-1),
        valid.reshape(-1),
    )


def sgns_train_step_impl(
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
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One training step over a batch of walks.

    Returns (emb_in, emb_out, acc_in, acc_out, loss), where
    loss = -mean_pairs[ log σ(c·o⁺) + (K/S) Σ_s log σ(-c·n_s) ] with S shared
    negatives standing in for K per-pair draws.

    Optimizer is **row-wise Adagrad** (the PyTorch-BigGraph recipe): gradients
    for duplicate rows accumulate (word2vec sum semantics), and each row is
    scaled by 1/sqrt(Σ mean-squared-grads of that row).  Hot vertices — which
    appear in hundreds of pairs per batch — take O(sqrt(count)) steps instead
    of the O(count) a raw summed-SGD scatter would, so training is stable for
    any degree distribution without tuning lr per graph.
    """
    n_vertices = emb_in.shape[0]
    k_neg1, k_neg2, k_shrink = jax.random.split(key, 3)

    center, context, valid = make_pairs(
        walks, k_shrink, vocab_mask, window, shrink_window
    )
    w_valid = valid.astype(jnp.float32)
    n_valid = jnp.maximum(w_valid.sum(), 1.0)

    # shared negatives from the unigram^0.75 alias table
    s = shared_negatives
    r1 = jax.random.uniform(k_neg1, (s,))
    r2 = jax.random.uniform(k_neg2, (s,))
    slot = jnp.minimum((r1 * n_vertices).astype(jnp.int32), n_vertices - 1)
    neg_ids = jnp.where(r2 < ns_prob[slot], slot, ns_alias[slot])

    ci = emb_in[center]  # [P, D]
    co = emb_out[context]  # [P, D]
    no = emb_out[neg_ids]  # [S, D]

    pos_logit = jnp.sum(ci * co, axis=-1)  # [P]
    neg_logit = jnp.dot(ci, no.T, preferred_element_type=jnp.float32)  # [P, S]

    neg_scale = negatives / s
    loss = -(
        jnp.sum(_log_sigmoid(pos_logit) * w_valid)
        + neg_scale * jnp.sum(_log_sigmoid(-neg_logit) * w_valid[:, None])
    ) / n_valid

    g_pos = (jax.nn.sigmoid(pos_logit) - 1.0) * w_valid  # [P]
    g_neg = jax.nn.sigmoid(neg_logit) * w_valid[:, None] * neg_scale  # [P, S]

    d_ci = g_pos[:, None] * co + jnp.dot(g_neg, no, preferred_element_type=jnp.float32)
    d_co = g_pos[:, None] * ci
    d_no = jnp.dot(g_neg.T, ci, preferred_element_type=jnp.float32)  # [S, D]

    # Row-wise Adagrad: accumulate mean-squared grads per row first (duplicate
    # rows include each other's contribution — conservative), then scale each
    # pair's gradient by the row's 1/sqrt(accumulator) at scatter time.
    eps = 1e-12
    sq_ci = jnp.mean(d_ci * d_ci, axis=-1) * w_valid
    sq_co = jnp.mean(d_co * d_co, axis=-1) * w_valid
    sq_no = jnp.mean(d_no * d_no, axis=-1)
    acc_in = acc_in.at[center].add(sq_ci)
    acc_out = acc_out.at[context].add(sq_co)
    acc_out = acc_out.at[neg_ids].add(sq_no)
    scale_ci = jax.lax.rsqrt(acc_in[center] + eps)
    scale_co = jax.lax.rsqrt(acc_out[context] + eps)
    scale_no = jax.lax.rsqrt(acc_out[neg_ids] + eps)

    emb_in = emb_in.at[center].add(-lr * d_ci * scale_ci[:, None])
    emb_out = emb_out.at[context].add(-lr * d_co * scale_co[:, None])
    emb_out = emb_out.at[neg_ids].add(-lr * d_no * scale_no[:, None])
    return emb_in, emb_out, acc_in, acc_out, loss


sgns_train_step = functools.partial(
    jax.jit,
    static_argnames=("window", "negatives", "shared_negatives", "shrink_window"),
    donate_argnames=("emb_in", "emb_out", "acc_in", "acc_out"),
)(sgns_train_step_impl)


def sgns_walk_step_impl(
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
    preagg: bool = False,
    optimizer: str = "adagrad",
    packed: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Walk-structured SGNS step — the fast single-device path.

    ``packed=True``: the embedding tables arrive (and leave) in the
    packed-pair [ceil(V/2), 2D] layout (see pack_rows) — the dim-64
    half-tile gather-relayout fix.  Accumulators stay [V].

    Same objective as sgns_train_step_impl, restructured for TPU gather cost
    (which is per ROW fetched): since every pair's center and context are walk
    positions, gather each position's vectors ONCE ([B, L1, D] — ~2w× fewer
    rows than per-pair gathers), compute all window offsets as shifted
    elementwise products, accumulate gradients positionally, and scatter once
    per table.  Negatives are shared per batch and interact with each center
    position weighted by its valid-pair multiplicity.

    ``preagg=True`` switches the Adagrad accumulator semantics from the
    per-occurrence recipe (each position's sq-mean summed, all occurrences
    scaled by the post-sum accumulator) to PRE-AGGREGATED: gradients of
    duplicate vertices are segment-summed first and each vertex takes ONE
    accumulator increment + update per batch — the same semantics the routed
    row-sharded trainer and the HS dense head already use (which fixed
    hot-row oscillation there).  Experimental; measured in
    experiments/sgns_preagg_quality.py.

    ``optimizer`` selects the update rule applied to the (summed or
    pre-aggregated) gradients:

    - ``"adagrad"`` (default): row-wise Adagrad — the production rule.
    - ``"sgd"``: duplicate-mean plain SGD with the linear-decay lr, no
      accumulator state touched — the reference trainers' rule
      (word2vec.c / spark.ml stepSize semantics).  Always pre-aggregated:
      each vertex takes ONE mean-scaled step per batch and the shared
      negatives take batch-mean-scaled steps, bounding the per-batch step
      the way sequential SGD's saturation feedback does (the summed
      variants measurably diverge).  Built for ROADMAP item 12 (residual
      quality band vs the sequential oracle); measured in
      experiments/sgd_mode_sweep.py.
    """
    if optimizer not in ("adagrad", "sgd"):
        raise ValueError(f"unknown optimizer {optimizer!r}")
    if optimizer == "sgd":
        # plain SGD REQUIRES the pre-aggregated (duplicate-mean) path: a
        # per-occurrence summed -lr*g step diverges on duplicate-dense
        # batches (hub rows sum hundreds of correlated gradients at the
        # stale point — measured NaN, experiments/sgd_mode_sweep.py)
        preagg = True
    n_vertices = acc_in.shape[0]  # true vocab size (tables may be packed)
    n_walks, length = walks.shape
    dim = emb_in.shape[1] // 2 if packed else emb_in.shape[1]
    if packed:
        def t_gather(t, idx):
            return _packed_gather(t, idx, dim)

        t_add = _packed_scatter_add
    else:
        def t_gather(t, idx):
            return t[idx]

        def t_add(t, idx, upd, mode=None):
            if mode is not None:
                return t.at[idx].add(upd, mode=mode)
            return t.at[idx].add(upd)
    k_neg1, k_neg2, k_shrink = jax.random.split(key, 3)

    walks_safe = jnp.where(walks >= 0, walks, 0)
    valid_pos = (walks >= 0) & vocab_mask[walks_safe]  # [B, L1]
    x_in = t_gather(emb_in, walks_safe)  # [B, L1, D]
    x_out = t_gather(emb_out, walks_safe)  # [B, L1, D]

    offsets = [d for d in range(-window, window + 1) if d != 0]
    if shrink_window:
        b_sh = jax.random.randint(k_shrink, (n_walks, length), 1, window + 1)
    else:
        b_sh = jnp.full((n_walks, length), window, dtype=jnp.int32)

    # zero-padded shifted views: entry i of shift(x, d) is x[i + d]
    def shift(x, d, fill=0):
        return window_shift(x, d, window, length, fill)

    g_in = jnp.zeros_like(x_in)
    g_out = jnp.zeros_like(x_out)
    pos_loss = jnp.float32(0.0)
    mult = jnp.zeros((n_walks, length), jnp.float32)  # valid pairs per center

    for d in offsets:
        xo = shift(x_out, d)
        pv = (
            valid_pos
            & shift(valid_pos, d)
            & (abs(d) <= b_sh)
        ).astype(jnp.float32)
        logit = jnp.sum(x_in * xo, axis=-1)  # [B, L1]
        g = (jax.nn.sigmoid(logit) - 1.0) * pv
        g_in = g_in + g[..., None] * xo
        g_out = g_out + shift(g[..., None] * x_in, -d)
        pos_loss = pos_loss + jnp.sum(_log_sigmoid(logit) * pv)
        mult = mult + pv

    # shared negatives against every center position, weighted by multiplicity
    s = shared_negatives
    r1 = jax.random.uniform(k_neg1, (s,))
    r2 = jax.random.uniform(k_neg2, (s,))
    slot = jnp.minimum((r1 * n_vertices).astype(jnp.int32), n_vertices - 1)
    neg_ids = jnp.where(r2 < ns_prob[slot], slot, ns_alias[slot])
    no = t_gather(emb_out, neg_ids)  # [S, D]

    x_in_flat = x_in.reshape(-1, dim)
    m_flat = mult.reshape(-1)
    neg_scale = negatives / s
    nl = jnp.dot(x_in_flat, no.T, preferred_element_type=jnp.float32)  # [BL, S]
    g_neg = jax.nn.sigmoid(nl) * m_flat[:, None] * neg_scale
    neg_loss = neg_scale * jnp.sum(_log_sigmoid(-nl) * m_flat[:, None])
    g_in_flat = g_in.reshape(-1, dim) + jnp.dot(
        g_neg, no, preferred_element_type=jnp.float32
    )
    d_no = jnp.dot(g_neg.T, x_in_flat, preferred_element_type=jnp.float32)

    n_valid = jnp.maximum(jnp.sum(mult), 1.0)
    loss = -(pos_loss + neg_loss) / n_valid

    # row-wise Adagrad + one scatter per table
    eps = 1e-12
    rows = walks_safe.reshape(-1)
    row_valid = (walks >= 0).reshape(-1).astype(jnp.float32)
    g_out_flat = g_out.reshape(-1, dim)
    if preagg:
        # segment-sum duplicate vertices' gradients before ONE Adagrad
        # increment + update per vertex per batch (sort + fixed-shape
        # segment ids; empty segments' heads are INT32_MAX and drop)
        n_rows = rows.shape[0]
        order = jnp.argsort(rows)
        r_s = rows[order]
        is_first = jnp.concatenate(
            [jnp.ones((1,), bool), r_s[1:] != r_s[:-1]]
        )
        seg = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # [N] segment ids
        head_v = jax.ops.segment_min(r_s, seg, num_segments=n_rows)

        def agg(g_flat):
            g_sorted = (g_flat * row_valid[:, None])[order]
            return jax.ops.segment_sum(g_sorted, seg, num_segments=n_rows)

        ga_in = agg(g_in_flat)  # [N, D]; row s = segment s's summed gradient
        ga_out = agg(g_out_flat)
        if optimizer == "sgd":
            # duplicate-mean SGD: one -lr * (sum/count) step per vertex.
            # The shared-negative rows likewise take a mean-scaled step:
            # each absorbs the WHOLE batch's negative mass (n_pairs *
            # negatives / s occurrences — thousands), which a plain summed
            # -lr*d_no step cannot survive (measured divergence,
            # experiments/sgd_mode_sweep.py).
            cnt = jax.ops.segment_sum(
                row_valid[order], seg, num_segments=n_rows
            )
            inv = 1.0 / jnp.maximum(cnt, 1.0)
            cnt_neg = jnp.maximum(jnp.sum(m_flat) * neg_scale, 1.0)
            emb_in = t_add(
                emb_in, head_v, -lr * ga_in * inv[:, None], mode="drop"
            )
            emb_out = t_add(
                emb_out, head_v, -lr * ga_out * inv[:, None], mode="drop"
            )
            emb_out = t_add(emb_out, neg_ids, -lr * d_no / cnt_neg)
            return emb_in, emb_out, acc_in, acc_out, loss
        acc_in = acc_in.at[head_v].add(
            jnp.mean(ga_in * ga_in, axis=-1), mode="drop"
        )
        acc_out = acc_out.at[head_v].add(
            jnp.mean(ga_out * ga_out, axis=-1), mode="drop"
        )
        acc_out = acc_out.at[neg_ids].add(jnp.mean(d_no * d_no, axis=-1))
        head_safe = jnp.minimum(head_v, n_vertices - 1)
        scale_in_a = jax.lax.rsqrt(acc_in[head_safe] + eps)
        scale_out_a = jax.lax.rsqrt(acc_out[head_safe] + eps)
        scale_no = jax.lax.rsqrt(acc_out[neg_ids] + eps)
        emb_in = t_add(
            emb_in, head_v, -lr * ga_in * scale_in_a[:, None], mode="drop"
        )
        emb_out = t_add(
            emb_out, head_v, -lr * ga_out * scale_out_a[:, None], mode="drop"
        )
        emb_out = t_add(emb_out, neg_ids, -lr * d_no * scale_no[:, None])
        return emb_in, emb_out, acc_in, acc_out, loss
    sq_in = jnp.mean(g_in_flat * g_in_flat, axis=-1) * row_valid
    sq_out = jnp.mean(g_out_flat * g_out_flat, axis=-1) * row_valid
    sq_no = jnp.mean(d_no * d_no, axis=-1)
    acc_in = acc_in.at[rows].add(sq_in)
    acc_out = acc_out.at[rows].add(sq_out)
    acc_out = acc_out.at[neg_ids].add(sq_no)
    scale_in = jax.lax.rsqrt(acc_in[rows] + eps) * row_valid
    scale_out = jax.lax.rsqrt(acc_out[rows] + eps) * row_valid
    scale_no = jax.lax.rsqrt(acc_out[neg_ids] + eps)

    emb_in = t_add(emb_in, rows, -lr * g_in_flat * scale_in[:, None])
    emb_out = t_add(emb_out, rows, -lr * g_out_flat * scale_out[:, None])
    emb_out = t_add(emb_out, neg_ids, -lr * d_no * scale_no[:, None])
    return emb_in, emb_out, acc_in, acc_out, loss


sgns_walk_step = functools.partial(
    jax.jit,
    static_argnames=(
        "window", "negatives", "shared_negatives", "shrink_window", "preagg",
        "optimizer", "packed",
    ),
    donate_argnames=("emb_in", "emb_out", "acc_in", "acc_out"),
)(sgns_walk_step_impl)


def init_fused_embeddings(
    n_vertices: int, dim: int, seed: int = 1
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused-table init: [V, D+1] with the row-wise Adagrad accumulator in
    column D (same U(±0.5/dim) / zeros values as init_embeddings)."""
    emb_in, emb_out, acc_in, acc_out = init_embeddings(n_vertices, dim, seed)
    return (
        jnp.concatenate([emb_in, acc_in[:, None]], axis=1),
        jnp.concatenate([emb_out, acc_out[:, None]], axis=1),
    )


def split_fused(table: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[V, D+1] fused table -> ([V, D] embeddings, [V] accumulator)."""
    return table[:, :-1], table[:, -1]


def sgns_walk_step_fused_impl(
    tab_in: jnp.ndarray,  # [V, D+1]: embedding | Adagrad accumulator column
    tab_out: jnp.ndarray,
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
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused-table SGNS step: 4 indexed table ops per walk position.

    STATUS: measured SLOWER than the two-pass positional step on v5e — NOT
    on the production path (fit() uses sgns_epoch).  The idea: the
    positional step is gather/scatter issue-bound at ~8 indexed ops per
    position (2 embedding gathers, 2 scatters, 4 more on the separate [V]
    Adagrad accumulators); fusing the accumulator into column D halves the
    op count, at the cost of one-pass per-batch-delayed Adagrad (duplicate
    rows inside a batch don't see each other's squared-gradient mass, so a
    cold accumulator diverges on duplicate-dense batches — small graphs).
    Measured (experiments/sgns_fused_bench.py, interleaved A/B): the
    [V, D+1] row breaks the f32 (8, 128) tile — at dim 128 the row pads to
    256 lanes, doubling table bytes and gather/scatter traffic — and the
    fused step lands at 0.67-0.86x the two-pass step at dim 128/256.
    Kept as the measured negative result; revisit only if a future XLA
    exposes unpadded 129-wide layouts or acc can share padding lanes.
    """
    n_vertices = tab_in.shape[0]
    n_walks, length = walks.shape
    dim = tab_in.shape[1] - 1
    k_neg1, k_neg2, k_shrink = jax.random.split(key, 3)

    walks_safe = jnp.where(walks >= 0, walks, 0)
    valid_pos = (walks >= 0) & vocab_mask[walks_safe]
    xi = tab_in[walks_safe]  # [B, L1, D+1] — vector + accumulator, one gather
    xo = tab_out[walks_safe]
    x_in, acc_in0 = xi[..., :dim], xi[..., dim]
    x_out, acc_out0 = xo[..., :dim], xo[..., dim]

    offsets = [d for d in range(-window, window + 1) if d != 0]
    if shrink_window:
        b_sh = jax.random.randint(k_shrink, (n_walks, length), 1, window + 1)
    else:
        b_sh = jnp.full((n_walks, length), window, dtype=jnp.int32)

    def shift(x, d, fill=0):
        return window_shift(x, d, window, length, fill)

    g_in = jnp.zeros_like(x_in)
    g_out = jnp.zeros_like(x_out)
    pos_loss = jnp.float32(0.0)
    mult = jnp.zeros((n_walks, length), jnp.float32)
    for d in offsets:
        xod = shift(x_out, d)
        pv = (valid_pos & shift(valid_pos, d) & (abs(d) <= b_sh)).astype(
            jnp.float32
        )
        logit = jnp.sum(x_in * xod, axis=-1)
        g = (jax.nn.sigmoid(logit) - 1.0) * pv
        g_in = g_in + g[..., None] * xod
        g_out = g_out + shift(g[..., None] * x_in, -d)
        pos_loss = pos_loss + jnp.sum(_log_sigmoid(logit) * pv)
        mult = mult + pv

    s = shared_negatives
    r1 = jax.random.uniform(k_neg1, (s,))
    r2 = jax.random.uniform(k_neg2, (s,))
    slot = jnp.minimum((r1 * n_vertices).astype(jnp.int32), n_vertices - 1)
    neg_ids = jnp.where(r2 < ns_prob[slot], slot, ns_alias[slot])
    nf = tab_out[neg_ids]  # [S, D+1]
    no, acc_no0 = nf[:, :dim], nf[:, dim]

    x_in_flat = x_in.reshape(-1, dim)
    m_flat = mult.reshape(-1)
    neg_scale = negatives / s
    nl = jnp.dot(x_in_flat, no.T, preferred_element_type=jnp.float32)
    g_neg = jax.nn.sigmoid(nl) * m_flat[:, None] * neg_scale
    neg_loss = neg_scale * jnp.sum(_log_sigmoid(-nl) * m_flat[:, None])
    g_in_flat = g_in.reshape(-1, dim) + jnp.dot(
        g_neg, no, preferred_element_type=jnp.float32
    )
    d_no = jnp.dot(g_neg.T, x_in_flat, preferred_element_type=jnp.float32)

    n_valid = jnp.maximum(jnp.sum(mult), 1.0)
    loss = -(pos_loss + neg_loss) / n_valid

    eps = 1e-12
    rows = walks_safe.reshape(-1)
    row_valid = (walks >= 0).reshape(-1).astype(jnp.float32)
    g_out_flat = g_out.reshape(-1, dim)
    sq_in = jnp.mean(g_in_flat * g_in_flat, axis=-1) * row_valid
    sq_out = jnp.mean(g_out_flat * g_out_flat, axis=-1) * row_valid
    sq_no = jnp.mean(d_no * d_no, axis=-1)
    scale_in = jax.lax.rsqrt(acc_in0.reshape(-1) + sq_in + eps) * row_valid
    scale_out = jax.lax.rsqrt(acc_out0.reshape(-1) + sq_out + eps) * row_valid
    scale_no = jax.lax.rsqrt(acc_no0 + sq_no + eps)

    # ONE scatter per table: (Δvector | Δaccumulator) fused rows
    upd_in = jnp.concatenate(
        [-lr * g_in_flat * scale_in[:, None], sq_in[:, None]], axis=1
    )
    upd_out = jnp.concatenate(
        [-lr * g_out_flat * scale_out[:, None], sq_out[:, None]], axis=1
    )
    upd_no = jnp.concatenate(
        [-lr * d_no * scale_no[:, None], sq_no[:, None]], axis=1
    )
    tab_in = tab_in.at[rows].add(upd_in)
    tab_out = tab_out.at[rows].add(upd_out)
    tab_out = tab_out.at[neg_ids].add(upd_no)
    return tab_in, tab_out, loss


sgns_walk_step_fused = functools.partial(
    jax.jit,
    static_argnames=("window", "negatives", "shared_negatives", "shrink_window"),
    donate_argnames=("tab_in", "tab_out"),
)(sgns_walk_step_fused_impl)


def _sgns_epoch_fused_impl(
    tab_in, tab_out, corpus, key, step0, lr0, lr_slope,
    ns_alias, ns_prob, vocab_mask, *,
    batch: int, n_batches: int, window: int, negatives: int,
    shared_negatives: int, shrink_window: bool, min_lr: float,
):
    """A whole fused-table epoch inside one jit (lax.scan)."""

    def body(state, b):
        tab_in, tab_out = state
        gstep = step0 + b
        lr = jnp.maximum(lr0 - lr_slope * gstep.astype(jnp.float32), min_lr)
        wb = jax.lax.dynamic_slice_in_dim(corpus, b * batch, batch, axis=0)
        tab_in, tab_out, loss = sgns_walk_step_fused_impl(
            tab_in, tab_out, wb, jax.random.fold_in(key, gstep), lr,
            ns_alias, ns_prob, vocab_mask,
            window=window, negatives=negatives,
            shared_negatives=shared_negatives, shrink_window=shrink_window,
        )
        return (tab_in, tab_out), loss

    state, losses = jax.lax.scan(
        body,
        (tab_in, tab_out),
        jnp.arange(n_batches, dtype=jnp.int32),
    )
    return (*state, losses)


sgns_epoch_fused = functools.partial(
    jax.jit,
    static_argnames=(
        "batch", "n_batches", "window", "negatives", "shared_negatives",
        "shrink_window", "min_lr",
    ),
    donate_argnames=("tab_in", "tab_out"),
)(_sgns_epoch_fused_impl)


def _sgns_corpus_step_impl(
    emb_in, emb_out, acc_in, acc_out, corpus, offset, key, lr,
    ns_alias, ns_prob, vocab_mask, *,
    batch: int, window: int, negatives: int, shared_negatives: int,
    shrink_window: bool, optimizer: str = "adagrad", packed: bool = False,
):
    """sgns_walk_step over a device-resident (pre-shuffled) corpus slice.

    Keeps the whole training loop free of per-step host->device transfers:
    the batch is cut with dynamic_slice on device.
    """
    wb = jax.lax.dynamic_slice_in_dim(corpus, offset, batch, axis=0)
    return sgns_walk_step_impl(
        emb_in, emb_out, acc_in, acc_out, wb, key, lr,
        ns_alias, ns_prob, vocab_mask,
        window=window, negatives=negatives,
        shared_negatives=shared_negatives, shrink_window=shrink_window,
        optimizer=optimizer, packed=packed,
    )


sgns_corpus_step = functools.partial(
    jax.jit,
    static_argnames=(
        "batch", "window", "negatives", "shared_negatives", "shrink_window",
        "optimizer", "packed",
    ),
    donate_argnames=("emb_in", "emb_out", "acc_in", "acc_out"),
)(_sgns_corpus_step_impl)


def _sgns_epoch_impl(
    emb_in, emb_out, acc_in, acc_out, corpus, key, step0, lr0, lr_slope,
    ns_alias, ns_prob, vocab_mask, *,
    batch: int, n_batches: int, window: int, negatives: int,
    shared_negatives: int, shrink_window: bool, min_lr: float,
    optimizer: str = "adagrad", preagg: bool = False, packed: bool = False,
):
    """A whole epoch of SGNS steps inside ONE jit program (lax.scan).

    Removes per-step host dispatch entirely: the corpus must already be
    shuffled on device; lr decays linearly on device as
    max(lr0 - lr_slope * global_step, min_lr).
    """

    def body(state, b):
        emb_in, emb_out, acc_in, acc_out = state
        gstep = step0 + b
        lr = jnp.maximum(lr0 - lr_slope * gstep.astype(jnp.float32), min_lr)
        wb = jax.lax.dynamic_slice_in_dim(corpus, b * batch, batch, axis=0)
        emb_in, emb_out, acc_in, acc_out, loss = sgns_walk_step_impl(
            emb_in, emb_out, acc_in, acc_out, wb,
            jax.random.fold_in(key, gstep), lr,
            ns_alias, ns_prob, vocab_mask,
            window=window, negatives=negatives,
            shared_negatives=shared_negatives, shrink_window=shrink_window,
            optimizer=optimizer, preagg=preagg, packed=packed,
        )
        return (emb_in, emb_out, acc_in, acc_out), loss

    state, losses = jax.lax.scan(
        body,
        (emb_in, emb_out, acc_in, acc_out),
        jnp.arange(n_batches, dtype=jnp.int32),
    )
    return (*state, losses)


sgns_epoch = functools.partial(
    jax.jit,
    static_argnames=(
        "batch", "n_batches", "window", "negatives", "shared_negatives",
        "shrink_window", "min_lr", "optimizer", "preagg", "packed",
    ),
    donate_argnames=("emb_in", "emb_out", "acc_in", "acc_out"),
)(_sgns_epoch_impl)


def pairs_per_batch(n_walks: int, walk_length: int, window: int) -> int:
    return n_walks * (walk_length + 1) * 2 * window
