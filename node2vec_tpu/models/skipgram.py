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


def pairs_per_batch(n_walks: int, walk_length: int, window: int) -> int:
    return n_walks * (walk_length + 1) * 2 * window
