"""Multi-device SGNS: tensor-parallel embedding columns × data-parallel batch.

The reference scales word2vec only by data-parallel partition averaging inside
spark.ml (SURVEY.md §2.2); its embedding table must fit in a single JVM heap.
The TPU layout removes that ceiling:

* **model axis (TP)** — embedding tables are column-sharded ``P(None,
  'model')``: each device holds dims ``[d·D/m, (d+1)·D/m)`` of EVERY vertex.
  Row gathers are local; pair logits are partial dot products combined with a
  tiny ``psum([P], 'model')``.  This is the natural TP for embedding models —
  the collective is O(pairs), not O(V·D).
* **data axis (DP)** — each data shard consumes its own walk slice and
  computes sparse updates; updates are combined with a ``psum`` over 'data'
  before applying, so the tables stay bit-identical on all replicas (stronger
  than the reference's once-per-iteration parameter averaging).

The Adagrad accumulators are [V] vectors, replicated; their updates psum over
both axes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from node2vec_tpu.models.skipgram import _log_sigmoid, make_pairs


class ShardedSGNSState(NamedTuple):
    emb_in: jax.Array  # [V, D] sharded P(None, 'model')
    emb_out: jax.Array  # [V, D] sharded P(None, 'model')
    acc_in: jax.Array  # [V] replicated
    acc_out: jax.Array  # [V] replicated


def init_sharded_state(
    mesh: Mesh, n_vertices: int, dim: int, seed: int = 1
) -> ShardedSGNSState:
    from node2vec_tpu.models.skipgram import init_embeddings

    emb_in, emb_out, acc_in, acc_out = init_embeddings(n_vertices, dim, seed)
    col = NamedSharding(mesh, P(None, "model"))
    rep = NamedSharding(mesh, P())
    return ShardedSGNSState(
        emb_in=jax.device_put(emb_in, col),
        emb_out=jax.device_put(emb_out, col),
        acc_in=jax.device_put(acc_in, rep),
        acc_out=jax.device_put(acc_out, rep),
    )


def _col_step(emb_in, emb_out, acc_in, acc_out, walks_shard, key, lr,
              ns_alias, ns_prob, vocab_mask, *, dim, window, negatives,
              shared_negatives, shrink_window):
    """One TP×DP step body on one device's shards (runs inside shard_map)."""
    n_vertices, local_dim = emb_in.shape
    d_idx = jax.lax.axis_index("data")
    # data shards draw independent pairs/negatives; model shards must
    # agree (they hold different dims of the SAME rows) -> fold data only
    k = jax.random.fold_in(key, d_idx)
    k_neg1, k_neg2, k_shrink = jax.random.split(k, 3)

    center, context, valid = make_pairs(
        walks_shard, k_shrink, vocab_mask, window, shrink_window
    )
    w_valid = valid.astype(jnp.float32)
    n_valid = jnp.maximum(jax.lax.psum(w_valid.sum(), "data"), 1.0)

    s = shared_negatives
    r1 = jax.random.uniform(k_neg1, (s,))
    r2 = jax.random.uniform(k_neg2, (s,))
    slot = jnp.minimum((r1 * n_vertices).astype(jnp.int32), n_vertices - 1)
    neg_ids = jnp.where(r2 < ns_prob[slot], slot, ns_alias[slot])

    ci = emb_in[center]  # [P, D/m] — row gather is local under TP
    co = emb_out[context]
    no = emb_out[neg_ids]

    # partial dots over local dims -> full logits via tiny psum
    pos_logit = jax.lax.psum(jnp.sum(ci * co, axis=-1), "model")
    neg_logit = jax.lax.psum(
        jnp.dot(ci, no.T, preferred_element_type=jnp.float32), "model"
    )

    neg_scale = negatives / s
    loss = -(
        jnp.sum(_log_sigmoid(pos_logit) * w_valid)
        + neg_scale * jnp.sum(_log_sigmoid(-neg_logit) * w_valid[:, None])
    )
    loss = jax.lax.psum(loss, "data") / n_valid

    g_pos = (jax.nn.sigmoid(pos_logit) - 1.0) * w_valid
    g_neg = jax.nn.sigmoid(neg_logit) * w_valid[:, None] * neg_scale

    d_ci = g_pos[:, None] * co + jnp.dot(
        g_neg, no, preferred_element_type=jnp.float32
    )
    d_co = g_pos[:, None] * ci
    d_no = jnp.dot(g_neg.T, ci, preferred_element_type=jnp.float32)

    # row-wise Adagrad over FULL-dim mean-square: psum local sums over model
    eps = 1e-12
    sq_ci = jax.lax.psum(jnp.sum(d_ci * d_ci, axis=-1), "model") / dim * w_valid
    sq_co = jax.lax.psum(jnp.sum(d_co * d_co, axis=-1), "model") / dim * w_valid
    sq_no = jax.lax.psum(jnp.sum(d_no * d_no, axis=-1), "model") / dim

    dacc_in = jnp.zeros_like(acc_in).at[center].add(sq_ci)
    dacc_out = (
        jnp.zeros_like(acc_out).at[context].add(sq_co).at[neg_ids].add(sq_no)
    )
    acc_in = acc_in + jax.lax.psum(dacc_in, "data")
    acc_out = acc_out + jax.lax.psum(dacc_out, "data")

    scale_ci = jax.lax.rsqrt(acc_in[center] + eps)
    scale_co = jax.lax.rsqrt(acc_out[context] + eps)
    scale_no = jax.lax.rsqrt(acc_out[neg_ids] + eps)

    # sparse per-shard deltas, combined across data replicas so tables
    # stay identical (dense psum this round; sparse all-to-all later)
    din = (
        jnp.zeros_like(emb_in)
        .at[center]
        .add(-lr * d_ci * scale_ci[:, None])
    )
    dout = (
        jnp.zeros_like(emb_out)
        .at[context]
        .add(-lr * d_co * scale_co[:, None])
        .at[neg_ids]
        .add(-lr * d_no * scale_no[:, None])
    )
    emb_in = emb_in + jax.lax.psum(din, "data")
    emb_out = emb_out + jax.lax.psum(dout, "data")
    return emb_in, emb_out, acc_in, acc_out, loss


_STEP_SPECS = dict(
    in_specs=(
        P(None, "model"),
        P(None, "model"),
        P(),
        P(),
        P("data", None),
        P(),
        P(),
        P(),
        P(),
        P(),
    ),
    out_specs=(P(None, "model"), P(None, "model"), P(), P(), P()),
)


@functools.lru_cache(maxsize=16)
def _build_sharded_step(
    mesh: Mesh,
    dim: int,
    window: int,
    negatives: int,
    shared_negatives: int,
    shrink_window: bool,
):
    """Construct and cache the jitted shard_map program for one config."""

    def shard_fn(emb_in, emb_out, acc_in, acc_out, walks_shard, key, lr,
                 ns_alias, ns_prob, vocab_mask):
        return _col_step(
            emb_in, emb_out, acc_in, acc_out, walks_shard, key, lr,
            ns_alias, ns_prob, vocab_mask,
            dim=dim, window=window, negatives=negatives,
            shared_negatives=shared_negatives, shrink_window=shrink_window,
        )

    mapped = shard_map(shard_fn, mesh=mesh, check_vma=False, **_STEP_SPECS)
    return jax.jit(mapped, donate_argnums=(0, 1, 2, 3))


@functools.lru_cache(maxsize=8)
def _build_col_epoch(
    mesh: Mesh,
    dim: int,
    batch_local: int,
    n_batches: int,
    window: int,
    negatives: int,
    shared_negatives: int,
    shrink_window: bool,
    min_lr: float,
):
    """One EPOCH of TP×DP training as a single jit dispatch: per-data-shard
    on-device shuffle, then lax.scan over batches with on-device LR decay
    (the single-device trainer's ``sgns_epoch`` pattern; round-1 VERDICT
    weak item 4 — the per-batch host loop's dispatch overhead dominated)."""

    def shard_fn(emb_in, emb_out, acc_in, acc_out, corpus_l, key, step0,
                 lr0, lr_slope, ns_alias, ns_prob, vocab_mask):
        d_idx = jax.lax.axis_index("data")
        # per-shard shuffle, identical across model replicas of a data shard
        k_sh = jax.random.fold_in(jax.random.fold_in(key, 0x5F5E2), d_idx)
        corpus_l = corpus_l[jax.random.permutation(k_sh, corpus_l.shape[0])]

        def body(carry, b):
            emb_in, emb_out, acc_in, acc_out = carry
            gstep = step0 + b
            lr = jnp.maximum(lr0 - lr_slope * gstep.astype(jnp.float32), min_lr)
            wb = jax.lax.dynamic_slice_in_dim(
                corpus_l, b * batch_local, batch_local, axis=0
            )
            emb_in, emb_out, acc_in, acc_out, loss = _col_step(
                emb_in, emb_out, acc_in, acc_out, wb,
                jax.random.fold_in(key, gstep), lr, ns_alias, ns_prob,
                vocab_mask,
                dim=dim, window=window, negatives=negatives,
                shared_negatives=shared_negatives,
                shrink_window=shrink_window,
            )
            return (emb_in, emb_out, acc_in, acc_out), loss

        (emb_in, emb_out, acc_in, acc_out), losses = jax.lax.scan(
            body,
            (emb_in, emb_out, acc_in, acc_out),
            jnp.arange(n_batches, dtype=jnp.int32),
        )
        return emb_in, emb_out, acc_in, acc_out, losses

    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(None, "model"),
            P(None, "model"),
            P(),
            P(),
            P("data", None),
            P(), P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(P(None, "model"), P(None, "model"), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0, 1, 2, 3))


def col_sgns_epoch(
    mesh: Mesh,
    state: ShardedSGNSState,
    corpus: jax.Array,  # [n_batches*batch, L+1] sharded P('data', None)
    key: jax.Array,
    step0,
    lr0,
    lr_slope,
    ns_alias: jax.Array,
    ns_prob: jax.Array,
    vocab_mask: jax.Array,
    *,
    batch_local: int,
    n_batches: int,
    window: int,
    negatives: int,
    shared_negatives: int,
    shrink_window: bool,
    min_lr: float,
):
    """One epoch of column-sharded TP×DP SGNS in a single jit dispatch.

    Returns (new_state, losses [n_batches]); host traffic is scalars only.
    """
    fn = _build_col_epoch(
        mesh, state.emb_in.shape[1], batch_local, n_batches, window,
        negatives, shared_negatives, shrink_window, float(min_lr),
    )
    emb_in, emb_out, acc_in, acc_out, losses = fn(
        state.emb_in, state.emb_out, state.acc_in, state.acc_out,
        corpus, key, jnp.int32(step0), jnp.float32(lr0),
        jnp.float32(lr_slope), ns_alias, ns_prob, vocab_mask,
    )
    return ShardedSGNSState(emb_in, emb_out, acc_in, acc_out), losses


def sharded_sgns_step(
    mesh: Mesh,
    state: ShardedSGNSState,
    walks: jax.Array,  # [B, L+1] int32, B divisible by n_data
    key: jax.Array,
    lr: jax.Array,
    ns_alias: jax.Array,  # [V] replicated
    ns_prob: jax.Array,
    vocab_mask: jax.Array,
    *,
    window: int,
    negatives: int,
    shared_negatives: int,
    shrink_window: bool,
):
    """One TP×DP training step. Returns (new_state, loss)."""
    step = _build_sharded_step(
        mesh, state.emb_in.shape[1], window, negatives, shared_negatives,
        shrink_window,
    )
    emb_in, emb_out, acc_in, acc_out, loss = step(
        state.emb_in,
        state.emb_out,
        state.acc_in,
        state.acc_out,
        walks,
        key,
        lr,
        ns_alias,
        ns_prob,
        vocab_mask,
    )
    return ShardedSGNSState(emb_in, emb_out, acc_in, acc_out), loss
