"""Hierarchical-softmax skip-gram trainer (the reference's DEFAULT objective).

Both reference backends train HS by default: gensim with ``negative=0``
(``/root/reference/node2vec/constants.py:65``) and spark.ml's Word2Vec, which
is HS-only (invoked at ``embedding.py:240``, ``spark.py:629``).  Round 1
shipped SGNS only; this closes the objective-parity gap: set
``Word2VecParams(negative=0)`` and the trainer switches here.

Design: a Huffman tree over vertex frequencies (shorter codes for frequent
vertices, exactly word2vec's construction) gives every vertex a path of inner
nodes; P(context | center) = Π_j σ((1-2·code_j) · v_center · θ_{path_j}).
On TPU the per-pair path loop becomes dense batched einsums over a fixed
``[B, L1, CODE_LEN, D]`` gather of path vectors — padded to the max code
length with masked lanes, MXU-friendly.  HS fetches ~code_len× more rows per
pair than shared-negative SGNS, which is why SGNS stays the performance
default; HS is the parity option.

Two structural optimizations on top:

* ``cap_code_length`` caps the padded width at the count-weighted 1e-3 tail
  (deep suffixes are almost entirely masked dead weight);
* **level-shared dense head**: inner nodes are BFS-renumbered so tree levels
  are contiguous id ranges (``HuffmanTree.level_offsets``), and the first H
  levels — a few hundred nodes absorbing ~60% of the count-weighted path
  mass — are scored/updated via MXU matmuls on the ``theta[:K]`` slice
  instead of row gathers/scatters (``head_offsets`` in hs_walk_step_impl).
  Measured 1.4× (4.75 → 6.63M pairs/s at 131k vertices, dim 128), and more
  stable: head rows take ONE pre-aggregated Adagrad update per batch instead
  of a per-occurrence sum that can oscillate the root row
  (experiments/hs_head_bench.py).
"""

from __future__ import annotations

import functools
import heapq
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from node2vec_tpu.models.skipgram import (
    _log_sigmoid,
    _packed_gather,
    _packed_scatter_add,
    window_shift,
)


class HuffmanTree(NamedTuple):
    points: np.ndarray  # [V, L] int32 inner-node ids along the path (root first)
    codes: np.ndarray  # [V, L] int8 branch bits
    lengths: np.ndarray  # [V] int32 code lengths
    n_inner: int
    # inner nodes are numbered breadth-first: depth-j nodes occupy ids
    # [level_offsets[j], level_offsets[j+1]) and path position c is depth c,
    # so points[:, c] always falls in level c's contiguous range.  This is
    # what lets the trainer handle the first H levels as DENSE tables (MXU
    # matmuls) instead of row gathers — see hs_walk_step_impl.
    level_offsets: np.ndarray  # [max_depth+1] int64 cumulative level sizes


def build_huffman(counts: np.ndarray) -> HuffmanTree:
    """word2vec Huffman coding over vertex frequencies.

    Zero-count vertices get count 1 so every vertex has a valid path (they are
    masked out of training by the vocab mask anyway).

    Large vocabularies (>= 64k) route the merge through the native core's
    O(n) two-queue algorithm (word2vec.c's construction; python heapq is
    minutes of host time at north-star vertex counts) and the path
    extraction through ~CODE_LEN vectorized passes.  The two merges can
    resolve count ties differently — both are optimal Huffman codes with
    identical length multisets.
    """
    counts = np.maximum(np.asarray(counts, dtype=np.int64), 1)
    n = len(counts)
    if n == 1:
        return HuffmanTree(
            np.zeros((1, 1), np.int32), np.zeros((1, 1), np.int8),
            np.ones(1, np.int32), 1, np.array([0, 1], np.int64),
        )
    from node2vec_tpu import native

    if native.available() and n >= 65536:
        order0 = np.argsort(counts, kind="stable")
        p_s, b_s, d_s = native.huffman_merge(counts[order0])
        parent = np.empty(2 * n - 1, dtype=np.int64)
        branch = np.empty(2 * n - 1, dtype=np.int8)
        depth = np.empty(2 * n - 1, dtype=np.int32)
        parent[order0] = p_s[:n]
        branch[order0] = b_s[:n]
        depth[order0] = d_s[:n]
        parent[n:] = p_s[n:]
        branch[n:] = b_s[n:]
        depth[n:] = d_s[n:]
    else:
        # heap of (count, tiebreak, node_id); leaves 0..n-1, inner n..2n-2
        heap = [(int(c), i, i) for i, c in enumerate(counts)]
        heapq.heapify(heap)
        parent = np.zeros(2 * n - 1, dtype=np.int64)
        branch = np.zeros(2 * n - 1, dtype=np.int8)
        nxt = n
        while len(heap) > 1:
            c1, _, a = heapq.heappop(heap)
            c2, _, b = heapq.heappop(heap)
            parent[a] = nxt
            parent[b] = nxt
            branch[b] = 1
            heapq.heappush(heap, (c1 + c2, nxt, nxt))
            nxt += 1
        # Huffman allocation is bottom-up (parent id > child id), so one
        # descending pass assigns depths
        depth = np.zeros(2 * n - 1, dtype=np.int32)
        for x in range(2 * n - 3, n - 1, -1):
            depth[x] = depth[parent[x]] + 1
        depth[:n] = depth[parent[:n]] + 1
    root = 2 * n - 2
    n_inner = n - 1

    # breadth-first renumbering: stable sort by depth gives each level a
    # contiguous id range (level_offsets)
    inner_depth = depth[n:]
    order = np.argsort(inner_depth, kind="stable")
    new_id = np.empty(n_inner, dtype=np.int64)
    new_id[order] = np.arange(n_inner)
    level_offsets = np.concatenate(
        [[0], np.cumsum(np.bincount(inner_depth))]
    ).astype(np.int64)

    # leaf->root path extraction into the reversed (root-first) layout the
    # trainer consumes: threaded C++ when available (19s of numpy passes at
    # 8.4M vertices), else ~CODE_LEN vectorized numpy passes
    lengths = depth[:n].astype(np.int32)
    max_len = int(lengths.max())
    if native.available():
        points, codes = native.huffman_paths(
            parent, branch, new_id, lengths, max_len
        )
        return HuffmanTree(points, codes, lengths, n_inner, level_offsets)
    points = np.zeros((n, max_len), dtype=np.int32)
    codes = np.zeros((n, max_len), dtype=np.int8)
    node = np.arange(n, dtype=np.int64)
    active = np.arange(n, dtype=np.int64)
    for i in range(max_len):
        cols = lengths[active] - 1 - i
        keep = cols >= 0
        active = active[keep]
        cols = cols[keep]
        cur = node[active]
        points[active, cols] = new_id[parent[cur] - n]
        codes[active, cols] = branch[cur]
        node[active] = parent[cur]
    return HuffmanTree(points, codes, lengths, n_inner, level_offsets)


def cap_code_length(
    tree: HuffmanTree,
    counts: np.ndarray,
    tail_mass: float = 1e-3,
    max_len: int | None = None,
) -> HuffmanTree:
    """Cap CODE_LEN at the count-weighted tail: the smallest L whose
    truncated path entries carry <= ``tail_mass`` of the corpus-weighted
    total.

    The HS step's cost is linear in the padded CODE_LEN (the
    ``[B, L1, CODE_LEN, D]`` path tensors), but the padded max is set by the
    RAREST vertex while the corpus-weighted mean is near the entropy — so
    deep-suffix lanes are almost entirely masked-out dead weight.  Capping
    trains rare vertices on a prefix of their Huffman code (gensim's
    MAX_CODE_LENGTH=40 analogously drops long codes); frequent vertices are
    untouched, and the affected probability mass is bounded by tail_mass.

    ``max_len`` additionally applies a HARD cap regardless of tail mass —
    the documented workaround for shape-specific backend failures (one
    CL-19/10-level tree program runs on the CPU backend but fails through
    the TPU remote-compile service, BASELINE.md round 3; ``max_len=18``
    sidesteps it with bounded quality impact).
    """
    w = np.maximum(np.asarray(counts, dtype=np.float64), 0.0)
    lens = tree.lengths.astype(np.int64)
    total = float((w * lens).sum())
    tree_len = int(tree.points.shape[1])
    if total <= 0:
        if max_len is None or tree_len <= max_len:
            return tree
        cap = max_len
    else:
        for cap in range(1, tree_len + 1):
            truncated = float((w * np.maximum(lens - cap, 0)).sum())
            if truncated / total <= tail_mass:
                break
        if max_len is not None:
            cap = min(cap, max_len)
    if cap >= tree_len:
        return tree
    return HuffmanTree(
        points=np.ascontiguousarray(tree.points[:, :cap]),
        codes=np.ascontiguousarray(tree.codes[:, :cap]),
        lengths=np.minimum(tree.lengths, cap).astype(np.int32),
        n_inner=tree.n_inner,
        level_offsets=tree.level_offsets,
    )


def hs_walk_step_impl(
    emb_in: jnp.ndarray,  # [V, D]
    theta: jnp.ndarray,  # [n_inner, D] inner-node vectors
    acc_in: jnp.ndarray,  # [V]
    acc_theta: jnp.ndarray,  # [n_inner]
    walks: jnp.ndarray,  # [B, L1] int32
    key: jax.Array,
    lr: jnp.ndarray,
    hs_points: jnp.ndarray,  # [V, CL] int32
    hs_codes: jnp.ndarray,  # [V, CL] int8
    hs_len: jnp.ndarray,  # [V] int32
    vocab_mask: jnp.ndarray,
    *,
    window: int,
    shrink_window: bool,
    head_offsets: Tuple[int, ...] = (0,),
    packed: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One HS step over a walk batch (positional structure like
    sgns_walk_step_impl: per-position path gathers, shifted-window products).

    ``packed=True``: ``emb_in`` and ``theta`` arrive (and leave) in the
    packed-pair [ceil(N/2), 2D] layout (skipgram.pack_rows) — the dim-64
    half-tile gather-relayout fix.  Accumulators stay [N].  The dense head
    un-interleaves its ``theta[:k_rows]`` slice with one tiny reshape (the
    relayout pathology is a property of the BIG dynamic gathers, not of a
    static few-hundred-row slice) and widens its pre-aggregated update back
    to physical rows; odd ``k_rows`` pads the update with a zero half-row,
    which commutes with the tail scatter into that physical row.

    For each valid (center i, context i+d) pair:
      loss -= Σ_j mask_j · log σ(sgn_j · v_in[center] · θ[point_j(context)])
    with sgn = 1-2·code.

    ``head_offsets`` = tree.level_offsets[:H+1] (static): the first H tree
    levels — a few hundred inner nodes absorbing most of the count-weighted
    path mass (Huffman depth ≈ entropy, so FREQUENT vertices live entirely in
    the head) — are handled DENSELY: one ``[B·L1, D] @ [D, K]`` MXU matmul
    scores every head node against every center, per-level one-hot selects
    pick each context's path entry, and head gradients flow back through two
    matmuls onto the ``theta[:K]`` slice.  Only path levels >= H pay the
    per-row gather/scatter.  Head rows get ONE pre-aggregated Adagrad update
    per batch (vs per-occurrence for tail rows) — a deliberate divergence:
    the root appears in every pair, and summing its sq-grads per occurrence
    only inflates the accumulator faster.
    """
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
            return t.at[idx].add(upd)
    cl = hs_points.shape[1]
    n_head = min(len(head_offsets) - 1, cl)  # head levels handled densely
    k_rows = int(head_offsets[n_head])  # dense head table rows
    clt = cl - n_head  # gathered tail width
    k_shrink = key

    walks_safe = jnp.where(walks >= 0, walks, 0)
    valid_pos = (walks >= 0) & vocab_mask[walks_safe]
    x_in = t_gather(emb_in, walks_safe)  # [B, L1, D]
    x_bf = x_in.astype(jnp.bfloat16)
    pts = hs_points[walks_safe]  # [B, L1, CL] — path of each position's vertex
    cds = hs_codes[walks_safe].astype(jnp.float32)
    plen = hs_len[walks_safe]
    pmask = (
        jax.lax.broadcasted_iota(jnp.int32, (n_walks, length, cl), 2)
        < plen[..., None]
    ).astype(jnp.float32)
    sgn = 1.0 - 2.0 * cds  # [B, L1, CL]

    # the [B, L1, CLT, D] path tensors dominate HBM traffic — hold them in
    # bfloat16 (masters stay fp32; logits/loss accumulate fp32 via
    # preferred_element_type, so only gradient *storage* is rounded)
    theta_bf = theta.astype(jnp.bfloat16)
    pts_t = pts[:, :, n_head:]
    th = t_gather(theta_bf, pts_t) if clt else None  # the big tail gather
    if n_head:
        if packed:  # un-interleave the static head slice: [kp, 2D] -> [K, D]
            kp = (k_rows + 1) // 2
            t_head = jax.lax.slice_in_dim(theta_bf, 0, kp, axis=0).reshape(
                2 * kp, dim
            )[:k_rows]
        else:
            t_head = jax.lax.slice_in_dim(theta_bf, 0, k_rows, axis=0)  # [K, D]
        # every head node scored against every center position, once
        l_head = jnp.einsum(
            "bld,kd->blk", x_bf, t_head, preferred_element_type=jnp.float32
        )
        dl_sum = jnp.zeros((n_walks, length, k_rows), jnp.bfloat16)

    offsets = [d for d in range(-window, window + 1) if d != 0]
    if shrink_window:
        b_sh = jax.random.randint(k_shrink, (n_walks, length), 1, window + 1)
    else:
        b_sh = jnp.full((n_walks, length), window, dtype=jnp.int32)

    def shift(x, d, fill=0):
        return window_shift(x, d, window, length, fill)

    g_in = jnp.zeros_like(x_in)
    g_th = jnp.zeros_like(th) if clt else None  # bf16 tail accumulator
    loss = jnp.float32(0.0)
    n_pairs = jnp.float32(0.0)

    for d in offsets:
        sgn_c = shift(sgn, d)
        pm_c = shift(pmask, d)
        pv = (valid_pos & shift(valid_pos, d) & (abs(d) <= b_sh)).astype(
            jnp.float32
        )
        n_pairs = n_pairs + jnp.sum(pv)
        m = pv[..., None] * pm_c  # [B, L1, CL]

        if clt:
            th_c = shift(th, d)  # context's tail path vectors at the center
            # logits over the tail path: fp32 accumulation on the MXU
            logit = jnp.einsum(
                "bld,blcd->blc", x_bf, th_c,
                preferred_element_type=jnp.float32,
            )
            sgn_t = sgn_c[:, :, n_head:]
            m_t = m[:, :, n_head:]
            loss = loss - jnp.sum(_log_sigmoid(sgn_t * logit) * m_t)
            # d/dlogit of -logσ(s·x) = σ(x) - t with 0/1 target t = (1+s)/2
            # (code 0 → s=+1 → target 1; code 1 → s=-1 → target 0)
            g = (jax.nn.sigmoid(logit) - (1.0 + sgn_t) / 2.0) * m_t
            g_bf = g.astype(jnp.bfloat16)
            g_in = g_in + jnp.einsum(
                "blc,blcd->bld", g_bf, th_c,
                preferred_element_type=jnp.float32,
            )
            g_th = g_th + shift(
                jnp.einsum("blc,bld->blcd", g_bf, x_bf,
                           preferred_element_type=jnp.bfloat16),
                -d,
            )

        if n_head:
            sel = shift(pts[:, :, :n_head], d)  # context's head path ids
            dl_levels = []
            for j in range(n_head):
                lo, hi = int(head_offsets[j]), int(head_offsets[j + 1])
                idx = sel[:, :, j] - lo  # level-local id, [B, L1]
                oh = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (n_walks, length, hi - lo), 2
                    )
                    == idx[..., None]
                )
                lj = jax.lax.slice_in_dim(l_head, lo, hi, axis=2)
                logit_j = jnp.sum(jnp.where(oh, lj, 0.0), axis=-1)
                sgn_j = sgn_c[:, :, j]
                m_j = m[:, :, j]
                loss = loss - jnp.sum(
                    _log_sigmoid(sgn_j * logit_j) * m_j
                )
                g_j = (jax.nn.sigmoid(logit_j) - (1.0 + sgn_j) / 2.0) * m_j
                dl_levels.append(
                    jnp.where(oh, g_j[..., None], 0.0).astype(jnp.bfloat16)
                )
            dl_sum = dl_sum + jnp.concatenate(dl_levels, axis=2)

    n_pairs = jnp.maximum(n_pairs, 1.0)
    loss = loss / n_pairs

    # row-wise Adagrad
    eps = 1e-12
    lr = jnp.asarray(lr, jnp.float32)
    rows = walks_safe.reshape(-1)
    row_valid = (walks >= 0).reshape(-1).astype(jnp.float32)

    if n_head:
        # dense head closure: two matmuls replace the per-row gather/scatter
        g_in = g_in + jnp.einsum(
            "blk,kd->bld", dl_sum, t_head, preferred_element_type=jnp.float32
        )
        d_head = jnp.einsum(
            "blk,bld->kd", dl_sum, x_bf, preferred_element_type=jnp.float32
        )  # [K, D] pre-aggregated head gradient
        acc_theta = acc_theta.at[:k_rows].add(
            jnp.mean(d_head * d_head, axis=-1)
        )
        scale_h = jax.lax.rsqrt(
            jax.lax.slice_in_dim(acc_theta, 0, k_rows, axis=0) + eps
        )
        upd_h = -lr * d_head * scale_h[:, None]  # [K, D]
        if packed:  # widen back to physical rows; odd K pads a zero half-row
            if k_rows % 2:
                upd_h = jnp.concatenate(
                    [upd_h, jnp.zeros((1, dim), upd_h.dtype)], axis=0
                )
            theta = theta.at[: (k_rows + 1) // 2].add(
                upd_h.reshape(-1, 2 * dim)
            )
        else:
            theta = theta.at[:k_rows].add(upd_h)

    g_in_flat = g_in.reshape(-1, dim)
    sq_in = jnp.mean(g_in_flat * g_in_flat, axis=-1) * row_valid
    acc_in = acc_in.at[rows].add(sq_in)
    scale_in = jax.lax.rsqrt(acc_in[rows] + eps) * row_valid
    emb_in = t_add(emb_in, rows, -lr * g_in_flat * scale_in[:, None])

    if clt:
        prow = pts_t.reshape(-1)
        g_th_flat = g_th.reshape(-1, dim).astype(jnp.float32)
        th_valid = (
            pmask[:, :, n_head:].reshape(-1) > 0
        ).astype(jnp.float32) * jnp.repeat(row_valid, clt)
        sq_th = jnp.mean(g_th_flat * g_th_flat, axis=-1) * th_valid
        acc_theta = acc_theta.at[prow].add(sq_th)
        scale_th = jax.lax.rsqrt(acc_theta[prow] + eps) * th_valid
        theta = t_add(theta, prow, -lr * g_th_flat * scale_th[:, None])
    return emb_in, theta, acc_in, acc_theta, loss


# Largest per-device theta table measured SAFE under the dense head at
# full code length.  The round-5 scale-23 bench crashed the TPU worker at
# runtime in the staged HS epoch; bisection (experiments/
# hs_crash_bisect.py, BASELINE.md round 5) shows the fault needs the
# CONJUNCTION {~8.4M-row donated theta} x {dense head} x {CL ~18}:
# V=2M/4.2M with head+CL18 PASS, V=8.39M without head at CL18 PASSES,
# V=8.39M with head at CL10 PASSES, V=8.39M with head at CL18 dies.
# It is not memory pressure (AOT peak 11.6/16 GiB) and not the round-3
# compile fault (this one executes, then kills the worker).  Until the
# lowering fault is understood, trainers auto-disable the head above the
# measured-safe table size — HS keeps its full code length at north-star
# scale and pays the ~1.4x head speedup back.
DENSE_HEAD_MAX_ROWS = 4_194_304


def head_level_offsets(
    tree: HuffmanTree, max_rows: int = 512, table_rows: int | None = None
) -> Tuple[int, ...]:
    """Static head split for hs_walk_step_impl: the longest level prefix
    whose dense table stays within ``max_rows`` inner nodes (and within the
    padded path width).  Returns (0,) when no dense head applies — always
    pass ``table_rows`` (the PER-DEVICE theta row count) so the
    DENSE_HEAD_MAX_ROWS runtime-fault guard can apply."""
    if table_rows is not None and table_rows > DENSE_HEAD_MAX_ROWS:
        return (0,)
    off = tree.level_offsets
    cl = tree.points.shape[1]
    h = 0
    while h < len(off) - 1 and h < cl and off[h + 1] <= max_rows:
        h += 1
    return tuple(int(x) for x in off[: h + 1])


def _hs_epoch_impl(
    emb_in, theta, acc_in, acc_theta, corpus, key, step0, lr0, lr_slope,
    hs_points, hs_codes, hs_len, vocab_mask, *,
    batch: int, n_batches: int, window: int, shrink_window: bool,
    min_lr: float, head_offsets: Tuple[int, ...] = (0,),
    packed: bool = False,
):
    """A whole HS epoch inside one jit (lax.scan), like sgns_epoch."""

    def body(state, b):
        emb_in, theta, acc_in, acc_theta = state
        gstep = step0 + b
        lr = jnp.maximum(lr0 - lr_slope * gstep.astype(jnp.float32), min_lr)
        wb = jax.lax.dynamic_slice_in_dim(corpus, b * batch, batch, axis=0)
        emb_in, theta, acc_in, acc_theta, loss = hs_walk_step_impl(
            emb_in, theta, acc_in, acc_theta, wb,
            jax.random.fold_in(key, gstep), lr,
            hs_points, hs_codes, hs_len, vocab_mask,
            window=window, shrink_window=shrink_window,
            head_offsets=head_offsets, packed=packed,
        )
        return (emb_in, theta, acc_in, acc_theta), loss

    state, losses = jax.lax.scan(
        body,
        (emb_in, theta, acc_in, acc_theta),
        jnp.arange(n_batches, dtype=jnp.int32),
    )
    return (*state, losses)


_hs_epoch_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "batch", "n_batches", "window", "shrink_window", "min_lr",
        "head_offsets", "packed",
    ),
    donate_argnames=("emb_in", "theta", "acc_in", "acc_theta"),
)(_hs_epoch_impl)


def hs_epoch(emb_in, theta, acc_in, acc_theta, *args, **kwargs):
    """Whole-epoch HS trainer.  DONATES its four state buffers — callers
    must thread the returned ``(emb_in, theta, acc_in, acc_theta, losses)``
    state into the next call.  On backends that support donation (TPU) the
    passed-in buffers are consumed; reusing them previously died at execute
    time with an opaque INVALID_ARGUMENT (BASELINE.md round 3), so misuse
    is now caught here with a clear error."""
    for name, x in (
        ("emb_in", emb_in), ("theta", theta),
        ("acc_in", acc_in), ("acc_theta", acc_theta),
    ):
        try:
            deleted = isinstance(x, jax.Array) and x.is_deleted()
        except Exception:  # tracers inside jit have no buffer state
            deleted = False
        if deleted:
            raise ValueError(
                f"hs_epoch: state argument '{name}' was already donated to "
                "a previous hs_epoch call (its device buffer is deleted). "
                "Thread the returned state instead of reusing inputs: "
                "emb_in, theta, acc_in, acc_theta, losses = hs_epoch(...)"
            )
    return _hs_epoch_jit(emb_in, theta, acc_in, acc_theta, *args, **kwargs)
