"""Blocked-CSR walk engine: the TPU-native heavy-tail fast path.

The dense engine (walk/dense.py) is one row-gather per walker-step but pads
every vertex to the graph's max degree — unusable for heavy-tail graphs
(max_deg 10k ⇒ 128KB rows).  The CSR rejection engine (walk/engine.py) covers
any degree but was measured 60× slower on skewed graphs.  Round-1 profiling
(experiments/gather_bench.py) found the real cost model on TPU:

  * one XLA row gather costs ~20-40ns per row regardless of width (512B-4KB),
  * dependent gather chains pipeline as well as independent ones,
  * the CSR engine's cliff is its SYNCHRONOUS rejection loop: every step,
    131k walkers wait for the slowest lane's rejection tail (~20 rounds when
    the mean is ~2) — per-step cost is max-over-lanes, not mean.

This engine is built around those facts:

1. **Two-table adjacency.** Light vertices (deg <= P) live in a dense
   ``[V, 3P]`` row (sorted ids | weights | reverse-edge weights) — one gather
   fetches a light vertex's whole neighborhood.  Heavy vertices get
   fixed-width blocks ``[NB, 3C]`` plus a 128-lane meta row (block-mass CDF +
   per-block min ids), so any operation on a heavy vertex is "one meta gather
   + one block gather", never a O(max_deg) row.
2. **Exact hierarchical inverse-CDF proposals** (no alias tables): level 1
   picks the block from the meta CDF, the residual of the SAME uniform picks
   the slot inside the gathered block — exactly ∝ edge weight.
3. **Reverse-edge weights stored per edge** so the next step's back-edge mass
   w(cur→prev) rides along with the proposal — zero extra gathers for the
   1/p mixture branch (engine.py burns a binary search chain on it).
4. **Asynchronous step advancement**: each walker carries its own step
   counter; a lane that rejects retries next iteration while its neighbors
   advance.  Per-iteration cost is flat (4 row gathers), so total cost tracks
   the MEAN rejection count, not the max.
5. **Counter-based per-walker RNG** (ops/hashrng.py): walk content is
   invariant to chunking and sharding layout.

Sampling semantics are identical to the reference per-step alias tables
(``/root/reference/node2vec/randomwalk.py:218-231``): step 0 first-order
(``randomwalk.py:320-321``), back/shared/other bias classes {1/p, 1, 1/q},
sink death, validated by the chi-square transition tests.  The mixture
decomposition (back-edge as an explicit atom) keeps the rejection bound at
max(1, 1/q) instead of max(1/p, 1, 1/q).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from node2vec_tpu.ops.hashrng import hash_uniform

PAD_ID = np.int32(np.iinfo(np.int32).max)  # sorts above any real id
MAX_BLOCKS = 62  # meta row budget: 4 header + 62 CDF + 62 min lanes = 128


class BlockedGraph(NamedTuple):
    """Device arrays for the blocked engine (see build_blocked_graph)."""

    light: jnp.ndarray  # [V, 3P] int32: ids | w bits | rev-w bits (heavy: sentinel)
    meta: jnp.ndarray  # [H, 128] int32 heavy-vertex meta rows
    blocks: jnp.ndarray  # [NB, 3C] int32 heavy-vertex neighbor blocks
    light_width: int  # P
    block_width: int  # C
    has_heavy: bool

    @property
    def n_vertices(self) -> int:
        return self.light.shape[0]


def build_blocked_graph(
    indptr: np.ndarray,
    indices: np.ndarray,
    weights: np.ndarray,
    light_width: int | None = None,
    block_width: int | None = None,
) -> BlockedGraph:
    """Host-side packing of a sorted CSR graph into the two-table layout.

    Meta row layout ([128] int32 lanes):
      [0] block_start  [1] n_blocks  [2] wtot (f32 bits)  [3] degree
      [4:66]  inclusive block-mass CDF (f32 bits; padded with wtot)
      [66:128] per-block minimum neighbor id (padded with INT32_MAX)
    """
    indptr = np.asarray(indptr, dtype=np.int64)
    indices = np.asarray(indices, dtype=np.int32)
    weights = np.asarray(weights, dtype=np.float32)
    n_v = len(indptr) - 1
    n_e = len(indices)
    deg = np.diff(indptr)
    max_deg = int(deg.max()) if n_v else 0

    # reverse-edge weights: rev_w[i] = w(dst_i -> src_i), 0 if absent.
    # CSR order (src asc, dst asc within row) makes src*V+dst keys sorted.
    src_rep = np.repeat(np.arange(n_v, dtype=np.int64), deg)
    keys = src_rep * n_v + indices
    rkeys = indices.astype(np.int64) * n_v + src_rep
    pos = np.searchsorted(keys, rkeys)
    pos_c = np.minimum(pos, max(n_e - 1, 0))
    found = (pos < n_e) & (keys[pos_c] == rkeys) if n_e else np.zeros(0, bool)
    rev_w = np.where(found, weights[pos_c], np.float32(0.0)).astype(np.float32)

    if light_width is None:
        p95 = float(np.percentile(deg, 95)) if n_v else 8.0
        light_width = int(min(256, max(8, 1 << int(np.ceil(np.log2(max(p95, 1.0)))))))
    p_l = light_width
    heavy = deg > p_l
    n_heavy = int(heavy.sum())
    if block_width is None:
        need = -(-max_deg // MAX_BLOCKS) if n_heavy else 1
        block_width = max(256, 1 << int(np.ceil(np.log2(max(need, 1)))))
    c = block_width
    if max_deg > MAX_BLOCKS * c:
        raise ValueError(
            f"max degree {max_deg} exceeds the blocked engine's "
            f"{MAX_BLOCKS}x{c} capacity; trim hotspots (max_out_degree) or "
            f"raise block_width"
        )

    zero_bits = np.float32(0.0).view(np.int32)
    col = np.arange(n_e, dtype=np.int64) - np.repeat(indptr[:-1], deg)

    light = np.empty((n_v, 3 * p_l), dtype=np.int32)
    light[:, :p_l] = PAD_ID
    light[:, p_l:] = zero_bits
    e_light = np.repeat(~heavy, deg)
    lr = src_rep[e_light]
    lc = col[e_light]
    light[lr, lc] = indices[e_light]
    light[lr, p_l + lc] = weights[e_light].view(np.int32)
    light[lr, 2 * p_l + lc] = rev_w[e_light].view(np.int32)

    rank = np.cumsum(heavy) - 1  # heavy rank per vertex (valid where heavy)
    hv = np.flatnonzero(heavy)
    light[hv, 0] = (-(rank[hv] + 2)).astype(np.int32)

    nb = -(-deg[hv] // c) if n_heavy else np.zeros(0, np.int64)
    block_start = np.concatenate([[0], np.cumsum(nb)])
    n_blocks = max(int(block_start[-1]), 1)
    blocks = np.empty((n_blocks, 3 * c), dtype=np.int32)
    blocks[:, :c] = PAD_ID
    blocks[:, c:] = zero_bits
    if n_heavy:
        e_heavy = np.repeat(heavy, deg)
        hr = block_start[rank[src_rep[e_heavy]]] + col[e_heavy] // c
        hc = col[e_heavy] % c
        blocks[hr, hc] = indices[e_heavy]
        blocks[hr, c + hc] = weights[e_heavy].view(np.int32)
        blocks[hr, 2 * c + hc] = rev_w[e_heavy].view(np.int32)

    meta = np.zeros((max(n_heavy, 1), 128), dtype=np.int32)
    meta[:, 66:] = PAD_ID
    if n_heavy:
        cw = np.concatenate([[0.0], np.cumsum(weights, dtype=np.float64)])
        starts = indptr[hv]
        ends = indptr[hv + 1]
        # per-block boundaries [H, MAX_BLOCKS+1], clipped to the row end
        bpos = np.minimum(
            starts[:, None] + np.arange(MAX_BLOCKS + 1, dtype=np.int64) * c,
            ends[:, None],
        )
        cum = (cw[bpos[:, 1:]] - cw[starts, None]).astype(np.float32)
        meta[:, 0] = block_start[:-1]
        meta[:, 1] = nb
        meta[:, 2] = cum[:, -1].view(np.int32)  # wtot == last CDF entry, exactly
        meta[:, 3] = deg[hv]
        meta[:, 4:66] = cum.view(np.int32)
        valid = bpos[:, :MAX_BLOCKS] < ends[:, None]
        mins = indices[np.minimum(bpos[:, :MAX_BLOCKS], max(n_e - 1, 0))]
        meta[:, 66:] = np.where(valid, mins, PAD_ID)

    return BlockedGraph(
        light=jnp.asarray(light),
        meta=jnp.asarray(meta),
        blocks=jnp.asarray(blocks),
        light_width=p_l,
        block_width=c,
        has_heavy=bool(n_heavy),
    )


def blocked_walk_chunk_impl(
    light: jax.Array,
    meta: jax.Array,
    blocks: jax.Array,
    starts: jax.Array,  # [W] int32, negative = dead padding lane
    gids: jax.Array,  # [W] int32 global walker ids (chunk-invariant RNG)
    seed: jax.Array,  # uint32 scalar
    *,
    walk_length: int,
    return_param: float,
    inout_param: float,
    max_trials: int,
    light_width: int,
    block_width: int,
    has_heavy: bool,
) -> tuple[jax.Array, jax.Array]:
    """Async blocked walks; returns (paths [W, L+1] int32, n_fallback int32).

    ``n_fallback`` counts lanes that exhausted ``max_trials`` rejections in a
    single step and accepted a plain ∝weight draw (probability mass error
    bounded by (1-α_min)^max_trials; surfaced instead of silent).
    """
    p_l = light_width
    c = block_width
    n_w = starts.shape[0]
    el = walk_length
    inv_p = jnp.float32(1.0 / return_param)
    inv_q = jnp.float32(1.0 / inout_param)
    alpha2_max = float(max(1.0, 1.0 / inout_param))
    uniform_bias = return_param == 1.0 and inout_param == 1.0
    need_membership = inout_param != 1.0

    light_iota = jax.lax.broadcasted_iota(jnp.int32, (n_w, p_l), 1)
    block_iota = jax.lax.broadcasted_iota(jnp.int32, (n_w, c), 1)
    cdf_iota = jax.lax.broadcasted_iota(jnp.int32, (n_w, MAX_BLOCKS), 1)
    path_iota = jax.lax.broadcasted_iota(jnp.int32, (n_w, el + 1), 1)
    gidsu = gids.astype(jnp.uint32)

    alive0 = starts >= 0
    paths0 = jnp.full((n_w, el + 1), -1, dtype=jnp.int32)
    paths0 = paths0.at[:, 0].set(jnp.where(alive0, starts, -1))

    def select(row: jax.Array, iota: jax.Array, idx: jax.Array) -> jax.Array:
        """One-hot row select (take_along_axis lowers poorly on TPU)."""
        return jnp.sum(jnp.where(iota == idx[:, None], row, 0), axis=1)

    def body(carry):
        (paths, t, cur, prev, w_fwd, w_back, cur_row, cur_meta, prev_row,
         prev_meta, alive, trials, need_entry, n_fb, it) = carry

        # --- entry: (re)gather the new frontier vertex's rows -------------
        entry = need_entry & alive
        lr = light[jnp.where(entry, cur, 0)]
        cur_row = jnp.where(entry[:, None], lr, cur_row)
        ids = cur_row[:, :p_l]
        is_heavy = ids[:, 0] < -1
        if has_heavy:
            rank = -ids[:, 0] - 2
            mrow = meta[jnp.where(entry & is_heavy, rank, 0)]
            cur_meta = jnp.where((entry & is_heavy)[:, None], mrow, cur_meta)
        w_light = jax.lax.bitcast_convert_type(
            cur_row[:, p_l : 2 * p_l], jnp.float32
        )
        light_deg = jnp.sum((ids != PAD_ID) & (ids >= 0), axis=1)
        if has_heavy:
            degree = jnp.where(is_heavy, cur_meta[:, 3], light_deg)
            wtot = jnp.where(
                is_heavy,
                jax.lax.bitcast_convert_type(cur_meta[:, 2], jnp.float32),
                jnp.sum(w_light, axis=1),
            )
        else:
            degree = light_deg
            wtot = jnp.sum(w_light, axis=1)
        alive = alive & ~(entry & (degree == 0))  # sink death

        first_order = t == 0
        ctr = (it * jnp.uint32(4)).astype(jnp.uint32)
        u_branch = hash_uniform(seed, gidsu, ctr)
        u_prop = hash_uniform(seed, gidsu, ctr + jnp.uint32(1))
        u_acc = hash_uniform(seed, gidsu, ctr + jnp.uint32(2))

        # --- mixture branch A: the back-edge atom (bias 1/p) --------------
        if uniform_bias:
            take_back = jnp.zeros((n_w,), dtype=bool)
            m2 = wtot
        else:
            m1 = jnp.where(first_order, 0.0, w_back * inv_p)
            m2 = wtot * jnp.float32(alpha2_max)
            take_back = u_branch < m1 / jnp.maximum(m1 + m2, 1e-30)

        # --- branch B proposal: exact hierarchical inverse-CDF ∝ weight ---
        target_l = u_prop * jnp.sum(w_light, axis=1)
        cdf_l = jnp.cumsum(w_light, axis=1)
        slot_l = jnp.sum((cdf_l < target_l[:, None]).astype(jnp.int32), axis=1)
        slot_l = jnp.minimum(slot_l, jnp.maximum(light_deg - 1, 0))
        cand_l = select(ids, light_iota, slot_l)
        w_l = select(cur_row[:, p_l : 2 * p_l], light_iota, slot_l)
        rev_l = select(cur_row[:, 2 * p_l :], light_iota, slot_l)

        if has_heavy:
            cum = jax.lax.bitcast_convert_type(cur_meta[:, 4:66], jnp.float32)
            target_h = u_prop * wtot
            blk = jnp.sum((cum < target_h[:, None]).astype(jnp.int32), axis=1)
            blk = jnp.minimum(blk, jnp.maximum(cur_meta[:, 1] - 1, 0))
            base = jnp.where(blk > 0, select(cur_meta[:, 4:66], cdf_iota, blk - 1), 0)
            residual = target_h - jax.lax.bitcast_convert_type(base, jnp.float32)
            brow = blocks[
                jnp.where(alive & is_heavy, cur_meta[:, 0] + blk, 0)
            ]
            bw = jax.lax.bitcast_convert_type(brow[:, c : 2 * c], jnp.float32)
            nvalid = jnp.sum(brow[:, :c] != PAD_ID, axis=1)
            cdf_b = jnp.cumsum(bw, axis=1)
            slot_b = jnp.sum((cdf_b < residual[:, None]).astype(jnp.int32), axis=1)
            slot_b = jnp.minimum(slot_b, jnp.maximum(nvalid - 1, 0))
            cand_h = select(brow[:, :c], block_iota, slot_b)
            w_h = select(brow[:, c : 2 * c], block_iota, slot_b)
            rev_h = select(brow[:, 2 * c :], block_iota, slot_b)
            cand = jnp.where(is_heavy, cand_h, cand_l)
            w_cand = jnp.where(is_heavy, w_h, w_l)
            rev_cand = jnp.where(is_heavy, rev_h, rev_l)
        else:
            cand, w_cand, rev_cand = cand_l, w_l, rev_l
        w_cand = jax.lax.bitcast_convert_type(w_cand, jnp.float32)
        rev_cand = jax.lax.bitcast_convert_type(rev_cand, jnp.float32)

        # --- acceptance: membership test candidate ∈ N(prev) --------------
        if uniform_bias:
            accept = jnp.ones((n_w,), dtype=bool)
        elif not need_membership:
            # q == 1: all branch-B biases are 1; only exclude the return edge
            accept = take_back | first_order | (cand != prev)
        else:
            prev_ids = prev_row[:, :p_l]
            prev_is_heavy = prev_ids[:, 0] < -1
            shared = jnp.any(prev_ids == cand[:, None], axis=1)
            if has_heavy:
                mins = prev_meta[:, 66:]
                jm = jnp.sum((mins <= cand[:, None]).astype(jnp.int32), axis=1) - 1
                jm = jnp.clip(jm, 0, jnp.maximum(prev_meta[:, 1] - 1, 0))
                mrow_b = blocks[
                    jnp.where(alive & prev_is_heavy, prev_meta[:, 0] + jm, 0)
                ]
                shared_h = jnp.any(mrow_b[:, :c] == cand[:, None], axis=1)
                shared = jnp.where(prev_is_heavy, shared_h, shared)
            bias2 = jnp.where(shared, 1.0, inv_q)
            is_return = cand == prev
            accept = take_back | first_order | (
                ~is_return & (u_acc * jnp.float32(alpha2_max) <= bias2)
            )

        # --- trial cap: bounded-bias ∝weight fallback, counted -------------
        trials = jnp.where(accept, 0, trials + 1)
        force = alive & (trials >= max_trials)
        n_fb = n_fb + jnp.sum(force & ~accept, dtype=jnp.int32)
        accept = accept | force

        # --- advance accepted lanes ----------------------------------------
        adv = alive & accept
        take = take_back & ~force
        nxt = jnp.where(take, prev, cand)
        paths = jnp.where(
            (adv[:, None]) & (path_iota == (t + 1)[:, None]), nxt[:, None], paths
        )
        # arrival-edge weights for the next step: a return hop traverses the
        # (cur->prev) edge, whose forward weight is the carried w_back and
        # whose reverse weight is the carried w_fwd — swap them.
        new_w_fwd = jnp.where(take, w_back, w_cand)
        new_w_back = jnp.where(take, w_fwd, rev_cand)
        prev = jnp.where(adv, cur, prev)
        prev_row = jnp.where(adv[:, None], cur_row, prev_row)
        if has_heavy:
            prev_meta = jnp.where(adv[:, None], cur_meta, prev_meta)
        w_fwd = jnp.where(adv, new_w_fwd, w_fwd)
        w_back = jnp.where(adv, new_w_back, w_back)
        cur = jnp.where(adv, nxt, cur)
        t = jnp.where(adv, t + 1, t)
        trials = jnp.where(adv, 0, trials)
        need_entry = adv
        alive = alive & (t < el)

        return (paths, t, cur, prev, w_fwd, w_back, cur_row, cur_meta,
                prev_row, prev_meta, alive, trials, need_entry, n_fb,
                it + jnp.uint32(1))

    def cond(carry):
        alive = carry[10]
        it = carry[14]
        return jnp.any(alive) & (it < jnp.uint32(walk_length * (max_trials + 2)))

    zeros_i = jnp.zeros((n_w,), jnp.int32)
    init = (
        paths0,
        zeros_i,  # t
        jnp.where(alive0, starts, 0),  # cur
        jnp.full((n_w,), -1, jnp.int32),  # prev
        jnp.zeros((n_w,), jnp.float32),  # w_fwd
        jnp.zeros((n_w,), jnp.float32),  # w_back
        jnp.full((n_w, 3 * p_l), PAD_ID, jnp.int32),  # cur_row
        jnp.zeros((n_w, 128), jnp.int32),  # cur_meta
        jnp.full((n_w, 3 * p_l), PAD_ID, jnp.int32),  # prev_row
        jnp.zeros((n_w, 128), jnp.int32),  # prev_meta
        alive0,
        zeros_i,  # trials
        jnp.ones((n_w,), bool),  # need_entry
        jnp.int32(0),  # n_fallback
        jnp.uint32(0),  # it
    )
    out = jax.lax.while_loop(cond, body, init)
    return out[0], out[13]


blocked_walk_chunk = jax.jit(
    blocked_walk_chunk_impl,
    static_argnames=(
        "walk_length",
        "return_param",
        "inout_param",
        "max_trials",
        "light_width",
        "block_width",
        "has_heavy",
    ),
)
