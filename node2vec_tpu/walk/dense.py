"""Dense (padded-adjacency) walk engine: the TPU-native fast path.

The CSR rejection engine (engine.py) is O(1) per proposal but pays for random
scalar gathers and a binary-search chain per membership test — access patterns
TPUs hate.  This engine trades memory for vectorization: neighbor lists are
stored as a dense ``[V, P]`` matrix (P = next power of two >= max degree,
sorted rows, INT32_MAX padding, zero weight padding).  A walk step is then:

  1. two row gathers ``[W, P]`` (neighborhoods of cur and prev) — the
     embedding-lookup pattern TPUs do well;
  2. the node2vec bias for ALL neighbors at once: back-edge mask, shared-
     neighbor mask via an all-pairs lane compare ``[W, P, P]`` (XLA fuses the
     reduction; pure VPU work, no gathers);
  3. **exact** inverse-CDF sampling over the biased weights: cumsum along P,
     one uniform, count-compare, one-hot select.

No rejection loop, no approximation, no scalar gathers.  Cost is O(P²) VPU
ops per walker-step, so this engine is selected when max degree <= a cap
(default 256; hotspot trimming usually guarantees far less) and the CSR
engine remains the fallback for heavy-tailed graphs.

Semantics identical to the reference walk (SURVEY.md §2.6): first-order step
0, sink death, p/q bias classes per ``randomwalk.py:218-231``.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

PAD_ID = np.int32(np.iinfo(np.int32).max)  # keeps rows sorted; never equals a real id


def build_padded_adjacency(
    indptr: np.ndarray, indices: np.ndarray, weights: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """CSR -> dense [V, P] (ids, weights); P = next pow2 >= max degree (min 8)."""
    degrees = np.diff(indptr)
    max_deg = int(degrees.max()) if len(degrees) else 0
    p = 8
    while p < max_deg:
        p *= 2
    n_vertices = len(indptr) - 1
    pad_nbrs = np.full((n_vertices, p), PAD_ID, dtype=np.int32)
    pad_w = np.zeros((n_vertices, p), dtype=np.float32)
    # vectorized fill: position of each CSR entry within its row
    if len(indices):
        row = np.repeat(np.arange(n_vertices), degrees)
        col = np.arange(len(indices)) - np.repeat(indptr[:-1], degrees)
        pad_nbrs[row, col] = indices
        pad_w[row, col] = weights
    return pad_nbrs, pad_w


def dense_walk_chunk_impl(
    pad_nbrs: jax.Array,  # [V, P] int32, sorted rows, PAD_ID padding
    pad_w: jax.Array,  # [V, P] f32, 0 padding
    starts: jax.Array,  # [W] int32, negative = dead lane
    key: jax.Array,
    *,
    walk_length: int,
    return_param: float,
    inout_param: float,
) -> jax.Array:
    """Exact biased walks; returns [W, walk_length+1] int32 (-1 padded)."""
    n_walkers = starts.shape[0]
    p_cols = pad_nbrs.shape[1]
    inv_p = jnp.float32(1.0 / return_param)
    inv_q = jnp.float32(1.0 / inout_param)
    uniform_bias = return_param == 1.0 and inout_param == 1.0

    alive0 = starts >= 0
    paths0 = jnp.full((n_walkers, walk_length + 1), -1, dtype=jnp.int32)
    paths0 = paths0.at[:, 0].set(jnp.where(alive0, starts, -1))
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (n_walkers, p_cols), 1)

    def one_step(t, carry):
        paths, cur, prev, alive, key = carry
        cur_safe = jnp.where(alive, cur, 0)
        rows = pad_nbrs[cur_safe]  # [W, P]
        wts = pad_w[cur_safe]

        if uniform_bias:
            bw = wts
        else:
            first_order = prev < 0
            prev_safe = jnp.where(first_order, 0, prev)
            prev_rows = pad_nbrs[prev_safe]  # [W, P]
            back = rows == prev[:, None]
            shared = (rows[:, :, None] == prev_rows[:, None, :]).any(-1)
            bias = jnp.where(back, inv_p, jnp.where(shared, 1.0, inv_q))
            bias = jnp.where(first_order[:, None], 1.0, bias)
            bw = wts * bias  # pads carry zero weight

        total = jnp.sum(bw, axis=1)
        alive = alive & (total > 0)

        key, k_u = jax.random.split(key)
        u = jax.random.uniform(k_u, (n_walkers,)) * total
        cdf = jnp.cumsum(bw, axis=1)
        idx = jnp.minimum(
            jnp.sum((cdf < u[:, None]).astype(jnp.int32), axis=1), p_cols - 1
        )
        nxt = jnp.sum(
            jnp.where(col_iota == idx[:, None], rows, 0), axis=1
        )  # one-hot select (take_along_axis lowers poorly on TPU)

        paths = jax.lax.dynamic_update_index_in_dim(
            paths, jnp.where(alive, nxt, -1), t + 1, axis=1
        )
        prev = jnp.where(alive, cur, prev)
        cur = jnp.where(alive, nxt, cur)
        return paths, cur, prev, alive, key

    prev0 = jnp.full((n_walkers,), -1, dtype=jnp.int32)
    cur0 = jnp.where(alive0, starts, 0)
    paths, _, _, _, _ = jax.lax.fori_loop(
        0, walk_length, one_step, (paths0, cur0, prev0, alive0, key)
    )
    return paths


dense_walk_chunk = jax.jit(
    dense_walk_chunk_impl,
    static_argnames=("walk_length", "return_param", "inout_param"),
)
