"""Vectorized segment search primitives for the walk engine.

The reference tests shared-neighborship with a Python ``set`` per walker
(``/root/reference/node2vec/randomwalk.py:226``, ``spark.py:143``).  On TPU the
neighbor lists are sorted CSR segments (the reference sorts them too,
``spark.py:298``), so membership is a batched binary search — O(log deg) fully
vectorized lanes instead of per-row hashing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def searchsorted_in_segments(
    values: jax.Array,
    start: jax.Array,
    length: jax.Array,
    sorted_data: jax.Array,
    n_iters: int = 32,
) -> jax.Array:
    """Batched lower_bound of ``values[i]`` within ``sorted_data[start[i]:start[i]+length[i]]``.

    Returns [W] int32 global positions (in [start, start+length]) of the first
    element >= value. ``n_iters`` must be >= ceil(log2(max segment length)); 32
    covers any int32-indexable segment.
    """
    lo = start
    hi = start + length

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) >> 1
        # Guard mid for empty segments (lo==hi): clamp into array bounds.
        mid_safe = jnp.clip(mid, 0, sorted_data.shape[0] - 1)
        go_right = sorted_data[mid_safe] < values
        new_lo = jnp.where((lo < hi) & go_right, mid + 1, lo)
        new_hi = jnp.where((lo < hi) & ~go_right, mid, hi)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
    return lo


def contains_in_segments(
    values: jax.Array,
    start: jax.Array,
    length: jax.Array,
    sorted_data: jax.Array,
    n_iters: int = 32,
) -> jax.Array:
    """Batched membership test: is ``values[i]`` present in the i-th sorted segment?"""
    pos = searchsorted_in_segments(values, start, length, sorted_data, n_iters)
    in_range = pos < start + length
    pos_safe = jnp.clip(pos, 0, sorted_data.shape[0] - 1)
    return in_range & (sorted_data[pos_safe] == values)


def prefix_sums(x: jax.Array, matmul_max_width: int = 128) -> jax.Array:
    """Row-wise inclusive prefix sums for inverse-CDF sampling.

    ``jnp.cumsum`` lowers to a reduce-window on TPU, which profiled as ~27%
    of the dense walk step; for narrow rows an upper-triangular-ones matmul
    on the MXU is 1.3x faster end-to-end and bit-identical at
    Precision.HIGHEST (experiments/dense_variants.py).  Wide rows keep
    cumsum — the [P, P] matmul grows quadratically.
    """
    p = x.shape[-1]
    if p > matmul_max_width:
        return jnp.cumsum(x, axis=-1)
    tri = jnp.triu(jnp.ones((p, p), x.dtype))
    return jnp.dot(
        x,
        tri,
        preferred_element_type=x.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
