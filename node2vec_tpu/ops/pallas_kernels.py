"""Pallas TPU kernels for the walk hot path.

``biased_sample_kernel`` fuses everything a dense walk step does AFTER the
frontier row gather — second-order bias classification, exact inverse-CDF
sampling, and PRNG — into one VMEM pass:

  * shared-neighbor test via P rolled lane-compares (no HBM-spilled
    [W, P, P] intermediate, no binary-search gather chains);
  * node2vec bias (reference ``randomwalk.py:218-231`` classes);
  * prefix-sum CDF via log2(P) masked rolls;
  * a uniform draw from the on-core PRNG (``pltpu.prng_random_bits``);
  * count-compare + one-hot select of the next vertex.

The XLA row gather stays outside (XLA's TPU gather is already near its
per-row floor; a kernel can't beat it without restructuring memory).  On
non-TPU backends callers use the pure-XLA math instead (walk.dense).

STATUS — measured on v5e and currently DISABLED by default: the XLA-fused
version of the same math is ~200x faster.  Mosaic keeps the P unrolled
membership compares as live sub-lane-width ([blk, P<128]) vectors, which
relayout/scalarize, and compile time is minutes.  Kept as an experimental
path (``use_pallas=True`` on the dense engine) and as the scaffold for the
planned heavy-tail segment-DMA kernel, where XLA has no good lowering at all.
The lesson matches the TPU guide: don't hand-schedule what XLA already fuses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_W = 512


def _sample_kernel(
    seed_ref,  # [1, 1] SMEM int32
    packed_ref,  # [BLK, 2P] int32: ids | bitcast f32 weights
    prev_rows_ref,  # [BLK, P] int32
    prev_ref,  # [BLK, 1] int32
    nxt_ref,  # [BLK, 1] int32 out
    total_ref,  # [BLK, 1] f32 out
    *,
    p_cols: int,
    inv_p: float,
    inv_q: float,
    uniform_bias: bool,
):
    blk = packed_ref.shape[0]
    rows = packed_ref[:, :p_cols]
    wts = pltpu.bitcast(packed_ref[:, p_cols:], jnp.float32)

    if uniform_bias:
        bw = wts
    else:
        prev = prev_ref[:, 0]
        # shared-neighbor membership: P broadcast compares against prev's row
        pr_all = prev_rows_ref[:, :]
        shared = jnp.zeros((blk, p_cols), dtype=jnp.bool_)
        for j in range(p_cols):
            shared = shared | (rows == pr_all[:, j : j + 1])
        back = rows == prev[:, None]
        bias = jnp.where(back, inv_p, jnp.where(shared, 1.0, inv_q))
        first_order = (prev < 0)[:, None]
        bias = jnp.where(first_order, 1.0, bias)
        bw = wts * bias  # padding lanes carry zero weight

    # inclusive prefix sum along lanes via log2(P) masked rolls
    lane = jax.lax.broadcasted_iota(jnp.int32, (blk, p_cols), 1)
    cdf = bw
    shift = 1
    while shift < p_cols:
        rolled = pltpu.roll(cdf, shift, axis=1)
        cdf = cdf + jnp.where(lane >= shift, rolled, 0.0)
        shift *= 2
    total = cdf[:, p_cols - 1 :]

    # one uniform per walker from the on-core PRNG
    pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    bits = pltpu.bitcast(pltpu.prng_random_bits((blk, 1)), jnp.int32)
    mantissa = jax.lax.shift_right_logical(bits, 8)  # 24 uniform bits, >= 0
    u = mantissa.astype(jnp.float32) * (1.0 / (1 << 24)) * total

    idx = jnp.minimum(
        jnp.sum((cdf < u).astype(jnp.int32), axis=1, keepdims=True),
        p_cols - 1,
    )
    nxt_ref[:, :] = jnp.sum(
        jnp.where(lane == idx, rows, 0), axis=1, keepdims=True
    )
    total_ref[:, :] = total


@functools.partial(
    jax.jit, static_argnames=("p_cols", "inv_p", "inv_q", "uniform_bias")
)
def biased_sample(
    seed,  # [] int32
    packed,  # [W, 2P] int32
    prev_rows,  # [W, P] int32
    prev,  # [W] int32
    *,
    p_cols: int,
    inv_p: float,
    inv_q: float,
    uniform_bias: bool,
):
    """Fused sampling over gathered frontier rows. Returns (nxt [W], total [W])."""
    n_walkers = packed.shape[0]
    # the unrolled membership loop keeps ~P live [blk, P->128-lane] vectors on
    # the VMEM stack; scale the block down as P grows to stay under the limit
    blk = min(BLOCK_W, max(64, (1 << 14) // p_cols), n_walkers)
    if n_walkers % blk:
        raise ValueError(f"walker count {n_walkers} not divisible by block {blk}")
    grid = (n_walkers // blk,)
    kernel = functools.partial(
        _sample_kernel,
        p_cols=p_cols,
        inv_p=inv_p,
        inv_q=inv_q,
        uniform_bias=uniform_bias,
    )
    nxt, total = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((blk, 2 * p_cols), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, p_cols), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((blk, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blk, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_walkers, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_walkers, 1), jnp.float32),
        ],
    )(
        jnp.reshape(seed.astype(jnp.int32), (1, 1)),
        packed,
        prev_rows,
        prev.reshape(-1, 1),
    )
    return nxt[:, 0], total[:, 0]
