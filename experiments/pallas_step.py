"""Pallas-fused bias+sample stage for the dense biased walk: measure whether
a VMEM-resident kernel (membership compares in vector masks, MXU prefix
sums, no int8 intermediates) beats XLA's lowering of the same math.

Baseline (experiments/unrolled_ab.py, v5e): full biased step 22.6ns of which
~8.3ns is the shared-neighbor membership and ~2-3ns bias/select overhead.
The kernel replaces everything after the row gather:

    XLA:    packed = packed_adj[cur]          (one [W, 2P] row gather)
    Pallas: (nxt, total) = fused(packed, prev_rows, prev, u)
    XLA:    paths/cur/prev/prev_rows bookkeeping

Not bit-identical to the XLA path (total = cdf[:, -1] instead of a separate
sum; reduction-order ulps can flip boundary picks) — validity and transition
distribution are the correctness bar here.

Run on the chip: python experiments/pallas_step.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from node2vec_tpu.graph.csr import build_csr
from node2vec_tpu.walk import dense
from node2vec_tpu.ops.hashrng import hash_uniform

V, E, W, L = 131072, 2 * 1024 * 1024, 131072, 40
P_CAP = 0.25
Q_CAP = 4.0
rng = np.random.default_rng(0)
src = rng.integers(0, V, E).astype(np.int32)
dst = rng.integers(0, V, E).astype(np.int32)
keep = src != dst
indptr, indices, weights = build_csr(
    np.concatenate([src[keep], dst[keep]]),
    np.concatenate([dst[keep], src[keep]]),
    np.ones(2 * int(keep.sum()), np.float32),
    V,
)
packed_np = dense.build_padded_adjacency(indptr, indices, weights)
packed = jnp.asarray(packed_np)
P = packed.shape[1] // 2
starts = jnp.arange(W, dtype=jnp.int32) % V
gids = jnp.arange(W, dtype=jnp.int32)
seed = jnp.uint32(7)

BLOCK = 512


def _fused_kernel(packed_ref, prev_rows_ref, prev_ref, u_ref, nxt_ref,
                  total_ref, *, p_cols, inv_p, inv_q, membership):
    pad = jnp.int32(np.iinfo(np.int32).max)
    rows = packed_ref[:, :p_cols]
    wts = pltpu.bitcast(packed_ref[:, p_cols:], jnp.float32)
    prev = prev_ref[:]  # [B, 1]
    back = rows == prev
    if membership == "unroll":
        # P unrolled compares — Mosaic stack-allocates every temp, so BLOCK
        # must stay small (74MB scoped-vmem OOM at BLOCK=2048)
        shared = jnp.zeros(rows.shape, dtype=jnp.bool_)
        for j in range(p_cols):
            shared = shared | (rows == prev_rows_ref[:, j : j + 1])
    else:
        # roll-based: 2 live buffers; covers all pairs via P lane rotations.
        # NOTE: Mosaic fails to legalize scf.for here ("failed to legalize
        # operation 'scf.for'") — kept for reference, do not select.
        def body(k, carry):
            m, pr = carry
            return m | (rows == pr), pltpu.roll(pr, 1, axis=1)

        shared, _ = jax.lax.fori_loop(
            0, p_cols,
            body,
            (jnp.zeros(rows.shape, dtype=jnp.bool_), prev_rows_ref[:]),
        )
    bias = jnp.where(back, inv_p, jnp.where(shared, 1.0, inv_q))
    bias = jnp.where(prev < 0, 1.0, bias)
    bw = wts * bias
    # prefix sums on the MXU: [B, P] @ upper-triangular ones [P, P]
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (p_cols, p_cols), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (p_cols, p_cols), 1)
    ).astype(jnp.float32)
    cdf = jax.lax.dot_general(
        bw, tri, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    total = cdf[:, p_cols - 1 : p_cols]
    u = u_ref[:] * total
    degree = jnp.sum((rows != pad).astype(jnp.int32), axis=1, keepdims=True)
    idx = jnp.minimum(
        jnp.sum((cdf < u).astype(jnp.int32), axis=1, keepdims=True),
        jnp.maximum(degree - 1, 0),
    )
    col = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    nxt_ref[:] = jnp.sum(jnp.where(col == idx, rows, 0), axis=1, keepdims=True)
    total_ref[:] = total


def fused_stage(packed_rows, prev_rows, prev, u, *, p_cols, inv_p, inv_q,
                membership, block):
    n_w = packed_rows.shape[0]
    kernel = functools.partial(
        _fused_kernel, p_cols=p_cols, inv_p=inv_p, inv_q=inv_q,
        membership=membership,
    )
    grid = (n_w // block,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            pl.BlockSpec((block, 2 * p_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, p_cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_w, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_w, 1), jnp.float32),
        ],
    )(packed_rows, prev_rows, prev, u)


def pallas_walk_impl(packed_adj, starts, gids, seed, *, walk_length,
                     return_param, inout_param, membership, block):
    n_walkers = starts.shape[0]
    gidsu = gids.astype(jnp.uint32)
    p_cols = packed_adj.shape[1] // 2
    inv_p = float(1.0 / return_param)
    inv_q = float(1.0 / inout_param)

    alive0 = starts >= 0
    paths0 = jnp.full((n_walkers, walk_length + 1), -1, dtype=jnp.int32)
    paths0 = paths0.at[:, 0].set(jnp.where(alive0, starts, -1))

    def one_step(t, carry):
        paths, cur, prev, prev_rows, alive = carry
        cur_safe = jnp.where(alive, cur, 0)
        packed_r = packed_adj[cur_safe]
        rows = packed_r[:, :p_cols]
        u = hash_uniform(seed, gidsu, t.astype(jnp.uint32))
        nxt2, total2 = fused_stage(
            packed_r, prev_rows, prev[:, None], u[:, None],
            p_cols=p_cols, inv_p=inv_p, inv_q=inv_q,
            membership=membership, block=block,
        )
        nxt = nxt2[:, 0]
        alive = alive & (total2[:, 0] > 0)
        paths = jax.lax.dynamic_update_index_in_dim(
            paths, jnp.where(alive, nxt, -1), t + 1, axis=1
        )
        prev = jnp.where(alive, cur, prev)
        cur = jnp.where(alive, nxt, cur)
        prev_rows = jnp.where(alive[:, None], rows, prev_rows)
        return paths, cur, prev, prev_rows, alive

    prev0 = jnp.full((n_walkers,), -1, dtype=jnp.int32)
    cur0 = jnp.where(alive0, starts, 0)
    prev_rows0 = jnp.full((n_walkers, p_cols), dense.PAD_ID, dtype=jnp.int32)
    paths, *_ = jax.lax.fori_loop(
        0, walk_length, one_step, (paths0, cur0, prev0, prev_rows0, alive0)
    )
    return paths


def sync(x):
    return int(jnp.sum(jnp.where(x >= 0, 1, 0)))


pallas_walk = jax.jit(
    pallas_walk_impl,
    static_argnames=("walk_length", "return_param", "inout_param",
                     "membership", "block"),
)

variants = {
    "xla": lambda: dense.dense_walk_chunk(
        packed, starts, gids, seed,
        walk_length=L, return_param=P_CAP, inout_param=Q_CAP),
    "pl_unroll512": lambda: pallas_walk(
        packed, starts, gids, seed,
        walk_length=L, return_param=P_CAP, inout_param=Q_CAP,
        membership="unroll", block=512),
    "pl_unroll1024": lambda: pallas_walk(
        packed, starts, gids, seed,
        walk_length=L, return_param=P_CAP, inout_param=Q_CAP,
        membership="unroll", block=1024),
}

outs = {}
for name, fn in variants.items():
    t0 = time.time()
    outs[name] = fn()
    sync(outs[name])
    print(f"compile {name}: {time.time()-t0:.1f}s", flush=True)

for rnd in range(3):
    line = []
    for name, fn in variants.items():
        t0 = time.time()
        for _ in range(5):
            out = fn()
        sync(out)
        dt = (time.time() - t0) / 5
        line.append(f"{name}={dt/(W*L)*1e9:5.1f}ns ({W*L/dt/1e6:5.1f}M/s)")
    print(f"round {rnd}: " + "  ".join(line), flush=True)

# correctness: identical starts; walks valid; near-match vs XLA
a, b = np.asarray(outs["xla"]), np.asarray(outs["pl_unroll512"])
c = np.asarray(outs["pl_unroll1024"])
print("pallas variants bit-identical:", (b == c).all())
assert (a[:, 0] == b[:, 0]).all()
# every consecutive pair must be an edge (sampled check, 2000 walkers)
idx_check = rng.integers(0, W, 2000)
row_sets = {}
bad = 0
for w in idx_check:
    path = b[w][b[w] >= 0]
    for x, y in zip(path[:-1], path[1:]):
        x = int(x)
        if x not in row_sets:
            row_sets[x] = set(indices[indptr[x]:indptr[x + 1]].tolist())
        if int(y) not in row_sets[x]:
            bad += 1
print(f"invalid transitions in 2000 sampled pallas walks: {bad}")
match = (a == b).all(axis=1).mean()
print(f"walks identical to XLA engine: {match:.4f} (ulp ties may differ)")
assert bad == 0
