"""Breakdown of the dense biased walk step cost on the real chip.

Hypothesis (round 3): the ~11ns/step gap between biased (35.4ns) and
unbiased (24.3ns) dense walks is the [W, P, P] all-pairs shared-neighbor
compare — if XLA materializes the [W, P, P] intermediate it moves
W*P*P bytes of HBM traffic per step (131k*64*64 = 537MB ~= 10ns/walker
at ~50-80GB/s effective).

Variants timed (same graph, same chunk):
  full      — the production biased step
  noshare   — shared mask replaced by a constant False (no all-pairs)
  nobias    — uniform p=q=1 (no membership, no bias multiply)
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from node2vec_tpu.graph.csr import build_csr
from node2vec_tpu.walk import dense
from node2vec_tpu.ops.hashrng import hash_uniform
from node2vec_tpu.ops.sampling import prefix_sums

V, E, W, L = 131072, 2 * 1024 * 1024, 131072, 40
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
packed = jnp.asarray(dense.build_padded_adjacency(indptr, indices, weights))
P = packed.shape[1] // 2
print(f"P={P} rows={packed.shape} bytes/row={packed.shape[1]*4}")

starts = jnp.arange(W, dtype=jnp.int32) % V
gids = jnp.arange(W, dtype=jnp.int32)
seed = jnp.uint32(7)


def make_variant(mode):
    def impl(packed_adj, starts, gids, seed):
        n_w = starts.shape[0]
        gidsu = gids.astype(jnp.uint32)
        p_cols = packed_adj.shape[1] // 2
        inv_p, inv_q = jnp.float32(1 / 0.25), jnp.float32(1 / 4.0)
        alive0 = starts >= 0
        paths0 = jnp.full((n_w, L + 1), -1, jnp.int32).at[:, 0].set(starts)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (n_w, p_cols), 1)

        def one_step(t, carry):
            paths, cur, prev, prev_rows, alive = carry
            packed_row = packed_adj[jnp.where(alive, cur, 0)]
            rows = packed_row[:, :p_cols]
            wts = jax.lax.bitcast_convert_type(packed_row[:, p_cols:], jnp.float32)
            if mode == "nobias":
                bw = wts
            else:
                first_order = prev < 0
                back = rows == prev[:, None]
                if mode == "noshare":
                    shared = jnp.zeros_like(back)
                elif mode == "full_unrolled":
                    # P lane-aligned [W, P] compares: never builds [W, P, P]
                    shared = jnp.zeros_like(back)
                    for j in range(p_cols):
                        shared = shared | (rows == prev_rows[:, j : j + 1])
                else:
                    shared = dense.shared_neighbor_mask(rows, prev_rows)
                bias = jnp.where(back, inv_p, jnp.where(shared, 1.0, inv_q))
                bias = jnp.where(first_order[:, None], 1.0, bias)
                bw = wts * bias
            total = jnp.sum(bw, axis=1)
            alive = alive & (total > 0)
            u = hash_uniform(seed, gidsu, t.astype(jnp.uint32)) * total
            cdf = prefix_sums(bw)
            degree = jnp.sum((rows != dense.PAD_ID).astype(jnp.int32), axis=1)
            idx = jnp.minimum(
                jnp.sum((cdf < u[:, None]).astype(jnp.int32), axis=1),
                jnp.maximum(degree - 1, 0),
            )
            nxt = jnp.sum(jnp.where(col_iota == idx[:, None], rows, 0), axis=1)
            paths = jax.lax.dynamic_update_index_in_dim(
                paths, jnp.where(alive, nxt, -1), t + 1, axis=1
            )
            prev = jnp.where(alive, cur, prev)
            cur = jnp.where(alive, nxt, cur)
            prev_rows = jnp.where(alive[:, None], rows, prev_rows)
            return paths, cur, prev, prev_rows, alive

        prev_rows0 = jnp.full((n_w, p_cols), dense.PAD_ID, jnp.int32)
        paths, *_ = jax.lax.fori_loop(
            0, L, one_step, (paths0, jnp.where(alive0, starts, 0),
                             jnp.full((n_w,), -1, jnp.int32), prev_rows0, alive0)
        )
        return paths

    return jax.jit(impl)


def sync(x):
    # block_until_ready can no-op through the axon tunnel — force a scalar
    # readback (verify skill gotcha list)
    return int(jnp.sum(jnp.where(x >= 0, 1, 0)))


for mode in ("nobias", "noshare", "full", "full_unrolled"):
    fn = make_variant(mode)
    t0 = time.time()
    sync(fn(packed, starts, gids, seed))
    compile_s = time.time() - t0
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        out = fn(packed, starts, gids, seed)
    sync(out)
    dt = (time.time() - t0) / reps
    ns = dt / (W * L) * 1e9
    print(f"{mode:8s} compile={compile_s:.1f}s steady={dt*1e3:.2f}ms "
          f"{ns:.1f}ns/step {W*L/dt/1e6:.1f}M steps/s")
