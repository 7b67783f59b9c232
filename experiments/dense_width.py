"""Does widening the dense packed row change the in-loop walk step cost?

The intersection-bounded fast path (round 3) wants K shared-slot bytes per
edge inline in the packed row: 2P -> 2P + P*K/4 lanes.  The gather cost
model ("flat up to ~1KB") came from pipelined standalone throughput; the
walk loop chains gathers sequentially, so measure IN the loop: pad the
table with extra zero lanes whose (always 0.0) sum is folded into `total`
— bit-identical walks, XLA can't elide the fetch.

Run on the chip: python experiments/dense_width.py
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
base = dense.build_padded_adjacency(indptr, indices, weights)
P = base.shape[1] // 2


def walk(packed_adj, starts, gids, seed, extra_lanes):
    n_w = starts.shape[0]
    gidsu = gids.astype(jnp.uint32)
    p_cols = P
    inv_p, inv_q = jnp.float32(1 / 0.25), jnp.float32(1 / 4.0)
    alive0 = starts >= 0
    paths0 = jnp.full((n_w, L + 1), -1, jnp.int32).at[:, 0].set(starts)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (n_w, p_cols), 1)

    def one_step(t, carry):
        paths, cur, prev, prev_rows, alive = carry
        packed_row = packed_adj[jnp.where(alive, cur, 0)]
        rows = packed_row[:, :p_cols]
        wts = jax.lax.bitcast_convert_type(
            packed_row[:, p_cols : 2 * p_cols], jnp.float32
        )
        first_order = prev < 0
        back = rows == prev[:, None]
        shared = dense.shared_neighbor_mask(rows, prev_rows)
        bias = jnp.where(back, inv_p, jnp.where(shared, 1.0, inv_q))
        bias = jnp.where(first_order[:, None], 1.0, bias)
        bw = wts * bias
        total = jnp.sum(bw, axis=1)
        if extra_lanes:
            # zero lanes in the table: result-identical, fetch not elidable
            total = total + jnp.sum(
                jax.lax.bitcast_convert_type(
                    packed_row[:, 2 * p_cols :], jnp.float32
                ),
                axis=1,
            )
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
        0, L, one_step,
        (paths0, jnp.where(alive0, starts, 0),
         jnp.full((n_w,), -1, jnp.int32), prev_rows0, alive0),
    )
    return paths


starts = jnp.arange(W, dtype=jnp.int32) % V
gids = jnp.arange(W, dtype=jnp.int32)
seed = jnp.uint32(7)

ref = None
for extra in (0, P // 2, P, 2 * P):
    tab = np.concatenate(
        [base, np.zeros((V, extra), np.int32)], axis=1
    ) if extra else base
    tabj = jnp.asarray(tab)
    fn = jax.jit(lambda a, s, g, sd, e=extra: walk(a, s, g, sd, e))
    out = fn(tabj, starts, gids, seed)
    out.block_until_ready()
    if ref is None:
        ref = np.asarray(out)
    else:
        assert (np.asarray(out) == ref).all(), "walks changed!"
    t0 = time.time()
    for _ in range(5):
        out = fn(tabj, starts, gids, seed)
        out.block_until_ready()
    dt = (time.time() - t0) / 5
    lanes = 2 * P + extra
    print(f"row {lanes:4d} lanes ({lanes*4:5d}B): {dt*1e3:7.2f}ms "
          f"{dt/(W*L)*1e9:5.1f}ns/step")
    del tabj
