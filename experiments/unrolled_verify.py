"""Verify the unrolled shared-mask dense step is bit-identical to production
and re-time both with more reps (follow-up to dense_profile.py's 2.4x).

Run on the chip: python experiments/unrolled_verify.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from node2vec_tpu.graph.csr import build_csr
from node2vec_tpu.walk import dense

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
starts = jnp.arange(W, dtype=jnp.int32) % V
gids = jnp.arange(W, dtype=jnp.int32)
seed = jnp.uint32(7)


def sync(x):
    return int(jnp.sum(jnp.where(x >= 0, 1, 0)))


def run(name, fn):
    t0 = time.time()
    out = fn(packed, starts, gids, seed, walk_length=L,
             return_param=0.25, inout_param=4.0)
    sync(out)
    compile_s = time.time() - t0
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        out = fn(packed, starts, gids, seed, walk_length=L,
                 return_param=0.25, inout_param=4.0)
    sync(out)
    dt = (time.time() - t0) / reps
    print(f"{name:12s} compile={compile_s:.1f}s {dt*1e3:7.2f}ms "
          f"{dt/(W*L)*1e9:5.1f}ns/step {W*L/dt/1e6:6.1f}M steps/s")
    return np.asarray(out)


# both variants defined locally so the script is independent of whichever
# formulation dense.py currently ships
def allpairs(rows, prev_rows):
    return (rows[:, :, None] == prev_rows[:, None, :]).any(-1)


def unrolled(rows, prev_rows):
    m = jnp.zeros(rows.shape, bool)
    for j in range(prev_rows.shape[1]):
        m = m | (rows == prev_rows[:, j : j + 1])
    return m


orig = dense.shared_neighbor_mask
results = {}
for name, mask_fn in (("allpairs", allpairs), ("unrolled", unrolled)):
    dense.shared_neighbor_mask = mask_fn
    chunk_fn = jax.jit(
        dense.dense_walk_chunk_impl,
        static_argnames=("walk_length", "return_param", "inout_param"),
    )
    results[name] = run(name, chunk_fn)
dense.shared_neighbor_mask = orig

ok = (results["allpairs"] == results["unrolled"]).all()
print("bit-identical:", ok)
assert ok
