"""Interleaved A/B timing of allpairs vs unrolled shared mask in the dense
biased walk — controls for chip-grant speed drift over a process lifetime
(unrolled_verify.py saw 22.1ns for both where dense_profile.py saw 23.1 vs
9.5 in a different process).

Run on the chip: python experiments/unrolled_ab.py
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


def allpairs(rows, prev_rows):
    return (rows[:, :, None] == prev_rows[:, None, :]).any(-1)


def unrolled(rows, prev_rows):
    m = jnp.zeros(rows.shape, bool)
    for j in range(prev_rows.shape[1]):
        m = m | (rows == prev_rows[:, j : j + 1])
    return m


fns = {}
for name, mask_fn in (("allpairs", allpairs), ("unrolled", unrolled)):
    dense.shared_neighbor_mask = mask_fn
    fns[name] = jax.jit(
        dense.dense_walk_chunk_impl,
        static_argnames=("walk_length", "return_param", "inout_param"),
    )
    # compile now (separate jit objects trace independently; mask binding is
    # captured at trace time)
    t0 = time.time()
    sync(fns[name](packed, starts, gids, seed, walk_length=L,
                   return_param=0.25, inout_param=4.0))
    print(f"compile {name}: {time.time()-t0:.1f}s", flush=True)

for rnd in range(4):
    line = []
    for name in ("allpairs", "unrolled"):
        t0 = time.time()
        for _ in range(5):
            out = fns[name](packed, starts, gids, seed, walk_length=L,
                            return_param=0.25, inout_param=4.0)
        sync(out)
        dt = (time.time() - t0) / 5
        line.append(f"{name}={dt/(W*L)*1e9:5.1f}ns")
    print(f"round {rnd}: " + "  ".join(line), flush=True)
