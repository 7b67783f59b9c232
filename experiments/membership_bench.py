"""Which formulation of the [W, P] shared-neighbor mask is fastest on TPU?

The dense engine's biased step costs ~27ns/walker-step of which ~8.3ns is
shared_neighbor_mask's all-pairs [W, P, P] compare (experiments/
dense_profile.py, round 3).  If XLA materializes the [W, P, P] intermediate
that's W*P*P bytes of HBM traffic; reformulations that keep everything
[W, P]-shaped may fuse better.

Run standalone on the chip: python experiments/membership_bench.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

W, P, reps = 131072, 64, 20
rng = np.random.default_rng(0)
# sorted rows with PAD at the tail, like the packed adjacency
PAD = np.int32(np.iinfo(np.int32).max)


def make_rows():
    r = np.sort(rng.integers(0, 131072, (W, P)).astype(np.int32), axis=1)
    k = rng.integers(8, P, W)
    r[np.arange(P)[None, :] >= k[:, None]] = PAD
    return jnp.asarray(r)


rows, prev = make_rows(), make_rows()


def allpairs(rows, prev):
    return (rows[:, :, None] == prev[:, None, :]).any(-1)


def unrolled(rows, prev):
    m = jnp.zeros(rows.shape, bool)
    for j in range(P):
        m = m | (rows == prev[:, j : j + 1])
    return m


def chunked8(rows, prev):
    m = jnp.zeros(rows.shape, bool)
    for j in range(0, P, 8):
        m = m | (rows[:, :, None] == prev[:, None, j : j + 8]).any(-1)
    return m


def scanned(rows, prev):
    def body(j, m):
        col = jax.lax.dynamic_slice_in_dim(prev, j, 1, axis=1)
        return m | (rows == col)

    return jax.lax.fori_loop(0, P, body, jnp.zeros(rows.shape, bool))


def rolled(rows, prev):
    # merge-style: rotate prev across all P offsets, compare lane-aligned.
    # Covers all pairs like allpairs but via P lane-aligned [W, P] compares
    # of ROTATED operands (roll is cheap on TPU, compare is elementwise).
    m = jnp.zeros(rows.shape, bool)
    pr = prev
    for _ in range(P):
        m = m | (rows == pr)
        pr = jnp.roll(pr, 1, axis=1)
    return m


variants = {
    "allpairs": allpairs,
    "unrolled": unrolled,
    "chunked8": chunked8,
    "scanned": scanned,
    "rolled": rolled,
}

ref = None
for name, fn in variants.items():
    jf = jax.jit(fn)
    out = jf(rows, prev)
    out.block_until_ready()
    if ref is None:
        ref = np.asarray(out)
    else:
        assert (np.asarray(out) == ref).all(), f"{name} WRONG"
    t0 = time.time()
    for _ in range(reps):
        out = jf(rows, prev)
        out.block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"{name:10s} {dt*1e3:7.2f}ms  {dt/W*1e9:6.2f}ns/walker")
