"""Microbenchmarks for TPU gather primitives that the walk engines lean on.

Questions this answers (feeds the heavy-tail engine design):
  1. ns per gathered ROW as a function of row width (8B .. 4KB) — is the cost
     per-row overhead or bandwidth?
  2. scalar [W] gathers from an [E]-sized table vs table size.
  3. dependent gather chains (binary-search shape) vs the same number of
     independent gathers.
  4. XLA sort throughput at walker-chunk sizes (for bucketing designs).

Run on the real chip: python experiments/gather_bench.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x))  # scalar readback forces completion via tunnel


def timeit(fn, *args, reps=20):
    fn(*args)  # compile
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    print("devices:", jax.devices())
    W = 131072
    rng = np.random.default_rng(0)

    # 1. row gathers: [W, C] from [N, C], random rows, ~1GB table
    #    (C < 128 is omitted: TPU tiling pads the last dim to 128 lanes, so a
    #    narrow 2D table physically occupies 128-wide rows — measured via an
    #    OOM on s32[2^27, 2] claiming 64GB)
    print("\n-- row gather [W, C] from [N, C] (total table ~1GB) --")
    for C in [128, 256, 512, 1024]:
        N = (1 << 28) // C  # 1GB of int32
        table = jnp.arange(N * C, dtype=jnp.int32).reshape(N, C)
        idx = jnp.asarray(rng.integers(0, N, W).astype(np.int32))
        f = jax.jit(lambda t, i: jnp.sum(t[i], dtype=jnp.int32))
        dt = timeit(f, table, idx)
        print(
            f"C={C:5d} rowB={C*4:6d} {dt*1e9/W:8.1f} ns/row "
            f"{W*C*4/dt/1e9:8.2f} GB/s"
        )
        del table

    # 1b. narrow "rows" as flat 1D + dynamic_slice gather (slice_sizes=(C,))
    print("\n-- flat gather: C contiguous elems from 1D [2^28] --")
    L = 1 << 28
    flat = jnp.arange(L, dtype=jnp.int32)
    for C in [1, 4, 8, 32, 128]:
        offs = jnp.asarray((rng.integers(0, L // C, W) * C).astype(np.int32))
        f = jax.jit(
            lambda t, o, C=C: jnp.sum(
                jax.vmap(lambda s: jax.lax.dynamic_slice(t, (s,), (C,)))(o),
                dtype=jnp.int32,
            )
        )
        dt = timeit(f, flat, offs)
        print(f"C={C:4d} {dt*1e9/W:8.1f} ns/row {W*C*4/dt/1e9:8.2f} GB/s")
    del flat

    # 2. scalar gathers vs table size
    print("\n-- scalar gather [W] from [E] --")
    for E in [1 << 17, 1 << 21, 1 << 25, 1 << 28]:
        table = jnp.arange(E, dtype=jnp.int32)
        idx = jnp.asarray(rng.integers(0, E, W).astype(np.int32))
        f = jax.jit(lambda t, i: jnp.sum(t[i], dtype=jnp.int32))
        dt = timeit(f, table, idx)
        print(f"E=2^{int(np.log2(E)):2d} {dt*1e9/W:8.1f} ns/elem")

    # 3. dependent chain of D scalar gathers vs D independent ones
    print("\n-- chains: D gathers, dependent vs independent --")
    E = 1 << 25
    table = jnp.asarray(rng.integers(0, E, E).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, E, W).astype(np.int32))
    for D in [4, 14]:
        def dep(t, i, D=D):
            x = i
            for _ in range(D):
                x = t[x]
            return jnp.sum(x, dtype=jnp.int32)

        def indep(t, i, D=D):
            acc = jnp.int32(0)
            for k in range(D):
                acc = acc + jnp.sum(t[(i + k) & (E - 1)], dtype=jnp.int32)
            return acc

        dt_d = timeit(jax.jit(dep), table, idx)
        dt_i = timeit(jax.jit(indep), table, idx)
        print(
            f"D={D:3d} dependent {dt_d*1e9/W:8.1f} ns/walker "
            f"independent {dt_i*1e9/W:8.1f} ns/walker"
        )

    # 4. sort at walker scale (key-value)
    print("\n-- sort [W] key + value --")
    keys = jnp.asarray(rng.integers(0, 8, W).astype(np.int32))
    vals = jnp.arange(W, dtype=jnp.int32)
    f = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1)[1])
    dt = timeit(f, keys, vals)
    print(f"sort W={W}: {dt*1e3:.2f} ms ({dt*1e9/W:.1f} ns/elem)")

    # 5. one wide gather + in-register CDF select (dense-engine step shape)
    print("\n-- [W,2C] gather + cumsum-select (dense step core) --")
    for C in [128, 256]:
        N = (1 << 27) // C
        table = jnp.arange(N * 2 * C, dtype=jnp.int32).reshape(N, 2 * C)
        idx = jnp.asarray(rng.integers(0, N, W).astype(np.int32))
        key = jax.random.key(0)

        def f(t, i, k, C=C):
            packed = t[i]
            w = jax.lax.bitcast_convert_type(packed[:, C:], jnp.float32)
            w = jnp.abs(w) + 1.0
            tot = jnp.sum(w, axis=1)
            u = jax.random.uniform(k, (W,)) * tot
            cdf = jnp.cumsum(w, axis=1)
            j = jnp.minimum(jnp.sum((cdf < u[:, None]).astype(jnp.int32), 1), C - 1)
            iota = jax.lax.broadcasted_iota(jnp.int32, (W, C), 1)
            nxt = jnp.sum(jnp.where(iota == j[:, None], packed[:, :C], 0), 1)
            return jnp.sum(nxt, dtype=jnp.int32)

        dt = timeit(jax.jit(f), table, idx, key)
        print(f"C={C}: {dt*1e9/W:8.1f} ns/walker-step")


if __name__ == "__main__":
    main()
