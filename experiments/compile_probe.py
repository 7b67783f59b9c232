"""Where do the multi-minute walk-kernel compiles go? (VERDICT weak #1)

Times cold compiles (fresh cache dir) of progressively closer approximations
of the dense walk kernel to isolate the expensive construct.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def t(label, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{label:50s} {dt:8.1f}s", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    W, P, L = 2500, 64, 10
    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.integers(0, 100, (500, 2 * P)).astype(np.int32))
    starts = jnp.asarray(rng.integers(0, 500, W).astype(np.int32))
    key = jax.random.key(0)

    # a) trivial baseline
    t("matmul 128x128", jax.jit(lambda x: x @ x), jnp.ones((128, 128)))

    # b) plain fori_loop with a gather body
    def fori_gather(tab, s, k):
        def body(i, c):
            cur, k = c
            row = tab[cur]
            k, ku = jax.random.split(k)
            u = jax.random.uniform(ku, (W,))
            nxt = row[:, 0] + (u * P).astype(jnp.int32)
            return jnp.clip(nxt, 0, 499), k
        cur, _ = jax.lax.fori_loop(0, L, body, (s, k))
        return cur
    t("fori(10) gather body", jax.jit(fori_gather), packed, starts, key)

    # c) the real dense kernel, unbiased, wl=10
    from node2vec_tpu.walk.dense import dense_walk_chunk_impl
    f = jax.jit(
        lambda a, s, k: dense_walk_chunk_impl(
            a, s, k, walk_length=10, return_param=1.0, inout_param=1.0
        )
    )
    t("dense unbiased wl=10", f, packed, starts, key)

    # d) dense unbiased wl=2  (does cost scale with loop length?)
    f2 = jax.jit(
        lambda a, s, k: dense_walk_chunk_impl(
            a, s, k, walk_length=2, return_param=1.0, inout_param=1.0
        )
    )
    t("dense unbiased wl=2", f2, packed, starts, key)

    # e) dense biased wl=10
    f3 = jax.jit(
        lambda a, s, k: dense_walk_chunk_impl(
            a, s, k, walk_length=10, return_param=0.25, inout_param=4.0
        )
    )
    t("dense biased wl=10", f3, packed, starts, key)

    # f) repeat (c) different W — warm-process recompile cost
    starts2 = jnp.asarray(rng.integers(0, 500, W * 2).astype(np.int32))
    t("dense unbiased wl=10 W*2 (warm process)", f, packed, starts2, key)


if __name__ == "__main__":
    main()
