"""Does gather LOCALITY recover large-table throughput on TPU?

ROADMAP round-2 item 3: SGNS pair-updates/s drops ~2x once the embedding
table passes ~1M rows (XLA row-gather slows down).  Walk corpora are
degree-skewed, so renumbering vertices by descending frequency would
concentrate the hot rows in a small prefix of the table.  Before building
that, measure whether concentration actually helps the gather:

  for V in {128k, 2M, 8M}: gather W=131k rows of [V, 128] f32 under
    uniform   — indices uniform over V (the status quo at 2M+)
    hot5      — 95% of indices in the first 5% of rows (degree-renumbered)
    hot1      — 95% of indices in the first 1% of rows
    seq       — sorted uniform indices (upper bound: perfect locality)

Run on the real chip: python experiments/locality_bench.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args, reps=20):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    print("devices:", jax.devices())
    W = 131072
    D = 128
    rng = np.random.default_rng(0)
    f = jax.jit(lambda t, i: jnp.sum(t[i], dtype=jnp.float32))

    for V in [1 << 17, 1 << 21, 1 << 23]:
        table = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
        uni = rng.integers(0, V, W)
        hot = {}
        for frac, name in [(0.05, "hot5"), (0.01, "hot1")]:
            k = max(int(V * frac), 1)
            take_hot = rng.random(W) < 0.95
            hot[name] = np.where(
                take_hot, rng.integers(0, k, W), rng.integers(0, V, W)
            )
        cases = {
            "uniform": uni,
            **hot,
            "seq": np.sort(uni),
        }
        for name, idx in cases.items():
            dt = timeit(f, table, jnp.asarray(idx.astype(np.int32)))
            print(
                f"V=2^{int(np.log2(V)):2d} {name:8s} {dt*1e9/W:7.1f} ns/row "
                f"{W*D*4/dt/1e9:7.2f} GB/s"
            )
        del table


if __name__ == "__main__":
    main()
