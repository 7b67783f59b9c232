"""Gather issue cost vs TABLE SIZE at the blocked engine's row width.

Round-4 VERDICT weak item 2 / do-item 10: the walk roofline pins gathers at
a flat 22ns/row (measured at 131k rows in round 1), but the north-star
fraction-of-floor reads 0.77 at 8.4M vertices with the gap unexplained.
This measures the actual per-row gather cost of the engine's access shape —
random row gathers from an [V, 128] int32 table (512B rows, the light-table
fetch) — across table sizes up to north-star scale, so the bench floor can
use a size-dependent curve instead of a constant.

Methodology: W=131072 random indices per gather (the bench walker chunk), 8
dependent gathers chained per timed step (index derived from the previous
fetch, like the walk loop's entry gather), median of 5 steady-state timings,
scalar-readback sync.

Run: python experiments/gather_curve.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def bench_gather(n_rows: int, width: int = 128, n_chain: int = 8,
                 w: int = 131072) -> float:
    """ns per gathered row for chained random gathers from [n_rows, width]."""
    table = jnp.asarray(
        np.random.default_rng(0).integers(
            0, n_rows, (n_rows, width), dtype=np.int32
        )
    )
    idx0 = jnp.asarray(
        np.random.default_rng(1).integers(0, n_rows, w, dtype=np.int32)
    )

    # table must be an ARGUMENT, not a closure: closed-over arrays are
    # serialized into the program and a 64MB+ constant overflows the
    # remote-compile request (HTTP 413)
    @jax.jit
    def step(tbl, idx):
        for _ in range(n_chain):
            rows = tbl[idx]
            # dependent: next indices come from the fetched rows (mod V)
            idx = (rows[:, 0] ^ rows[:, 64]) % n_rows
        return idx

    out = step(table, idx0)
    float(jnp.sum(out))  # compile + sync
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = step(table, out)
        float(jnp.sum(out))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    ns = med / (n_chain * w) * 1e9
    log(f"rows={n_rows:>9,} width={width}: {ns:6.1f} ns/row "
        f"({med*1e3:.1f}ms / {n_chain}x{w})")
    return ns


def main():
    out = {}
    for scale in (17, 19, 21, 23):
        n_rows = 1 << scale
        out[str(n_rows)] = round(bench_gather(n_rows), 2)
    print(json.dumps({"gather_ns_by_rows_w128": out}))


if __name__ == "__main__":
    main()
