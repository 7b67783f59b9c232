"""Host<->device transfer weather through the attached-chip tunnel.

Round-5 design inputs (BASELINE.md): the staged/full-config paths depend on
h2d slab uploads and the pipelined striped d2h readback.  Both directions
turned out to be strongly time-varying ("weather"), so this probe records a
snapshot: single-stream h2d at several sizes, threaded d2h aggregation, and
whether threading helps h2d too (it shapes whether build_blocked_graph
should upload its 7 GiB of packed tables in striped parallel chunks — the
scale-23 pack wall was 151s against ~40s of host work, pointing at the
upload).

Run: python experiments/transfer_bench.py
"""

from __future__ import annotations

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def h2d_once(mb: int) -> float:
    x = np.ones((mb, 1 << 18), np.float32)  # mb MiB
    t0 = time.perf_counter()
    d = jax.device_put(x)
    jax.block_until_ready(d)
    dt = time.perf_counter() - t0
    del d
    return mb / 1024 / dt


def h2d_threaded(total_mb: int, n_threads: int) -> float:
    per = total_mb // n_threads
    xs = [np.ones((per, 1 << 18), np.float32) for _ in range(n_threads)]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(n_threads) as ex:
        ds = list(ex.map(jax.device_put, xs))
    jax.block_until_ready(ds)
    dt = time.perf_counter() - t0
    del ds
    return total_mb / 1024 / dt


def d2h_threaded(total_mb: int, n_threads: int) -> float:
    per = total_mb // n_threads
    ds = [jax.device_put(np.ones((per, 1 << 18), np.float32))
          for _ in range(n_threads)]
    jax.block_until_ready(ds)
    t0 = time.perf_counter()
    with ThreadPoolExecutor(n_threads) as ex:
        list(ex.map(np.asarray, ds))
    dt = time.perf_counter() - t0
    del ds
    return total_mb / 1024 / dt


def main():
    out = {}
    for mb in (256, 1024):
        g = h2d_once(mb)
        log(f"h2d single {mb}MiB: {g:.2f} GiB/s")
        out[f"h2d_single_{mb}mb_gibs"] = round(g, 3)
    for nt in (4, 8):
        g = h2d_threaded(1024, nt)
        log(f"h2d {nt} threads 1GiB: {g:.2f} GiB/s")
        out[f"h2d_{nt}t_gibs"] = round(g, 3)
    for nt in (1, 16):
        g = d2h_threaded(256, nt)
        log(f"d2h {nt} threads 256MiB: {g*1024:.1f} MiB/s")
        out[f"d2h_{nt}t_mibs"] = round(g * 1024, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
