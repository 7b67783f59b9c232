"""Interleaved A/B of the shared-list 3-atom sampler vs the rejection-bound
sampler on the bench heavy-tail RMAT (the regime the reference advertises).

Run on the chip: python experiments/shared_list_bench.py
Env: SLB_SCALE (default 19), SLB_Q / SLB_P (default 4.0 / 0.25).
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
from scale_test import rmat_edges

from node2vec_tpu.graph.ingest import build_graph
from node2vec_tpu.walk.blocked import (
    build_blocked_graph,
    blocked_walk_chunk,
    slq_or_dummy,
)

SCALE = int(os.environ.get("SLB_SCALE", 19))
P_RET = float(os.environ.get("SLB_P", 0.25))
Q_IO = float(os.environ.get("SLB_Q", 4.0))
GRAPH = os.environ.get("SLB_GRAPH", "rmat")  # rmat | zipf
W, L = 131072, 20

t0 = time.time()
if GRAPH == "zipf":
    # configuration-model power-law graph: heavy degree tail (hubs to 10k)
    # but near-zero clustering — shared lists cover ~all traversal mass, so
    # this is the sl_exhaustive regime (web-crawl-shaped, vs RMAT's
    # triangle-dense social shape)
    rng = np.random.default_rng(0)
    n_v = 1 << SCALE
    deg_draw = np.minimum((rng.zipf(1.8, n_v)).astype(np.int64), 10_000)
    stubs = np.repeat(np.arange(n_v, dtype=np.int32), deg_draw)
    rng.shuffle(stubs)
    half = len(stubs) // 2
    src, dst = stubs[:half], stubs[half : 2 * half]
else:
    src, dst = rmat_edges(SCALE, 8 * (1 << SCALE))
g = build_graph((src, dst), indexed=True, directed=False, max_out_degree=10_000)
print(f"graph({GRAPH}) V={g.n_vertices} E={g.n_edges} "
      f"max_deg={g.out_degrees().max()} build={time.time()-t0:.1f}s",
      flush=True)

t0 = time.time()
bg_on = build_blocked_graph(
    g.indptr, g.indices, g.weights, shared_lists=True
)
t_on = time.time() - t0
bg_off = bg_on._replace(slq=None)
slq = np.asarray(bg_on.slq)
ovf = (slq.reshape(-1, 16)[: g.n_edges, 13] & 1).astype(bool)
print(f"pack={t_on:.1f}s slq={bg_on.slq.nbytes/1e6:.0f}MB "
      f"overflow edges: {ovf.mean():.1%} ovf_wfrac={bg_on.sl_ovf_wfrac:.3f} "
      f"exhaustive={bg_on.sl_exhaustive}", flush=True)

starts = jnp.asarray((np.arange(W) * 2654435761 % g.n_vertices).astype(np.int32))
gids = jnp.arange(W, dtype=jnp.int32)


def sync(x):
    return int(jnp.sum(jnp.where(x >= 0, 1, 0)))


def run(bg, label):
    t0 = time.time()
    paths, n_fb, n_att = blocked_walk_chunk(
        bg.light, bg.biw, bg.bids, bg.brp, slq_or_dummy(bg), starts, gids,
        jnp.uint32(7), walk_length=L, return_param=P_RET, inout_param=Q_IO,
        max_trials=64, light_width=bg.light_width,
        block_width=bg.block_width, has_heavy=bg.has_heavy,
        shared_lists=bg.shared_lists,
        sl_exhaustive=bg.sl_exhaustive,
    )
    sync(paths)
    compile_s = time.time() - t0
    steps = int((np.asarray(paths) >= 0).sum()) - W
    att = int(n_att)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        paths, _, _ = blocked_walk_chunk(
            bg.light, bg.biw, bg.bids, bg.brp, slq_or_dummy(bg), starts, gids,
            jnp.uint32(7), walk_length=L, return_param=P_RET, inout_param=Q_IO,
            max_trials=64, light_width=bg.light_width,
            block_width=bg.block_width, has_heavy=bg.has_heavy,
            shared_lists=bg.shared_lists,
            sl_exhaustive=bg.sl_exhaustive,
        )
    sync(paths)
    dt = (time.time() - t0) / reps
    print(f"  {label:4s} compile={compile_s:5.1f}s steady={dt*1e3:7.1f}ms "
          f"{steps/dt/1e6:5.2f}M steps/s  {att/steps:.2f} attempts/step",
          flush=True)
    return steps / dt


for rnd in range(3):
    print(f"round {rnd}:", flush=True)
    r_on = run(bg_on, "ON")
    r_off = run(bg_off, "OFF")
    print(f"  speedup {r_on/r_off:.2f}x", flush=True)
