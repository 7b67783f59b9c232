"""Sweep the blocked engine's (light_width P, block_width C) at RMAT scale 21.

BASELINE.md: the scale-21 biased heavy-tail line runs at 65% of the
4-gather x 2.6-attempt floor while scale 19 sits at 99% — the gap is
big-table gather cost.  The packing parameters trade bytes-per-gather
against gather count:

  * light rows are [4P] int32 = 16P bytes (P=32 -> 512B, P=64 -> 1KB);
    bigger P keeps more vertices on the 1-gather light path but fattens
    every entry fetch and the light table itself ([V, 4P]);
  * heavy blocks are [2C] int32 = 8C bytes (C=256 -> 2KB, past the ~1KB
    issue-cost free zone; C=128 -> 1KB) but smaller C means more blocks
    per heavy vertex (header capacity maxb = (4P-5)//2 must cover
    max_deg/C).

Usage: python experiments/blocked_tune.py [scale] [p] [q]
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "examples")
sys.path.insert(0, ".")
from scale_test import rmat_edges  # noqa: E402

from node2vec_tpu.graph.ingest import build_graph  # noqa: E402
from node2vec_tpu.walk.blocked import (  # noqa: E402
    blocked_walk_chunk,
    build_blocked_graph,
    _max_blocks,
)


def run_combo(g, bg, p, q, n_walkers, walk_length, max_trials=64):
    starts = (
        np.random.default_rng(0)
        .integers(0, g.n_vertices, n_walkers)
        .astype(np.int32)
    )
    gids = np.arange(n_walkers, dtype=np.int32)
    kw = dict(
        walk_length=walk_length,
        return_param=p,
        inout_param=q,
        max_trials=max_trials,
        light_width=bg.light_width,
        block_width=bg.block_width,
        has_heavy=bg.has_heavy,
    )
    t0 = time.perf_counter()
    paths, n_fb, n_att = blocked_walk_chunk(
        bg.light, bg.biw, bg.bids, bg.brp, slq_or_dummy(bg),
        jnp.asarray(starts),
        jnp.asarray(gids), jnp.uint32(7), **kw
    )
    paths.block_until_ready()
    compile_s = time.perf_counter() - t0
    best = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        paths, n_fb, n_att = blocked_walk_chunk(
            bg.light, bg.biw, bg.bids, bg.brp, slq_or_dummy(bg),
            jnp.asarray(starts),
            jnp.asarray(gids), jnp.uint32(8 + rep), **kw
        )
        steps = float(jnp.sum(paths >= 0)) - n_walkers
        dt = time.perf_counter() - t0
        best = max(best, steps / dt)
    att_per_step = float(n_att) / max(steps, 1.0)
    return best, compile_s, att_per_step


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    p = float(sys.argv[2]) if len(sys.argv) > 2 else 0.25
    q = float(sys.argv[3]) if len(sys.argv) > 3 else 4.0
    import jax

    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    src, dst = rmat_edges(scale, 8 * (1 << scale))
    g = build_graph(
        (src, dst), indexed=True, directed=False, max_out_degree=10_000
    )
    print(f"graph built in {time.perf_counter()-t0:.0f}s", flush=True)
    deg = g.out_degrees()
    max_deg = int(deg.max())
    print(
        f"V={g.n_vertices} E={g.n_edges} max_deg={max_deg} "
        f"median_deg={int(np.median(deg))}",
        flush=True,
    )

    import os

    combos = [(32, 256), (64, 128), (64, 256), (32, 512), (128, 128)]
    if os.environ.get("COMBOS"):  # e.g. COMBOS="32,256;64,128"
        combos = [
            tuple(int(x) for x in s.split(","))
            for s in os.environ["COMBOS"].split(";")
        ]
    for p_l, c in combos:
        if max_deg > _max_blocks(p_l) * c:
            print(f"P={p_l} C={c}: capacity too small, skip", flush=True)
            continue
        n_heavy = int((deg > p_l).sum())
        t0 = time.perf_counter()
        bg = build_blocked_graph(
            g.indptr, g.indices, g.weights, light_width=p_l, block_width=c
        )
        pack_s = time.perf_counter() - t0
        print(f"P={p_l} C={c}: packed in {pack_s:.0f}s, running...", flush=True)
        light_mb = bg.light.size * 4 / 1e6
        blk_mb = (bg.biw.size + bg.bids.size + bg.brp.size) * 4 / 1e6
        sps, comp, att = run_combo(g, bg, p, q, 1 << 17, 40)
        print(
            f"P={p_l:4d} C={c:4d}: {sps/1e6:6.2f}M steps/s "
            f"(att/step {att:.2f}, compile {comp:.0f}s, pack {pack_s:.0f}s, "
            f"heavy={n_heavy}, light {light_mb:.0f}MB blocks {blk_mb:.0f}MB)",
            flush=True,
        )
        del bg


if __name__ == "__main__":
    main()
