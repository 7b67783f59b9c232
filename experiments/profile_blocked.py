"""Profile one steady-state blocked-walk run and print the op-level cost
breakdown (parses the chrome-trace JSON jax.profiler emits)."""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "examples")
from scale_test import rmat_edges  # noqa: E402

from node2vec_tpu.graph.ingest import build_graph  # noqa: E402
from node2vec_tpu.constants import Node2VecParams  # noqa: E402
from node2vec_tpu.walk import WalkEngine  # noqa: E402


def main():
    p = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    q = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    scale = 21
    src, dst = rmat_edges(scale, 8 * (1 << scale))
    g = build_graph((src, dst), indexed=True, directed=False, max_out_degree=10_000)
    n_walkers = 1 << 17
    params = Node2VecParams(
        num_walks=1, walk_length=40, return_param=p, inout_param=q,
        walker_chunk=n_walkers,
    )
    eng = WalkEngine(g, params, strategy="blocked")
    starts = np.random.default_rng(0).integers(0, g.n_vertices, n_walkers).astype(np.int32)
    out = eng.run_device(seed=0, start_vertices=starts)
    print("warm steps:", float(jnp.sum(out >= 0)) - n_walkers, flush=True)

    trace_dir = "/tmp/jax_trace"
    with jax.profiler.trace(trace_dir):
        out = eng.run_device(seed=1, start_vertices=starts)
        steps = float(jnp.sum(out >= 0)) - n_walkers
    t0 = time.perf_counter()
    out = eng.run_device(seed=2, start_vertices=starts)
    steps = float(jnp.sum(out >= 0)) - n_walkers
    dt = time.perf_counter() - t0
    print(f"steady {steps/dt/1e6:.2f}M steps/s", flush=True)

    files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        return
    with gzip.open(sorted(files)[-1], "rt") as f:
        trace = json.load(f)
    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            # keep only device lanes (TensorCore ops)
            name = ev.get("name", "")
            dur_by_name[name] += ev["dur"]
            cnt_by_name[name] += 1
    top = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:40]
    total = sum(dur_by_name.values())
    print(f"total traced op-time {total/1e6:.2f}s")
    for name, d in top:
        print(f"{d/1e3:10.1f}ms  x{cnt_by_name[name]:6d}  {name[:120]}")


if __name__ == "__main__":
    main()
