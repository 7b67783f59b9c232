"""Bisect the scale-23 staged-HS TPU worker crash (round 5).

The dim-128 HS epoch at V=8.4M kills the TPU worker at runtime even
though AOT memory_analysis says the program peaks at ~11.6 GiB of 16.
Synthetic-data repro (no graph resident) crashes identically, so this is
a shape-dependent runtime fault, not memory pressure from other arrays.
Each configuration must run in its OWN process (a crash takes the worker
down); drive with:

    for args in "2097152 18 1 2048" "4194304 18 1 2048" ...; do
        python experiments/hs_crash_bisect.py $args; done

Args: V [cap=18] [use_head=1] [batch=2048] [n_batches=16]
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(V, cap=18, use_head=1, B=2048, n_batches=16):
    from node2vec_tpu.models.hsoftmax import (
        build_huffman,
        cap_code_length,
        head_level_offsets,
        hs_epoch,
    )

    D, L1 = 128, 21
    counts = (1e6 / np.arange(1, V + 1) ** 0.8).astype(np.int64) + 1
    tree = cap_code_length(build_huffman(counts), counts, max_len=cap)
    head = head_level_offsets(tree) if use_head else (0,)
    print(f"V={V} CL={tree.points.shape[1]} head={head[-1]} B={B} "
          f"n_batches={n_batches}", flush=True)
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    emb = jax.random.uniform(key, (V, D), jnp.float32, -0.01, 0.01)
    theta = jnp.zeros((tree.n_inner, D), jnp.float32)
    a1, a2 = jnp.zeros((V,)), jnp.zeros((tree.n_inner,))
    corpus = jnp.asarray(rng.integers(0, V, (B * n_batches, L1), np.int32))
    kw = dict(batch=B, n_batches=n_batches, window=5, shrink_window=True,
              min_lr=1e-4, head_offsets=head)
    t0 = time.perf_counter()
    out = hs_epoch(emb, theta, a1, a2, corpus, jax.random.PRNGKey(3),
                   jnp.int32(0), jnp.float32(0.025), jnp.float32(1e-7),
                   jnp.asarray(tree.points), jnp.asarray(tree.codes),
                   jnp.asarray(tree.lengths), jnp.ones((V,), bool), **kw)
    lm = float(out[4].mean())
    print(f"OK {time.perf_counter() - t0:.0f}s loss {lm:.4f}", flush=True)


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
