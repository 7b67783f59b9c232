"""HS trainer cost breakdown on the real chip (round 3).

bench r02: 7.9M nominal pairs/s at dim 128, CL 18, head 9 levels.  Neither
HBM bandwidth (~47GB/s of ~800) nor MXU flops (~0.1 of ~200T) explains the
rate — so what binds it?  Ablations over the existing knobs:

  * head levels H in {0, 5, 9, 11}  (H=0: all path levels gathered)
  * window in {1, 5}                (10x fewer offset iterations at w=1)
  * dim in {128, 256}               (bandwidth-bound would scale ~1/2)

Run on the chip: python experiments/hs_profile.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from node2vec_tpu.graph.csr import build_csr
from node2vec_tpu.models.hsoftmax import (
    build_huffman,
    cap_code_length,
    head_level_offsets,
    hs_epoch,
)
from node2vec_tpu.models.vocab import build_vocab

V = 131072
rng = np.random.default_rng(0)
# uniform corpus (same tree shape as bench: CL 18, 9 head levels, 511 rows).
# NOTE a zipf(1.3) corpus produces a CL-19/10-level tree whose program runs
# on CPU but dies with an opaque INVALID_ARGUMENT through the TPU remote
# compile service — shape-specific backend quirk, not a semantic bug
walks = rng.integers(0, V, (16384, 21)).astype(np.int32)
vocab = build_vocab(walks, V, min_count=1)
tree = cap_code_length(build_huffman(vocab.counts), vocab.counts)
full_head = head_level_offsets(tree)
print(f"CL={tree.points.shape[1]} levels={len(full_head)-1} "
      f"head_rows_full={full_head[-1]}", flush=True)


def sync(x):
    return float(jnp.sum(x))


def run(dim, window, n_head, batch=2048, n_batches=8, label=""):
    head = tuple(full_head[: n_head + 1]) if n_head else (0,)
    emb_in = jax.random.uniform(
        jax.random.PRNGKey(1), (V, dim), jnp.float32, -0.5 / dim, 0.5 / dim
    )
    theta = jnp.zeros((tree.n_inner, dim), jnp.float32)
    acc_in = jnp.zeros((V,), jnp.float32)
    acc_th = jnp.zeros((tree.n_inner,), jnp.float32)
    rest = (
        jnp.asarray(walks[: batch * n_batches]),
        jax.random.PRNGKey(7), jnp.int32(0), jnp.float32(0.025),
        jnp.float32(1e-6), jnp.asarray(tree.points),
        jnp.asarray(tree.codes), jnp.asarray(tree.lengths),
        jnp.asarray(vocab.mask),
    )
    kw = dict(batch=batch, n_batches=n_batches, window=window,
              shrink_window=True, min_lr=1e-4, head_offsets=head)
    # hs_epoch DONATES its state buffers — thread the returned state through
    # reps (reusing the donated inputs dies with INVALID_ARGUMENT on TPU)
    state = (emb_in, theta, acc_in, acc_th)
    t0 = time.time()
    out = hs_epoch(*state, *rest, **kw)
    state = out[:4]
    sync(out[-1])
    compile_s = time.time() - t0
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = hs_epoch(*state, *rest, **kw)
        state = out[:4]
    sync(out[-1])
    dt = (time.time() - t0) / reps
    n_pairs = batch * n_batches * walks.shape[1] * 2 * window
    print(f"  {label:28s} compile={compile_s:5.1f}s {dt*1e3:7.1f}ms "
          f"{n_pairs/dt/1e6:6.2f}M nominal pairs/s", flush=True)
    return n_pairs / dt


print("baseline grid:", flush=True)
run(128, 5, 9, label="dim128 w5 H9 (production)")
run(128, 5, 0, label="dim128 w5 H0 (no head)")
run(128, 5, 5, label="dim128 w5 H5")
run(128, 5, 11, label="dim128 w5 H11")
run(128, 1, 9, label="dim128 w1 H9")
run(256, 5, 9, label="dim256 w5 H9")
run(128, 5, 9, batch=8192, n_batches=2, label="dim128 w5 H9 batch8192")
