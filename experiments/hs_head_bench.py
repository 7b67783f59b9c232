"""A/B: dense-head HS (level-shared matmuls) vs pure-gather HS.

The HS step's cost is the [B, L1, CL, D] theta path gather + scatter; BFS
level renumbering lets the first H levels (a few hundred inner nodes holding
most of the count-weighted path mass) be scored by ONE [B*L1, D] @ [D, K]
MXU matmul and updated by two more, shrinking the gathered tail to CL - H
lanes.  Interleaved same-process measurement (tunnel absolutes are noise).

Run: python experiments/hs_head_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from node2vec_tpu.models.hsoftmax import (  # noqa: E402
    build_huffman,
    cap_code_length,
    head_level_offsets,
    hs_epoch,
)

V = 131072
DIM = 128
L1 = 41
BATCH = 2048
N_BATCHES = 8
WINDOW = 5


def main() -> None:
    rng = np.random.default_rng(0)
    ranks = np.arange(1, V + 1)
    counts = np.maximum(
        (1e8 * ranks**-0.9 / (ranks**-0.9).sum()).astype(np.int64), 1
    )
    tree = cap_code_length(build_huffman(counts), counts)
    cl = tree.points.shape[1]
    head = head_level_offsets(tree)
    print(f"V={V} CL={cl} head levels={len(head) - 1} rows={head[-1]}")
    w = counts.astype(np.float64)
    lens = np.minimum(tree.lengths, cl)
    frac = (w * np.minimum(lens, len(head) - 1)).sum() / (w * lens).sum()
    print(f"head absorbs {frac:.1%} of count-weighted path rows")

    # corpus drawn from the unigram distribution (zipf) like a real walk set
    probs = counts / counts.sum()
    corpus = jnp.asarray(
        rng.choice(V, size=(BATCH * N_BATCHES, L1), p=probs).astype(np.int32)
    )
    hs_points = jnp.asarray(tree.points)
    hs_codes = jnp.asarray(tree.codes)
    hs_len = jnp.asarray(tree.lengths)
    vocab_mask = jnp.ones((V,), bool)
    key = jax.random.PRNGKey(0)

    def run(head_offsets, reps=3):
        times = []
        loss = None
        for r in range(reps + 1):
            emb_in = jax.random.uniform(key, (V, DIM), jnp.float32, -0.004, 0.004)
            theta = jnp.zeros((tree.n_inner, DIM), jnp.float32)
            acc_in = jnp.zeros((V,), jnp.float32)
            acc_th = jnp.zeros((tree.n_inner,), jnp.float32)
            t0 = time.perf_counter()
            emb_in, theta, acc_in, acc_th, losses = hs_epoch(
                emb_in, theta, acc_in, acc_th, corpus, key,
                jnp.int32(0), jnp.float32(0.025), jnp.float32(1e-6),
                hs_points, hs_codes, hs_len, vocab_mask,
                batch=BATCH, n_batches=N_BATCHES, window=WINDOW,
                shrink_window=True, min_lr=1e-4,
            ) if head_offsets is None else hs_epoch(
                emb_in, theta, acc_in, acc_th, corpus, key,
                jnp.int32(0), jnp.float32(0.025), jnp.float32(1e-6),
                hs_points, hs_codes, hs_len, vocab_mask,
                batch=BATCH, n_batches=N_BATCHES, window=WINDOW,
                shrink_window=True, min_lr=1e-4, head_offsets=head_offsets,
            )
            loss = float(losses.mean())
            if r:  # rep 0 is compile warmup
                times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        # pairs: ~2*mean(b_sh) per position with shrink_window; report raw
        pairs = BATCH * N_BATCHES * L1 * (WINDOW + 1)  # approx E[2*b]=W+1
        return pairs / med / 1e6, loss

    for r in range(2):
        m_g, l_g = run((0,))
        m_h, l_h = run(head)
        print(
            f"round {r}: gather {m_g:6.2f}M pairs/s (loss {l_g:.4f})  "
            f"head {m_h:6.2f}M pairs/s (loss {l_h:.4f})  {m_h / m_g:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
