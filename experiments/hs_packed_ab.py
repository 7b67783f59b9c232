"""Interleaved A/B of the packed-pair dim-64 layout on the HS trainer.

Round 5 measured the SGNS packed-pair win (2.48x at V=2M, temp 8.37 ->
0.22 GiB at V=8.4M — BASELINE.md).  This script produces the same two
pieces of evidence for the hierarchical-softmax trainer, whose theta
table (and its level-shared dense head) packs via the parity-aware
un-interleave shipped in models/hsoftmax.py:

1. AOT ``memory_analysis()`` of one hs_epoch program at the given
   (V, dim), packed vs unpacked — the relayout-copy signature is temp
   HBM of order the table size.
2. Timed interleaved A/B (alternating reps within one process — the only
   timing comparison that survives chip-grant weather, BASELINE.md
   round-3 methodology), reporting pair-updates/s for both layouts.

Run: python experiments/hs_packed_ab.py [V] [dim] [batch] [reps]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main(V=2_000_000, D=64, B=2048, reps=3):
    from node2vec_tpu.models.vocab import build_vocab_from_counts
    from node2vec_tpu.models.hsoftmax import (
        build_huffman,
        cap_code_length,
        head_level_offsets,
        hs_epoch,
    )
    from node2vec_tpu.models.skipgram import pack_rows

    rng = np.random.default_rng(0)
    # zipf-ish counts: realistic Huffman depth profile
    counts = (1e6 / np.arange(1, V + 1) ** 0.8).astype(np.int64) + 1
    vocab = build_vocab_from_counts(counts, min_count=1)
    tree = cap_code_length(build_huffman(vocab.counts), vocab.counts)
    hs_head = head_level_offsets(tree)
    cl = tree.points.shape[1]
    print(f"V={V} D={D} B={B} CL={cl} head_rows={hs_head[-1]} "
          f"n_inner={tree.n_inner}")

    L1, n_batches = 21, 8
    walks = rng.integers(0, V, (B * n_batches, L1), dtype=np.int32)
    args_host = dict(
        corpus=jnp.asarray(walks), key=jax.random.PRNGKey(3),
        step0=jnp.int32(0), lr0=jnp.float32(0.025),
        lr_slope=jnp.float32(1e-6),
        hs_points=jnp.asarray(tree.points), hs_codes=jnp.asarray(tree.codes),
        hs_len=jnp.asarray(tree.lengths), vocab_mask=jnp.asarray(vocab.mask),
    )
    kw = dict(batch=B, n_batches=n_batches, window=5, shrink_window=True,
              min_lr=1e-4, head_offsets=hs_head)
    n_pairs = B * n_batches * L1 * 5  # nominal (2w shifts, half masked)

    def fresh(packed):
        key = jax.random.PRNGKey(1)
        e = jax.random.uniform(key, (V, D), jnp.float32, -0.01, 0.01)
        t = jnp.zeros((tree.n_inner, D), jnp.float32)
        if packed:
            e, t = pack_rows(e), pack_rows(t)
        return e, t, jnp.zeros((V,)), jnp.zeros((tree.n_inner,))

    # --- AOT memory probe (exact compiler numbers, nothing allocated) ---
    from node2vec_tpu.models.hsoftmax import _hs_epoch_impl
    from jax import ShapeDtypeStruct as S

    for packed in (False, True):
        st = jax.eval_shape(lambda: fresh(packed))
        shapes = [S(x.shape, x.dtype) for x in st]
        arg_shapes = [S(v.shape, v.dtype) for v in args_host.values()]
        try:
            c = (
                jax.jit(
                    _hs_epoch_impl,
                    static_argnames=tuple(kw) + ("packed",),
                    donate_argnums=(0, 1, 2, 3),
                )
                .lower(*shapes, *arg_shapes, packed=packed, **kw)
                .compile()
            )
            m = c.memory_analysis()
            print(f"packed={packed}: temp {m.temp_size_in_bytes/2**30:.2f} "
                  f"GiB peak ~{(m.temp_size_in_bytes + m.argument_size_in_bytes)/2**30:.2f} GiB")
        except Exception as e:  # memory_analysis availability varies
            print(f"packed={packed}: AOT probe unavailable ({e})")

    # --- interleaved timing ---
    results = {False: [], True: []}
    state = {p: fresh(p) for p in (False, True)}
    for p in (False, True):  # warm both compiles before timing
        out = hs_epoch(*state[p], *args_host.values(), packed=p, **kw)
        float(jnp.sum(out[0]))
        state[p] = out[:4]
    for r in range(reps):
        for p in (False, True):
            t0 = time.perf_counter()
            out = hs_epoch(*state[p], *args_host.values(), packed=p, **kw)
            float(jnp.sum(out[0]))  # scalar sync (tunnel-safe)
            dt = time.perf_counter() - t0
            state[p] = out[:4]
            results[p].append(n_pairs / dt / 1e6)
    for p in (False, True):
        xs = results[p]
        print(f"packed={p}: {['%.1f' % x for x in xs]} M nominal pairs/s "
              f"(best {max(xs):.1f})")
    print(f"speedup (best/best): "
          f"{max(results[True]) / max(results[False]):.2f}x")


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:]]
    main(*a)
