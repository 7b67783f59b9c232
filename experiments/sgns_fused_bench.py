"""Fused-table (one-pass Adagrad) SGNS vs the two-pass positional step.

RESULT (negative, kept for the record): fusing the Adagrad accumulator into
column D halves the indexed-op count (8 -> 4 per position) but the
[V, D+1] row breaks the f32 (8, 128) tile — at dim 128 each row pads to 256
lanes, doubling table bytes and gather/scatter traffic.  Interleaved A/B on
v5e: fused = 0.67-0.86x two-pass at dim 128/256 (an early single-shot
measurement showed +24%, an artifact of a degraded chip-grant state — always
interleave A/B rounds through the tunnel).  One-pass Adagrad also diverges
on duplicate-dense batches with a cold accumulator (karate: every vertex
~40x per batch).  fit() stays on the two-pass sgns_epoch.

Run: python experiments/sgns_fused_bench.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    from node2vec_tpu.constants import Node2VecParams
    from node2vec_tpu.graph.ingest import build_graph
    from node2vec_tpu.models.skipgram import (
        init_embeddings,
        init_fused_embeddings,
        sgns_walk_step,
        sgns_walk_step_fused,
        split_fused,
    )
    from node2vec_tpu.models.vocab import build_vocab
    from node2vec_tpu.walk.engine import WalkEngine

    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    n_v = 131072
    n_e = n_v * 16
    src = rng.integers(0, n_v, n_e).astype(np.int32)
    dst = rng.integers(0, n_v, n_e).astype(np.int32)
    keep = src != dst
    g = build_graph((src[keep], dst[keep]), indexed=True, directed=False)
    walks = WalkEngine(
        g, Node2VecParams(num_walks=2, walk_length=20, walker_chunk=262144)
    ).run(seed=0)
    vocab = build_vocab(walks, g.n_vertices, min_count=1)
    ns_alias = jnp.asarray(vocab.ns_alias)
    ns_prob = jnp.asarray(vocab.ns_prob)
    mask = jnp.asarray(vocab.mask)
    dim, window, negatives, shared = 128, 5, 5, 64
    batch = 2048
    wb = jnp.asarray(walks[:batch])
    n_pairs = batch * walks.shape[1] * 2 * window
    n_steps = 30

    # two-pass baseline
    e1, e2, a1, a2 = init_embeddings(g.n_vertices, dim, seed=1)
    state = (e1, e2, a1, a2)

    def step2(state, i):
        return sgns_walk_step(
            *state, wb, jax.random.fold_in(jax.random.PRNGKey(7), i),
            jnp.float32(0.025), ns_alias, ns_prob, mask,
            window=window, negatives=negatives, shared_negatives=shared,
            shrink_window=True,
        )

    *state, loss = step2(state, 0)
    float(loss)
    t0 = time.perf_counter()
    for i in range(1, n_steps + 1):
        *state, loss = step2(tuple(state), i)
    float(loss)
    dt2 = (time.perf_counter() - t0) / n_steps
    print(f"two-pass: {n_pairs/dt2/1e6:.1f}M pair-updates/s "
          f"({dt2*1e9/(batch*walks.shape[1]):.0f}ns/position) loss={float(loss):.3f}")

    # fused one-pass
    t1f, t2f = init_fused_embeddings(g.n_vertices, dim, seed=1)
    fstate = (t1f, t2f)

    def stepf(state, i):
        return sgns_walk_step_fused(
            *state, wb, jax.random.fold_in(jax.random.PRNGKey(7), i),
            jnp.float32(0.025), ns_alias, ns_prob, mask,
            window=window, negatives=negatives, shared_negatives=shared,
            shrink_window=True,
        )

    *fstate, loss = stepf(fstate, 0)
    float(loss)
    t0 = time.perf_counter()
    for i in range(1, n_steps + 1):
        *fstate, loss = stepf(tuple(fstate), i)
    float(loss)
    dtf = (time.perf_counter() - t0) / n_steps
    print(f"fused:    {n_pairs/dtf/1e6:.1f}M pair-updates/s "
          f"({dtf*1e9/(batch*walks.shape[1]):.0f}ns/position) loss={float(loss):.3f}")
    print(f"speedup: {dt2/dtf:.2f}x")

    emb2 = np.asarray(state[0])
    embf = np.asarray(split_fused(fstate[0])[0])
    cos = np.sum(emb2 * embf, axis=1) / np.maximum(
        np.linalg.norm(emb2, axis=1) * np.linalg.norm(embf, axis=1), 1e-12
    )
    print(f"row cosine two-pass vs fused after {n_steps+1} identical steps: "
          f"mean {cos.mean():.4f} p5 {np.percentile(cos, 5):.4f}")


if __name__ == "__main__":
    main()
