"""Dense-engine optimization variants: where do the 42ns/step go?

The dense walk sits at 43-53% of the 22ns 1-gather floor (BENCH r2). The
per-step profile (jax.profiler, /tmp/dense_prof.log) splits the loop body
roughly: cumsum-as-reduce-window ~27%, compare-reduce fusions ~24%, gather +
PRNG + selects the rest.  Variants measured here on the real chip:

  A. baseline          — current dense_walk_chunk math
  B. hoisted PRNG      — all per-step uniforms generated before the loop
  C. matmul CDF        — cumsum as [W,P]@[P,P] upper-tri ones on the MXU
  D. B + C

Run: python experiments/dense_variants.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

PAD_ID = np.int32(np.iinfo(np.int32).max)


def sync(x):
    return float(jnp.sum(jnp.where(x >= 0, x, 0)))


def build_graph(n_vertices=131072, avg_degree=16, seed=0):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from node2vec_tpu.graph.ingest import build_graph as bg
    rng = np.random.default_rng(seed)
    n_edges = n_vertices * avg_degree
    src = rng.integers(0, n_vertices, n_edges).astype(np.int32)
    dst = rng.integers(0, n_vertices, n_edges).astype(np.int32)
    keep = src != dst
    return bg((src[keep], dst[keep]), indexed=True, directed=False)


def make_variant(packed_adj, *, walk_length, inv_p, inv_q, hoist_prng, matmul_cdf):
    p_cols = packed_adj.shape[1] // 2
    tri = jnp.triu(jnp.ones((p_cols, p_cols), jnp.float32))  # [P, P] upper

    def impl(starts, key):
        n_walkers = starts.shape[0]
        alive0 = starts >= 0
        paths0 = jnp.full((n_walkers, walk_length + 1), -1, jnp.int32)
        paths0 = paths0.at[:, 0].set(jnp.where(alive0, starts, -1))
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (n_walkers, p_cols), 1)
        if hoist_prng:
            u_all = jax.random.uniform(key, (walk_length, n_walkers))

        def one_step(t, carry):
            paths, cur, prev, prev_rows, alive, key = carry
            cur_safe = jnp.where(alive, cur, 0)
            packed = packed_adj[cur_safe]
            rows = packed[:, :p_cols]
            wts = jax.lax.bitcast_convert_type(packed[:, p_cols:], jnp.float32)
            first_order = prev < 0
            back = rows == prev[:, None]
            shared = (rows[:, :, None] == prev_rows[:, None, :]).any(-1)
            bias = jnp.where(back, inv_p, jnp.where(shared, 1.0, inv_q))
            bias = jnp.where(first_order[:, None], 1.0, bias)
            bw = wts * bias
            total = jnp.sum(bw, axis=1)
            alive = alive & (total > 0)
            if hoist_prng:
                u = u_all[t] * total
            else:
                key, k_u = jax.random.split(key)
                u = jax.random.uniform(k_u, (n_walkers,)) * total
            if matmul_cdf:
                # idx = #{j : cdf[j] < u}; cdf[j] = sum_{k<=j} bw_k.
                # equivalently tail[j] = sum_{k>=j} bw_k = bw @ triu;
                # cdf[j] = total - tail[j+1] ... simpler: cdf = bw @ tril.
                cdf = jnp.dot(
                    bw, tri, preferred_element_type=jnp.float32
                )  # cdf'[j] = sum_{k<=j} bw_k via upper-tri: bw@triu[j]= sum_{k<=j}? no:
                # (bw @ triu)[j] = sum_k bw_k * triu[k, j] = sum_{k<=j} bw_k  ✓
            else:
                cdf = jnp.cumsum(bw, axis=1)
            idx = jnp.minimum(
                jnp.sum((cdf < u[:, None]).astype(jnp.int32), axis=1), p_cols - 1
            )
            nxt = jnp.sum(jnp.where(col_iota == idx[:, None], rows, 0), axis=1)
            paths = jax.lax.dynamic_update_index_in_dim(
                paths, jnp.where(alive, nxt, -1), t + 1, axis=1
            )
            prev = jnp.where(alive, cur, prev)
            cur = jnp.where(alive, nxt, cur)
            prev_rows = jnp.where(alive[:, None], rows, prev_rows)
            return paths, cur, prev, prev_rows, alive, key

        prev0 = jnp.full((n_walkers,), -1, jnp.int32)
        cur0 = jnp.where(alive0, starts, 0)
        prev_rows0 = jnp.full((n_walkers, p_cols), PAD_ID, jnp.int32)
        paths, *_ = jax.lax.fori_loop(
            0, walk_length, one_step, (paths0, cur0, prev0, prev_rows0, alive0, key)
        )
        return paths

    return jax.jit(impl)


def main():
    print("devices:", jax.devices())
    g = build_graph()
    from node2vec_tpu.walk.dense import build_padded_adjacency

    packed = jnp.asarray(build_padded_adjacency(g.indptr, g.indices, g.weights))
    print(f"V={g.n_vertices} E={g.n_edges} P={packed.shape[1]//2}")
    W = 131072
    L = 20
    starts = jnp.arange(W, dtype=jnp.int32) % g.n_vertices
    key = jax.random.key(0)

    for name, hp, mc in [
        ("A baseline", False, False),
        ("B hoistPRNG", True, False),
        ("C matmulCDF", False, True),
        ("D both", True, True),
    ]:
        fn = make_variant(
            packed, walk_length=L, inv_p=4.0, inv_q=0.25,
            hoist_prng=hp, matmul_cdf=mc,
        )
        out = fn(starts, key)
        sync(out)
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            out = fn(starts, key)
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        sps = W * L / dt
        print(f"{name}: {sps/1e6:.1f}M steps/s ({dt*1e9/(W*L):.1f}ns/step)")


if __name__ == "__main__":
    main()
