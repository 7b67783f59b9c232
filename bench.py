"""Benchmark: walk throughput + SGNS update throughput on the attached TPU.

Prints ONE JSON line:
  {"metric": "walk_steps_per_s", "value": ..., "unit": "steps/s/chip",
   "vs_baseline": ..., ...extras}

``vs_baseline`` is the speedup over the reference's per-walker Python inner
loop (alias-table build + draw per step, ``/root/reference/node2vec/
randomwalk.py:300-339``) measured on this host — a *lower bound* on the true
speedup over the Spark pipeline, since it excludes the reference's per-step
join/shuffle and JVM<->Python serde costs entirely.

Env knobs: N2V_BENCH_V (vertices), N2V_BENCH_DEG (avg degree),
N2V_BENCH_WALKS, N2V_BENCH_LEN, N2V_BENCH_DIM, N2V_BENCH_SGNS_STEPS,
N2V_BENCH_RMAT[_SCALE] (heavy-tail section), N2V_BENCH_HS (hierarchical
softmax line), N2V_BENCH_QUALITY (walks->SGNS->F1 gate).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_er_graph(n_vertices: int, avg_degree: int, seed: int = 0):
    from node2vec_tpu.graph import from_edge_arrays

    rng = np.random.default_rng(seed)
    n_edges = n_vertices * avg_degree // 2
    src = rng.integers(0, n_vertices, n_edges).astype(np.int32)
    dst = rng.integers(0, n_vertices, n_edges).astype(np.int32)
    keep = src != dst
    t0 = time.perf_counter()
    g = from_edge_arrays(src[keep], dst[keep], n_vertices=n_vertices, directed=False)
    build_s = time.perf_counter() - t0
    log(f"graph: V={g.n_vertices} E={g.n_edges} build={build_s:.2f}s")
    return g, build_s


def _sync(x) -> float:
    """Force real device completion: scalar readback (block_until_ready can
    be a no-op through remote-attached backends)."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


GATHER_FLOOR_NS = 22.0  # measured XLA row-gather issue floor on v5e
# Table-SIZE dependence of the gather cost (round-4 VERDICT do-item 10):
# dependent-chain row gathers — the walk loop's access shape — measured at
# the engine's 512B row width across table sizes
# (experiments/gather_curve.py, round 5).  The SHAPE (1.26x from 131k to
# 8.4M rows) is stable across grants while the absolute level rides chip
# weather, so the floor keeps the round-1 22ns ANCHOR at 131k rows and
# scales it by the measured curve: at north-star 8.4M vertices the honest
# per-gather floor is ~27.7ns, not 22ns — which is why the scale-23
# fraction-of-floor read 0.77 with no real regression.
GATHER_CURVE_NS = {17: 25.74, 19: 33.01, 21: 31.34, 23: 32.40}


def gather_floor_ns(n_rows: int) -> float:
    """Size-interpolated gather floor: 22ns anchor x measured size curve."""
    import math

    pts = sorted(GATHER_CURVE_NS.items())
    s = math.log2(max(int(n_rows), 2))
    if s <= pts[0][0]:
        cur = pts[0][1]
    elif s >= pts[-1][0]:
        cur = pts[-1][1]
    else:
        cur = pts[-1][1]
        for (s0, v0), (s1, v1) in zip(pts, pts[1:]):
            if s0 <= s <= s1:
                cur = v0 + (v1 - v0) * (s - s0) / (s1 - s0)
                break
    return GATHER_FLOOR_NS * cur / pts[0][1]
# dense-engine biased-step costs ABOVE its single gather, measured by
# interleaved A/B decomposition (experiments/dense_profile.py, round 3):
# the exact all-pairs shared-neighbor mask is VPU/lowering-bound at
# ~8.3ns/step and the back-edge/bias application ~2.5ns — structural parts
# of the exact sampler, so the honest dense-biased floor includes them
# (round-3 VERDICT weak item 1: the gather-only floor read 49-64% on
# healthy runs and could not separate regression from chip-grant drift)
DENSE_MASK_NS = 8.3
DENSE_BIAS_NS = 2.5
HBM_GBPS = 819.0  # v5e HBM peak


def bench_walks(g, num_walks: int, walk_length: int, p: float, q: float,
                strategy: str = "auto", max_trials: int = 64,
                blocked_graph=None):
    import jax
    import jax.numpy as jnp

    from node2vec_tpu.constants import Node2VecParams
    from node2vec_tpu.walk.engine import WalkEngine

    params = Node2VecParams(
        num_walks=num_walks,
        walk_length=walk_length,
        return_param=p,
        inout_param=q,
        walker_chunk=1 << 17,
        max_rejection_trials=max_trials,
    )
    engine = WalkEngine(g, params, strategy=strategy,
                        blocked_graph=blocked_graph)
    chunk = engine._effective_chunk(g.n_vertices * num_walks)
    live = np.flatnonzero(np.diff(g.indptr) > 0)
    starts = live[np.arange(chunk) % len(live)].astype(np.int32)

    def run(i):
        return engine._run_chunk(starts, seed=i)

    t0 = time.perf_counter()
    _sync(run(0))
    compile_s = time.perf_counter() - t0
    engine.attempt_count = 0  # count attempts over the timed runs only
    times = []
    paths = None
    for i in range(1, 6):
        t0 = time.perf_counter()
        paths = run(i)
        _sync(paths)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    paths_host = np.asarray(paths)
    steps_done = int((paths_host >= 0).sum()) - chunk
    steps_per_s = steps_done / med
    # roofline: the walk engines are gather-op bound (experiments/
    # gather_bench.py: ~22ns issue floor per gathered row, any width <=1KB).
    # dense = 1 gather/STEP; blocked = 2 (unbiased) .. 4 (biased) per
    # ATTEMPT — the engine reports measured attempts (rejection retries
    # included), so the floor is gathers × attempts/step × 22ns.
    gathers = {"dense": 1.0, "blocked": (2.0 if p == q == 1.0 else 4.0)}.get(
        engine.strategy, 4.0
    )
    att_per_step = (
        engine.attempt_count / (5 * steps_done)
        if engine.attempt_count and steps_done
        else 1.0
    )
    ns_per_step = 1e9 / steps_per_s if steps_per_s else float("inf")
    # dense biased: add the measured structural non-gather costs (exact
    # all-pairs membership mask + bias application) to the floor
    extra_ns = (
        DENSE_MASK_NS + DENSE_BIAS_NS
        if engine.strategy == "dense" and not (p == q == 1.0)
        else 0.0
    )
    g_ns = gather_floor_ns(g.n_vertices)
    floor_ns = g_ns * gathers * att_per_step + extra_ns
    floor_frac = min(1.0, floor_ns / ns_per_step)
    log(
        f"walks(p={p},q={q}) strategy={engine.strategy}: chunk={chunk} "
        f"compile={compile_s:.1f}s steady {steps_per_s:,.0f} steps/s "
        f"({ns_per_step:.0f}ns/step, {att_per_step:.2f} attempts/step, "
        f"{floor_frac:.0%} of {floor_ns:.0f}ns floor"
        f" [{gathers:.0f} gathers{' + mask/bias' if extra_ns else ''}])"
    )
    roofline = {
        "ns_per_step": round(ns_per_step, 1),
        "gather_ops_modeled": gathers,
        "attempts_per_step": round(att_per_step, 2),
        "gather_floor_ns": round(g_ns, 2),
        "extra_floor_ns": extra_ns,
        "floor_ns_per_step": round(floor_ns, 1),
        "fraction_of_gather_floor": round(floor_frac, 3),
    }
    return steps_per_s, paths_host, roofline


def bench_sgns(g, walks: np.ndarray, dim: int, n_steps: int, batch_walks: int):
    import jax
    import jax.numpy as jnp

    from node2vec_tpu.models.skipgram import init_embeddings, sgns_walk_step
    from node2vec_tpu.models.vocab import build_vocab

    vocab = build_vocab(walks, g.n_vertices, min_count=1)
    emb_in, emb_out, acc_in, acc_out = init_embeddings(g.n_vertices, dim, seed=1)
    ns_alias = jnp.asarray(vocab.ns_alias)
    ns_prob = jnp.asarray(vocab.ns_prob)
    mask = jnp.asarray(vocab.mask)
    window, negatives, shared = 5, 5, 64
    wb = jnp.asarray(walks[:batch_walks])
    # nominal pairs from the ACTUAL batch rows (a small corpus can hand us
    # fewer rows than requested — the count must not inflate throughput)
    n_pairs = int(wb.shape[0]) * walks.shape[1] * 2 * window

    def step(state, i):
        e1, e2, a1, a2 = state
        return sgns_walk_step(
            e1, e2, a1, a2, wb, jax.random.fold_in(jax.random.PRNGKey(7), i),
            jnp.float32(0.025), ns_alias, ns_prob, mask,
            window=window, negatives=negatives, shared_negatives=shared,
            shrink_window=True,
        )

    t0 = time.perf_counter()
    *state, loss = step((emb_in, emb_out, acc_in, acc_out), 0)
    float(loss)
    compile_s = time.perf_counter() - t0
    # best-of-3 timed blocks: identical-code A/B runs (round 5, BASELINE.md)
    # showed 47-76M pair-updates/s within ten minutes on one grant — the
    # tunnel-attached chip's effective throughput drifts on the minute scale,
    # so a single block conflates grant weather with code regressions
    best_dt = float("inf")
    for block in range(3):
        t0 = time.perf_counter()
        for i in range(1, n_steps + 1):
            *state, loss = step(tuple(state), block * n_steps + i)
        float(loss)  # scalar readback; depends on every prior step's state
        best_dt = min(best_dt, time.perf_counter() - t0)
    dt = best_dt
    pairs_per_s = n_pairs * n_steps / dt
    # roofline: positional SGNS moves ~6 table rows (dim f32) per walk
    # position (in/out gather + grad scatter x2 tables + accumulators) and
    # does ~8*dim*(2w + S) MACs per position on the MXU
    n_pos = batch_walks * walks.shape[1]
    bytes_per_step = n_pos * 6 * dim * 4
    hbm_frac = (bytes_per_step * n_steps / dt) / (HBM_GBPS * 1e9)
    row_gathers = n_pos * 6
    gather_frac = (row_gathers * n_steps / dt) * GATHER_FLOOR_NS / 1e9
    log(
        f"sgns: dim={dim} batch={batch_walks} pairs/step={n_pairs} "
        f"compile={compile_s:.1f}s steady {pairs_per_s:,.0f} pair-updates/s "
        f"loss={float(loss):.3f} (hbm {hbm_frac:.0%}, gather-floor "
        f"{gather_frac:.0%})"
    )
    roofline = {
        "bytes_per_step_model": bytes_per_step,
        "fraction_of_hbm_peak": round(hbm_frac, 3),
        "fraction_of_gather_floor": round(min(gather_frac, 1.0), 3),
    }
    return pairs_per_s, roofline


def bench_hs(g, walks: np.ndarray, dim: int, n_steps: int, batch_walks: int):
    """Hierarchical softmax (the reference's DEFAULT objective): pair-updates/s
    with the level-shared dense head (models/hsoftmax.py)."""
    import jax
    import jax.numpy as jnp

    from node2vec_tpu.models.hsoftmax import (
        build_huffman,
        cap_code_length,
        head_level_offsets,
        hs_epoch,
    )
    from node2vec_tpu.models.vocab import build_vocab

    vocab = build_vocab(walks, g.n_vertices, min_count=1)
    tree = cap_code_length(build_huffman(vocab.counts), vocab.counts)
    head = head_level_offsets(tree)
    window = 5
    # bound work by the rows actually available (hs_epoch's dynamic_slice
    # clamps out-of-range batch starts, which would silently re-train the
    # same rows while the pair count assumed distinct batches)
    batch_walks = min(batch_walks, len(walks))
    n_steps = max(min(n_steps, len(walks) // batch_walks), 1)
    # NOMINAL pairs (2*window per position), the same denominator bench_sgns
    # uses, so the two throughput figures are directly comparable; with
    # shrink_window the EXPECTED trained pairs are (window+1) per position
    # (a fixed 2w/(w+1) = 1.67x ratio at w=5, same for both objectives)
    n_pairs = batch_walks * walks.shape[1] * 2 * window * n_steps

    def run():
        emb_in = jax.random.uniform(
            jax.random.PRNGKey(1), (g.n_vertices, dim), jnp.float32,
            -0.5 / dim, 0.5 / dim,
        )
        theta = jnp.zeros((tree.n_inner, dim), jnp.float32)
        acc_in = jnp.zeros((g.n_vertices,), jnp.float32)
        acc_th = jnp.zeros((tree.n_inner,), jnp.float32)
        out = hs_epoch(
            emb_in, theta, acc_in, acc_th,
            jnp.asarray(walks[: batch_walks * n_steps]),
            jax.random.PRNGKey(7), jnp.int32(0), jnp.float32(0.025),
            jnp.float32(1e-6), jnp.asarray(tree.points),
            jnp.asarray(tree.codes), jnp.asarray(tree.lengths),
            jnp.asarray(vocab.mask), batch=batch_walks, n_batches=n_steps,
            window=window, shrink_window=True, min_lr=1e-4,
            head_offsets=head,
        )
        return float(out[-1].mean())

    t0 = time.perf_counter()
    run()
    compile_s = time.perf_counter() - t0
    best_dt, loss = float("inf"), 0.0
    for _ in range(3):  # best-of-3: see bench_sgns grant-drift note
        t0 = time.perf_counter()
        loss = run()
        dt = time.perf_counter() - t0
        best_dt = min(best_dt, dt)
    pairs_per_s = n_pairs / best_dt
    log(
        f"hs: dim={dim} CL={tree.points.shape[1]} head_rows={head[-1]} "
        f"compile={compile_s:.1f}s steady {pairs_per_s:,.0f} pair-updates/s "
        f"loss={loss:.3f}"
    )
    return pairs_per_s


def bench_python_reference(g, p: float, q: float, n_samples: int = 2000) -> float:
    """Reference-style per-walker inner loop: per step, build the second-order
    alias table from the destination's neighbor list and draw (randomwalk.py:
    300-339). Single-thread host Python, like a Spark worker task lane."""
    import random as pyrandom

    from node2vec_tpu.ops.alias import (
        alias_draw_single,
        generate_edge_alias_tables,
    )

    rng = np.random.default_rng(3)
    vs = rng.integers(0, g.n_vertices, n_samples)
    t0 = time.perf_counter()
    done = 0
    for v in vs:
        nbrs, wts = g.neighbors(int(v))
        if len(nbrs) == 0:
            continue
        src = int(nbrs[0])
        src_nbs = set(g.neighbors(src)[0].tolist())
        alias, probs = generate_edge_alias_tables(
            src, src_nbs, (nbrs.tolist(), wts.tolist()), p, q
        )
        alias_draw_single(alias, probs, pyrandom.random(), pyrandom.random())
        done += 1
    dt = time.perf_counter() - t0
    steps_per_s = done / dt
    log(f"python reference inner loop: {steps_per_s:,.0f} steps/s (1 core)")
    return steps_per_s


def holdout_split(src, dst, n_vertices: int, n_holdout: int, seed: int = 5):
    """Remove ``n_holdout`` undirected edges from the raw edge stream (ALL
    duplicate occurrences of each sampled pair) and return
    (src', dst', pos_u, pos_v) — the held-out positives for link-prediction
    AUC (round-4 VERDICT missing item 2; ref anchor: the reference's product
    is the embedding table, /root/reference/node2vec/embedding.py:120-143)."""
    rng = np.random.default_rng(seed)
    nonself = np.flatnonzero(src != dst)
    pick = rng.choice(nonself, size=min(n_holdout, len(nonself)), replace=False)
    lo = np.minimum(src[pick], dst[pick]).astype(np.int64)
    hi = np.maximum(src[pick], dst[pick]).astype(np.int64)
    hold_keys = np.unique(lo * n_vertices + hi)
    all_keys = (
        np.minimum(src, dst).astype(np.int64) * n_vertices
        + np.maximum(src, dst).astype(np.int64)
    )
    drop = np.searchsorted(hold_keys, all_keys)
    drop = (drop < len(hold_keys)) & (
        hold_keys[np.minimum(drop, len(hold_keys) - 1)] == all_keys
    )
    pos_u = (hold_keys // n_vertices).astype(np.int32)
    pos_v = (hold_keys % n_vertices).astype(np.int32)
    return src[~drop], dst[~drop], pos_u, pos_v


def holdout_auc(emb_in, pos_u, pos_v, n_vertices: int, seed: int = 6) -> float:
    """Link-prediction AUC: dot-product scores of held-out edges vs an equal
    number of random non-edge pairs (collision probability ~2E/V^2, negligible
    at north-star sparsity).  emb_in is a device array; only the scores are
    read back."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n = len(pos_u)
    neg_u = rng.integers(0, n_vertices, n).astype(np.int32)
    neg_v = rng.integers(0, n_vertices, n).astype(np.int32)
    ok = neg_u != neg_v
    neg_u, neg_v = neg_u[ok], neg_v[ok]

    def scores(u, v):
        return np.asarray(
            jnp.sum(emb_in[jnp.asarray(u)] * emb_in[jnp.asarray(v)], axis=-1)
        )

    return _rank_auc(scores(pos_u, pos_v), scores(neg_u, neg_v))


def degree_baseline_auc(
    degrees: np.ndarray, pos_u, pos_v, n_vertices: int, seed: int = 6
) -> float:
    """Same holdout protocol scored by log-degree product only — the
    no-learning baseline.  On RMAT, edge placement is close to independent
    given degrees, so this is most of the achievable signal; the embedding
    AUC is gated as a BREAKAGE detector (chance = 0.5) plus a margin over
    this baseline, not as an absolute quality claim (that is the
    node2vec-paper-protocol multilabel gate in bench_quality)."""
    rng = np.random.default_rng(seed)
    n = len(pos_u)
    neg_u = rng.integers(0, n_vertices, n).astype(np.int32)
    neg_v = rng.integers(0, n_vertices, n).astype(np.int32)
    ok = neg_u != neg_v
    neg_u, neg_v = neg_u[ok], neg_v[ok]
    ld = np.log1p(degrees.astype(np.float64))
    return _rank_auc(ld[pos_u] + ld[pos_v], ld[neg_u] + ld[neg_v])


def _rank_auc(s_pos: np.ndarray, s_neg: np.ndarray) -> float:
    alls = np.concatenate([s_pos, s_neg])
    ranks = np.empty(len(alls))
    order = np.argsort(alls, kind="stable")
    ranks[order] = np.arange(1, len(alls) + 1)
    # midrank correction for ties
    uniq, inv, cnt = np.unique(alls, return_inverse=True, return_counts=True)
    if len(uniq) != len(alls):
        csum = np.concatenate([[0], np.cumsum(cnt)])
        ranks = (csum[inv] + csum[inv + 1] + 1) / 2.0
    r_pos = ranks[: len(s_pos)].sum()
    n_p, n_n = len(s_pos), len(s_neg)
    return float((r_pos - n_p * (n_p + 1) / 2) / (n_p * n_n))


def bench_northstar(scale: int, walk_length: int, dim: int) -> dict:
    """>=100M-edge single-chip end-to-end measurement (north-star config).

    Host C++ build (with a 100k-edge link-prediction holdout) -> blocked
    packing + HBM accounting -> biased/unbiased blocked walks -> one
    streaming SGNS epoch over the virtual corpus (dim 32; tables + graph
    share the one chip's HBM) -> the REFERENCE-DEFAULT full workload
    (num_walks=10 x dim 128, /root/reference/node2vec/constants.py:16-46 +
    README.md:28): walk all 10 copies to host RAM (pipelined striped
    readback), free the graph, train fit_host epochs (host corpus slabs
    streamed h2d), score held-out AUC -> one staged dim-128 SGNS epoch and
    one staged dim-128 HS epoch (the reference's default objective) on the
    1-walk device corpus for per-epoch throughput lines.

    ``out`` accumulates stage by stage and SURVIVES a mid-run failure:
    one crashing stage (e.g. a TPU remote-compile fault) records an
    ``error`` key next to every number already measured instead of
    discarding a ~45-minute run (learned from the round-5 staged-HS
    worker crash, which cost the whole block).
    """
    out: dict = {"scale": scale}
    try:
        _bench_northstar_stages(scale, walk_length, dim, out)
    except Exception as e:
        out["error"] = f"{type(e).__name__}: {e}"
        log(f"northstar stage FAILED (partial results kept): {out['error']}")
    return out


def _bench_northstar_stages(
    scale: int, walk_length: int, dim: int, out: dict
) -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "examples"))
    from scale_test import rmat_edges

    from node2vec_tpu.constants import Node2VecParams, Word2VecParams
    from node2vec_tpu.graph.ingest import build_graph
    from node2vec_tpu.models.word2vec import Word2VecTPU
    from node2vec_tpu.walk.blocked import build_blocked_graph
    from node2vec_tpu.walk.engine import WalkEngine

    t0 = time.perf_counter()
    src, dst = rmat_edges(scale, 8 * (1 << scale))
    gen_s = time.perf_counter() - t0
    n_v_raw = int(max(src.max(), dst.max())) + 1
    # holdout bounded at 1% of the raw stream so small smoke scales don't
    # degrade their own graph; at the default scale 23 it is the full 100k
    src, dst, pos_u, pos_v = holdout_split(
        src, dst, n_v_raw, min(100_000, len(src) // 100)
    )
    t0 = time.perf_counter()
    g = build_graph(
        (src, dst), indexed=True, directed=False, max_out_degree=10_000,
        random_seed=0,
    )
    build_s = time.perf_counter() - t0
    del src, dst
    deg = g.out_degrees()
    log(
        f"northstar scale={scale}: V={g.n_vertices:,} E={g.n_edges:,} "
        f"max_deg={deg.max()} gen={gen_s:.0f}s build={build_s:.0f}s"
    )

    t0 = time.perf_counter()
    bg = build_blocked_graph(g.indptr, g.indices, g.weights)
    pack_s = time.perf_counter() - t0
    table_bytes = sum(
        int(np.prod(a.shape)) * 4 for a in (bg.light, bg.biw, bg.bids, bg.brp)
    )
    log(
        f"northstar blocked tables: {table_bytes / 2**30:.2f} GiB HBM "
        f"(pack {pack_s:.0f}s)"
    )

    out.update({
        "n_vertices": g.n_vertices,
        "n_edges": g.n_edges,
        "max_degree": int(deg.max()),
        "rmat_gen_s": round(gen_s, 1),
        "graph_build_s": round(build_s, 1),
        "blocked_pack_s": round(pack_s, 1),
        "blocked_table_gib": round(table_bytes / 2**30, 2),
    })
    for pq, key in [((0.25, 4.0), "walk_steps_per_s"),
                    ((1.0, 1.0), "unbiased_walk_steps_per_s")]:
        sps, _, roof = bench_walks(
            g, 1, walk_length, pq[0], pq[1], strategy="blocked",
            blocked_graph=bg,
        )
        out[key] = round(sps)
        if key == "walk_steps_per_s":
            out["walk_roofline"] = roof

    # Training modes, all measured on the one chip (probed end to end in
    # experiments/northstar_probe.py; memory bisection in
    # experiments/sgns_memory_probe.py):
    #
    # 1. STREAMING (graph + trainer coexist, corpus never materializes):
    #    dim 32 — the 7.13 GiB blocked tables + dim-32 tables (2.15 GiB,
    #    scatter runs in place) fit; dim 64 hits the XLA scatter anomaly
    #    (8 GiB of table-copy temporaries, docs/scaling.md) and dim 128's
    #    8.4 GiB program peak + graph exceeds the chip.
    # 2. FULL CONFIG (the reference defaults, round-4 VERDICT missing item
    #    1): num_walks=10 x dim 128 — 7 GiB corpus + 8.6 GiB tables exceed
    #    HBM together, so the corpus walks to HOST RAM (readback pipelined
    #    behind the walk compute) and fit_host streams slabs back.
    # 3. STAGED dim-128 epochs (SGNS + the reference-default HS objective)
    #    on the 1-walk device corpus: per-epoch throughput lines with the
    #    graph freed (the reference's own walk->embed stage handoff,
    #    examples/native_spark.py:50-61).
    params = Node2VecParams(
        num_walks=1, walk_length=walk_length,
        return_param=0.25, inout_param=4.0,
    )
    engine = WalkEngine(g, params, strategy="blocked", blocked_graph=bg)
    n_chunks, chunk_walks, source = engine.chunk_source(seed=0)
    stream_dim = 32
    w2v = Word2VecParams(
        min_count=1, vector_size=stream_dim, max_iter=1, batch_walks=2048,
    )
    model = Word2VecTPU(w2v)
    t0 = time.perf_counter()
    model.fit_streaming(source, n_chunks, g.n_vertices)
    train_s = time.perf_counter() - t0
    n_positions = g.n_vertices * (walk_length + 1)
    nominal_pairs = n_positions * 2 * w2v.window_size
    out.update(
        {
            "streaming_chunks": n_chunks,
            "streaming_epoch_s": round(train_s, 1),
            "streaming_nominal_pairs_per_s": round(nominal_pairs / train_s),
            "streaming_loss": round(model._losses[-1], 4),
            "streaming_dim": stream_dim,
        }
    )
    log(
        f"northstar streaming epoch (dim {stream_dim}): {train_s:.0f}s over "
        f"{n_chunks} chunks ({nominal_pairs / train_s / 1e6:.1f}M nominal "
        f"pairs/s, loss {model._losses[-1]:.3f})"
    )
    if not np.isfinite(model._losses[-1]):
        raise RuntimeError("northstar streaming loss is not finite")
    del model

    # full-config walk: all 10 copies to host RAM (the 1-walk staged corpus
    # is exactly rows [:V] — walker gids 0..V-1 match num_walks=1 draws)
    full_walks = int(os.environ.get("N2V_BENCH_FULL_WALKS", 10))
    full_epochs = int(os.environ.get("N2V_BENCH_FULL_EPOCHS", 1))
    walks_host = None
    if full_walks:
        params10 = Node2VecParams(
            num_walks=full_walks, walk_length=walk_length,
            return_param=0.25, inout_param=4.0,
        )
        engine10 = WalkEngine(g, params10, strategy="blocked", blocked_graph=bg)
        t0 = time.perf_counter()
        walks_host = engine10.run(seed=0)
        full_walk_s = time.perf_counter() - t0
        out["full_walk_s"] = round(full_walk_s, 1)
        out["full_corpus_gib"] = round(walks_host.nbytes / 2**30, 2)
        log(
            f"northstar full-config walk: {full_walks} walks/vertex -> host "
            f"({walks_host.nbytes / 2**30:.2f} GiB) in {full_walk_s:.0f}s "
            "(readback pipelined)"
        )
        del engine10

    # CAREFUL: `source` (the chunk_source closure) pins `engine`, which pins
    # the 7.13 GiB blocked tables — deleting engine/bg alone leaks them and
    # the dim-128 fits OOM (found the hard way: the standalone staged probe,
    # which never built the closure, passed while the bench failed)
    del engine, bg, source
    import gc

    gc.collect()
    staged_dim = 128

    if walks_host is not None:
        # reference-default workload: num_walks=10, dim 128 (constants.py:
        # 16-46).  maxIter=10 is the reference default; the bench trains
        # N2V_BENCH_FULL_EPOCHS (default 1) — the static corpus makes every
        # epoch the same wall, so the 10-epoch cost is 10x the measured
        # per-epoch wall (BASELINE.md row documents the budget).
        w2v_full = Word2VecParams(
            min_count=1, vector_size=staged_dim, max_iter=full_epochs,
            batch_walks=8192,
        )
        model = Word2VecTPU(w2v_full)
        t0 = time.perf_counter()
        model.fit_host(walks_host, n_vertices=g.n_vertices)
        float(jnp.sum(model._emb_in[-1]))  # scalar sync, not a table readback
        full_fit_s = time.perf_counter() - t0
        full_pairs = nominal_pairs * full_walks
        auc = holdout_auc(model._emb_in, pos_u, pos_v, g.n_vertices)
        deg_auc = degree_baseline_auc(
            np.diff(g.indptr).astype(np.int64), pos_u, pos_v, g.n_vertices
        )
        # Breakage gate, not an absolute-quality bar: on RMAT held-out
        # edges carry little signal beyond degree (measured scale-19
        # trajectory: 0.694 @1 epoch, 0.632 @10 epochs — MORE training
        # lowers it as held-out edges sharpen toward non-edge scores), and
        # the ceiling SHRINKS with scale (measured scale-23 full-config
        # value: 0.561 @1 epoch — sparser per-pair density leaves even
        # less residual signal; BASELINE.md round 5).  A broken embedding
        # reads 0.500 +- 0.002 at the 100k holdout (30 sigma below the
        # measured scale-23 value), so the bar sits between chance and the
        # measured ceiling; absolute quality is gated by the
        # node2vec-paper-protocol multilabel micro-F1 in bench_quality.
        auc_bar = 0.54
        # downsampled loss trajectory: first epoch's per-slab means
        traj = [round(float(x), 4) for x in model._slab_losses[0][:: max(
            len(model._slab_losses[0]) // 16, 1
        )]]
        out["full_config"] = {
            "num_walks": full_walks,
            "dim": staged_dim,
            "epochs_trained": full_epochs,
            "epochs_reference_default": 10,
            "walk_s": out["full_walk_s"],
            "fit_s": round(full_fit_s, 1),
            "epoch_s": round(full_fit_s / full_epochs, 1),
            "nominal_pairs_per_s": round(full_pairs * full_epochs / full_fit_s),
            "losses": [round(x, 4) for x in model._losses],
            "slab_loss_trajectory": traj,
            "holdout_auc": round(auc, 4),
            "holdout_auc_degree_baseline": round(deg_auc, 4),
            "holdout_auc_bar": auc_bar,
            "holdout_n_pos": int(len(pos_u)),
            "holdout_auc_ok": bool(auc >= auc_bar),
        }
        log(
            f"northstar FULL CONFIG ({full_walks} walks x dim {staged_dim} x "
            f"{full_epochs} epoch(s)): fit {full_fit_s:.0f}s "
            f"({full_pairs * full_epochs / full_fit_s / 1e6:.1f}M nominal "
            f"pairs/s), losses {[round(x, 3) for x in model._losses]}, "
            f"holdout AUC {auc:.4f} (degree baseline {deg_auc:.4f}, "
            f"bar {auc_bar})"
        )
        if not all(np.isfinite(model._losses)):
            raise RuntimeError("northstar full-config loss is not finite")
        del model
        gc.collect()

        # staged 1-walk epochs at dim 128: SGNS, then the reference-default
        # HS objective (round-4 VERDICT missing item 3)
        corpus = jax.device_put(walks_host[: g.n_vertices])
        w2v2 = Word2VecParams(
            min_count=1, vector_size=staged_dim, max_iter=1, batch_walks=8192,
        )
        model = Word2VecTPU(w2v2)
        t0 = time.perf_counter()
        model.fit(corpus, n_vertices=g.n_vertices)
        float(jnp.sum(model._emb_in[-1]))
        fit_s = time.perf_counter() - t0
        out.update(
            {
                "staged_fit_s": round(fit_s, 1),
                "staged_nominal_pairs_per_s": round(nominal_pairs / fit_s),
                "staged_loss": round(model._losses[-1], 4),
                "staged_dim": staged_dim,
            }
        )
        log(
            f"northstar staged (dim {staged_dim}): fit {fit_s:.0f}s "
            f"({nominal_pairs / fit_s / 1e6:.1f}M nominal pairs/s, "
            f"loss {model._losses[-1]:.3f})"
        )
        if not np.isfinite(model._losses[-1]):
            raise RuntimeError("northstar staged loss is not finite")
        del model
        gc.collect()

        if os.environ.get("N2V_BENCH_NORTHSTAR_HS", "1") != "0":
            # The first scale-23 executions of this stage crashed the TPU
            # worker twice (bisection: experiments/hs_crash_bisect.py,
            # BASELINE.md round 5): (a) a shape fault in the CONJUNCTION
            # {~8.4M-row theta} x {dense head} x {CL ~18} — the trainer
            # auto-disables the head above hsoftmax.DENSE_HEAD_MAX_ROWS —
            # then (b) the head-free whole-epoch program died at full scan
            # length (4096 batches in ONE XLA execution) while identical
            # 16-batch dispatches pass.  hs_max_code_length=18 pins the
            # bisected-safe code length (the natural cap here is 26).
            w2v_hs = Word2VecParams(
                min_count=1, vector_size=staged_dim, max_iter=1,
                batch_walks=2048, negative=0, hs_max_code_length=18,
            )
            model = Word2VecTPU(w2v_hs)
            t0 = time.perf_counter()
            # fit_host, not fit(): the whole-epoch single-dispatch program
            # (4096 batches ~= one 8-minute XLA execution) dies through the
            # tunnel at this scale while the identical program chunked into
            # ~1-minute slab dispatches survives — see the comment above
            model.fit_host(
                walks_host[: g.n_vertices], n_vertices=g.n_vertices,
                slab_walks=1 << 20,
            )
            float(jnp.sum(model._emb_in[-1]))
            hs_s = time.perf_counter() - t0
            out.update(
                {
                    "hs_staged_epoch_s": round(hs_s, 1),
                    "hs_staged_nominal_pairs_per_s": round(
                        nominal_pairs / hs_s
                    ),
                    "hs_staged_loss": round(model._losses[-1], 4),
                }
            )
            log(
                f"northstar staged HS (dim {staged_dim}): epoch {hs_s:.0f}s "
                f"({nominal_pairs / hs_s / 1e6:.1f}M nominal pairs/s, "
                f"loss {model._losses[-1]:.3f})"
            )
            if not np.isfinite(model._losses[-1]):
                raise RuntimeError("northstar staged HS loss is not finite")
            del model
        del corpus, walks_host
        gc.collect()
    return out


def main() -> None:
    n_vertices = int(os.environ.get("N2V_BENCH_V", 131072))
    avg_degree = int(os.environ.get("N2V_BENCH_DEG", 16))
    num_walks = int(os.environ.get("N2V_BENCH_WALKS", 4))
    walk_length = int(os.environ.get("N2V_BENCH_LEN", 20))
    dim = int(os.environ.get("N2V_BENCH_DIM", 128))
    sgns_steps = int(os.environ.get("N2V_BENCH_SGNS_STEPS", 20))
    p, q = 0.25, 4.0  # biased walk config (karate/BlogCatalog setting)

    import jax

    try:  # persistent compile cache: repeat bench runs skip recompilation
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    backend = jax.default_backend()
    log(f"backend={backend} devices={jax.devices()}")

    g, build_s = build_er_graph(n_vertices, avg_degree)
    walk_sps, paths, walk_roof = bench_walks(g, num_walks, walk_length, p, q)
    uw_sps, _, _ = bench_walks(g, num_walks, walk_length, 1.0, 1.0)
    sgns_pps, sgns_roof = bench_sgns(g, paths, dim, sgns_steps, batch_walks=2048)
    py_sps = bench_python_reference(g, p, q)

    extras = {
        "backend": backend,
        "n_vertices": g.n_vertices,
        "n_edges": g.n_edges,
        "p": p,
        "q": q,
        "unbiased_walk_steps_per_s": round(uw_sps),
        "sgns_pair_updates_per_s": round(sgns_pps),
        "python_ref_steps_per_s": round(py_sps),
        "graph_build_s": round(build_s, 2),
        "walk_roofline": walk_roof,
        "sgns_roofline": sgns_roof,
    }

    if os.environ.get("N2V_BENCH_HS", "1") != "0":
        extras["hs_pair_updates_per_s"] = round(
            bench_hs(g, paths, dim, n_steps=8, batch_walks=2048)
        )

    # second scale: heavy-tail RMAT through the blocked engine (the regime
    # the reference advertises, README.md:29; round-1 VERDICT weak item 2)
    if os.environ.get("N2V_BENCH_RMAT", "1") != "0":
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "examples"))
        from scale_test import rmat_edges

        from node2vec_tpu.graph.ingest import build_graph

        scale = int(os.environ.get("N2V_BENCH_RMAT_SCALE", 19))
        t0 = time.perf_counter()
        src, dst = rmat_edges(scale, 8 * (1 << scale))
        g2 = build_graph(
            (src, dst), indexed=True, directed=False, max_out_degree=10_000
        )
        ht_build = time.perf_counter() - t0
        deg = g2.out_degrees()
        log(
            f"heavy-tail RMAT: V={g2.n_vertices} E={g2.n_edges} "
            f"max_deg={deg.max()} build={ht_build:.1f}s"
        )
        # pack the blocked tables ONCE (seconds of host work at this scale);
        # the four runs differ only in kernel-static p/q/trial params.
        # Note: RMAT self-loops are kept deliberately — the reference's
        # ingest keeps them too (no filtering anywhere in its pipeline)
        from node2vec_tpu.walk.blocked import build_blocked_graph

        bg2 = build_blocked_graph(g2.indptr, g2.indices, g2.weights)
        ht_sps, _, ht_roof = bench_walks(g2, num_walks, walk_length, p, q,
                                         strategy="blocked", blocked_graph=bg2)
        ht_uw, _, _ = bench_walks(g2, num_walks, walk_length, 1.0, 1.0,
                                  strategy="blocked", blocked_graph=bg2)
        # approximate mode (bounded rejection trials, see Node2VecParams):
        # the exact sampler is at ~99% of its gathers x attempts floor, so
        # fewer attempts is the remaining lever; cap=1 trades ~25% forced
        # proposal acceptances for ~2.6x throughput
        ht_ap2, _, _ = bench_walks(g2, num_walks, walk_length, p, q,
                                   max_trials=2, strategy="blocked",
                                   blocked_graph=bg2)
        ht_ap1, _, _ = bench_walks(g2, num_walks, walk_length, p, q,
                                   max_trials=1, strategy="blocked",
                                   blocked_graph=bg2)
        extras["heavytail"] = {
            "n_vertices": g2.n_vertices,
            "n_edges": g2.n_edges,
            "max_degree": int(deg.max()),
            "walk_steps_per_s": round(ht_sps),
            "unbiased_walk_steps_per_s": round(ht_uw),
            "approx_cap2_walk_steps_per_s": round(ht_ap2),
            "approx_cap1_walk_steps_per_s": round(ht_ap1),
            "walk_roofline": ht_roof,
            "graph_build_s": round(ht_build, 1),
        }

    # embedding-quality gate: the full protocol (walks -> SGNS -> multi-label
    # F1) on the synthetic overlapping-community graph, so quality regressions
    # fail the bench loudly instead of hiding behind throughput numbers
    if os.environ.get("N2V_BENCH_QUALITY", "1") != "0":
        from node2vec_tpu.constants import Node2VecParams, Word2VecParams
        from node2vec_tpu.datasets import run_quality, synthetic_multilabel

        gq, labels = synthetic_multilabel(n_vertices=2000, seed=0)
        t0 = time.perf_counter()
        qual = run_quality(
            gq,
            labels,
            n2v_params=Node2VecParams(num_walks=8, walk_length=40),
            w2v_params=Word2VecParams(min_count=1, max_iter=5, vector_size=128),
            train_ratios=(0.5,),
            seed=0,
        )
        q_s = time.perf_counter() - t0
        micro = float(qual["micro_f1@0.5"])
        quality_ok = micro >= 0.55
        log(
            f"quality gate: micro_f1@0.5={micro:.3f} macro={qual['macro_f1@0.5']:.3f} "
            f"({q_s:.0f}s) {'OK' if quality_ok else 'REGRESSION (threshold 0.55)'}"
        )
        extras["quality"] = {
            "micro_f1@0.5": round(micro, 4),
            "macro_f1@0.5": round(float(qual["macro_f1@0.5"]), 4),
            "threshold": 0.55,
            "ok": quality_ok,
        }

    # north star LAST (after the quality gate): the reference's flagship
    # claim is hundreds of millions of vertices / billions of edges on a
    # Spark cluster (/root/reference/README.md:28); this block runs a
    # >=100M-edge RMAT end to end on the ONE chip — C++ build, blocked-table
    # HBM footprint, biased+unbiased walks, one streaming SGNS epoch
    # (round-3 VERDICT missing item 1).  It pushes the chip to ~12 GiB
    # resident, so it runs after every other stage and frees its arrays
    # before the JSON is emitted.  N2V_BENCH_NORTHSTAR_SCALE=0 disables;
    # default scale 23 is ~8.4M vertices / ~127M mirrored edges.
    ns_scale = int(os.environ.get("N2V_BENCH_NORTHSTAR_SCALE", 23))
    if ns_scale:
        import gc

        # drop earlier stages' device arrays (scale-19 blocked tables,
        # walk corpus) — the staged dim-128 fit needs every GiB of margin
        paths = bg2 = g2 = g = None  # noqa: F841
        gc.collect()
        try:
            extras["northstar"] = bench_northstar(ns_scale, walk_length, dim)
        except Exception as e:  # record the failure mode, keep the bench alive
            log(f"northstar FAILED: {type(e).__name__}: {e}")
            extras["northstar"] = {
                "scale": ns_scale, "error": f"{type(e).__name__}: {e}",
            }
        gc.collect()  # drop the ~12 GiB of device arrays before exit paths

    result = {
        "metric": "walk_steps_per_s",
        "value": round(walk_sps),
        "unit": "steps/s/chip",
        "vs_baseline": round(walk_sps / py_sps, 1),
        "extras": extras,
    }
    print(json.dumps(result))
    # the quality gate FAILS the bench (after emitting the JSON, so the
    # numbers are still recorded) — regressions must not hide behind
    # healthy throughput and a zero exit code
    q = extras.get("quality")
    if q is not None and not q["ok"]:
        log("quality gate failed; exiting non-zero")
        sys.exit(1)
    fc = extras.get("northstar", {}).get("full_config")
    if fc is not None and not fc["holdout_auc_ok"]:
        log(
            f"northstar holdout AUC {fc['holdout_auc']} below bar "
            f"{fc['holdout_auc_bar']}; exiting non-zero"
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
