"""One JAX process of a multi-process CPU mesh — spawned by
test_multiprocess.py with (process_id, num_processes, port).

This is the multi-host code path run for real: jax.distributed.initialize
over a TCP coordinator, a global mesh spanning both processes, gloo CPU
collectives.  On a TPU pod the same calls bring up the DCN mesh — only the
transport differs (SURVEY.md §2.3).

IMPORTANT: nothing here may touch the XLA backend before
initialize_distributed (jax.devices(), device_put, any computation) — that
is exactly the bug class the mesh.initialize_distributed guard regression
test exists for.
"""

import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def hub_graph():
    """Deterministic heavy-tail graph — identical on every process."""
    from node2vec_tpu.graph import from_edge_arrays

    rng = np.random.default_rng(0)
    n = 3000
    src = rng.integers(0, n, 18000)
    dst = rng.integers(0, n, 18000)
    src = np.concatenate([src, np.zeros(700, np.int64)])
    dst = np.concatenate([dst, rng.integers(0, n, 700)])
    keep = src != dst
    return from_edge_arrays(
        src[keep].astype(np.int32), dst[keep].astype(np.int32), directed=False
    )


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from node2vec_tpu.parallel.mesh import initialize_distributed, make_mesh

    initialize_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from node2vec_tpu.parallel.sharded_walk import sharded_blocked_walk_chunk
    from node2vec_tpu.walk.blocked import (
        blocked_walk_chunk,
        build_blocked_graph,
        slq_or_dummy,
    )

    g = hub_graph()
    # shared_lists=True: the cross-process sharded walk then exercises the
    # slq operand through shard_map (and the EP bit-match below genuinely
    # needs its separate no-slq oracle)
    bg = build_blocked_graph(g.indptr, g.indices, g.weights, shared_lists=True)
    n_dev = jax.device_count()
    mesh = make_mesh(n_data=n_dev // 2, n_model=2)

    w = 512
    starts = (np.arange(w) * 37 % g.n_vertices).astype(np.int32)
    gids = np.arange(w, dtype=np.int32)
    kw = dict(walk_length=8, return_param=0.25, inout_param=4.0)

    # reference: plain single-device jit on this process's local device
    ref, _, _ = blocked_walk_chunk(
        bg.light, bg.biw, bg.bids, bg.brp, slq_or_dummy(bg),
        jnp.asarray(starts),
        jnp.asarray(gids), jnp.uint32(11), max_trials=64,
        light_width=bg.light_width, block_width=bg.block_width,
        has_heavy=bg.has_heavy, shared_lists=bg.shared_lists, **kw,
    )
    ref = np.asarray(ref)

    # cross-process run: walkers sharded over 'data' spanning both processes
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P("data"))
    paths, _, _ = sharded_blocked_walk_chunk(
        mesh,
        jax.device_put(bg.light, rep), jax.device_put(bg.biw, rep),
        jax.device_put(bg.bids, rep), jax.device_put(bg.brp, rep),
        jax.device_put(slq_or_dummy(bg), rep),
        jax.device_put(jnp.asarray(starts), shd),
        jax.device_put(jnp.asarray(gids), shd),
        jnp.uint32(11), light_width=bg.light_width,
        block_width=bg.block_width, has_heavy=bg.has_heavy,
        shared_lists=bg.shared_lists, **kw,
    )
    full = multihost_utils.process_allgather(paths, tiled=True)
    np.testing.assert_array_equal(ref, full)
    print(f"proc {pid}: WALKS_BITMATCH_OK", flush=True)

    # routed row-sharded SGNS: all-to-all row routing across the process
    # boundary, one jit dispatch for the epoch
    from node2vec_tpu.models.vocab import build_vocab
    from node2vec_tpu.parallel.rowsharded_sgns import (
        init_row_state,
        row_sgns_epoch,
    )

    walks = ref[: (ref.shape[0] // n_dev) * n_dev]
    vocab = build_vocab(walks, g.n_vertices, min_count=1)
    state = init_row_state(mesh, g.n_vertices, dim=32, seed=1)
    corpus = jax.device_put(jnp.asarray(walks), NamedSharding(mesh, P(("data", "model"), None)))
    batch_local = walks.shape[0] // n_dev
    losses_seq = []
    for epoch in range(2):
        state, losses, dropped = row_sgns_epoch(
            mesh, state, corpus, jax.random.PRNGKey(3), epoch, 0.05, 1e-4,
            jnp.asarray(vocab.ns_alias), jnp.asarray(vocab.ns_prob),
            jnp.asarray(vocab.mask), batch_local=batch_local, n_batches=1,
            window=3, negatives=5, shared_negatives=64,
            shrink_window=False, min_lr=1e-4,
        )
        assert int(dropped) == 0
        losses_seq.append(float(losses.mean()))
    assert losses_seq[1] < losses_seq[0], losses_seq
    print(f"proc {pid}: ROWSHARDED_SGNS_OK", flush=True)

    # graph-sharded (edge-partitioned) walks: the adjacency itself is
    # range-sharded over all devices of both processes; every superstep
    # exchanges walker frontiers through a cross-process all-to-all
    from node2vec_tpu.parallel.edge_partitioned_blocked import (
        edge_partitioned_blocked_walk,
        partition_blocked_graph,
    )

    pg = partition_blocked_graph(
        g.indptr, g.indices, g.weights, mesh.shape["data"], mesh=mesh
    )
    ep, unfin, _ = edge_partitioned_blocked_walk(
        mesh, pg, jax.device_put(jnp.asarray(starts), shd),
        jax.device_put(jnp.asarray(gids), shd), jnp.uint32(11), **kw,
    )
    ep_full = multihost_utils.process_allgather(ep, tiled=True)
    # EP bit-match oracle: the single-device engine WITHOUT shared lists
    # (the EP sampler has no per-range slq tables)
    bg_nosl = build_blocked_graph(
        g.indptr, g.indices, g.weights, shared_lists=False
    )
    ref_nosl, _, _ = blocked_walk_chunk(
        bg_nosl.light, bg_nosl.biw, bg_nosl.bids, bg_nosl.brp,
        slq_or_dummy(bg_nosl), jnp.asarray(starts),
        jnp.asarray(gids), jnp.uint32(11), max_trials=64,
        light_width=bg_nosl.light_width, block_width=bg_nosl.block_width,
        has_heavy=bg_nosl.has_heavy, shared_lists=False, **kw,
    )
    np.testing.assert_array_equal(np.asarray(ref_nosl), ep_full)
    assert int(multihost_utils.process_allgather(unfin, tiled=True).sum()) == 0
    print(f"proc {pid}: EDGE_PARTITIONED_OK", flush=True)

    # row-sharded HS: Huffman tree-top replicated per step via a
    # cross-process all-gather, deep levels routed
    from node2vec_tpu.models.hsoftmax import build_huffman, head_level_offsets
    from node2vec_tpu.parallel.rowsharded_hs import (
        init_hs_row_state,
        row_hs_epoch,
    )

    tree = build_huffman(vocab.counts)
    hs_state = init_hs_row_state(mesh, g.n_vertices, tree.n_inner, dim=32)
    hs_losses = []
    for epoch in range(2):
        hs_state, losses, dropped = row_hs_epoch(
            mesh, hs_state, corpus, jax.random.PRNGKey(5), epoch, 0.05,
            1e-4, jnp.asarray(tree.points), jnp.asarray(tree.codes),
            jnp.asarray(tree.lengths), jnp.asarray(vocab.mask),
            batch_local=batch_local, n_batches=1, window=3,
            shrink_window=False, min_lr=1e-4,
            head_offsets=head_level_offsets(tree, max_rows=64),
        )
        assert int(dropped) == 0
        hs_losses.append(float(losses.mean()))
    assert hs_losses[1] < hs_losses[0], hs_losses
    print(f"proc {pid}: ROWSHARDED_HS_OK", flush=True)

    # streaming x row-sharded: virtual chunks generated mesh-sharded over
    # 'data', resharded cross-process to the row trainer's all-device layout
    from node2vec_tpu.models.word2vec import Word2VecTPU
    from node2vec_tpu.constants import Word2VecParams

    def chunk_src(i):
        lo = (i * w) % g.n_vertices
        starts_c = (lo + np.arange(w)) % g.n_vertices
        gids_c = i * w + np.arange(w)
        paths_c, _, _ = sharded_blocked_walk_chunk(
            mesh,
            jax.device_put(bg.light, rep), jax.device_put(bg.biw, rep),
            jax.device_put(bg.bids, rep), jax.device_put(bg.brp, rep),
            jax.device_put(slq_or_dummy(bg), rep),
            jax.device_put(jnp.asarray(starts_c.astype(np.int32)), shd),
            jax.device_put(jnp.asarray(gids_c.astype(np.int32)), shd),
            jnp.uint32(21), light_width=bg.light_width,
            block_width=bg.block_width, has_heavy=bg.has_heavy,
            shared_lists=bg.shared_lists, **kw,
        )
        return paths_c

    m = Word2VecTPU(
        Word2VecParams(
            min_count=1, vector_size=32, max_iter=2, batch_walks=128,
            step_size=0.05,
        )
    ).fit_streaming_sharded(chunk_src, 3, mesh, g.n_vertices)
    assert m._losses[-1] < m._losses[0], m._losses
    print(f"proc {pid}: STREAMING_SHARDED_OK", flush=True)

    # distributed host-side graph build: each process holds ONLY its shard
    # of the raw edge list; indexing/dedup/trim/metadata/packing exchange
    # through real cross-process all-to-alls, and the per-process result
    # bit-matches the monolithic ranged pack (round-3 VERDICT item 2 — the
    # reference's distributed zipWithIndex + repartition, spark.py:496-534)
    import tempfile

    from node2vec_tpu.graph.ingest import build_graph
    from node2vec_tpu.parallel.distributed_build import (
        assemble_partitioned,
        build_participant,
        run_distributed,
    )
    from node2vec_tpu.parallel.edge_partitioned_blocked import (
        save_partitioned_graph,
    )

    n_shards = mesh.shape["data"]
    rngb = np.random.default_rng(1)  # same full edge list on every process
    names_pool = np.unique(rngb.integers(0, 2**40, 500).astype(np.int64))
    b_src = names_pool[rngb.integers(0, len(names_pool), 6000)]
    b_dst = names_pool[rngb.integers(0, len(names_pool), 6000)]
    b_src = np.concatenate([b_src, np.full(200, names_pool[7])])
    b_dst = np.concatenate(
        [b_dst, names_pool[rngb.integers(0, len(names_pool), 200)]]
    )
    bkeep = b_src != b_dst
    b_src, b_dst = b_src[bkeep], b_dst[bkeep]
    b_w = rngb.uniform(0.5, 2.0, len(b_src)).astype(np.float32)
    cuts = np.linspace(0, len(b_src), nproc + 1).astype(np.int64)
    sl = slice(int(cuts[pid]), int(cuts[pid + 1]))
    res = run_distributed(
        build_participant(
            pid, nproc, b_src[sl], b_dst[sl], b_w[sl], n_shards=n_shards,
            indexed=False, directed=False, max_out_degree=48, random_seed=5,
        )
    )
    # local oracle (the full list is deterministic, so every process can
    # compute the monolithic reference for ITS shards)
    g_ref = build_graph(
        (b_src, b_dst, b_w), indexed=False, directed=False,
        max_out_degree=48, random_seed=5,
    )
    with tempfile.TemporaryDirectory() as td:
        save_partitioned_graph(
            td, g_ref.indptr, g_ref.indices, g_ref.weights, n_shards,
            ranged_metadata=True,
        )
        for k, s in enumerate(res.ranges):
            z = np.load(f"{td}/shard_{s:05d}.npz")
            v_p = res.meta["rows_per_shard"]
            nb_p = res.meta["blocks_per_shard"]
            qpr = nb_p * res.meta["block_width"] // 64
            np.testing.assert_array_equal(
                res.light[k * v_p : (k + 1) * v_p], z["light"]
            )
            np.testing.assert_array_equal(
                res.biw[k * nb_p : (k + 1) * nb_p], z["biw"]
            )
            np.testing.assert_array_equal(
                res.bids[k * nb_p : (k + 1) * nb_p], z["bids"]
            )
            np.testing.assert_array_equal(
                res.brp[k * qpr : (k + 1) * qpr], z["brp"]
            )
    # the distributed-built tables drive EP walks across the process boundary
    pg = assemble_partitioned(res, mesh=mesh)
    n_w2 = 16 * n_dev
    starts2 = (np.arange(n_w2, dtype=np.int32) * 7) % pg.n_vertices
    ep2, unfin2, _ = edge_partitioned_blocked_walk(
        mesh, pg,
        jax.device_put(jnp.asarray(starts2.astype(np.int32)), shd),
        jax.device_put(jnp.arange(n_w2, dtype=jnp.int32), shd),
        jnp.uint32(13), walk_length=6, return_param=0.5, inout_param=2.0,
        max_trials=64,
    )
    ep2_full = multihost_utils.process_allgather(ep2, tiled=True)
    assert int(multihost_utils.process_allgather(unfin2, tiled=True).sum()) == 0
    adj_ref = {
        v: set(g_ref.neighbors(v)[0].tolist())
        for v in range(g_ref.n_vertices)
    }
    for row in np.asarray(ep2_full):
        for a, b in zip(row[:-1], row[1:]):
            if a >= 0 and b >= 0:
                assert int(b) in adj_ref[int(a)]
    print(f"proc {pid}: DISTRIBUTED_BUILD_OK", flush=True)

    # distributed STRING-name indexing across real processes (round-4
    # VERDICT item 8): fixed-width UTF-8 exchange must reproduce the
    # host-global indexer's ids; unicode + shared prefixes exercised
    s_src = np.array(
        [f"né{x:011x}" if x % 5 else f"v{x}" for x in b_src], dtype=object
    )
    s_dst = np.array(
        [f"né{x:011x}" if x % 5 else f"v{x}" for x in b_dst], dtype=object
    )
    res_s = run_distributed(
        build_participant(
            pid, nproc, s_src[sl], s_dst[sl], b_w[sl], n_shards=n_shards,
            indexed=False, directed=False, max_out_degree=48, random_seed=5,
        )
    )
    g_s = build_graph(
        (s_src, s_dst, b_w), indexed=False, directed=False,
        max_out_degree=48, random_seed=5,
    )
    all_names = np.asarray(g_s.names).astype("U")
    loc = np.asarray(res_s.names).astype("U")
    np.testing.assert_array_equal(
        loc, all_names[res_s.name_base : res_s.name_base + len(loc)]
    )
    v_ps = res_s.meta["rows_per_shard"]
    rpp_s = n_shards // nproc
    lo_s = pid * rpp_s * v_ps
    hi_s = min((pid + 1) * rpp_s * v_ps, g_s.n_vertices)
    np.testing.assert_array_equal(
        res_s.indices, g_s.indices[g_s.indptr[lo_s] : g_s.indptr[hi_s]]
    )
    print(f"proc {pid}: DISTRIBUTED_BUILD_STR_OK", flush=True)


if __name__ == "__main__":
    main()
