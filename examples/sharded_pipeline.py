"""Multi-device pipeline tour: every sharded surface on one mesh.

Runs on any device set — real TPU chips or virtual CPU devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python examples/sharded_pipeline.py

Covers, end to end on a (data x model) mesh:
  1. graph-sharded walks (adjacency range-partitioned across devices,
     Node2Vec(graph_sharded=True)) with per-host shard packing/loading;
  2. row-sharded SGNS training (tables mod-partitioned, routed all-to-all);
  3. row-sharded hierarchical softmax (the reference's default objective);
  4. checkpoint/resume of the sharded trainer.

The reference's counterpart is a Spark cluster submit (examples/
fugue_spark.py + a cluster); here the same pipeline is one process on a
device mesh.
"""

import sys
import tempfile

import numpy as np


def main() -> None:
    import jax

    if jax.device_count() < 2:
        # sharding wants >1 device; a 1x1 mesh would run but exercise none
        # of the cross-device routing this tour exists to demonstrate
        print(
            "single device detected - re-run with JAX_PLATFORMS=cpu "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 for the "
            "sharded tour"
        )
        return 1

    from node2vec_tpu import Node2Vec
    from node2vec_tpu.parallel.mesh import make_mesh

    n_dev = jax.device_count()
    n_model = 2 if n_dev % 2 == 0 else 1
    mesh = make_mesh(n_data=n_dev // n_model, n_model=n_model)
    print(f"mesh: {dict(mesh.shape)} over {n_dev} devices")

    # a two-block SBM: embeddings must separate the blocks
    rng = np.random.default_rng(0)
    n, half = 2000, 1000
    src = rng.integers(0, n, 40_000).astype(np.int32)
    same = rng.random(40_000) < 0.9
    dst = np.where(
        same,
        (src // half) * half + rng.integers(0, half, 40_000),
        ((src // half) ^ 1) * half + rng.integers(0, half, 40_000),
    ).astype(np.int32)
    keep = src != dst
    edges = (src[keep], dst[keep])

    with tempfile.TemporaryDirectory() as ckpt:
        # 1-2: graph-sharded walks feeding row-sharded SGNS, checkpointed
        n2v = Node2Vec(
            n2v_params={"num_walks": 10, "walk_length": 20,
                        "return_param": 0.25, "inout_param": 4.0},
            w2v_params={"vector_size": 64, "max_iter": 3, "min_count": 1},
            mesh=mesh,
            graph_sharded=True,
            table_sharding="row",
            checkpoint_dir=ckpt,
            random_seed=7,
        )
        n2v.preprocess_input_graph(edges, indexed=True, directed=False)
        n2v.random_walk()
        model = n2v.fit(verbose=True)
        emb = model.vectors
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9)
        intra = (emb[:half] @ emb[:half].T).mean()
        inter = (emb[:half] @ emb[half:].T).mean()
        print(f"row-sharded SGNS: intra={intra:.3f} inter={inter:.3f} "
              f"(separation {intra - inter:.3f})")

        # 4: resume from the checkpoint (no epochs left -> state from disk)
        resumed = n2v.fit()
        assert np.allclose(resumed.vectors, model.vectors, atol=1e-5)
        print("checkpoint resume: tables reconstructed from disk OK")

    # 3: the reference's default objective (HS), row-sharded
    hs = Node2Vec(
        n2v_params={"num_walks": 10, "walk_length": 20},
        w2v_params={"vector_size": 64, "max_iter": 3, "min_count": 1,
                    "negative": 0},
        mesh=mesh,
        table_sharding="row",
        random_seed=7,
    )
    hs.preprocess_input_graph(edges, indexed=True, directed=False)
    hs.random_walk()
    hs_model = hs.fit(verbose=True)
    embh = hs_model.vectors
    embh = embh / np.maximum(np.linalg.norm(embh, axis=1, keepdims=True), 1e-9)
    intra = (embh[:half] @ embh[:half].T).mean()
    inter = (embh[:half] @ embh[half:].T).mean()
    print(f"row-sharded HS:   intra={intra:.3f} inter={inter:.3f} "
          f"(separation {intra - inter:.3f})")

    # 5: the unbounded configuration — graph sharded, corpus STREAMED
    # (virtual chunks regenerate on device; never materialized), tables
    # row-sharded.  walker_chunk forces several chunks even at this size.
    stream = Node2Vec(
        n2v_params={"num_walks": 10, "walk_length": 20,
                    "walker_chunk": 4096},
        w2v_params={"vector_size": 64, "max_iter": 3, "min_count": 1},
        mesh=mesh,
        graph_sharded=True,
        table_sharding="row",
        random_seed=7,
    )
    stream.preprocess_input_graph(edges, indexed=True, directed=False)
    s_model = stream.run_pipeline(verbose=True)
    assert stream.walks is None  # virtual corpus: never materialized
    embs = s_model.vectors
    embs = embs / np.maximum(np.linalg.norm(embs, axis=1, keepdims=True), 1e-9)
    intra = (embs[:half] @ embs[:half].T).mean()
    inter = (embs[:half] @ embs[half:].T).mean()
    print(f"streaming sharded: intra={intra:.3f} inter={inter:.3f} "
          f"(separation {intra - inter:.3f})")


if __name__ == "__main__":
    sys.exit(main())
