"""Quality-harness tests: .mat loader, the node2vec-paper top-k multi-label
protocol, held-out link prediction, and the end-to-end run_quality command."""

import numpy as np
import pytest

from node2vec_tpu.datasets import (
    holdout_link_prediction,
    load_mat_dataset,
    multilabel_f1,
    run_quality,
    synthetic_multilabel,
)


def test_mat_loader_roundtrip(tmp_path):
    from scipy import io as sio
    from scipy import sparse

    rng = np.random.default_rng(0)
    n = 60
    a = sparse.random(n, n, density=0.1, random_state=0, format="csr")
    a = a + a.T  # undirected
    a.setdiag(0)
    a.eliminate_zeros()
    grp = sparse.csr_matrix((np.random.default_rng(1).random((n, 4)) < 0.3))
    path = str(tmp_path / "toy.mat")
    sio.savemat(path, {"network": a, "group": grp})
    g, labels = load_mat_dataset(path)
    assert g.n_vertices == n
    assert labels.shape == (n, 4)
    assert g.n_edges > 0
    # undirected: both directions present
    src = np.repeat(np.arange(n), np.diff(g.indptr))
    keys = set(zip(src.tolist(), g.indices.tolist()))
    assert all((b, a_) in keys for a_, b in list(keys)[:50])


def test_cli_quality_stage_with_mat_file(tmp_path, capsys):
    """The documented BlogCatalog command path, end to end on a synthesized
    .mat: `python -m node2vec_tpu.cli quality --input <path>`."""
    import json
    import sys

    from scipy import io as sio
    from scipy import sparse

    from node2vec_tpu import cli

    g, labels = synthetic_multilabel(n_vertices=300, n_labels=4, seed=0)
    src = np.repeat(np.arange(g.n_vertices), np.diff(g.indptr))
    adj = sparse.csr_matrix(
        (g.weights, (src, g.indices)), shape=(g.n_vertices, g.n_vertices)
    )
    path = str(tmp_path / "toy.mat")
    sio.savemat(path, {"network": adj, "group": sparse.csr_matrix(labels)})

    argv = sys.argv
    try:
        sys.argv = [
            "cli", "quality", "--input", path, "--num-walks", "4",
            "--walk-length", "10", "--dim", "32", "--epochs", "2",
            "--train-ratios", "0.5",
        ]
        cli.main()
    finally:
        sys.argv = argv
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "micro_f1@0.5" in out
    assert 0.0 <= out["micro_f1@0.5"] <= 1.0


def test_mat_loader_rejects_wrong_format(tmp_path):
    from scipy import io as sio

    path = str(tmp_path / "bad.mat")
    sio.savemat(path, {"something": np.eye(3)})
    with pytest.raises(ValueError, match="DeepWalk-format"):
        load_mat_dataset(path)


def test_multilabel_f1_protocol_sanity():
    """Perfectly separable embeddings must score ~1; random ~chance."""
    rng = np.random.default_rng(0)
    n, L = 400, 5
    labels = np.zeros((n, L), bool)
    labels[np.arange(n), rng.integers(0, L, n)] = True
    # embeddings = label one-hots + noise: separable
    emb = labels.astype(np.float32) + rng.normal(0, 0.05, (n, L)).astype(
        np.float32
    )
    scores = multilabel_f1(emb, labels, train_ratio=0.5, seed=0)
    assert scores["micro_f1"] > 0.95
    noise = rng.normal(size=(n, 16)).astype(np.float32)
    rand = multilabel_f1(noise, labels, train_ratio=0.5, seed=0)
    assert rand["micro_f1"] < 0.6


def test_run_quality_synthetic_end_to_end():
    """Full protocol on the synthetic multi-label graph: embeddings must beat
    the random baseline by a wide margin."""
    from node2vec_tpu.constants import Node2VecParams, Word2VecParams

    g, labels = synthetic_multilabel(
        n_vertices=600, n_labels=6, avg_degree=16, seed=0
    )
    result = run_quality(
        g,
        labels,
        Node2VecParams(num_walks=6, walk_length=20),
        Word2VecParams(min_count=1, vector_size=64, max_iter=4),
        train_ratios=(0.5,),
        seed=0,
    )
    # random top-k baseline for ~1.6 labels over 6 classes is ~0.27 micro
    assert result["micro_f1@0.5"] > 0.55, result
    assert result["macro_f1@0.5"] > 0.4, result


def test_holdout_link_prediction():
    from node2vec_tpu.constants import Node2VecParams, Word2VecParams

    # many SMALL dense communities: same-community is rare among random
    # negative pairs, so held-out (mostly intra) edges are predictable
    g, _ = synthetic_multilabel(
        n_vertices=500, n_labels=25, avg_degree=20, labels_per_vertex=1.05,
        p_in_out_ratio=50.0, seed=1,
    )
    out = holdout_link_prediction(
        g,
        holdout_frac=0.2,
        n2v_params=Node2VecParams(num_walks=8, walk_length=30),
        w2v_params=Word2VecParams(min_count=1, vector_size=64, max_iter=6),
        seed=0,
    )
    assert out["holdout_link_auc"] > 0.7, out


def test_cli_eval_defaults_to_holdout(tmp_path, capsys):
    """CLI `eval` must default to the honest held-out link-prediction
    protocol (retrain on a split with the stage-recorded params) and keep
    the optimistic train-edge AUC as the --train-edge-auc opt-in
    (round-3 VERDICT item 9)."""
    import json

    from node2vec_tpu import cli
    from node2vec_tpu.graph import Graph

    g, _ = synthetic_multilabel(n_vertices=200, n_labels=3, seed=1)
    src = np.repeat(np.arange(g.n_vertices), np.diff(g.indptr))
    edge_file = str(tmp_path / "edges.txt")
    with open(edge_file, "w") as f:
        for a, b in zip(src.tolist(), g.indices.tolist()):
            f.write(f"{a} {b}\n")
    wd = str(tmp_path / "run")
    cli.main(["index", "--input", edge_file, "--workdir", wd, "--indexed"])
    cli.main([
        "walk", "--workdir", wd, "--num-walks", "4", "--walk-length", "8",
    ])
    cli.main([
        "embed", "--workdir", wd, "--dim", "32", "--epochs", "2",
        "--min-count", "1",
    ])
    capsys.readouterr()
    cli.main(["eval", "--workdir", wd, "--holdout-frac", "0.15"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["metric"] == "holdout_link_auc"
    assert 0.0 <= out["value"] <= 1.0
    assert out["holdout_frac"] == 0.15
    # the recorded stage params round-trip
    from node2vec_tpu.cli import _recorded_params

    n2v_p, w2v_p = _recorded_params(wd)
    assert n2v_p.num_walks == 4 and n2v_p.walk_length == 8
    assert w2v_p.vector_size == 32 and w2v_p.max_iter == 2
    # opt-in diagnostic still available
    cli.main(["eval", "--workdir", wd, "--train-edge-auc"])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["metric"] == "train_edge_auc"
    assert 0.0 <= out2["value"] <= 1.0
