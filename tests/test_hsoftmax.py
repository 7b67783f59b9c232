"""Hierarchical-softmax trainer tests (the reference's default objective:
gensim negative=0, reference constants.py:65; spark.ml is HS-only)."""

import numpy as np

from node2vec_tpu.constants import Node2VecParams, Word2VecParams
from node2vec_tpu.graph import from_edge_arrays
from node2vec_tpu.models import Word2VecTPU
from node2vec_tpu.models.hsoftmax import build_huffman
from node2vec_tpu.walk import random_walks


def test_huffman_tree_invariants():
    counts = np.array([50, 30, 10, 5, 3, 1, 1], dtype=np.int64)
    tree = build_huffman(counts)
    n = len(counts)
    assert tree.n_inner == n - 1
    # code lengths: frequent symbols get codes no longer than rare ones
    assert tree.lengths[0] <= tree.lengths[5]
    assert (tree.lengths >= 1).all()
    # prefix-free: no full code is a prefix of another's code
    codes = [
        tuple(tree.codes[v, : tree.lengths[v]].tolist()) for v in range(n)
    ]
    assert len(set(codes)) == n
    for a in codes:
        for b in codes:
            if a != b:
                assert a != b[: len(a)]
    # Kraft equality for a complete binary code: sum 2^-len == 1
    assert abs(sum(2.0 ** -len(c) for c in codes) - 1.0) < 1e-9
    # expected length within 1 bit of entropy (Huffman optimality)
    p = counts / counts.sum()
    entropy = -(p * np.log2(p)).sum()
    avg = (p * tree.lengths).sum()
    assert entropy <= avg <= entropy + 1


def test_huffman_points_in_range():
    rng = np.random.default_rng(0)
    counts = rng.integers(1, 1000, 300)
    tree = build_huffman(counts)
    off = tree.level_offsets
    assert off[0] == 0 and off[-1] == tree.n_inner
    assert off[1] == 1  # level 0 is exactly the root
    for v in range(300):
        pts = tree.points[v, : tree.lengths[v]]
        assert (pts >= 0).all() and (pts < tree.n_inner).all()
        # BFS numbering: root (id 0) first, and path position c is depth c,
        # so every entry falls in its level's contiguous id range
        assert pts[0] == 0
        for c, pt in enumerate(pts):
            assert off[c] <= pt < off[c + 1]


def test_hs_head_dense_loss_matches_gather_path():
    """The dense-head formulation scores the SAME theta rows through matmuls
    instead of gathers — forward loss must match the pure-gather path."""
    import jax.numpy as jnp

    from node2vec_tpu.models.hsoftmax import (
        head_level_offsets,
        hs_walk_step_impl,
    )

    rng = np.random.default_rng(1)
    n_v, dim = 64, 16
    counts = rng.integers(1, 500, n_v)
    tree = build_huffman(counts)
    head = head_level_offsets(tree, max_rows=16)
    assert len(head) > 2  # the dense head actually engages

    walks = rng.integers(0, n_v, (8, 9)).astype(np.int32)
    emb_in = jnp.asarray(rng.normal(0, 0.1, (n_v, dim)).astype(np.float32))
    theta = jnp.asarray(
        rng.normal(0, 0.1, (tree.n_inner, dim)).astype(np.float32)
    )
    acc = jnp.zeros((n_v,), jnp.float32)
    acc_t = jnp.zeros((tree.n_inner,), jnp.float32)
    args = (
        jnp.asarray(walks), __import__("jax").random.PRNGKey(0),
        jnp.float32(0.01), jnp.asarray(tree.points), jnp.asarray(tree.codes),
        jnp.asarray(tree.lengths), jnp.ones((n_v,), bool),
    )
    _, _, _, _, loss_gather = hs_walk_step_impl(
        emb_in, theta, acc, acc_t, *args, window=3, shrink_window=False,
        head_offsets=(0,),
    )
    _, _, _, _, loss_head = hs_walk_step_impl(
        emb_in, theta, acc, acc_t, *args, window=3, shrink_window=False,
        head_offsets=head,
    )
    np.testing.assert_allclose(
        float(loss_gather), float(loss_head), rtol=2e-2
    )


def test_hs_training_separates_cliques():
    blocks = []
    for b in range(2):
        vs = np.arange(10) + 10 * b
        s, d = np.meshgrid(vs, vs)
        keep = s != d
        blocks.append((s[keep], d[keep]))
    src = np.concatenate([b[0] for b in blocks] + [[0]]).astype(np.int32)
    dst = np.concatenate([b[1] for b in blocks] + [[10]]).astype(np.int32)
    g = from_edge_arrays(src, dst, directed=False)
    walks = random_walks(g, Node2VecParams(num_walks=30, walk_length=8), seed=0)
    params = Word2VecParams(
        min_count=1, vector_size=32, max_iter=6, negative=0, step_size=0.05,
        batch_walks=128,
    )
    m = Word2VecTPU(params).fit(walks)
    assert m.emb_out.shape[0] == g.n_vertices - 1  # inner nodes, not vocab
    assert m._losses[-1] < m._losses[0]
    emb = m.vectors / np.maximum(
        np.linalg.norm(m.vectors, axis=1, keepdims=True), 1e-9
    )
    sim = emb @ emb.T
    intra = (sim[:10, :10].sum() - 10) / 90
    inter = sim[:10, 10:].mean()
    assert intra - inter > 0.2, (intra, inter)


def test_hs_loss_is_path_length_scaled():
    """Initial HS loss ≈ mean code length * log(2) (θ=0 ⇒ σ=0.5 per node)."""
    rng = np.random.default_rng(0)
    walks = rng.integers(0, 64, (64, 9)).astype(np.int32)
    params = Word2VecParams(
        min_count=1, vector_size=32, max_iter=1, negative=0, step_size=1e-9,
    )
    m = Word2VecTPU(params).fit(walks, n_vertices=64)
    from node2vec_tpu.models.hsoftmax import build_huffman

    tree = build_huffman(m.vocab.counts)
    p = m.vocab.counts / m.vocab.counts.sum()
    mean_len = float((p * tree.lengths).sum())
    assert abs(m._losses[0] - mean_len * np.log(2)) / (mean_len * np.log(2)) < 0.05


def test_cap_code_length_tail_mass():
    """Capping keeps >= 1 - tail_mass of the count-weighted path entries,
    leaves frequent vertices' full codes, and preserves prefix structure."""
    from node2vec_tpu.models.hsoftmax import cap_code_length

    rng = np.random.default_rng(0)
    counts = (rng.zipf(1.5, 5000) % 100000).astype(np.int64) + 1
    tree = build_huffman(counts)
    capped = cap_code_length(tree, counts, tail_mass=1e-3)
    assert capped.points.shape[1] <= tree.points.shape[1]
    cap = capped.points.shape[1]
    w = counts.astype(np.float64)
    total = (w * tree.lengths).sum()
    truncated = (w * np.maximum(tree.lengths - cap, 0)).sum()
    assert truncated / total <= 1e-3
    # untruncated vertices keep identical paths
    keep = tree.lengths <= cap
    np.testing.assert_array_equal(
        capped.points[keep], tree.points[keep, :cap]
    )
    np.testing.assert_array_equal(capped.lengths[keep], tree.lengths[keep])
    # truncated vertices keep the PREFIX of their path (root side)
    v = int(np.argmax(tree.lengths))
    np.testing.assert_array_equal(capped.points[v], tree.points[v, :cap])
    assert capped.lengths[v] == cap
    # degenerate: tail_mass=1 caps to a single level; tail_mass=0 no-op
    assert cap_code_length(tree, counts, tail_mass=0.0).points.shape[1] == tree.points.shape[1]


def test_cap_code_length_hard_max_len():
    """Explicit ``max_len`` hard-caps CODE_LEN regardless of tail mass — the
    documented workaround for the CL-19/10-level remote-compile failure
    (BASELINE.md round 3)."""
    from node2vec_tpu.models.hsoftmax import cap_code_length

    rng = np.random.default_rng(0)
    counts = (rng.zipf(1.5, 5000) % 100000).astype(np.int64) + 1
    tree = build_huffman(counts)
    capped = cap_code_length(tree, counts, tail_mass=0.0, max_len=8)
    assert capped.points.shape[1] == 8
    assert capped.lengths.max() == 8
    # prefix structure preserved
    v = int(np.argmax(tree.lengths))
    np.testing.assert_array_equal(capped.points[v], tree.points[v, :8])
    # max_len above the tree length is a no-op
    same = cap_code_length(tree, counts, tail_mass=0.0, max_len=10_000)
    assert same.points.shape[1] == tree.points.shape[1]


def test_hs_epoch_donation_misuse_raises():
    """hs_epoch donates its state buffers; on TPU, reusing them died at
    execute time with an opaque INVALID_ARGUMENT (BASELINE.md round 3). The
    guard must catch deleted state buffers with a clear Python error.  The
    CPU backend ignores donation, so the deleted-buffer condition is
    simulated with an explicit .delete()."""
    import jax
    import jax.numpy as jnp
    import pytest

    from node2vec_tpu.models.hsoftmax import (
        cap_code_length,
        head_level_offsets,
        hs_epoch,
    )
    from node2vec_tpu.models.vocab import build_vocab

    V, dim, batch, n_batches = 64, 16, 32, 2
    rng = np.random.default_rng(1)
    walks = rng.integers(0, V, (batch * n_batches, 9)).astype(np.int32)
    vocab = build_vocab(walks, V, min_count=1)
    tree = cap_code_length(build_huffman(vocab.counts), vocab.counts)
    head = head_level_offsets(tree)
    emb_in = jnp.zeros((V, dim), jnp.float32)
    theta = jnp.zeros((tree.n_inner, dim), jnp.float32)
    acc_in = jnp.zeros((V,), jnp.float32)
    acc_th = jnp.zeros((tree.n_inner,), jnp.float32)
    rest = (
        jnp.asarray(walks), jax.random.PRNGKey(7), jnp.int32(0),
        jnp.float32(0.025), jnp.float32(1e-6), jnp.asarray(tree.points),
        jnp.asarray(tree.codes), jnp.asarray(tree.lengths),
        jnp.asarray(vocab.mask),
    )
    kw = dict(batch=batch, n_batches=n_batches, window=2,
              shrink_window=True, min_lr=1e-4, head_offsets=head)
    out = hs_epoch(emb_in, theta, acc_in, acc_th, *rest, **kw)
    assert np.isfinite(np.asarray(out[-1])).all()
    state = out[:4]
    # threading the returned state is fine
    out2 = hs_epoch(*state, *rest, **kw)
    assert np.isfinite(np.asarray(out2[-1])).all()
    # a donated/deleted buffer must raise the clear error, not an opaque
    # backend failure
    theta2 = out2[1]
    theta2.delete()
    with pytest.raises(ValueError, match="donated"):
        hs_epoch(out2[0], theta2, out2[2], out2[3], *rest, **kw)


def test_hs_zipf_cl19_tree_shape_runs():
    """Regression shape for the CL-19/10-level tree (zipf-1.3 counts): the
    program must stay correct on the CPU backend.  Through the TPU
    remote-compile service this exact shape failed (BASELINE.md round 3) —
    the documented workaround is cap_code_length(max_len=18), exercised
    here too."""
    import jax
    import jax.numpy as jnp

    from node2vec_tpu.models.hsoftmax import (
        cap_code_length,
        head_level_offsets,
        hs_epoch,
    )

    rng = np.random.default_rng(0)
    # zipf counts over a vocab large enough for a raw CODE_LEN >= 19
    counts = rng.zipf(1.3, 60_000).astype(np.int64)
    raw = build_huffman(counts)
    assert raw.points.shape[1] >= 19, raw.points.shape
    # pin the failing shape exactly: CL 19
    tree = cap_code_length(raw, counts, tail_mass=0.0, max_len=19)
    assert tree.points.shape[1] == 19
    capped = cap_code_length(raw, counts, tail_mass=0.0, max_len=18)
    assert capped.points.shape[1] == 18

    V, dim, batch = len(counts), 8, 16
    walks = rng.integers(0, V, (batch, 7)).astype(np.int32)
    mask = np.ones(V, dtype=bool)
    for t in (tree, capped):
        head = head_level_offsets(t)
        out = hs_epoch(
            jnp.zeros((V, dim), jnp.float32),
            jnp.zeros((t.n_inner, dim), jnp.float32),
            jnp.zeros((V,), jnp.float32),
            jnp.zeros((t.n_inner,), jnp.float32),
            jnp.asarray(walks), jax.random.PRNGKey(3), jnp.int32(0),
            jnp.float32(0.025), jnp.float32(1e-6), jnp.asarray(t.points),
            jnp.asarray(t.codes), jnp.asarray(t.lengths), jnp.asarray(mask),
            batch=batch, n_batches=1, window=2, shrink_window=True,
            min_lr=1e-4, head_offsets=head,
        )
        assert np.isfinite(np.asarray(out[-1])).all()


def test_dense_head_disabled_above_safe_table_rows():
    """DENSE_HEAD_MAX_ROWS guard (round-5 scale-23 worker-crash bisection,
    BASELINE.md): head_level_offsets returns no head when the per-device
    theta table exceeds the measured-safe row count, and is unchanged
    below it."""
    from node2vec_tpu.models.hsoftmax import (
        DENSE_HEAD_MAX_ROWS,
        build_huffman,
        head_level_offsets,
    )

    counts = np.arange(1, 2000, dtype=np.int64)
    tree = build_huffman(counts)
    with_head = head_level_offsets(tree, table_rows=DENSE_HEAD_MAX_ROWS)
    assert len(with_head) > 1  # small tables keep the dense head
    assert head_level_offsets(tree, table_rows=DENSE_HEAD_MAX_ROWS) == \
        head_level_offsets(tree)
    assert head_level_offsets(
        tree, table_rows=DENSE_HEAD_MAX_ROWS + 1
    ) == (0,)
