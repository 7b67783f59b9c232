"""Host-resident-corpus trainer (Word2VecTPU.fit_host) tests.

fit_host streams globally-shuffled slabs of a host corpus to the device
(double-buffered h2d) instead of materializing the corpus + a per-epoch
permuted copy in HBM like fit() — the mode that lets the reference's
flagship workload (num_walks=10 x dim 128, /root/reference/README.md:28 +
constants.py:16-46 defaults) train at 100M+ edges on one chip.
"""

import numpy as np
import pytest

from node2vec_tpu.constants import Node2VecParams, Word2VecParams
from node2vec_tpu.graph import from_edge_arrays
from node2vec_tpu.models import Word2VecTPU
from node2vec_tpu.walk import random_walks


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(3)
    n_v = 600
    src = rng.integers(0, n_v, 6000).astype(np.int32)
    dst = rng.integers(0, n_v, 6000).astype(np.int32)
    keep = src != dst
    g = from_edge_arrays(src[keep], dst[keep], n_vertices=n_v, directed=False)
    walks = random_walks(g, Node2VecParams(num_walks=4, walk_length=10), seed=1)
    return g, walks


def test_fit_host_sgns_converges(corpus):
    g, walks = corpus
    params = Word2VecParams(min_count=1, vector_size=32, max_iter=3,
                            batch_walks=256)
    m = Word2VecTPU(params).fit_host(walks, n_vertices=g.n_vertices)
    assert m.emb_in.shape == (g.n_vertices, 32)
    assert all(np.isfinite(x) for x in m._losses)
    assert m._losses[-1] < m._losses[0]
    # per-slab trajectory recorded, one list per epoch
    assert len(m._slab_losses) == 3
    assert all(np.isfinite(x) for ep in m._slab_losses for x in ep)


def test_fit_host_multi_slab_matches_single_slab_quality(corpus):
    """Forcing many small slabs (the production shape) must train to the
    same ballpark as one big slab — the slab cut only changes upload
    granularity, not the objective."""
    g, walks = corpus
    params = Word2VecParams(min_count=1, vector_size=32, max_iter=3,
                            batch_walks=256)
    m1 = Word2VecTPU(params).fit_host(walks, n_vertices=g.n_vertices,
                                      slab_walks=1 << 20)
    m2 = Word2VecTPU(params).fit_host(walks, n_vertices=g.n_vertices,
                                      slab_walks=512)
    assert len(m2._slab_losses[0]) > 1  # actually multi-slab
    assert abs(m1._losses[-1] - m2._losses[-1]) < 0.3


def test_fit_host_tracks_fit_quality(corpus):
    """fit_host's host-side global shuffle is a different permutation stream
    than fit()'s on-device shuffle, so no bit-match — but final losses must
    agree closely on the same corpus."""
    g, walks = corpus
    params = Word2VecParams(min_count=1, vector_size=32, max_iter=3,
                            batch_walks=256)
    lh = Word2VecTPU(params).fit_host(walks, n_vertices=g.n_vertices)._losses
    ld = Word2VecTPU(params).fit(walks, n_vertices=g.n_vertices)._losses
    assert abs(lh[-1] - ld[-1]) < 0.25


def test_fit_host_hs_and_cbow(corpus):
    g, walks = corpus
    for kw in (
        {"negative": 0},  # hierarchical softmax (reference default objective)
        {"sg": 0},  # CBOW + negative sampling
        {"sg": 0, "negative": 0},  # CBOW + HS
    ):
        params = Word2VecParams(min_count=1, vector_size=32, max_iter=2,
                                batch_walks=256, **kw)
        m = Word2VecTPU(params).fit_host(walks, n_vertices=g.n_vertices)
        assert m.emb_in.shape == (g.n_vertices, 32)
        assert all(np.isfinite(x) for x in m._losses)


def test_fit_host_subsample(corpus):
    g, walks = corpus
    params = Word2VecParams(min_count=1, vector_size=32, max_iter=2,
                            batch_walks=256, sample=1e-2)
    m = Word2VecTPU(params).fit_host(walks, n_vertices=g.n_vertices)
    assert all(np.isfinite(x) for x in m._losses)


class _EpochBomb:
    """Timer stand-in that crashes the run when epoch ``n + 1`` begins —
    simulates a kill after n fully-checkpointed epochs."""

    def __init__(self, n: int):
        self.n = n
        self.count = 0

    def measure(self, name):
        import contextlib

        self.count += 1
        if self.count > self.n:
            raise RuntimeError("simulated crash")
        return contextlib.nullcontext()


def test_fit_host_resume_matches_uninterrupted(corpus, tmp_path):
    g, walks = corpus
    params = Word2VecParams(min_count=1, vector_size=32, max_iter=3,
                            batch_walks=256)
    full = Word2VecTPU(params).fit_host(
        walks, n_vertices=g.n_vertices, checkpoint_dir=str(tmp_path / "a")
    )
    # crash at the start of epoch 3 — dir b holds the epoch-2 snapshot
    with pytest.raises(RuntimeError, match="simulated crash"):
        Word2VecTPU(params).fit_host(
            walks, n_vertices=g.n_vertices,
            checkpoint_dir=str(tmp_path / "b"), timer=_EpochBomb(2),
        )
    resumed = Word2VecTPU(params).fit_host(
        walks, n_vertices=g.n_vertices, checkpoint_dir=str(tmp_path / "b")
    )
    # the resumed run replays epoch 3 exactly (same host permutation + same
    # on-device key schedule) — tables must match the uninterrupted run
    np.testing.assert_allclose(resumed.emb_in, full.emb_in, rtol=1e-5)


def test_run_readback_thread_count_invariant(corpus):
    """run()'s pipelined striped readback must be bit-identical to the
    single-stream path for any thread count."""
    g, _ = corpus
    from node2vec_tpu.walk.engine import WalkEngine

    params = Node2VecParams(num_walks=3, walk_length=8, walker_chunk=500)
    w1 = WalkEngine(g, params).run(seed=5, readback_threads=1)
    w16 = WalkEngine(g, params).run(seed=5, readback_threads=16)
    np.testing.assert_array_equal(w1, w16)
