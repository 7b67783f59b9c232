"""Word2VecTPU: the skip-gram trainer driver (epochs, batching, LR decay).

Plays the role of ``gensim.models.Word2Vec`` / ``spark.ml.feature.Word2Vec``
in the reference (``/root/reference/node2vec/embedding.py:120-127,233-242``):
walks in, per-vertex embedding vectors out.  Training sweeps jit-compiled
SGNS steps over shuffled walk batches with word2vec's linear learning-rate
decay (stepSize=0.025 default mirrored from ``constants.py:37``).
"""

from __future__ import annotations

import logging
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from node2vec_tpu.constants import Word2VecParams
from node2vec_tpu.models.skipgram import (
    init_embeddings,
    pack_rows,
    sgns_epoch,
    unpack_rows,
    use_packed_rows,
)
from node2vec_tpu.models.vocab import (
    Vocabulary,
    build_vocab,
    subsample_keep_prob,
)

logger = logging.getLogger(__name__)


@jax.jit
def _subsample_walks(walks, key, keep_prob):
    """Frequent-vertex subsampling as a corpus transform: each occurrence is
    kept i.i.d. with ``keep_prob[vertex]`` (models/vocab.py
    subsample_keep_prob); discarded positions become -1, which every trainer
    already masks.  Applied per epoch (gensim redraws each pass) OUTSIDE the
    epoch scan, so no step kernel changes; elementwise + one replicated-table
    gather, so it shards along with the corpus on a mesh."""
    safe = jnp.where(walks >= 0, walks, 0)
    u = jax.random.uniform(key, walks.shape)
    keep = (walks < 0) | (u < keep_prob[safe])
    return jnp.where(keep, walks, -1)


def _streaming_counts(walk_source, n_chunks: int, n_vertices: int):
    """Pass-1 exact corpus counts over a virtual corpus, nothing
    materialized: int32 on device (no x64 on TPU), spilled to a host int64
    total every 256 chunks so hub-vertex counts can't wrap at unbounded
    corpus sizes.  Returns (counts[int64], walk length)."""
    from node2vec_tpu.parallel.rowsharded_sgns import host_copy

    counts_host = np.zeros((n_vertices,), np.int64)
    counts = jnp.zeros((n_vertices,), jnp.int32)
    length = None
    for c in range(n_chunks):
        w = walk_source(c)
        length = w.shape[1]
        flat = w.reshape(-1)
        counts = counts.at[jnp.where(flat >= 0, flat, 0)].add(
            (flat >= 0).astype(jnp.int32)
        )
        if (c + 1) % 8 == 0:
            # bound async enqueue depth: without a sync the whole pass is
            # dispatched at once and every pending chunk's walk output +
            # counts intermediate must be resident simultaneously — at
            # north-star scale (64 chunks x tens of MB on a chip already
            # holding 11+ GiB of graph+tables) that transient OOMs
            jax.block_until_ready(counts)
        if (c + 1) % 256 == 0:
            counts_host += host_copy(counts)
            counts = jnp.zeros((n_vertices,), jnp.int32)
    counts_host += host_copy(counts)
    return counts_host, length


def _effective_batch(
    batch_walks: int, n_walks: int, floor: int = 1,
    target_updates: int = 512,
) -> int:
    """Batch size with a SMALL-CORPUS cap: at least ~``target_updates``
    optimizer updates per epoch (but never below 64 walks/batch — the
    shared-negative pool is drawn per batch, and one-walk batches would skew
    the negative:positive ratio).  One Adagrad step per 8192-walk batch on a
    30k-walk corpus is 4 updates/epoch and measurably underfits the
    reference's per-pair SGD; the batch granularity is the DOMINANT term of
    the residual band vs the sequential oracle (experiments/
    sgd_mode_sweep.py: multilabel-3k micro-F1 0.819 at ~64 updates/epoch vs
    0.920 at batch 64 / ~470 updates, e5; 0.855 vs 0.938 at the reference's
    default 10 epochs — oracle 0.947, i.e. batch 64 is parity to -0.009).
    At production corpus sizes (n_walks >= target_updates * batch_walks)
    the cap is inactive; streaming callers scale ``target_updates`` down by
    n_chunks since updates accumulate across a chunked epoch.  ``floor``
    keeps sharded trainers' per-device batches whole."""
    batch = min(batch_walks, max(n_walks, 1))
    target = max(target_updates, 1)
    return max(min(batch, max(n_walks // target, 64, floor)), floor)


class Word2VecTPU:
    """Skip-gram negative-sampling trainer over walk corpora."""

    @staticmethod
    def _ckpt_table(t, n_vertices: int, packed: bool) -> np.ndarray:
        """Host copy of an embedding table for checkpointing; the packed-pair
        dim-64 layout (skipgram.pack_rows) is an internal device format, so
        checkpoints always store the logical [V, D] layout."""
        a = np.asarray(t)
        return np.asarray(unpack_rows(a, n_vertices)) if packed else a

    def __init__(
        self,
        params: Optional[Word2VecParams] = None,
        shared_negatives: int = 64,
    ):
        self.params = params or Word2VecParams()
        self.shared_negatives = shared_negatives
        self.vocab: Optional[Vocabulary] = None
        self._emb_in = None  # device or host array; host view is lazy
        self._emb_out = None
        self._losses: list = []

    def _keep_table(self):
        """[V] keep-probability table for ``params.sample`` subsampling, or
        None when disabled (must be called after the vocab is built)."""
        if self.params.sample <= 0:
            return None
        return jnp.asarray(
            subsample_keep_prob(
                self.vocab.counts, self.params.sample, self.vocab.mask
            )
        )

    def fit(
        self,
        walks: np.ndarray,
        n_vertices: Optional[int] = None,
        verbose: bool = False,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 1,
        timer=None,
    ) -> "Word2VecTPU":
        """Train embeddings over a walk corpus [N, L+1] int32 (-1 padded).

        With ``checkpoint_dir``, state is saved every ``checkpoint_every``
        epochs and fit() resumes from the newest saved epoch.
        """
        from node2vec_tpu.utils.checkpoint import load_train_state, save_train_state

        p = self.params
        is_device = not isinstance(walks, np.ndarray)
        if not is_device:
            walks = np.asarray(walks, dtype=np.int32)
        self.vocab = build_vocab(
            walks, n_vertices, min_count=p.min_count, ns_exponent=p.ns_exponent
        )
        n_v = self.vocab.n_vertices
        if self.vocab.n_kept == 0:
            raise ValueError(
                f"No vertex meets min_count={p.min_count}; corpus too small"
            )
        if p.sg == 0:
            # CBOW architecture (gensim sg=0, its default; models/cbow.py)
            # — handles both negative>0 (NS) and negative==0 (HS) variants
            return self._fit_cbow(
                walks, is_device, verbose, timer,
                checkpoint_dir=checkpoint_dir,
                checkpoint_every=checkpoint_every,
            )
        if p.negative == 0:
            # reference default objective: hierarchical softmax (gensim
            # negative=0, constants.py:65; spark.ml Word2Vec is HS-only)
            return self._fit_hs(
                walks, is_device, verbose, timer,
                checkpoint_dir=checkpoint_dir,
                checkpoint_every=checkpoint_every,
            )

        emb_in, emb_out, acc_in, acc_out = init_embeddings(
            n_v, p.vector_size, seed=p.seed
        )
        start_epoch = 0
        state = load_train_state(checkpoint_dir)
        if state is not None:
            start_epoch, e_in, e_out, a_in, a_out = state
            emb_in = jnp.asarray(e_in)
            emb_out = jnp.asarray(e_out)
            acc_in = jnp.asarray(a_in)
            acc_out = jnp.asarray(a_out)
            logger.info("resuming training from epoch %d", start_epoch)
        # dim-64 half-tile fix (skipgram.pack_rows): tables live packed
        # between steps; checkpoints and self.emb_* stay logical [V, D]
        packed = use_packed_rows(n_v, p.vector_size)
        if packed:
            emb_in, emb_out = pack_rows(emb_in), pack_rows(emb_out)
        ns_alias = jnp.asarray(self.vocab.ns_alias)
        ns_prob = jnp.asarray(self.vocab.ns_prob)
        vocab_mask = jnp.asarray(self.vocab.mask)

        n_walks = len(walks)
        batch = _effective_batch(p.batch_walks, n_walks)
        n_batches = (n_walks + batch - 1) // batch
        total_steps = max(p.max_iter * n_batches, 1)
        root_key = jax.random.PRNGKey(p.seed)

        # device-resident corpus, padded to whole batches; per-epoch shuffle
        # happens on device too — the training loop transfers only scalars.
        # Walks handed over as device arrays (e.g. straight from the walk
        # engine) never round-trip through the host at all.
        n_padded = n_batches * batch
        if is_device:
            corpus = walks.astype(jnp.int32)
            if n_padded > n_walks:
                pad = jnp.full((n_padded - n_walks, walks.shape[1]), -1, jnp.int32)
                corpus = jnp.concatenate([corpus, pad])
        else:
            corpus_host = np.full((n_padded, walks.shape[1]), -1, dtype=np.int32)
            corpus_host[:n_walks] = walks
            corpus = jnp.asarray(corpus_host)

        # one jit dispatch per EPOCH: shuffle on device, then lax.scan over
        # all batches with on-device linear LR decay
        lr_slope = p.step_size / total_steps
        keep = self._keep_table()
        self._losses = []
        for epoch in range(start_epoch, p.max_iter):
            k_shuffle = jax.random.fold_in(root_key, 1_000_000 + epoch)
            shuffled = corpus[jax.random.permutation(k_shuffle, n_padded)]
            if keep is not None:  # gensim-style subsampling, redrawn per epoch
                shuffled = _subsample_walks(
                    shuffled, jax.random.fold_in(root_key, 2_000_000 + epoch), keep
                )
            ctx = timer.measure("sgns_epoch") if timer is not None else None
            if ctx is not None:
                ctx.__enter__()
            emb_in, emb_out, acc_in, acc_out, losses = sgns_epoch(
                emb_in,
                emb_out,
                acc_in,
                acc_out,
                shuffled,
                root_key,
                jnp.int32(epoch * n_batches),
                jnp.float32(p.step_size),
                jnp.float32(lr_slope),
                ns_alias,
                ns_prob,
                vocab_mask,
                batch=batch,
                n_batches=n_batches,
                window=p.window_size,
                negatives=p.negative,
                shared_negatives=self.shared_negatives,
                shrink_window=p.shrink_window,
                min_lr=p.min_step_size,
                optimizer=p.optimizer,
                packed=packed,
            )
            epoch_loss = float(losses.mean())  # mean over batches, not the last batch
            if ctx is not None:
                ctx.__exit__(None, None, None)
            self._losses.append(epoch_loss)
            if verbose:
                logger.info(
                    "epoch %d/%d loss=%.4f", epoch + 1, p.max_iter, epoch_loss
                )
            if checkpoint_dir and (epoch + 1) % checkpoint_every == 0:
                save_train_state(
                    checkpoint_dir,
                    epoch + 1,
                    self._ckpt_table(emb_in, n_v, packed),
                    self._ckpt_table(emb_out, n_v, packed),
                    np.asarray(acc_in),
                    np.asarray(acc_out),
                )

        self.emb_in = unpack_rows(emb_in, n_v) if packed else emb_in
        self.emb_out = unpack_rows(emb_out, n_v) if packed else emb_out
        return self

    def fit_host(
        self,
        walks: np.ndarray,
        n_vertices: Optional[int] = None,
        slab_walks: int = 1 << 20,
        verbose: bool = False,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 1,
        timer=None,
    ) -> "Word2VecTPU":
        """Host-resident-corpus trainer: the corpus never lives on device.

        ``fit()`` keeps the whole corpus in HBM and materializes a second
        fully-permuted copy per epoch — at the reference's flagship scale
        (num_walks=10 × dim 128 on a 127M-edge graph,
        ``/root/reference/README.md:28`` + ``constants.py:16-46`` defaults)
        the 7 GiB corpus plus 8.6 GiB of tables cannot share one chip's HBM.
        Here the corpus stays in host RAM; each epoch draws a host-side
        GLOBAL permutation (stronger than the streaming path's hierarchical
        shuffle), assembles slabs of ``slab_walks`` rows into pinned host
        buffers, and uploads them double-buffered (slab k+1's transfer is
        dispatched before slab k trains — h2d rides ahead of compute).  Each
        slab trains with the existing one-dispatch epoch kernels, so device
        memory is tables + two slabs, independent of corpus size.

        Supports all three objectives like fit(): SGNS (sg=1, negative>0),
        hierarchical softmax (negative=0), and CBOW (sg=0).  With
        ``checkpoint_dir``, per-epoch train-state snapshots are written and
        fit_host resumes from the newest epoch.  ``self._slab_losses`` keeps
        the per-slab loss trajectory of the last run.
        """
        from node2vec_tpu.utils.checkpoint import (
            load_train_state,
            save_train_state,
        )

        p = self.params
        walks = np.ascontiguousarray(walks, dtype=np.int32)
        self.vocab = build_vocab(
            walks, n_vertices, min_count=p.min_count, ns_exponent=p.ns_exponent
        )
        n_v = self.vocab.n_vertices
        if self.vocab.n_kept == 0:
            raise ValueError(
                f"No vertex meets min_count={p.min_count}; corpus too small"
            )
        vocab_mask = jnp.asarray(self.vocab.mask)
        keep = self._keep_table()
        use_hs = p.negative == 0
        use_cbow = p.sg == 0

        n_walks = len(walks)
        length = walks.shape[1]
        batch = _effective_batch(p.batch_walks, n_walks)
        slab = max((min(slab_walks, n_walks) // batch) * batch, batch)
        slab_batches = slab // batch
        n_slabs = -(-n_walks // slab)
        n_batches_epoch = n_slabs * slab_batches
        total_steps = max(p.max_iter * n_batches_epoch, 1)
        lr_slope = p.step_size / total_steps
        root_key = jax.random.PRNGKey(p.seed)

        # objective state + one-slab trainer closure (mirrors fit_streaming's
        # dispatch; every branch reuses the whole-epoch scan kernels with
        # n_batches=slab_batches per uploaded slab)
        if use_cbow:
            from node2vec_tpu.models.cbow import cbow_epoch, cbow_hs_epoch
        if use_hs:
            from node2vec_tpu.models.hsoftmax import (
                build_huffman,
                cap_code_length,
                head_level_offsets,
                hs_epoch,
            )

            tree = cap_code_length(
                build_huffman(self.vocab.counts), self.vocab.counts,
                max_len=p.hs_max_code_length or None,
            )
            hs_points = jnp.asarray(tree.points)
            hs_codes = jnp.asarray(tree.codes)
            hs_len = jnp.asarray(tree.lengths)
            hs_head = head_level_offsets(
                tree, table_rows=tree.n_inner
            )
        else:
            ns_alias = jnp.asarray(self.vocab.ns_alias)
            ns_prob = jnp.asarray(self.vocab.ns_prob)
        emb_in, emb_out, acc_in, acc_out = init_embeddings(
            n_v, p.vector_size, seed=p.seed
        )
        if use_hs:
            emb_out = jnp.zeros((tree.n_inner, p.vector_size), jnp.float32)
            acc_out = jnp.zeros((tree.n_inner,), jnp.float32)
        n_out = tree.n_inner if use_hs else n_v  # output table logical rows
        start_epoch = 0
        ckpt = load_train_state(checkpoint_dir)
        if ckpt is not None:
            start_epoch, e_in, e_out, a_in, a_out = ckpt
            emb_in, emb_out = jnp.asarray(e_in), jnp.asarray(e_out)
            acc_in, acc_out = jnp.asarray(a_in), jnp.asarray(a_out)
            logger.info("resuming host-corpus training from epoch %d", start_epoch)
        packed = use_packed_rows(n_v, p.vector_size)
        if packed:  # dim-64 half-tile fix (skipgram.pack_rows)
            emb_in, emb_out = pack_rows(emb_in), pack_rows(emb_out)

        def train_slab(state, slab_dev, step0):
            e1, e2, a1, a2 = state
            if use_hs and use_cbow:
                return cbow_hs_epoch(
                    e1, e2, a1, a2, slab_dev, root_key, jnp.int32(step0),
                    jnp.float32(p.step_size), jnp.float32(lr_slope),
                    hs_points, hs_codes, hs_len, vocab_mask,
                    batch=batch, n_batches=slab_batches,
                    window=p.window_size, shrink_window=p.shrink_window,
                    min_lr=p.min_step_size, cbow_mean=p.cbow_mean,
                    packed=packed,
                )
            if use_hs:
                return hs_epoch(
                    e1, e2, a1, a2, slab_dev, root_key, jnp.int32(step0),
                    jnp.float32(p.step_size), jnp.float32(lr_slope),
                    hs_points, hs_codes, hs_len, vocab_mask,
                    batch=batch, n_batches=slab_batches,
                    window=p.window_size, shrink_window=p.shrink_window,
                    min_lr=p.min_step_size, head_offsets=hs_head,
                    packed=packed,
                )
            if use_cbow:
                return cbow_epoch(
                    e1, e2, a1, a2, slab_dev, root_key, jnp.int32(step0),
                    jnp.float32(p.step_size), jnp.float32(lr_slope),
                    ns_alias, ns_prob, vocab_mask,
                    batch=batch, n_batches=slab_batches,
                    window=p.window_size, negatives=p.negative,
                    shared_negatives=self.shared_negatives,
                    shrink_window=p.shrink_window, min_lr=p.min_step_size,
                    cbow_mean=p.cbow_mean, packed=packed,
                )
            return sgns_epoch(
                e1, e2, a1, a2, slab_dev, root_key, jnp.int32(step0),
                jnp.float32(p.step_size), jnp.float32(lr_slope),
                ns_alias, ns_prob, vocab_mask,
                batch=batch, n_batches=slab_batches,
                window=p.window_size, negatives=p.negative,
                shared_negatives=self.shared_negatives,
                shrink_window=p.shrink_window, min_lr=p.min_step_size,
                optimizer=p.optimizer, packed=packed,
            )

        # each slab is assembled into a FRESH host array and handed to
        # device_put (which keeps it alive until the async h2d transfer
        # lands) — slab k+1's upload rides ahead while slab k trains.
        # Buffer reuse is deliberately avoided: on the CPU backend
        # device_put can alias the numpy buffer zero-copy, so overwriting a
        # staging buffer would corrupt a slab training hasn't consumed yet.
        def make_slab(perm, s_idx):
            lo = s_idx * slab
            idx = perm[lo: lo + slab]
            buf = np.empty((slab, length), np.int32)
            np.take(walks, idx, axis=0, out=buf[: len(idx)])
            if len(idx) < slab:  # tail slab: dead (-1) rows, trainers mask them
                buf[len(idx):] = -1
            return jax.device_put(buf)

        # the tail slab's dead (-1) pad rows sit at its END, so its trailing
        # batches can be entirely padding — they train nothing and report
        # loss 0, which would silently deflate the epoch mean (fit() doesn't
        # have this: its on-device shuffle mixes pad rows into every batch)
        tail_real = n_walks - (n_slabs - 1) * slab
        tail_real_batches = min(-(-tail_real // batch), slab_batches)

        self._losses = []
        self._slab_losses = []
        for epoch in range(start_epoch, p.max_iter):
            # host-side global shuffle: one permutation over the WHOLE corpus
            perm = np.random.default_rng(
                p.seed * 1_000_003 + 17 + epoch
            ).permutation(n_walks)
            ctx = timer.measure("host_epoch") if timer is not None else None
            if ctx is not None:
                ctx.__enter__()
            pending = make_slab(perm, 0)
            epoch_losses = []
            for s in range(n_slabs):
                slab_dev = pending
                if s + 1 < n_slabs:  # upload next slab before training blocks
                    pending = make_slab(perm, s + 1)
                if keep is not None:  # gensim subsampling, redrawn per slab
                    slab_dev = _subsample_walks(
                        slab_dev,
                        jax.random.fold_in(
                            root_key, 4_000_000 + epoch * n_slabs + s
                        ),
                        keep,
                    )
                step0 = (epoch * n_slabs + s) * slab_batches
                emb_in, emb_out, acc_in, acc_out, losses = train_slab(
                    (emb_in, emb_out, acc_in, acc_out), slab_dev, step0
                )
                if s == n_slabs - 1:
                    losses = losses[:tail_real_batches]
                epoch_losses.append(losses)
                if (s + 1) % 4 == 0:
                    # bound async enqueue depth (see fit_streaming)
                    jax.block_until_ready(losses)
            if ctx is not None:
                ctx.__exit__(None, None, None)
            slab_means = [float(jnp.mean(x)) for x in epoch_losses]
            self._slab_losses.append(slab_means)
            self._losses.append(
                float(jnp.mean(jnp.concatenate(epoch_losses)))
            )
            if verbose:
                logger.info(
                    "host epoch %d/%d loss=%.4f (%d slabs)",
                    epoch + 1, p.max_iter, self._losses[-1], n_slabs,
                )
            if checkpoint_dir and (epoch + 1) % checkpoint_every == 0:
                save_train_state(
                    checkpoint_dir, epoch + 1,
                    self._ckpt_table(emb_in, n_v, packed),
                    self._ckpt_table(emb_out, n_out, packed),
                    np.asarray(acc_in), np.asarray(acc_out),
                )
        self.emb_in = unpack_rows(emb_in, n_v) if packed else emb_in
        self.emb_out = unpack_rows(emb_out, n_out) if packed else emb_out
        return self

    def fit_streaming(
        self,
        walk_source,
        n_chunks: int,
        n_vertices: int,
        verbose: bool = False,
        timer=None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every_chunks: int = 0,
        source_token: str = "",
    ) -> "Word2VecTPU":
        """Train over a VIRTUAL corpus: ``walk_source(i)`` regenerates walk
        chunk i on device (WalkEngine.chunk_source).

        The corpus never exists in memory — chunks are pure functions of
        (seed, chunk index) — so corpora of any size stream through fixed
        device memory (the reference streams via Spark partitions; round-1
        VERDICT missing item 7).  Chunk i+1's walk kernel is dispatched
        BEFORE chunk i's training blocks, so walk generation pipelines with
        training (producer/consumer; SURVEY.md §2.2 PP row).

        Shuffling is hierarchical: chunk order per epoch + on-device within-
        chunk permutation (vs the materialized path's global shuffle — the
        standard streaming-word2vec tradeoff).

        With ``checkpoint_dir``, chunk-boundary snapshots of (cursor, tables,
        Adagrad state, losses, pass-1 counts) are written at every epoch end
        and — when ``checkpoint_every_chunks`` > 0 — every that many chunks;
        a restarted call resumes mid-run and reproduces the uninterrupted
        trajectory bit-for-bit (all RNG is keyed on absolute (epoch, chunk)
        indices).  ``source_token`` should identify the walk source (graph
        digest + walk params + walk seed) so snapshots are never resumed
        against a different virtual corpus.
        """
        from node2vec_tpu.models.vocab import build_vocab_from_counts
        from node2vec_tpu.utils.checkpoint import (
            load_stream_state,
            save_stream_state,
            stream_fingerprint,
        )

        p = self.params
        fp = stream_fingerprint(p, n_chunks, n_vertices, token=source_token)
        resume = load_stream_state(checkpoint_dir, fp)
        chunk_walks = None
        cur_losses = np.zeros(0, np.float32)
        start_epoch = start_chunk = 0
        if resume is not None:
            (start_epoch, start_chunk, e_in_r, e_out_r, a_in_r, a_out_r,
             prev_losses, cur_losses, counts_host, chunk_walks) = resume
            logger.info(
                "resuming streaming training at epoch %d chunk %d",
                start_epoch, start_chunk,
            )
        else:
            counts_host, _ = _streaming_counts(
                walk_source, n_chunks, n_vertices
            )
        self.vocab = build_vocab_from_counts(
            counts_host, min_count=p.min_count, ns_exponent=p.ns_exponent
        )
        if self.vocab.n_kept == 0:
            raise ValueError(f"No vertex meets min_count={p.min_count}")
        ns_alias = jnp.asarray(self.vocab.ns_alias)
        ns_prob = jnp.asarray(self.vocab.ns_prob)
        vocab_mask = jnp.asarray(self.vocab.mask)
        keep = self._keep_table()

        use_hs = p.negative == 0  # reference default objective (HS)
        use_cbow = p.sg == 0  # gensim's default architecture (models/cbow.py)
        if use_cbow:
            from node2vec_tpu.models.cbow import cbow_epoch, cbow_hs_epoch
        emb_in, emb_out, acc_in, acc_out = init_embeddings(
            n_vertices, p.vector_size, seed=p.seed
        )
        if use_hs:
            from node2vec_tpu.models.hsoftmax import (
                build_huffman,
                cap_code_length,
                head_level_offsets,
                hs_epoch,
            )

            tree = cap_code_length(
                build_huffman(self.vocab.counts), self.vocab.counts,
                max_len=self.params.hs_max_code_length or None,
            )
            hs_points = jnp.asarray(tree.points)
            hs_codes = jnp.asarray(tree.codes)
            hs_len = jnp.asarray(tree.lengths)
            hs_head = head_level_offsets(
                tree, table_rows=tree.n_inner
            )
            # emb_out/acc_out slots carry the inner-node table (syn1) so the
            # streaming loop below is objective-agnostic
            emb_out = jnp.zeros((tree.n_inner, p.vector_size), jnp.float32)
            acc_out = jnp.zeros((tree.n_inner,), jnp.float32)
        n_out = tree.n_inner if use_hs else n_vertices  # output logical rows
        if resume is not None:
            emb_in = jnp.asarray(e_in_r)
            emb_out = jnp.asarray(e_out_r)
            acc_in = jnp.asarray(a_in_r)
            acc_out = jnp.asarray(a_out_r)
        packed = use_packed_rows(n_vertices, p.vector_size)
        if packed:  # dim-64 half-tile fix (skipgram.pack_rows)
            emb_in, emb_out = pack_rows(emb_in), pack_rows(emb_out)
        root_key = jax.random.PRNGKey(p.seed)
        rng = np.random.default_rng(p.seed)
        # all epochs' chunk orders up front: a resume must replay the exact
        # permutation stream of the uninterrupted run
        orders = [rng.permutation(n_chunks) for _ in range(p.max_iter)]

        self._losses = (
            [float(x) for x in prev_losses] if resume is not None else []
        )
        batch = n_batches = lr_slope = None
        step0 = 0
        if chunk_walks is not None:  # resume: geometry known from snapshot
            batch = _effective_batch(
                p.batch_walks, chunk_walks,
                target_updates=max(512 // n_chunks, 1),
            )
            n_batches = chunk_walks // batch
            lr_slope = p.step_size / max(p.max_iter * n_chunks * n_batches, 1)
            step0 = (start_epoch * n_chunks + start_chunk) * n_batches

        def _snapshot(epoch_next, chunk_next, state, epoch_losses):
            cur = (
                np.concatenate([np.asarray(x) for x in epoch_losses])
                if epoch_losses
                else np.zeros(0, np.float32)
            )
            save_stream_state(
                checkpoint_dir, fp, epoch_next, chunk_next,
                self._ckpt_table(state[0], n_vertices, packed),
                self._ckpt_table(state[1], n_out, packed),
                np.asarray(state[2]), np.asarray(state[3]),
                np.asarray(self._losses, np.float32), cur,
                counts=counts_host, chunk_walks=chunk_walks or 0,
            )

        # total steps for the LR schedule: computed from chunk geometry
        for epoch in range(start_epoch, p.max_iter):
            order = orders[epoch]
            skip = start_chunk if epoch == start_epoch else 0
            if skip >= n_chunks:
                continue  # defensive: epoch-end snapshots normalize to (e+1, 0)
            epoch_losses = []
            if epoch == start_epoch and len(cur_losses):
                epoch_losses.append(jnp.asarray(cur_losses))
            pending = walk_source(int(order[skip]))
            for i in range(skip, n_chunks):
                nxt = (
                    walk_source(int(order[i + 1]))
                    if i + 1 < n_chunks
                    else None  # prefetch: dispatched before training blocks
                )
                corpus = pending
                n_walks_c = corpus.shape[0]
                if chunk_walks is None:
                    chunk_walks = n_walks_c
                    batch = _effective_batch(
                        p.batch_walks, n_walks_c,
                        target_updates=max(512 // n_chunks, 1),
                    )
                    n_batches = n_walks_c // batch
                    total_steps = max(
                        p.max_iter * n_chunks * n_batches, 1
                    )
                    lr_slope = p.step_size / total_steps
                elif n_walks_c != chunk_walks:
                    raise ValueError(
                        f"walk_source chunk {int(order[i])} has "
                        f"{n_walks_c} walks, expected {chunk_walks} — "
                        "streaming requires constant chunk shapes "
                        "(WalkEngine.chunk_source pads every chunk)"
                    )
                k_sh = jax.random.fold_in(
                    root_key, 7_000_000 + epoch * n_chunks + i
                )
                shuffled = corpus[
                    jax.random.permutation(k_sh, n_walks_c)
                ][: n_batches * batch]
                if keep is not None:
                    shuffled = _subsample_walks(
                        shuffled,
                        jax.random.fold_in(
                            root_key, 8_000_000 + epoch * n_chunks + i
                        ),
                        keep,
                    )
                ctx = (
                    timer.measure("stream_chunk") if timer is not None else None
                )
                if ctx is not None:
                    ctx.__enter__()
                if use_hs and use_cbow:
                    emb_in, emb_out, acc_in, acc_out, losses = cbow_hs_epoch(
                        emb_in, emb_out, acc_in, acc_out, shuffled, root_key,
                        jnp.int32(step0), jnp.float32(p.step_size),
                        jnp.float32(lr_slope), hs_points, hs_codes, hs_len,
                        vocab_mask,
                        batch=batch, n_batches=n_batches,
                        window=p.window_size,
                        shrink_window=p.shrink_window,
                        min_lr=p.min_step_size,
                        cbow_mean=p.cbow_mean, packed=packed,
                    )
                elif use_hs:
                    emb_in, emb_out, acc_in, acc_out, losses = hs_epoch(
                        emb_in, emb_out, acc_in, acc_out, shuffled, root_key,
                        jnp.int32(step0), jnp.float32(p.step_size),
                        jnp.float32(lr_slope), hs_points, hs_codes, hs_len,
                        vocab_mask,
                        batch=batch, n_batches=n_batches,
                        window=p.window_size,
                        shrink_window=p.shrink_window,
                        min_lr=p.min_step_size,
                        head_offsets=hs_head, packed=packed,
                    )
                elif use_cbow:
                    emb_in, emb_out, acc_in, acc_out, losses = cbow_epoch(
                        emb_in, emb_out, acc_in, acc_out, shuffled, root_key,
                        jnp.int32(step0), jnp.float32(p.step_size),
                        jnp.float32(lr_slope), ns_alias, ns_prob, vocab_mask,
                        batch=batch, n_batches=n_batches,
                        window=p.window_size,
                        negatives=p.negative,
                        shared_negatives=self.shared_negatives,
                        shrink_window=p.shrink_window, min_lr=p.min_step_size,
                        cbow_mean=p.cbow_mean, packed=packed,
                    )
                else:
                    emb_in, emb_out, acc_in, acc_out, losses = sgns_epoch(
                        emb_in, emb_out, acc_in, acc_out, shuffled, root_key,
                        jnp.int32(step0), jnp.float32(p.step_size),
                        jnp.float32(lr_slope), ns_alias, ns_prob, vocab_mask,
                        batch=batch, n_batches=n_batches,
                        window=p.window_size,
                        negatives=p.negative,
                        shared_negatives=self.shared_negatives,
                        shrink_window=p.shrink_window, min_lr=p.min_step_size,
                        optimizer=p.optimizer, packed=packed,
                    )
                if ctx is not None:
                    ctx.__exit__(None, None, None)
                step0 += n_batches
                epoch_losses.append(losses)
                pending = nxt
                if (i + 1) % 4 == 0:
                    # bound async enqueue depth (see _streaming_counts):
                    # keeps <= ~4 chunks of walk+train work outstanding
                    # while preserving the producer/consumer overlap
                    jax.block_until_ready(losses)
                if (
                    checkpoint_dir
                    and checkpoint_every_chunks > 0
                    and i + 1 < n_chunks
                    and (i + 1) % checkpoint_every_chunks == 0
                ):
                    _snapshot(
                        epoch, i + 1, (emb_in, emb_out, acc_in, acc_out),
                        epoch_losses,
                    )
            self._losses.append(
                float(jnp.mean(jnp.concatenate(epoch_losses)))
            )
            if verbose:
                logger.info(
                    "streaming epoch %d/%d loss=%.4f", epoch + 1, p.max_iter,
                    self._losses[-1],
                )
            if checkpoint_dir:
                _snapshot(
                    epoch + 1, 0, (emb_in, emb_out, acc_in, acc_out), []
                )
        self.emb_in = unpack_rows(emb_in, n_vertices) if packed else emb_in
        self.emb_out = unpack_rows(emb_out, n_out) if packed else emb_out
        return self

    def _fit_hs(
        self, walks, is_device, verbose, timer=None,
        checkpoint_dir=None, checkpoint_every=1,
    ) -> "Word2VecTPU":
        """Hierarchical-softmax training path (params.negative == 0).

        Same epoch structure as the SGNS path — device-resident corpus,
        on-device shuffle, one jit dispatch per epoch, per-epoch train-state
        checkpoint/resume — with the Huffman-tree objective of
        models.hsoftmax.  ``emb_out`` holds the [V-1, D] inner-node vectors
        (word2vec's syn1).
        """
        from node2vec_tpu.models.hsoftmax import (
            build_huffman,
            cap_code_length,
            head_level_offsets,
            hs_epoch,
        )
        from node2vec_tpu.utils.checkpoint import (
            load_train_state,
            save_train_state,
        )

        p = self.params
        n_v = self.vocab.n_vertices
        tree = cap_code_length(
            build_huffman(self.vocab.counts), self.vocab.counts,
            max_len=self.params.hs_max_code_length or None,
        )
        hs_points = jnp.asarray(tree.points)
        hs_codes = jnp.asarray(tree.codes)
        hs_len = jnp.asarray(tree.lengths)
        hs_head = head_level_offsets(tree, table_rows=tree.n_inner)
        vocab_mask = jnp.asarray(self.vocab.mask)

        key = jax.random.PRNGKey(p.seed)
        emb_in = jax.random.uniform(
            key, (n_v, p.vector_size), jnp.float32,
            -0.5 / p.vector_size, 0.5 / p.vector_size,
        )
        theta = jnp.zeros((tree.n_inner, p.vector_size), jnp.float32)
        acc_in = jnp.zeros((n_v,), jnp.float32)
        acc_theta = jnp.zeros((tree.n_inner,), jnp.float32)
        start_epoch = 0
        ckpt = load_train_state(checkpoint_dir)
        if ckpt is not None:
            start_epoch, e_in, th, a_in, a_th = ckpt
            emb_in = jnp.asarray(e_in)
            theta = jnp.asarray(th)
            acc_in = jnp.asarray(a_in)
            acc_theta = jnp.asarray(a_th)
            logger.info("resuming HS training from epoch %d", start_epoch)
        # dim-64 half-tile fix (skipgram.pack_rows): both tables live packed
        # between steps; checkpoints and self.emb_* stay logical [N, D]
        packed = use_packed_rows(n_v, p.vector_size)
        if packed:
            emb_in, theta = pack_rows(emb_in), pack_rows(theta)

        n_walks = len(walks)
        batch = _effective_batch(p.batch_walks, n_walks)
        n_batches = (n_walks + batch - 1) // batch
        total_steps = max(p.max_iter * n_batches, 1)
        n_padded = n_batches * batch
        if is_device:
            corpus = walks.astype(jnp.int32)
            if n_padded > n_walks:
                pad = jnp.full((n_padded - n_walks, walks.shape[1]), -1, jnp.int32)
                corpus = jnp.concatenate([corpus, pad])
        else:
            corpus_host = np.full((n_padded, walks.shape[1]), -1, dtype=np.int32)
            corpus_host[:n_walks] = walks
            corpus = jnp.asarray(corpus_host)

        lr_slope = p.step_size / total_steps
        keep = self._keep_table()
        self._losses = []
        for epoch in range(start_epoch, p.max_iter):
            k_shuffle = jax.random.fold_in(key, 1_000_000 + epoch)
            shuffled = corpus[jax.random.permutation(k_shuffle, n_padded)]
            if keep is not None:
                shuffled = _subsample_walks(
                    shuffled, jax.random.fold_in(key, 2_000_000 + epoch), keep
                )
            ctx = timer.measure("hs_epoch") if timer is not None else None
            if ctx is not None:
                ctx.__enter__()
            emb_in, theta, acc_in, acc_theta, losses = hs_epoch(
                emb_in, theta, acc_in, acc_theta, shuffled, key,
                jnp.int32(epoch * n_batches), jnp.float32(p.step_size),
                jnp.float32(lr_slope), hs_points, hs_codes, hs_len,
                vocab_mask,
                batch=batch, n_batches=n_batches, window=p.window_size,
                shrink_window=p.shrink_window, min_lr=p.min_step_size,
                head_offsets=hs_head, packed=packed,
            )
            if ctx is not None:
                ctx.__exit__(None, None, None)
            self._losses.append(float(losses.mean()))
            if verbose:
                logger.info(
                    "hs epoch %d/%d loss=%.4f", epoch + 1, p.max_iter,
                    self._losses[-1],
                )
            if checkpoint_dir and (epoch + 1) % checkpoint_every == 0:
                save_train_state(
                    checkpoint_dir,
                    epoch + 1,
                    self._ckpt_table(emb_in, n_v, packed),
                    self._ckpt_table(theta, tree.n_inner, packed),
                    np.asarray(acc_in),
                    np.asarray(acc_theta),
                )
        self.emb_in = unpack_rows(emb_in, n_v) if packed else emb_in
        self.emb_out = unpack_rows(theta, tree.n_inner) if packed else theta
        return self

    def _fit_cbow(
        self, walks, is_device, verbose, timer=None,
        checkpoint_dir=None, checkpoint_every=1,
    ) -> "Word2VecTPU":
        """CBOW training path (params.sg == 0; models/cbow.py).

        Covers both variants of the architecture: ``negative>0`` trains
        CBOW with shared negative sampling, ``negative==0`` CBOW with
        hierarchical softmax (the gensim default combination is sg=0 +
        negative per its own defaults).  Epoch structure mirrors the SGNS/HS
        paths: device-resident corpus, on-device shuffle (+ optional
        ``sample`` subsampling), one jit dispatch per epoch, per-epoch
        checkpoint/resume.
        """
        from node2vec_tpu.models.cbow import cbow_epoch, cbow_hs_epoch
        from node2vec_tpu.utils.checkpoint import (
            load_train_state,
            save_train_state,
        )

        p = self.params
        n_v = self.vocab.n_vertices
        use_hs = p.negative == 0
        vocab_mask = jnp.asarray(self.vocab.mask)
        emb_in, emb_out, acc_in, acc_out = init_embeddings(
            n_v, p.vector_size, seed=p.seed
        )
        if use_hs:
            from node2vec_tpu.models.hsoftmax import (
                build_huffman,
                cap_code_length,
            )

            tree = cap_code_length(
                build_huffman(self.vocab.counts), self.vocab.counts,
                max_len=self.params.hs_max_code_length or None,
            )
            hs_points = jnp.asarray(tree.points)
            hs_codes = jnp.asarray(tree.codes)
            hs_len = jnp.asarray(tree.lengths)
            # emb_out/acc_out slots carry the inner-node table (syn1)
            emb_out = jnp.zeros((tree.n_inner, p.vector_size), jnp.float32)
            acc_out = jnp.zeros((tree.n_inner,), jnp.float32)
        else:
            ns_alias = jnp.asarray(self.vocab.ns_alias)
            ns_prob = jnp.asarray(self.vocab.ns_prob)

        start_epoch = 0
        ckpt = load_train_state(checkpoint_dir)
        if ckpt is not None:
            start_epoch, e_in, e_out, a_in, a_out = ckpt
            emb_in = jnp.asarray(e_in)
            emb_out = jnp.asarray(e_out)
            acc_in = jnp.asarray(a_in)
            acc_out = jnp.asarray(a_out)
            logger.info("resuming CBOW training from epoch %d", start_epoch)
        # dim-64 half-tile fix (skipgram.pack_rows); n_out tracks the output
        # table's logical row count (V rows for NS, n_inner for HS/syn1)
        n_out = tree.n_inner if use_hs else n_v
        packed = use_packed_rows(n_v, p.vector_size)
        if packed:
            emb_in, emb_out = pack_rows(emb_in), pack_rows(emb_out)

        n_walks = len(walks)
        batch = _effective_batch(p.batch_walks, n_walks)
        n_batches = (n_walks + batch - 1) // batch
        total_steps = max(p.max_iter * n_batches, 1)
        n_padded = n_batches * batch
        if is_device:
            corpus = walks.astype(jnp.int32)
            if n_padded > n_walks:
                pad = jnp.full((n_padded - n_walks, walks.shape[1]), -1, jnp.int32)
                corpus = jnp.concatenate([corpus, pad])
        else:
            corpus_host = np.full((n_padded, walks.shape[1]), -1, dtype=np.int32)
            corpus_host[:n_walks] = walks
            corpus = jnp.asarray(corpus_host)

        lr_slope = p.step_size / total_steps
        root_key = jax.random.PRNGKey(p.seed)
        keep = self._keep_table()
        self._losses = []
        for epoch in range(start_epoch, p.max_iter):
            k_shuffle = jax.random.fold_in(root_key, 1_000_000 + epoch)
            shuffled = corpus[jax.random.permutation(k_shuffle, n_padded)]
            if keep is not None:
                shuffled = _subsample_walks(
                    shuffled, jax.random.fold_in(root_key, 2_000_000 + epoch), keep
                )
            ctx = timer.measure("cbow_epoch") if timer is not None else None
            if ctx is not None:
                ctx.__enter__()
            if use_hs:
                emb_in, emb_out, acc_in, acc_out, losses = cbow_hs_epoch(
                    emb_in, emb_out, acc_in, acc_out, shuffled, root_key,
                    jnp.int32(epoch * n_batches), jnp.float32(p.step_size),
                    jnp.float32(lr_slope), hs_points, hs_codes, hs_len,
                    vocab_mask,
                    batch=batch, n_batches=n_batches, window=p.window_size,
                    shrink_window=p.shrink_window, min_lr=p.min_step_size,
                    cbow_mean=p.cbow_mean, packed=packed,
                )
            else:
                emb_in, emb_out, acc_in, acc_out, losses = cbow_epoch(
                    emb_in, emb_out, acc_in, acc_out, shuffled, root_key,
                    jnp.int32(epoch * n_batches), jnp.float32(p.step_size),
                    jnp.float32(lr_slope), ns_alias, ns_prob, vocab_mask,
                    batch=batch, n_batches=n_batches, window=p.window_size,
                    negatives=p.negative,
                    shared_negatives=self.shared_negatives,
                    shrink_window=p.shrink_window, min_lr=p.min_step_size,
                    cbow_mean=p.cbow_mean, packed=packed,
                )
            if ctx is not None:
                ctx.__exit__(None, None, None)
            self._losses.append(float(losses.mean()))
            if verbose:
                logger.info(
                    "cbow epoch %d/%d loss=%.4f", epoch + 1, p.max_iter,
                    self._losses[-1],
                )
            if checkpoint_dir and (epoch + 1) % checkpoint_every == 0:
                save_train_state(
                    checkpoint_dir,
                    epoch + 1,
                    self._ckpt_table(emb_in, n_v, packed),
                    self._ckpt_table(emb_out, n_out, packed),
                    np.asarray(acc_in),
                    np.asarray(acc_out),
                )
        self.emb_in = unpack_rows(emb_in, n_v) if packed else emb_in
        self.emb_out = unpack_rows(emb_out, n_out) if packed else emb_out
        return self

    def fit_streaming_sharded(
        self,
        walk_source,
        n_chunks: int,
        mesh,
        n_vertices: int,
        table_sharding: str = "row",
        verbose: bool = False,
        timer=None,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every_chunks: int = 0,
        source_token: str = "",
    ) -> "Word2VecTPU":
        """Streaming virtual corpus × row-sharded tables — the unbounded
        configuration: V bounded only by aggregate mesh HBM (rows
        mod-sharded, O(batch·D) routed comm) and corpus size bounded by
        nothing (chunks regenerate on device from the walk seed, chunk k+1
        dispatching while chunk k trains).

        ``walk_source(i)`` must return mesh-sharded walk chunks
        (WalkEngine.chunk_source with a mesh-attached engine).  Row mode
        only: a streamed corpus makes no difference to the column trainer's
        per-device full-table replica — use fit_sharded for that.

        ``checkpoint_dir``: same contract as fit_streaming — chunk-boundary
        snapshots (state unsharded to host, resharded on resume); a resumed
        run reproduces the uninterrupted trajectory bit-for-bit.
        """
        from jax.sharding import NamedSharding, PartitionSpec as Pspec

        from node2vec_tpu.models.vocab import build_vocab_from_counts
        from node2vec_tpu.parallel.rowsharded_sgns import (
            AXES,
            init_row_state,
            row_sgns_epoch,
            row_state_from_host,
            row_state_to_host,
            unshard_rows,
        )
        from node2vec_tpu.utils.checkpoint import (
            load_stream_state,
            save_stream_state,
            stream_fingerprint,
        )

        if self.params.sg == 0:
            raise ValueError(
                "CBOW (sg=0) is supported on the single-device and streaming "
                "trainers (fit/fit_streaming); the sharded trainers are "
                "skip-gram only — set sg=1 or train unsharded"
            )
        if table_sharding != "row":
            raise ValueError(
                "streaming sharded training requires table_sharding='row' "
                "(column mode replicates the full table per data shard — "
                "materialize the corpus and use fit_sharded instead)"
            )
        p = self.params
        n_dev = int(np.prod([mesh.shape[a] for a in AXES]))

        fp = stream_fingerprint(
            p, n_chunks, n_vertices, token=source_token + "|row-sharded"
        )
        resume = load_stream_state(checkpoint_dir, fp)
        chunk_walks = None
        cur_losses = np.zeros(0, np.float32)
        start_epoch = start_chunk = 0
        if resume is not None:
            (start_epoch, start_chunk, e_in_r, e_out_r, a_in_r, a_out_r,
             prev_losses, cur_losses, counts_host, chunk_walks) = resume
            logger.info(
                "resuming row-sharded streaming training at epoch %d "
                "chunk %d", start_epoch, start_chunk,
            )
        else:
            # pass 1: exact corpus counts (chunks stay mesh-sharded)
            counts_host, _ = _streaming_counts(
                walk_source, n_chunks, n_vertices
            )
        self.vocab = build_vocab_from_counts(
            counts_host, min_count=p.min_count, ns_exponent=p.ns_exponent
        )
        if self.vocab.n_kept == 0:
            raise ValueError(f"No vertex meets min_count={p.min_count}")

        rep = NamedSharding(mesh, Pspec())
        sh_corpus = NamedSharding(mesh, Pspec(AXES, None))
        mask = jax.device_put(jnp.asarray(self.vocab.mask), rep)
        keep = self._keep_table()
        if keep is not None:
            keep = jax.device_put(keep, rep)
        use_hs = p.negative == 0
        if use_hs:
            from node2vec_tpu.models.hsoftmax import (
                build_huffman,
                cap_code_length,
                head_level_offsets,
            )
            from node2vec_tpu.parallel.rowsharded_hs import (
                init_hs_row_state,
                row_hs_epoch,
                unshard_hs_rows,
            )

            tree = cap_code_length(
                build_huffman(self.vocab.counts), self.vocab.counts,
                max_len=self.params.hs_max_code_length or None,
            )
            hs_points = jax.device_put(jnp.asarray(tree.points), rep)
            hs_codes = jax.device_put(jnp.asarray(tree.codes), rep)
            hs_len = jax.device_put(jnp.asarray(tree.lengths), rep)
            hs_head = head_level_offsets(
                tree, table_rows=-(-tree.n_inner // n_dev)
            )
            state = init_hs_row_state(
                mesh, n_vertices, tree.n_inner, p.vector_size, seed=p.seed
            )
            if resume is not None:
                from node2vec_tpu.parallel.rowsharded_hs import (
                    hs_state_from_host,
                )

                state = hs_state_from_host(
                    mesh, e_in_r, e_out_r, a_in_r, a_out_r
                )
        else:
            ns_alias = jax.device_put(jnp.asarray(self.vocab.ns_alias), rep)
            ns_prob = jax.device_put(jnp.asarray(self.vocab.ns_prob), rep)
            state = init_row_state(mesh, n_vertices, p.vector_size, seed=p.seed)
            if resume is not None:
                state = row_state_from_host(
                    mesh, e_in_r, e_out_r, a_in_r, a_out_r
                )

        def _state_to_host(st):
            if use_hs:
                from node2vec_tpu.parallel.rowsharded_hs import (
                    hs_state_to_host,
                )

                return hs_state_to_host(st, n_dev)
            return row_state_to_host(st, n_dev)

        def _snapshot(epoch_next, chunk_next, st, epoch_losses):
            cur = (
                np.concatenate([np.asarray(x).reshape(-1) for x in epoch_losses])
                if epoch_losses
                else np.zeros(0, np.float32)
            )
            save_stream_state(
                checkpoint_dir, fp, epoch_next, chunk_next,
                *_state_to_host(st),
                epoch_losses=np.asarray(self._losses, np.float32),
                cur_losses=cur,
                counts=counts_host, chunk_walks=chunk_walks or 0,
            )

        root_key = jax.random.PRNGKey(p.seed)
        rng = np.random.default_rng(p.seed)
        orders = [rng.permutation(n_chunks) for _ in range(p.max_iter)]
        self._losses = (
            [float(x) for x in prev_losses] if resume is not None else []
        )
        step0 = 0
        lr_slope = None
        if chunk_walks is not None:  # resume: geometry known from snapshot
            batch_local = max(
                _effective_batch(p.batch_walks, chunk_walks, floor=n_dev,
                                 target_updates=max(512 // n_chunks, 1))
                // n_dev, 1)
            n_batches = max((chunk_walks // n_dev) // batch_local, 1)
            lr_slope = p.step_size / max(p.max_iter * n_chunks * n_batches, 1)
            step0 = (start_epoch * n_chunks + start_chunk) * n_batches
        total_dropped = 0
        for epoch in range(start_epoch, p.max_iter):
            order = orders[epoch]
            skip = start_chunk if epoch == start_epoch else 0
            if skip >= n_chunks:
                continue  # defensive: epoch-end snapshots normalize to (e+1, 0)
            epoch_losses = []
            if epoch == start_epoch and len(cur_losses):
                epoch_losses.append(jnp.asarray(cur_losses))
            pending = walk_source(int(order[skip]))
            for i in range(skip, n_chunks):
                nxt = (
                    walk_source(int(order[i + 1]))
                    if i + 1 < n_chunks
                    else None  # prefetch: dispatched before training blocks
                )
                if pending.shape[0] % n_dev:
                    # pad to whole device shards with dead (-1) rows — the
                    # trainers mask them; chunk sizes are constant so this
                    # compiles once
                    pad = n_dev - pending.shape[0] % n_dev
                    pending = jnp.concatenate(
                        [
                            pending,
                            jnp.full((pad, pending.shape[1]), -1, jnp.int32),
                        ]
                    )
                # stride-interleave rows so each device's contiguous shard
                # is a stride-n_dev sample of the chunk (walk chunks are
                # walker-id ordered = a contiguous vertex range; per-shard
                # on-device shuffles never cross devices)
                n_c = pending.shape[0]
                pending = (
                    pending.reshape(n_c // n_dev, n_dev, -1)
                    .transpose(1, 0, 2)
                    .reshape(n_c, -1)
                )
                corpus = jax.device_put(pending, sh_corpus)
                if keep is not None:
                    corpus = _subsample_walks(
                        corpus,
                        jax.random.fold_in(
                            root_key, 10_000_000 + epoch * n_chunks + i
                        ),
                        keep,
                    )
                n_walks_c = corpus.shape[0]
                if chunk_walks is None:
                    chunk_walks = n_walks_c
                    batch_local = max(
                        _effective_batch(
                            p.batch_walks, n_walks_c, floor=n_dev,
                            target_updates=max(512 // n_chunks, 1),
                        ) // n_dev, 1
                    )
                    n_batches = max((n_walks_c // n_dev) // batch_local, 1)
                    total_steps = max(p.max_iter * n_chunks * n_batches, 1)
                    lr_slope = p.step_size / total_steps
                elif n_walks_c != chunk_walks:
                    raise ValueError(
                        f"walk_source chunk {int(order[i])} has "
                        f"{n_walks_c} walks, expected {chunk_walks} — "
                        "streaming requires constant chunk shapes"
                    )
                key = jax.random.fold_in(
                    root_key, 9_000_000 + epoch * n_chunks + i
                )
                ctx = (
                    timer.measure("stream_chunk") if timer is not None else None
                )
                if ctx is not None:
                    ctx.__enter__()
                if use_hs:
                    state, losses, dropped = row_hs_epoch(
                        mesh, state, corpus, key, step0, p.step_size,
                        lr_slope, hs_points, hs_codes, hs_len, mask,
                        batch_local=batch_local, n_batches=n_batches,
                        window=p.window_size, shrink_window=p.shrink_window,
                        min_lr=p.min_step_size, head_offsets=hs_head,
                    )
                else:
                    state, losses, dropped = row_sgns_epoch(
                        mesh, state, corpus, key, step0, p.step_size,
                        lr_slope, ns_alias, ns_prob, mask,
                        batch_local=batch_local, n_batches=n_batches,
                        window=p.window_size, negatives=p.negative,
                        shared_negatives=self.shared_negatives,
                        shrink_window=p.shrink_window,
                        min_lr=p.min_step_size,
                    )
                if ctx is not None:
                    ctx.__exit__(None, None, None)
                total_dropped += int(dropped)
                step0 += n_batches
                epoch_losses.append(losses)
                pending = nxt
                if (i + 1) % 4 == 0:
                    jax.block_until_ready(losses)  # bound enqueue depth
                if (
                    checkpoint_dir
                    and checkpoint_every_chunks > 0
                    and i + 1 < n_chunks
                    and (i + 1) % checkpoint_every_chunks == 0
                ):
                    _snapshot(epoch, i + 1, state, epoch_losses)
            self._losses.append(
                float(jnp.mean(jnp.concatenate(
                    [jnp.asarray(x).reshape(-1) for x in epoch_losses]
                )))
            )
            if verbose:
                logger.info(
                    "streaming row-sharded epoch %d/%d loss=%.4f",
                    epoch + 1, p.max_iter, self._losses[-1],
                )
            if checkpoint_dir:
                _snapshot(epoch + 1, 0, state, [])
        if total_dropped:
            logger.warning(
                "row-sharded training dropped %d routed rows to capacity "
                "overflow (raise cap_slack or batch size)", total_dropped,
            )
        if use_hs:
            self.emb_in, self.emb_out = unshard_hs_rows(state, n_dev)
        else:
            self.emb_in, self.emb_out = unshard_rows(state, n_dev)
        return self

    def fit_sharded(
        self,
        walks: np.ndarray,
        mesh,
        n_vertices: Optional[int] = None,
        verbose: bool = False,
        table_sharding: str = "column",
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 1,
    ) -> "Word2VecTPU":
        """Multi-device training over a (data × model) mesh.

        Two table layouts:

        * ``table_sharding="column"`` — TP columns over 'model', full-table
          replica per data shard, dense psum per step.  Bit-matches the
          single-device trainer under TP-only meshes; V capped by one
          device's HBM.  Each epoch is ONE jit dispatch (on-device shuffle +
          batch scan) — host transfers are scalars only.
        * ``table_sharding="row"`` — rows mod-sharded over ALL devices with
          sparse all-to-all routing (parallel.rowsharded_sgns): per-step comm
          is O(batch·D) independent of V, lifting the vertex-count ceiling.
          The whole epoch is one jit dispatch.

        The reference's only scaling story is spark.ml's once-per-iteration
        parameter averaging (SURVEY.md §2.2); both modes are synchronous
        equivalents with genuinely sharded state.
        """
        from jax.sharding import NamedSharding, PartitionSpec as Pspec

        from node2vec_tpu.parallel.sharded_sgns import (
            col_sgns_epoch,
            init_sharded_state,
        )

        if self.params.sg == 0:
            raise ValueError(
                "CBOW (sg=0) is supported on the single-device and streaming "
                "trainers (fit/fit_streaming); the sharded trainers are "
                "skip-gram only — set sg=1 or train unsharded"
            )
        if self.params.negative == 0:
            if table_sharding != "row":
                # column-sharded HS would replicate the [n_inner, D] tree
                # table per data shard — the row mode is the scaling path
                raise ValueError(
                    "hierarchical softmax (negative=0) requires "
                    "table_sharding='row' in the sharded trainer (the "
                    "inner-node table is row-sharded like the embeddings)"
                )
            return self._fit_row_sharded_hs(
                walks, mesh, n_vertices, verbose, checkpoint_dir,
                checkpoint_every,
            )
        if table_sharding == "row":
            return self._fit_row_sharded(
                walks, mesh, n_vertices, verbose, checkpoint_dir,
                checkpoint_every,
            )

        p = self.params
        walks = np.asarray(walks, dtype=np.int32)
        self.vocab = build_vocab(
            walks, n_vertices, min_count=p.min_count, ns_exponent=p.ns_exponent
        )
        n_v = self.vocab.n_vertices
        if self.vocab.n_kept == 0:
            raise ValueError(f"No vertex meets min_count={p.min_count}")
        n_data = mesh.shape["data"]
        n_model = mesh.shape["model"]
        if p.vector_size % n_model:
            raise ValueError(
                f"vector_size {p.vector_size} not divisible by model axis {n_model}"
            )

        from node2vec_tpu.parallel.sharded_sgns import ShardedSGNSState
        from node2vec_tpu.utils.checkpoint import (
            load_train_state,
            save_train_state,
        )

        state = init_sharded_state(mesh, n_v, p.vector_size, seed=p.seed)
        start_epoch = 0
        ckpt = load_train_state(checkpoint_dir)
        if ckpt is not None:
            start_epoch, e_in, e_out, a_in, a_out = ckpt
            col = NamedSharding(mesh, Pspec(None, "model"))
            rep0 = NamedSharding(mesh, Pspec())
            state = ShardedSGNSState(
                emb_in=jax.device_put(jnp.asarray(e_in), col),
                emb_out=jax.device_put(jnp.asarray(e_out), col),
                acc_in=jax.device_put(jnp.asarray(a_in), rep0),
                acc_out=jax.device_put(jnp.asarray(a_out), rep0),
            )
            logger.info("resuming sharded training from epoch %d", start_epoch)
        rep = NamedSharding(mesh, Pspec())
        ns_alias = jax.device_put(jnp.asarray(self.vocab.ns_alias), rep)
        ns_prob = jax.device_put(jnp.asarray(self.vocab.ns_prob), rep)
        mask = jax.device_put(jnp.asarray(self.vocab.mask), rep)

        n_walks = len(walks)
        batch = _effective_batch(p.batch_walks, n_walks)
        batch -= batch % n_data or 0
        batch = max(batch, n_data)
        batch_local = batch // n_data
        n_batches = (n_walks + batch - 1) // batch
        total_steps = max(p.max_iter * n_batches, 1)
        lr_slope = p.step_size / total_steps
        root_key = jax.random.PRNGKey(p.seed)

        # corpus padded to whole sharded batches, resident on the mesh; a
        # one-time host shuffle stratifies rows across data shards (each
        # epoch then reshuffles per-shard on device)
        n_used = n_batches * batch
        corpus_host = np.full((n_used, walks.shape[1]), -1, dtype=np.int32)
        corpus_host[: min(n_walks, n_used)] = walks[:n_used]
        rng = np.random.default_rng(p.seed)
        corpus = jax.device_put(
            jnp.asarray(corpus_host[rng.permutation(n_used)]),
            NamedSharding(mesh, Pspec("data", None)),
        )

        keep = self._keep_table()
        if keep is not None:
            keep = jax.device_put(keep, rep)
        self._losses = []
        for epoch in range(start_epoch, p.max_iter):
            ep_corpus = corpus
            if keep is not None:
                ep_corpus = _subsample_walks(
                    corpus, jax.random.fold_in(root_key, 2_500_000 + epoch), keep
                )
            state, losses = col_sgns_epoch(
                mesh,
                state,
                ep_corpus,
                jax.random.fold_in(root_key, 500_000 + epoch),
                epoch * n_batches,
                p.step_size,
                lr_slope,
                ns_alias,
                ns_prob,
                mask,
                batch_local=batch_local,
                n_batches=n_batches,
                window=p.window_size,
                negatives=p.negative,
                shared_negatives=self.shared_negatives,
                shrink_window=p.shrink_window,
                min_lr=p.min_step_size,
            )
            self._losses.append(float(losses.mean()))
            if verbose:
                logger.info(
                    "sharded epoch %d/%d loss=%.4f", epoch + 1, p.max_iter,
                    self._losses[-1],
                )
            if checkpoint_dir and (epoch + 1) % checkpoint_every == 0:
                save_train_state(
                    checkpoint_dir,
                    epoch + 1,
                    np.asarray(state.emb_in),
                    np.asarray(state.emb_out),
                    np.asarray(state.acc_in),
                    np.asarray(state.acc_out),
                )

        self.emb_in = state.emb_in
        self.emb_out = state.emb_out
        return self

    def _fit_row_sharded(
        self,
        walks: np.ndarray,
        mesh,
        n_vertices: Optional[int],
        verbose: bool,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 1,
    ) -> "Word2VecTPU":
        """Row-sharded trainer: one jit dispatch per epoch, O(batch·D) comm."""
        from jax.sharding import NamedSharding, PartitionSpec as Pspec

        from node2vec_tpu.parallel.rowsharded_sgns import (
            AXES,
            init_row_state,
            row_sgns_epoch,
            row_state_from_host,
            row_state_to_host,
            unshard_rows,
        )
        from node2vec_tpu.utils.checkpoint import (
            load_train_state,
            save_train_state,
        )

        p = self.params
        walks = np.asarray(walks, dtype=np.int32)
        self.vocab = build_vocab(
            walks, n_vertices, min_count=p.min_count, ns_exponent=p.ns_exponent
        )
        n_v = self.vocab.n_vertices
        if self.vocab.n_kept == 0:
            raise ValueError(f"No vertex meets min_count={p.min_count}")
        n_dev = int(np.prod([mesh.shape[a] for a in AXES]))

        n_walks = len(walks)
        batch = max(
            _effective_batch(p.batch_walks, n_walks, floor=n_dev) // n_dev, 1
        ) * n_dev
        batch_local = batch // n_dev
        n_batches = max(n_walks // batch, 1)
        # pad/trim the corpus to whole sharded batches (dead rows are -1)
        n_used = n_batches * batch
        corpus_host = np.full((n_used, walks.shape[1]), -1, dtype=np.int32)
        corpus_host[: min(n_walks, n_used)] = walks[:n_used]
        # permute rows so each device's contiguous shard is a stratified
        # sample of the whole corpus — walk corpora are copy-major, so an
        # unpermuted split gives every device one narrow vertex range for
        # the entire run (shuffling then happens per-shard on device each
        # epoch, which never crosses devices)
        rng = np.random.default_rng(p.seed)
        corpus_host = corpus_host[rng.permutation(n_used)]
        corpus = jax.device_put(
            jnp.asarray(corpus_host),
            NamedSharding(mesh, Pspec(AXES, None)),
        )
        rep = NamedSharding(mesh, Pspec())
        ns_alias = jax.device_put(jnp.asarray(self.vocab.ns_alias), rep)
        ns_prob = jax.device_put(jnp.asarray(self.vocab.ns_prob), rep)
        mask = jax.device_put(jnp.asarray(self.vocab.mask), rep)

        state = init_row_state(mesh, n_v, p.vector_size, seed=p.seed)
        start_epoch = 0
        ckpt = load_train_state(checkpoint_dir)
        if ckpt is not None:
            start_epoch, e_in, e_out, a_in, a_out = ckpt
            state = row_state_from_host(mesh, e_in, e_out, a_in, a_out)
            logger.info("resuming row-sharded training from epoch %d", start_epoch)
        total_steps = max(p.max_iter * n_batches, 1)
        lr_slope = p.step_size / total_steps
        root_key = jax.random.PRNGKey(p.seed)

        keep = self._keep_table()
        if keep is not None:
            keep = jax.device_put(keep, rep)
        self._losses = []
        total_dropped = 0
        for epoch in range(start_epoch, p.max_iter):
            ep_corpus = corpus
            if keep is not None:
                ep_corpus = _subsample_walks(
                    corpus, jax.random.fold_in(root_key, 3_000_000 + epoch), keep
                )
            state, losses, dropped = row_sgns_epoch(
                mesh,
                state,
                ep_corpus,
                jax.random.fold_in(root_key, epoch),
                epoch * n_batches,
                p.step_size,
                lr_slope,
                ns_alias,
                ns_prob,
                mask,
                batch_local=batch_local,
                n_batches=n_batches,
                window=p.window_size,
                negatives=p.negative,
                shared_negatives=self.shared_negatives,
                shrink_window=p.shrink_window,
                min_lr=p.min_step_size,
            )
            total_dropped += int(dropped)
            self._losses.append(float(losses.mean()))
            if verbose:
                logger.info(
                    "row-sharded epoch %d/%d loss=%.4f", epoch + 1,
                    p.max_iter, self._losses[-1],
                )
            if checkpoint_dir and (epoch + 1) % checkpoint_every == 0:
                save_train_state(
                    checkpoint_dir, epoch + 1, *row_state_to_host(state, n_dev)
                )
        if total_dropped:
            logger.warning(
                "row-sharded training dropped %d routed rows to capacity "
                "overflow (raise cap_slack or batch size)", total_dropped,
            )
        self.emb_in, self.emb_out = unshard_rows(state, n_dev)
        return self

    def _fit_row_sharded_hs(
        self,
        walks: np.ndarray,
        mesh,
        n_vertices: Optional[int],
        verbose: bool,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 1,
    ) -> "Word2VecTPU":
        """Row-sharded HS: emb_in AND the Huffman inner-node table (syn1)
        mod-sharded across the mesh; the reference's default objective at
        vertex counts beyond one device's HBM (parallel/rowsharded_hs.py)."""
        from jax.sharding import NamedSharding, PartitionSpec as Pspec

        from node2vec_tpu.models.hsoftmax import (
            build_huffman,
            cap_code_length,
            head_level_offsets,
        )
        from node2vec_tpu.parallel.rowsharded_hs import (
            hs_state_from_host,
            hs_state_to_host,
            init_hs_row_state,
            row_hs_epoch,
            unshard_hs_rows,
        )
        from node2vec_tpu.parallel.rowsharded_sgns import AXES
        from node2vec_tpu.utils.checkpoint import (
            load_train_state,
            save_train_state,
        )

        p = self.params
        walks = np.asarray(walks, dtype=np.int32)
        self.vocab = build_vocab(
            walks, n_vertices, min_count=p.min_count, ns_exponent=p.ns_exponent
        )
        n_v = self.vocab.n_vertices
        if self.vocab.n_kept == 0:
            raise ValueError(f"No vertex meets min_count={p.min_count}")
        n_dev = int(np.prod([mesh.shape[a] for a in AXES]))

        tree = cap_code_length(
            build_huffman(self.vocab.counts), self.vocab.counts,
            max_len=self.params.hs_max_code_length or None,
        )
        rep = NamedSharding(mesh, Pspec())
        hs_points = jax.device_put(jnp.asarray(tree.points), rep)
        hs_codes = jax.device_put(jnp.asarray(tree.codes), rep)
        hs_len = jax.device_put(jnp.asarray(tree.lengths), rep)
        mask = jax.device_put(jnp.asarray(self.vocab.mask), rep)

        n_walks = len(walks)
        batch = max(
            _effective_batch(p.batch_walks, n_walks, floor=n_dev) // n_dev, 1
        ) * n_dev
        batch_local = batch // n_dev
        n_batches = max(n_walks // batch, 1)
        n_used = n_batches * batch
        corpus_host = np.full((n_used, walks.shape[1]), -1, dtype=np.int32)
        corpus_host[: min(n_walks, n_used)] = walks[:n_used]
        # stratify rows across data shards (see _fit_row_sharded)
        rng = np.random.default_rng(p.seed)
        corpus_host = corpus_host[rng.permutation(n_used)]
        corpus = jax.device_put(
            jnp.asarray(corpus_host),
            NamedSharding(mesh, Pspec(AXES, None)),
        )

        state = init_hs_row_state(
            mesh, n_v, tree.n_inner, p.vector_size, seed=p.seed
        )
        start_epoch = 0
        ckpt = load_train_state(checkpoint_dir)
        if ckpt is not None:
            start_epoch, e_in, theta, a_in, a_th = ckpt
            state = hs_state_from_host(mesh, e_in, theta, a_in, a_th)
            logger.info(
                "resuming row-sharded HS training from epoch %d", start_epoch
            )
        total_steps = max(p.max_iter * n_batches, 1)
        lr_slope = p.step_size / total_steps
        root_key = jax.random.PRNGKey(p.seed)

        keep = self._keep_table()
        if keep is not None:
            keep = jax.device_put(keep, rep)
        self._losses = []
        total_dropped = 0
        for epoch in range(start_epoch, p.max_iter):
            ep_corpus = corpus
            if keep is not None:
                ep_corpus = _subsample_walks(
                    corpus, jax.random.fold_in(root_key, 3_000_000 + epoch), keep
                )
            state, losses, dropped = row_hs_epoch(
                mesh,
                state,
                ep_corpus,
                jax.random.fold_in(root_key, epoch),
                epoch * n_batches,
                p.step_size,
                lr_slope,
                hs_points,
                hs_codes,
                hs_len,
                mask,
                batch_local=batch_local,
                n_batches=n_batches,
                window=p.window_size,
                shrink_window=p.shrink_window,
                min_lr=p.min_step_size,
                head_offsets=head_level_offsets(
                    tree, table_rows=-(-tree.n_inner // n_dev)
                ),
            )
            total_dropped += int(dropped)
            self._losses.append(float(losses.mean()))
            if verbose:
                logger.info(
                    "row-sharded HS epoch %d/%d loss=%.4f", epoch + 1,
                    p.max_iter, self._losses[-1],
                )
            if checkpoint_dir and (epoch + 1) % checkpoint_every == 0:
                save_train_state(
                    checkpoint_dir, epoch + 1, *hs_state_to_host(state, n_dev)
                )
        if total_dropped:
            logger.warning(
                "row-sharded HS training dropped %d routed rows to capacity "
                "overflow (raise cap_slack or batch size)", total_dropped,
            )
        self.emb_in, self.emb_out = unshard_hs_rows(state, n_dev)
        return self

    @property
    def emb_in(self) -> Optional[np.ndarray]:
        """Input table as numpy; device->host readback happens lazily here
        (the tunnel readback of a [V, D] table costs seconds — training code
        keeps results on device and only a host consumer pays this)."""
        if self._emb_in is not None and not isinstance(self._emb_in, np.ndarray):
            self._emb_in = np.asarray(self._emb_in)
        return self._emb_in

    @emb_in.setter
    def emb_in(self, v) -> None:
        self._emb_in = v

    @property
    def emb_out(self) -> Optional[np.ndarray]:
        if self._emb_out is not None and not isinstance(self._emb_out, np.ndarray):
            self._emb_out = np.asarray(self._emb_out)
        return self._emb_out

    @emb_out.setter
    def emb_out(self, v) -> None:
        self._emb_out = v

    @property
    def vectors(self) -> np.ndarray:
        """Input embedding table [V, D] (word2vec convention: input side)."""
        if self._emb_in is None:
            raise RuntimeError("model not fitted yet")
        return self.emb_in

    def vector(self, vertex_id: int) -> np.ndarray:
        v = self.vectors[vertex_id]
        if self.vocab is not None and not self.vocab.mask[vertex_id]:
            raise KeyError(f"vertex {vertex_id} below min_count (not in vocabulary)")
        return v
