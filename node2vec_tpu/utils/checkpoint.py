"""Checkpoint/resume for walks and training.

The reference truncates Spark lineage every 10 walk steps and relies on
recompute-from-checkpoint for recovery (``/root/reference/node2vec/spark.py:
562-563,597-598``, ``fugue.py:127,149``), plus coarse parquet handoff between
pipeline stages (``examples/native_spark.py:39-61``).  The TPU equivalents:

* **walk chunks** — each completed walker chunk is persisted; a restarted run
  skips chunks already on disk (finer-grained than the reference's all-or-
  nothing stage restart, and no lineage recompute needed);
* **train state** — embedding tables + Adagrad accumulators + epoch counter
  saved every K epochs; fit() resumes from the latest epoch.
"""

from __future__ import annotations

import hashlib
import logging
import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def graph_digest(indices: np.ndarray, weights: np.ndarray) -> str:
    """Cheap content digest of a CSR edge set: exact E + weight sum +
    strided samples of indices/weights (O(1k) work at any graph size)."""
    h = hashlib.sha256()
    stride = max(len(indices) // 512, 1)
    h.update(
        f"E={len(indices)}|wsum={float(np.sum(weights, dtype=np.float64))}|".encode()
    )
    h.update(np.ascontiguousarray(indices[::stride]).tobytes())
    h.update(np.ascontiguousarray(weights[::stride]).tobytes())
    return h.hexdigest()[:16]


def walk_fingerprint(
    params,
    seed: int,
    starts: np.ndarray,
    n_vertices: int,
    graph_token: str = "",
    strategy: str = "",
) -> str:
    """Hash of everything that determines walk content, so a checkpoint dir
    reused with a different configuration is detected instead of silently
    serving stale walks (round-1 advisor finding).

    ``graph_token`` (from graph_digest) folds in the EDGE CONTENT and
    ``strategy`` the engine choice (including applied sampler-mode suffixes
    like ``blocked+sl``): same-V graphs with different edges, or a strategy/
    sampler switch (each engine draws a different bit-stream), must not
    reuse each other's chunks."""
    h = hashlib.sha256()
    h.update(repr(params).encode())
    h.update(
        f"|seed={seed}|V={n_vertices}|g={graph_token}|strategy={strategy}|".encode()
    )
    h.update(np.ascontiguousarray(starts, dtype=np.int32).tobytes())
    return h.hexdigest()[:32]


def _fingerprint_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "walks_fingerprint.txt")


def save_walk_chunk(
    checkpoint_dir: str,
    chunk_idx: int,
    paths: np.ndarray,
    fingerprint: Optional[str] = None,
) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    if fingerprint is not None and not os.path.exists(_fingerprint_path(checkpoint_dir)):
        with open(_fingerprint_path(checkpoint_dir), "w") as f:
            f.write(fingerprint)
    path = os.path.join(checkpoint_dir, f"walks_chunk_{chunk_idx:06d}.npz")
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, paths=paths)
    os.replace(tmp, path)
    return path


def load_walk_chunks(
    checkpoint_dir: Optional[str], fingerprint: Optional[str] = None
) -> Dict[int, np.ndarray]:
    """All persisted walk chunks as {chunk_idx: paths}.

    If ``fingerprint`` is given and the directory's stored fingerprint does
    not match (different seed/params/starts), the stale chunk files are
    REMOVED (they can never be valid again, and leaving them risks a crashed
    rerun later mixing old and new chunks under the new fingerprint).
    """
    if not checkpoint_dir or not os.path.isdir(checkpoint_dir):
        return {}
    if fingerprint is not None:
        fp_path = _fingerprint_path(checkpoint_dir)
        stored = open(fp_path).read().strip() if os.path.exists(fp_path) else None
        if stored != fingerprint:
            stale = [
                fn
                for fn in os.listdir(checkpoint_dir)
                if re.fullmatch(r"walks_chunk_(\d+)\.npz", fn)
            ]
            if stored is None and not stale:
                return {}  # fresh dir: nothing to discard, nothing to warn
            logger.warning(
                "walk checkpoint dir %s was written by a different "
                "configuration (fingerprint %s != %s); discarding %d stale "
                "chunk(s)", checkpoint_dir, stored, fingerprint, len(stale),
            )
            for fn in stale:
                os.remove(os.path.join(checkpoint_dir, fn))
            if stored is not None:
                os.remove(fp_path)
            return {}
    out = {}
    for fn in os.listdir(checkpoint_dir):
        m = re.fullmatch(r"walks_chunk_(\d+)\.npz", fn)
        if m:
            out[int(m.group(1))] = np.load(os.path.join(checkpoint_dir, fn))["paths"]
    return out


# Bump when the meaning of a saved table changes. v2: Huffman inner nodes
# renumbered breadth-first (models/hsoftmax.py level_offsets) — an HS theta
# saved under v1 would silently map every path to a permuted row.
TRAIN_STATE_VERSION = 2


def save_train_state(
    checkpoint_dir: str,
    epoch: int,
    emb_in: np.ndarray,
    emb_out: np.ndarray,
    acc_in: np.ndarray,
    acc_out: np.ndarray,
) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, "train_state.npz")
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp,
        version=np.int64(TRAIN_STATE_VERSION),
        epoch=np.int64(epoch),
        emb_in=emb_in,
        emb_out=emb_out,
        acc_in=acc_in,
        acc_out=acc_out,
    )
    os.replace(tmp, path)
    return path


def load_train_state(
    checkpoint_dir: Optional[str],
) -> Optional[Tuple[int, np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    if not checkpoint_dir:
        return None
    path = os.path.join(checkpoint_dir, "train_state.npz")
    if not os.path.exists(path):
        return None
    z = np.load(path)
    stored = int(z["version"]) if "version" in z else 1
    if stored != TRAIN_STATE_VERSION:
        logger.warning(
            "train-state checkpoint %s has format version %d (current %d); "
            "ignoring it and training from scratch", path, stored,
            TRAIN_STATE_VERSION,
        )
        return None
    return (
        int(z["epoch"]),
        z["emb_in"],
        z["emb_out"],
        z["acc_in"],
        z["acc_out"],
    )


def stream_fingerprint(
    params, n_chunks: int, n_vertices: int, token: str = ""
) -> str:
    """Hash of everything that determines the streaming training trajectory.
    The chunk geometry is part of it (the chunk permutation, LR schedule,
    and per-chunk shuffles are keyed on chunk indices); ``token`` carries
    the walk source's identity (graph digest + walk params + walk seed) so
    a checkpoint is never resumed against a different virtual corpus."""
    h = hashlib.sha256()
    h.update(repr(params).encode())
    h.update(f"|chunks={n_chunks}|V={n_vertices}|src={token}|".encode())
    return h.hexdigest()[:32]


def save_stream_state(
    checkpoint_dir: str,
    fingerprint: str,
    epoch: int,
    chunk: int,
    emb_in: np.ndarray,
    emb_out: np.ndarray,
    acc_in: np.ndarray,
    acc_out: np.ndarray,
    epoch_losses: np.ndarray,
    cur_losses: np.ndarray,
    counts: np.ndarray,
    chunk_walks: int,
) -> str:
    """Chunk-boundary snapshot of a streaming training run: tables + Adagrad
    state + (epoch, next-chunk) cursor + loss bookkeeping + the pass-1
    vocabulary counts (so a resume skips re-walking the whole corpus for
    counting).  The reference checkpoints its hot loop every 10 steps
    (spark.py:597-598)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, "stream_state.npz")
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp,
        version=np.int64(TRAIN_STATE_VERSION),
        fingerprint=np.str_(fingerprint),
        epoch=np.int64(epoch),
        chunk=np.int64(chunk),
        emb_in=emb_in,
        emb_out=emb_out,
        acc_in=acc_in,
        acc_out=acc_out,
        epoch_losses=np.asarray(epoch_losses, np.float32),
        cur_losses=np.asarray(cur_losses, np.float32),
        counts=np.asarray(counts, np.int64),
        chunk_walks=np.int64(chunk_walks),
    )
    os.replace(tmp, path)
    return path


def load_stream_state(checkpoint_dir: Optional[str], fingerprint: str):
    """Newest streaming snapshot, or None.  A snapshot written under a
    different configuration (params/chunk geometry/walk source) or an older
    format version is ignored loudly — resuming it would splice two
    different training trajectories."""
    if not checkpoint_dir:
        return None
    path = os.path.join(checkpoint_dir, "stream_state.npz")
    if not os.path.exists(path):
        return None
    z = np.load(path)
    stored_v = int(z["version"]) if "version" in z else 1
    if stored_v != TRAIN_STATE_VERSION:
        logger.warning(
            "streaming checkpoint %s has format version %d (current %d); "
            "ignoring it", path, stored_v, TRAIN_STATE_VERSION,
        )
        return None
    stored_fp = str(z["fingerprint"])
    if stored_fp != fingerprint:
        logger.warning(
            "streaming checkpoint %s was written by a different "
            "configuration (fingerprint %s != %s); ignoring it",
            path, stored_fp, fingerprint,
        )
        return None
    return (
        int(z["epoch"]),
        int(z["chunk"]),
        z["emb_in"],
        z["emb_out"],
        z["acc_in"],
        z["acc_out"],
        z["epoch_losses"],
        z["cur_losses"],
        z["counts"],
        int(z["chunk_walks"]),
    )
