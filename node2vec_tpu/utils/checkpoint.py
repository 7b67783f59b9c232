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

import os
import re
from typing import Dict, Optional, Tuple

import numpy as np


def save_walk_chunk(checkpoint_dir: str, chunk_idx: int, paths: np.ndarray) -> str:
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, f"walks_chunk_{chunk_idx:06d}.npz")
    tmp = path + ".tmp.npz"
    np.savez_compressed(tmp, paths=paths)
    os.replace(tmp, path)
    return path


def load_walk_chunks(checkpoint_dir: Optional[str]) -> Dict[int, np.ndarray]:
    """All persisted walk chunks as {chunk_idx: paths}."""
    if not checkpoint_dir or not os.path.isdir(checkpoint_dir):
        return {}
    out = {}
    for fn in os.listdir(checkpoint_dir):
        m = re.fullmatch(r"walks_chunk_(\d+)\.npz", fn)
        if m:
            out[int(m.group(1))] = np.load(os.path.join(checkpoint_dir, fn))["paths"]
    return out


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
    return (
        int(z["epoch"]),
        z["emb_in"],
        z["emb_out"],
        z["acc_in"],
        z["acc_out"],
    )
