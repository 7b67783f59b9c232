"""Device mesh construction and sharding helpers.

The reference's parallel substrate is Spark hash-partitioning + shuffle
(SURVEY.md §2.2-2.3); the TPU substrate is a named-axis device mesh:

* ``data`` — walker batches / walk corpora are sharded here (the analogue of
  the reference's 3000 hash partitions, ``spark.py:498``);
* ``model`` — embedding-table columns are sharded here (tensor parallelism;
  the reference has no model parallelism at all — its tables must fit in one
  JVM/gensim heap).

Collectives ride ICI inside a slice; XLA inserts them from shard_map programs.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    n_data: int
    n_model: int

    @property
    def n_devices(self) -> int:
        return self.n_data * self.n_model


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a 2-D (data × model) mesh over the available devices.

    Defaults: all devices on the data axis.  ``n_data=None`` derives it from
    the device count and ``n_model``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        if n % n_model != 0:
            raise ValueError(f"{n} devices not divisible by n_model={n_model}")
        n_data = n // n_model
    if n_data * n_model > n:
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, have {n}"
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up: ``jax.distributed.initialize`` wrapper.

    On a multi-host TPU slice call this once per host before building meshes;
    with no arguments JAX autodetects the TPU pod topology.  The reference's
    multi-host story is the Spark cluster manager (external, SURVEY.md L0) —
    here it is one function call and the same mesh API afterwards.
    """
    import jax

    # NOTE: do NOT probe jax.process_count() here — it initializes the
    # runtime backend, after which jax.distributed.initialize always fails
    # (and every host would silently run single-process).
    if jax.distributed.is_initialized():
        return
    if coordinator_address is not None:
        # explicit setup must not fail silently
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    try:
        jax.distributed.initialize()
    except (RuntimeError, ValueError):
        # no autodetectable cluster: single-process environment
        pass
