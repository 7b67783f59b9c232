"""Test harness config: force the CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual 8-device CPU mesh (the reference
analogously tests its "cluster" paths on local-mode Spark,
``/root/reference/tests/test_fugue.py:30,82``); real-TPU runs happen via
bench.py / __graft_entry__.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The deployment's sitecustomize may have imported jax and registered a TPU
# backend already; jax.config wins over the env var in that case.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(20)


@pytest.fixture
def toy_graph_edges():
    """The reference's 5-vertex toy graph (tests/test_fugue.py uses a similar one)."""
    src = np.array([0, 0, 1, 1, 2, 3], dtype=np.int32)
    dst = np.array([1, 2, 2, 3, 4, 4], dtype=np.int32)
    w = np.array([1.0, 0.5, 2.0, 1.0, 1.0, 0.5], dtype=np.float32)
    return src, dst, w


@pytest.fixture
def karate_edges():
    """Zachary karate club graph (34 vertices, 78 undirected edges)."""
    edges = [
        (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
        (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2),
        (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3),
        (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32), (3, 7),
        (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16), (6, 16),
        (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
        (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
        (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
        (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
        (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
        (31, 33), (32, 33),
    ]
    arr = np.array(edges, dtype=np.int32)
    return arr[:, 0], arr[:, 1]
