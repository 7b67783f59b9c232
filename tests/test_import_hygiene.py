"""Importing the package must NOT initialize the XLA backend.

jax.distributed.initialize must run before any backend-touching call; a
module-level jnp constant anywhere in the import graph would break every
multi-host bring-up that imports node2vec_tpu first (it did once: the
hashrng mix constants — see ops/hashrng.py).
"""

import subprocess
import sys

PROG = """
import jax
jax.config.update("jax_platforms", "cpu")
import node2vec_tpu
import node2vec_tpu.parallel.mesh
import node2vec_tpu.parallel.sharded_walk
import node2vec_tpu.parallel.sharded_sgns
import node2vec_tpu.parallel.rowsharded_sgns
import node2vec_tpu.parallel.rowsharded_hs
import node2vec_tpu.parallel.edge_partitioned_blocked
import node2vec_tpu.walk.blocked
import node2vec_tpu.walk.engine
import node2vec_tpu.models.word2vec
import node2vec_tpu.ops.hashrng
import jax._src.xla_bridge as xb
assert not xb._backends, f"imports initialized the backend: {list(xb._backends)}"
print("IMPORT_HYGIENE_OK")
"""


def test_imports_do_not_initialize_backend():
    out = subprocess.run(
        [sys.executable, "-c", PROG],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "IMPORT_HYGIENE_OK" in out.stdout
