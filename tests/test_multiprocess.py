"""REAL multi-process mesh tests: two JAX processes, one global mesh.

Everything else in tests/ simulates multi-chip with 8 virtual devices in ONE
process; collectives never cross a process boundary there.  These tests
spawn two OS processes joined through jax.distributed.initialize (TCP
coordinator + gloo CPU collectives) — the same bring-up a multi-host TPU pod
uses over DCN — and run the framework's actual sharded paths across the
boundary:

* blocked sharded walks bit-match the single-device engine (layout-invariant
  counter RNG, now across processes);
* row-sharded SGNS routes rows through a cross-process all-to-all and trains.
"""

import os
import socket
import subprocess
import sys


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


import pytest


@pytest.mark.parametrize(
    "nproc,devs_per_proc",
    [(2, 4), (4, 2)],  # same 8-device global mesh, 2- and 4-way process cut
)
def test_multi_process_mesh_all_sharded_paths(nproc, devs_per_proc):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devs_per_proc}"
    )
    env.pop("JAX_PLATFORMS", None)  # the program forces cpu itself
    prog = os.path.join(os.path.dirname(__file__), "mp_program.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(prog)))
    # the subprocess's sys.path[0] is tests/, not the repo root — make the
    # package importable regardless of how pytest itself resolved it
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, prog, str(pid), str(nproc), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(prog))),
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert "WALKS_BITMATCH_OK" in out, out[-2000:]
        assert "ROWSHARDED_SGNS_OK" in out, out[-2000:]
        assert "EDGE_PARTITIONED_OK" in out, out[-2000:]
        assert "ROWSHARDED_HS_OK" in out, out[-2000:]
        assert "STREAMING_SHARDED_OK" in out, out[-2000:]
        assert "DISTRIBUTED_BUILD_OK" in out, out[-2000:]
        assert "DISTRIBUTED_BUILD_STR_OK" in out, out[-2000:]
