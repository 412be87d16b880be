"""Multi-host proof: 2 jax.distributed processes x 4 CPU devices.

SURVEY.md section 4 prescribes local multiprocess jax.distributed + a CPU
device mesh as the fake backend for distributed logic. The worker
(multihost_worker.py) runs one sharded wavefront step, a cross-process halo
exchange and the termination psum on a global 8-device mesh, asserting the
pmin-merged depth buffer equals the single-process reference."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # spawns 2 jax processes (~1-2 min)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_step():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # the worker sets its own
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""    # never touch the TPU tunnel
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))

    procs = [subprocess.Popen([sys.executable, "-u", worker, str(pid),
                               str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid}" in out, out
