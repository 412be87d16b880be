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


def _expected_alive() -> tuple:
    """Single-process references: (a) the SAME SpatialEngine configuration
    on this process's 8 virtual devices after 25 steps (the 2-process
    replicated run must match it exactly); (b) a COMPLETED run at
    MAX_TREE_LEVEL=8 (the owned+subsets completion leg must match it
    statistically)."""
    import dataclasses

    import numpy as np

    from hpmvs_tpu.config import Options
    from hpmvs_tpu.parallel import mesh as pmesh
    from hpmvs_tpu.runtime.spatial import SpatialEngine
    from hpmvs_tpu.testing import make_plane_scene

    opt = dataclasses.replace(Options(), START_LEVEL=1, MAXLEVEL=3,
                              MAX_VIEWS=6, COVIS_MIN_POINTS=10, LM_ITERS=4)
    ps = make_plane_scene(n_cams=4, imgsize=96, n_points=24, seed=0)
    eng = SpatialEngine(ps.model, opt, images=ps.images,
                        mesh=pmesh.make_mesh(8, shape=(4, 2)))
    eng.seed()
    start = min(eng.queue) if eng.queue else 0
    for prio in range(start, start + 25):
        eng.process_priority_step(prio)
        if not eng.have_work():
            break
    partial = int(eng.n_alive())

    opt3 = dataclasses.replace(opt, MAX_TREE_LEVEL=8)
    eng2 = SpatialEngine(ps.model, opt3, images=ps.images,
                         mesh=pmesh.make_mesh(8, shape=(4, 2)))
    eng2.seed()
    for prio in range(opt3.max_prio):
        eng2.process_priority_step(prio)
        if not eng2.have_work():
            break
    return partial, int(eng2.n_alive())


def test_two_process_distributed_step():
    expected, expected_final = _expected_alive()
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # the worker sets its own
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""    # never touch the TPU tunnel
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))

    procs = [subprocess.Popen([sys.executable, "-u", worker, str(pid),
                               str(port), str(expected),
                               str(expected_final)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=2400)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid}" in out, out
