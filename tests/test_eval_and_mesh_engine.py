import dataclasses

import numpy as np
import pytest

from hpmvs_tpu import eval as eval_mod
from hpmvs_tpu.config import Options
from hpmvs_tpu.parallel import mesh as pmesh
from hpmvs_tpu.runtime.wavefront import Engine
from hpmvs_tpu.testing import make_plane_scene

pytestmark = pytest.mark.slow  # e2e scene test; quick run: pytest -m 'not slow'


def test_eval_metrics():
    rng = np.random.default_rng(0)
    ref = rng.uniform(-1, 1, (4000, 3))
    ref[:, 2] = 0
    cloud = ref + rng.normal(0, 0.01, ref.shape)
    acc = eval_mod.accuracy(cloud, ref, 90)
    assert 0.001 < acc < 0.05
    comp = eval_mod.completeness(cloud, ref, 0.05)
    assert comp > 0.99
    ch = eval_mod.chamfer(cloud, ref)
    assert 0 < ch < 0.05
    pm = eval_mod.plane_metrics(cloud, 0.0, 1.0, tol=0.06)
    assert pm["acc_median"] < 0.02
    assert pm["completeness"] > 0.9
    # a sparse, off-surface cloud scores worse
    bad = rng.uniform(-1, 1, (50, 3))
    pm_bad = eval_mod.plane_metrics(bad, 0.0, 1.0, tol=0.06)
    assert pm_bad["acc_median"] > pm["acc_median"]
    assert pm_bad["completeness"] < pm["completeness"]


def test_engine_runs_sharded_over_mesh():
    """The full wavefront engine with the optimize step sharded over an
    8-device mesh produces an equivalent reconstruction."""
    scene = make_plane_scene(n_cams=5, imgsize=160, n_points=60, seed=31)
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=15, MAX_TREE_LEVEL=6,
                              PATCH_FINAL_MINLEVEL=4, LM_ITERS=8)
    mesh = pmesh.make_mesh(8, shape=(2, 4))

    eng = Engine(scene.model, opt, images=scene.images, mesh=mesh)
    eng.seed()
    for prio in range(opt.max_prio):
        eng.process_priority_step(prio)
        if not eng.have_work():
            break

    assert eng.n_alive() > 2 * eng.stats["seeds"]
    c = eng.alive_arrays()[0]
    pm = eval_mod.plane_metrics(c, scene.plane_z, scene.extent, tol=0.05)
    assert pm["acc_median"] < 0.02
    assert pm["completeness"] > 0.5
