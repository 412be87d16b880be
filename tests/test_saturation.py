"""View/covisibility caps at saturation: >MAX_COVIS covisible cameras.

The reference keeps unbounded covisibility + view lists
(PatchOptimizer.cpp:225-258 addImages just appends); the TPU engine bounds
them with fixed slots (Options.MAX_COVIS / MAX_VIEWS) and an overflow
policy (keep the most-covisible candidates, core/scene.py). This module
constructs the saturated regime the internet-scale north star names --
more covisible cameras than slots -- and proves the caps select correctly
and the engine still reconstructs."""

import dataclasses

import numpy as np
import pytest

from hpmvs_tpu.config import Options
from hpmvs_tpu.core import scene as scene_mod
from hpmvs_tpu.runtime.wavefront import Engine
from hpmvs_tpu.testing import make_plane_scene


@pytest.fixture(scope="module")
def saturated():
    # 40 cameras on an arc over one plane: every pair shares all points ->
    # 39 covisible candidates per camera, well above MAX_COVIS=32
    scene = make_plane_scene(n_cams=40, imgsize=96, n_points=80, seed=3)
    opt = dataclasses.replace(Options(), START_LEVEL=1, MAXLEVEL=3,
                              COVIS_MIN_POINTS=10, MAX_TREE_LEVEL=6,
                              LM_ITERS=6)
    return scene, opt


def test_covis_overflow_keeps_most_covisible(saturated):
    scene, opt = saturated
    model = scene.model
    covis = scene_mod.extract_covisibility(model, opt)
    ncam = len(model.cameras)
    assert covis.shape == (ncam, opt.MAX_COVIS)
    # recompute the pair counts independently
    vis = np.zeros((ncam, ncam), np.int64)
    for ii in range(model.n_points):
        s, e = model.meas_start[ii], model.meas_start[ii + 1]
        ids = model.meas_img[s:e]
        np.add.at(vis, (ids[:, None], ids[None, :]), 1)
    np.fill_diagonal(vis, 0)
    for ii in range(ncam):
        kept = covis[ii][covis[ii] >= 0]
        assert len(kept) == opt.MAX_COVIS          # saturated: all slots used
        dropped = np.setdiff1d(np.nonzero(
            vis[ii] >= opt.COVIS_MIN_POINTS)[0], kept)
        assert len(dropped) > 0                     # cap actually bit
        # top-k policy: every kept candidate covises at least as much as
        # the best dropped one
        assert vis[ii][kept].min() >= vis[ii][dropped].max()


@pytest.mark.slow
def test_saturated_scene_reconstructs(saturated):
    """Densification under saturation: view lists stay within MAX_VIEWS
    (<= MAX_IMAGES_PER_PATCH enter the refiner, PatchOptimizer.cpp:298),
    every stored view id is a real camera, and the cloud lands on the
    plane despite the truncated candidate set."""
    scene, opt = saturated
    eng = Engine(scene.model, opt, images=scene.images)
    eng.seed()
    assert eng.n_alive() > 20
    for prio in range(opt.max_prio):
        eng.process_priority_step(prio)
        if not eng.have_work():
            break
    p = eng.patches
    pids = np.nonzero(p.alive[:p.n])[0]
    assert len(pids) > 100
    v = p.views[pids]
    nv = (v >= 0).sum(1)
    assert nv.max() <= opt.MAX_VIEWS
    assert (v < len(scene.model.cameras)).all()
    # saturation should still produce richly-supported patches
    assert float(np.median(nv)) >= opt.MIN_IMAGES_PER_PATCH
    z = np.abs(p.center[pids][:, 2] - scene.plane_z)
    assert float(np.median(z)) < 0.01
