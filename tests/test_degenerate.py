"""Degenerate-input robustness: the engine must not crash on scenes the
reference would CHECK-fail or segfault on (empty models, too few views,
all-seeds-rejected)."""

import dataclasses
import os

import numpy as np

from hpmvs_tpu.config import Options
from hpmvs_tpu.io import nvm as nvm_io
from hpmvs_tpu.runtime import pipeline
from hpmvs_tpu.testing import make_plane_scene


def test_no_points(tmp_path):
    scene = make_plane_scene(n_cams=4, imgsize=64, n_points=5, seed=1)
    m = scene.model
    empty = nvm_io.NvmModel(
        cameras=m.cameras, points_xyz=np.zeros((0, 3)),
        points_rgb=np.zeros((0, 3)), meas_start=np.zeros(1, np.int64),
        meas_img=np.zeros(0, np.int32), meas_feat=np.zeros(0, np.int32),
        meas_xy=np.zeros((0, 2)))
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              OUTFOLDER=str(tmp_path / "o"))
    eng = pipeline.run(empty, opt, images=scene.images)
    assert eng.n_alive() == 0
    assert os.path.exists(str(tmp_path / "o" / "patches-final.ply"))


def test_two_cameras_insufficient_covis(tmp_path):
    """MIN_IMAGES_PER_PATCH=3 with 2 cameras: every seed must fail the view
    gates and the run must exit cleanly with zero patches."""
    scene = make_plane_scene(n_cams=2, imgsize=64, n_points=10, seed=2)
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=1,
                              OUTFOLDER=str(tmp_path / "o"))
    eng = pipeline.run(scene.model, opt, images=scene.images)
    assert eng.n_alive() == 0
