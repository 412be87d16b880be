"""Curved-surface reconstruction: sphere scene (radius + normal accuracy).

The plane scene cannot catch normal-estimation axis/sign bugs or curvature
handling; here ground truth is |p - c| = r with radial normals."""

import dataclasses
import os

import numpy as np
import pytest

from hpmvs_tpu.config import Options
from hpmvs_tpu.runtime import pipeline
from hpmvs_tpu.io import ply as ply_io
from hpmvs_tpu.testing import make_sphere_scene

pytestmark = pytest.mark.slow  # e2e scene test; quick run: pytest -m 'not slow'


def test_sphere_reconstruction(tmp_path):
    scene = make_sphere_scene(n_cams=7, imgsize=256, n_points=80, seed=2)
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=20, MAX_TREE_LEVEL=8,
                              PATCH_FINAL_MINLEVEL=4,
                              OUTFOLDER=str(tmp_path / "out"))
    eng = pipeline.run(scene.model, opt, images=scene.images)
    c, n, col, s, v, nv = eng.alive_arrays()
    assert len(c) >= 300, f"too sparse: {len(c)}"
    r = np.linalg.norm(c, axis=1)
    rerr = np.abs(r - scene.radius)
    assert np.median(rerr) < 0.01 * scene.radius, np.median(rerr)
    # normals radial (sign-free: the reference orients toward cameras)
    nn = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    ali = np.abs(np.einsum("ij,ij->i", nn, c / r[:, None]))
    assert np.median(ali) > 0.95, np.median(ali)
    # colors sampled from the real texture, not garbage
    assert (col > 0).any() and col.max() <= 255.0
