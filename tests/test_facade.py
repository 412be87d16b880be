"""Strecha-like hard config: self-occluding building corner + radial
distortion driven through the FULL pipeline (NVM on disk -> image load ->
VisualSFM undistortion -> reconstruction), VERDICT round-1 item 8.

The wedge z = slope*|x| has a ridge silhouette that occludes the far face
from oblique cameras; every camera has a nonzero k1 (both sign branches of
Image.cpp:68-149), so reconstruction quality collapses unless undistortion
is correct end-to-end."""

import dataclasses

import numpy as np
import pytest

from hpmvs_tpu.config import Options
from hpmvs_tpu.io import nvm as nvm_io
from hpmvs_tpu.runtime import pipeline
from hpmvs_tpu.testing import make_facade_scene, facade_surface_dist

pytestmark = pytest.mark.slow  # e2e scene test; quick run: pytest -m 'not slow'


@pytest.fixture(scope="module")
def facade_run(tmp_path_factory):
    d = tmp_path_factory.mktemp("facade")
    scene = make_facade_scene(n_cams=11, imgsize=256, n_points=160, seed=0,
                              out_dir=str(d / "imgs"))
    nvm_path = str(d / "facade.nvm")
    nvm_io.save_nvm(nvm_path, [scene.model])
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=10, MAX_TREE_LEVEL=8,
                              PATCH_FINAL_MINLEVEL=4,
                              OUTFOLDER=str(d / "out"))
    # no images= -> pipeline loads the distorted PNGs from disk and
    # undistorts them with each camera's k1 (image/pyramid.py)
    eng = pipeline.run_nvm_file(nvm_path, opt, max_prio=70)
    return scene, eng


def test_facade_reconstruction_quality(facade_run):
    scene, eng = facade_run
    c = eng.alive_arrays()[0]
    assert len(c) > 500, len(c)
    dist = facade_surface_dist(c, scene.slope)
    assert np.median(dist) < 0.01, float(np.median(dist))
    assert np.percentile(dist, 90) < 0.05, float(np.percentile(dist, 90))


def test_facade_covers_both_faces(facade_run):
    """The self-occluding ridge must not wipe out either face, and patches
    reach both outer regions (wide-baseline completeness)."""
    scene, eng = facade_run
    c = eng.alive_arrays()[0]
    left = c[:, 0] < -0.2
    right = c[:, 0] > 0.2
    assert left.sum() > 100 and right.sum() > 100, (left.sum(), right.sum())
    # normals on each face point against the face's outward direction
    n = eng.alive_arrays()[1]
    # both faces' patches face the cameras (-z component dominant)
    assert np.median(n[left][:, 2]) < -0.5
    assert np.median(n[right][:, 2]) < -0.5


def test_facade_histogram_coarse_to_fine(facade_run):
    """Per-level occupancy mirrors the reference's coarse-to-fine profile
    (doctree.h:493-511): occupied levels are contiguous and the mass sits
    at the finest levels (branching splits coarse cells away)."""
    _, eng = facade_run
    hist = eng.tree.histogram()
    occ = np.nonzero(hist)[0]
    assert len(occ) >= 1
    assert (np.diff(occ) == 1).all(), hist  # contiguous occupied range
    assert int(np.argmax(hist)) == int(occ[-1]), hist  # mass at the finest
    # finest level dominates everything coarser combined
    assert hist[occ[-1]] > hist[occ[:-1]].sum(), hist


def test_facade_distortion_actually_matters(facade_run):
    """Control: skipping undistortion (k1 forced to 0 on the same distorted
    images) must clearly degrade reconstruction -- proves the undistortion
    path is load-bearing, not decorative."""
    scene, eng = facade_run
    model0 = dataclasses.replace(
        scene.model,
        cameras=[dataclasses.replace(cam, r=0.0)
                 for cam in scene.model.cameras])
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=10, MAX_TREE_LEVEL=8,
                              PATCH_FINAL_MINLEVEL=4,
                              OUTFOLDER="/tmp/facade_nodist")
    bad = pipeline.run(model0, opt, images=scene.images, max_prio=70,
                       mesh=None)
    good_n = eng.n_alive()
    bad_n = bad.n_alive()
    good_med = float(np.median(facade_surface_dist(
        eng.alive_arrays()[0], scene.slope)))
    if bad_n > 0:
        bad_med = float(np.median(facade_surface_dist(
            bad.alive_arrays()[0], scene.slope)))
    else:
        bad_med = np.inf
    assert bad_n < 0.5 * good_n or bad_med > 3 * good_med, \
        (good_n, bad_n, good_med, bad_med)


def test_facade_jpeg_ingest(facade_run, tmp_path):
    """Real-ingest leg (r4 verdict item 6): the same distorted renders
    re-encoded as quality-85 JPEG -- the reference's only input format
    (Image.cpp:41-66) -- plus sensor noise on the pixels and 0.5 px noise
    on the SfM measurements (a VisualSFM-shaped NVM), driven through the
    FULL CLI from disk. Reconstruction must land within a small delta of
    the PNG leg."""
    import os

    from PIL import Image as PILImage

    from hpmvs_tpu import cli
    from hpmvs_tpu.io import ply as ply_io

    scene, eng_png = facade_run
    rng = np.random.default_rng(1)
    imdir = tmp_path / "jpgs"
    imdir.mkdir()
    cams = []
    for cam in scene.model.cameras:
        img = np.asarray(PILImage.open(cam.filename)).astype(np.float64)
        noisy = np.clip(img + rng.normal(0, 2.0, img.shape), 0,
                        255).astype(np.uint8)
        jpath = str(imdir / (os.path.basename(cam.filename)[:-4] + ".jpg"))
        PILImage.fromarray(noisy).save(jpath, quality=85)
        cams.append(dataclasses.replace(cam, filename=jpath))
    model = dataclasses.replace(
        scene.model, cameras=cams,
        meas_xy=scene.model.meas_xy + rng.normal(0, 0.5,
                                                 scene.model.meas_xy.shape))
    nvm_path = str(tmp_path / "facade_jpeg.nvm")
    nvm_io.save_nvm(nvm_path, [model])
    out = str(tmp_path / "out")
    rc = cli.main(["--nvm", nvm_path, "--outdir", out, "--maxtreelevel", "8",
                   "--patch_level_final_min", "4", "--start_level", "2",
                   "--max_views", "8", "--covis_min_points", "10"])
    assert rc == 0
    pts = ply_io.read_ply_xyz(os.path.join(out, "patches-final.ply"))
    n_png = eng_png.n_alive()
    assert pts.shape[0] > 0.6 * n_png, (pts.shape[0], n_png)
    med_png = float(np.median(facade_surface_dist(
        eng_png.alive_arrays()[0], scene.slope)))
    med_jpg = float(np.median(facade_surface_dist(pts, scene.slope)))
    # JPEG q85 + noise costs a little accuracy, not correctness
    assert med_jpg < max(2.5 * med_png, 0.015), (med_png, med_jpg)
