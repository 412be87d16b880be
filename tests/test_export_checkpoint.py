import dataclasses
import os

import numpy as np
import pytest

from hpmvs_tpu.config import Options
from hpmvs_tpu.io import export as export_mod
from hpmvs_tpu.io import nvm as nvm_io
from hpmvs_tpu.io import ply as ply_io
from hpmvs_tpu.runtime import checkpoint as ckpt
from hpmvs_tpu.runtime.wavefront import Engine
from hpmvs_tpu.testing import make_plane_scene


@pytest.fixture(scope="module")
def seeded_engine():
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=20, MAX_TREE_LEVEL=6,
                              PATCH_FINAL_MINLEVEL=4, LM_ITERS=8)
    scene = make_plane_scene(n_cams=5, imgsize=192, n_points=60, seed=8)
    eng = Engine(scene.model, opt, images=scene.images)
    eng.seed()
    # run two priority levels so there is real multi-level state
    for prio in range(60):
        eng.process_priority_step(prio)
        if not eng.have_work():
            break
    return scene, opt, eng


def test_save_as_nvm_roundtrip(seeded_engine, tmp_path):
    scene, opt, eng = seeded_engine
    folder = str(tmp_path / "nvm_export")
    path = export_mod.save_as_nvm(eng, folder)
    models = nvm_io.read_nvm(path)
    assert len(models) == 1
    m = models[0]
    assert len(m.cameras) == eng.scene.n_cameras
    assert m.n_points == eng.n_alive()
    # exported camera centers match
    centers = np.asarray(eng.scene.ctx.cams.center)
    got = np.stack([c.c for c in m.cameras])
    np.testing.assert_allclose(got, centers, atol=1e-4)
    # measurement projections are inside the images
    assert m.meas_img.min() >= 0
    assert m.meas_img.max() < eng.scene.n_cameras


def test_save_pmats_and_pose(seeded_engine, tmp_path):
    scene, opt, eng = seeded_engine
    p1 = str(tmp_path / "pmats.txt")
    p2 = str(tmp_path / "pose.txt")
    export_mod.save_pmats(eng, p1)
    export_mod.save_pose_mats(eng, p2)
    rows1 = open(p1).read().strip().split("\n")
    rows2 = open(p2).read().strip().split("\n")
    assert len(rows1) == 3 * eng.scene.n_cameras
    assert len(rows2) == 3 * eng.scene.n_cameras
    first = [float(x) for x in rows1[0].split(",")]
    P0 = np.asarray(eng.scene.ctx.cams.P)[0, 0]
    np.testing.assert_allclose(first, P0[0], rtol=1e-6)


def test_visualize_depths(seeded_engine, tmp_path):
    scene, opt, eng = seeded_engine
    folder = str(tmp_path / "viz")
    path = export_mod.visualize_depths(eng, folder)
    assert os.path.exists(path)
    html = open(path).read()
    assert "<table" in html
    files = os.listdir(folder)
    # color + combined + per-level image per camera
    assert len([f for f in files if f.endswith(".jpg")]) \
        == eng.scene.n_cameras * (2 + opt.n_levels)


def test_tree_to_ply(seeded_engine, tmp_path):
    scene, opt, eng = seeded_engine
    prefix = str(tmp_path / "tree")
    export_mod.tree_to_ply(eng, prefix, no_scalar=False)
    pts = ply_io.read_ply_xyz(prefix + "-points.ply")
    assert pts.shape[0] == eng.n_alive()
    tree_txt = open(prefix + "-tree.ply").read()
    n_cells = int(np.count_nonzero(eng.tree.alive[:eng.tree.n]))
    assert f"element vertex {8 * n_cells}" in tree_txt
    assert f"element face {6 * n_cells}" in tree_txt


def test_checkpoint_resume(seeded_engine, tmp_path):
    scene, opt, eng = seeded_engine
    path = str(tmp_path / "ckpt.npz")
    ckpt.save_checkpoint(eng, path)

    # fresh engine on the same scene, restore, compare state
    eng2 = Engine(scene.model, opt, images=scene.images)
    ckpt.load_checkpoint(eng2, path)
    assert eng2.n_alive() == eng.n_alive()
    np.testing.assert_allclose(eng2.patches.center[:eng2.patches.n],
                               eng.patches.center[:eng.patches.n])
    np.testing.assert_array_equal(np.asarray(eng2.pack.depth),
                                  np.asarray(eng.pack.depth))
    def flat_queue(e):
        return {pr: np.concatenate(chunks).tolist()
                for pr, chunks in e.queue.items() if chunks}
    assert flat_queue(eng2) == flat_queue(eng)
    assert eng2.tree.histogram().tolist() == eng.tree.histogram().tolist()

    # resumed engine continues the reconstruction
    before = eng2.n_alive()
    for prio in range(opt.max_prio):
        eng2.process_priority_step(prio)
        if not eng2.have_work():
            break
    # reconstruction continued (final-level outlier removal may shrink the
    # count somewhat, like the reference's flatness filtering)
    assert eng2.n_alive() > 0.6 * before
    err = np.abs(eng2.alive_arrays()[0][:, 2] - scene.plane_z)
    assert np.median(err) < 0.02


def test_requeue_from_tree_skip_clean(seeded_engine, tmp_path):
    scene, opt, eng = seeded_engine
    path = str(tmp_path / "ckpt2.npz")
    ckpt.save_checkpoint(eng, path)
    eng3 = Engine(scene.model, opt, images=scene.images)
    ckpt.load_checkpoint(eng3, path)
    # queue rebuilt from the tree: skip_clean skips expanded single-patch
    # cells, full requeue touches every occupied cell
    n_skip = ckpt.requeue_from_tree(eng3, skip_clean=True)
    n_all = ckpt.requeue_from_tree(eng3, skip_clean=False)
    n_cells = int(np.count_nonzero(eng3.tree.alive[:eng3.tree.n]))
    assert n_all == n_cells
    assert 0 <= n_skip <= n_all


@pytest.mark.slow
def test_nvm_reexport_reconstructs(seeded_engine, tmp_path):
    """Dogfood the full NVM round trip (Scene.cpp:646-713 saveAsNVM ->
    NVMReader.cpp:115-155 ingest): export the densified scene as an NVM
    project with images re-encoded to disk, re-read it through the standard
    reader (path fixup + undistort + measurement parsing) and reconstruct a
    second-generation cloud from it -- the closest available stand-in for a
    real external NVM ingest."""
    scene, opt, eng = seeded_engine
    folder = str(tmp_path / "nvm_gen2")
    path = export_mod.save_as_nvm(eng, folder)

    from hpmvs_tpu.runtime import pipeline
    opt2 = dataclasses.replace(opt, OUTFOLDER=str(tmp_path / "out2"))
    eng2 = pipeline.run_nvm_file(path, opt2, max_prio=60, mesh=None)

    # camera fidelity through the quaternion + focal re-encoding
    c1 = np.asarray(eng.scene.ctx.cams.center)
    c2 = np.asarray(eng2.scene.ctx.cams.center)
    np.testing.assert_allclose(c2, c1, atol=1e-3)
    f1 = np.linalg.norm(np.asarray(eng.scene.ctx.cams.P)[:, 0][:, 0, :3],
                        axis=1)
    f2 = np.linalg.norm(np.asarray(eng2.scene.ctx.cams.P)[:, 0][:, 0, :3],
                        axis=1)
    np.testing.assert_allclose(f2, f1, rtol=1e-3)

    # a sane second-generation cloud on the same surface (JPEG re-encode
    # costs some texture fidelity; the structure must survive)
    pts = eng2.alive_arrays()[0]
    assert len(pts) > 0.5 * eng.n_alive(), (len(pts), eng.n_alive())
    z = np.abs(pts[:, 2] - scene.plane_z)
    assert float(np.median(z)) < 0.01, float(np.median(z))
