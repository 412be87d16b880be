import dataclasses
import os

import numpy as np
import pytest

from hpmvs_tpu.config import Options
from hpmvs_tpu.io import nvm as nvm_io, ply as ply_io
from hpmvs_tpu.runtime import pipeline
from hpmvs_tpu.testing import make_plane_scene

pytestmark = pytest.mark.slow  # e2e scene test; quick run: pytest -m 'not slow'


@pytest.fixture(scope="module")
def small_run(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("out"))
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=20, OUTFOLDER=d,
                              MAX_TREE_LEVEL=6, PATCH_FINAL_MINLEVEL=4,
                              PATCH_INIT_MAXLEVEL=6, LM_ITERS=10)
    scene = make_plane_scene(n_cams=5, imgsize=192, n_points=60, seed=4)
    eng = pipeline.run(scene.model, opt, images=scene.images,
                       more_output=True)
    return scene, opt, eng, d


def test_progressive_densification(small_run):
    """The headline feature (README.md:5-8): output gets denser level by
    level; final cloud much denser than the seeds."""
    scene, opt, eng, d = small_run
    assert eng.stats["seeds"] >= 40
    assert eng.n_alive() > 4 * eng.stats["seeds"]
    hist = eng.tree.histogram()
    assert hist.sum() > 0
    # multiple levels were populated during the run (branched at least twice)
    assert eng.stats["branched"] > 0
    assert eng.stats["extended"] > 0
    assert eng.stats["regularized"] > 0


def test_reconstruction_accuracy(small_run):
    """Reconstruction quality: patches lie on the ground-truth plane."""
    scene, opt, eng, d = small_run
    c, n, col, s, v, nv = eng.alive_arrays()
    err = np.abs(c[:, 2] - scene.plane_z)
    assert np.median(err) < 0.01            # ~patch scale
    assert np.percentile(err, 90) < 0.05
    # normals agree with the plane normal
    cos = np.abs(n[:, 2]) / np.linalg.norm(n, axis=1)
    assert np.median(cos) > 0.95
    # every patch still sees enough views
    assert (nv >= opt.MIN_IMAGES_PER_PATCH).all()


def test_progressive_outputs(small_run):
    """Snapshot PLYs every 10 priorities + final (main.cpp:157-202)."""
    scene, opt, eng, d = small_run
    files = sorted(os.listdir(d))
    assert "patches-final.ply" in files
    assert "patches-init.ply" in files
    snaps = [f for f in files if f.startswith("patches-")
             and f[8:-4].isdigit()]
    assert len(snaps) >= 2
    # snapshots get denser overall (small dips allowed: flatness removals
    # can outpace branching once image resolution is exhausted)
    sizes = [ply_io.read_ply_xyz(os.path.join(d, f)).shape[0]
             for f in sorted(snaps, key=lambda f: int(f[8:-4]))]
    assert sizes[-1] >= 3 * sizes[0]
    for a, b in zip(sizes, sizes[1:]):
        assert b >= 0.8 * a
    final = ply_io.read_ply_xyz(os.path.join(d, "patches-final.ply"))
    assert final.shape[0] == eng.n_alive()


def test_cli(tmp_path):
    """Flag-compatible CLI driver (main.cpp:39-48)."""
    from hpmvs_tpu import cli
    scene = make_plane_scene(n_cams=5, imgsize=128, n_points=40, seed=6,
                             out_dir=str(tmp_path / "imgs"))
    nvm_path = str(tmp_path / "scene.nvm")
    nvm_io.save_nvm(nvm_path, [scene.model])
    out = str(tmp_path / "out")
    rc = cli.main(["--nvm", nvm_path, "--outdir", out, "--maxtreelevel", "5",
                   "--patch_level_final_min", "3", "--start_level", "2",
                   "--max_views", "8"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "patches-final.ply"))


def test_cli_checkpoint_resume(tmp_path):
    """--checkpoint_every writes a resumable state; --resume continues from
    it (the initFromTree analog, CellProcessor.cpp:422-455)."""
    from hpmvs_tpu import cli
    scene = make_plane_scene(n_cams=5, imgsize=128, n_points=40, seed=7,
                             out_dir=str(tmp_path / "imgs"))
    nvm_path = str(tmp_path / "scene.nvm")
    nvm_io.save_nvm(nvm_path, [scene.model])
    out = str(tmp_path / "out")
    rc = cli.main(["--nvm", nvm_path, "--outdir", out, "--maxtreelevel", "5",
                   "--patch_level_final_min", "3", "--start_level", "2",
                   "--max_views", "8", "--checkpoint_every", "10"])
    assert rc == 0
    ck = os.path.join(out, "checkpoint.npz")
    assert os.path.exists(ck)
    out2 = str(tmp_path / "out2")
    rc = cli.main(["--nvm", nvm_path, "--outdir", out2, "--maxtreelevel", "5",
                   "--patch_level_final_min", "3", "--start_level", "2",
                   "--max_views", "8", "--resume", ck])
    assert rc == 0
    final = ply_io.read_ply_xyz(os.path.join(out2, "patches-final.ply"))
    assert final.shape[0] > 0
