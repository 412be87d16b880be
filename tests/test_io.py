import numpy as np

from hpmvs_tpu.io import nvm as nvm_io
from hpmvs_tpu.io import ply as ply_io
from hpmvs_tpu.testing import make_plane_scene


def test_nvm_roundtrip(tmp_path):
    scene = make_plane_scene(n_cams=4, imgsize=64, n_points=20, seed=3)
    path = str(tmp_path / "scene.nvm")
    nvm_io.save_nvm(path, [scene.model])
    models = nvm_io.read_nvm(path, fix_path=False)
    assert len(models) == 1
    m = models[0]
    assert len(m.cameras) == 4
    assert m.n_points == 20
    np.testing.assert_allclose(m.points_xyz, scene.model.points_xyz, rtol=1e-10)
    for a, b in zip(m.cameras, scene.model.cameras):
        np.testing.assert_allclose(a.rq, b.rq, rtol=1e-10)
        np.testing.assert_allclose(a.c, b.c, rtol=1e-10)
        assert a.f == b.f
    np.testing.assert_array_equal(m.meas_img, scene.model.meas_img)
    np.testing.assert_allclose(m.meas_xy, scene.model.meas_xy, rtol=1e-12)


def test_ext_ply_ascii_and_binary(tmp_path):
    n = 17
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(n, 3)).astype(np.float32)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    colors = rng.uniform(0, 255, size=(n, 3))
    scales = rng.uniform(0.01, 1.0, size=(n,)).astype(np.float32)
    views = np.tile(np.array([0, 2, 5, -1, -1], dtype=np.int32), (n, 1))
    nviews = np.full((n,), 3, dtype=np.int32)

    p_ascii = str(tmp_path / "a.ply")
    ply_io.write_ext_ply(p_ascii, centers, normals, colors, scales, views, nviews)
    xyz = ply_io.read_ply_xyz(p_ascii)
    np.testing.assert_allclose(xyz, centers, rtol=1e-5)

    p_bin = str(tmp_path / "b.ply")
    ply_io.write_ext_ply(p_bin, centers, normals, colors, scales, views, nviews,
                         binary=True)
    raw = open(p_bin, "rb").read()
    assert b"binary_little_endian" in raw or b"binary_big_endian" in raw
    # light variant: no normals/scale/visibility (main.cpp:163-169)
    p_light = str(tmp_path / "c.ply")
    ply_io.write_ext_ply(p_light, centers, normals, colors, scales, views, nviews,
                         binary=True, normal=False, scale=False, visibility=False)
    body = open(p_light, "rb").read()
    hdr_end = body.index(b"end_header\n") + len(b"end_header\n")
    assert len(body) - hdr_end == n * (12 + 3)


def test_nvm_multi_model_roundtrip(tmp_path):
    """NVM_V3 files can hold several models (NVMReader.cpp:115-155); all of
    them round-trip and the pipeline consumes models[0] like the reference
    (main.cpp:106-112)."""
    s1 = make_plane_scene(n_cams=4, imgsize=64, n_points=20, seed=3)
    s2 = make_plane_scene(n_cams=3, imgsize=64, n_points=11, seed=4)
    path = str(tmp_path / "multi.nvm")
    nvm_io.save_nvm(path, [s1.model, s2.model])
    models = nvm_io.read_nvm(path, fix_path=False)
    assert len(models) == 2
    assert len(models[0].cameras) == 4 and models[0].n_points == 20
    assert len(models[1].cameras) == 3 and models[1].n_points == 11
    np.testing.assert_allclose(models[1].points_xyz, s2.model.points_xyz,
                               rtol=1e-10)
