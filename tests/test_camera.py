import numpy as np
import jax.numpy as jnp

from hpmvs_tpu.geom import camera as cam_ops
from hpmvs_tpu.testing import make_plane_scene, _quatR


def _build(scene, max_level=5):
    ncam = len(scene.model.cameras)
    return cam_ops.build_cameras(
        scene.model.cameras, [scene.imgsize] * ncam, [scene.imgsize] * ncam,
        max_level)


def test_projection_matches_direct_math():
    scene = make_plane_scene(n_cams=4, imgsize=128, n_points=10, seed=2)
    cams = _build(scene)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.5, 0.5, size=(50, 3))
    pts[:, 2] = 0.0

    for ci in range(4):
        cam = scene.model.cameras[ci]
        R = _quatR(cam.rq)
        K = np.array([[cam.f, 0, scene.imgsize / 2],
                      [0, cam.f, scene.imgsize / 2], [0, 0, 1]])
        for lv in [0, 2, 4]:
            pc = (R @ (pts - cam.c).T).T
            uvw = (K @ pc.T).T
            uv = uvw[:, :2] / uvw[:, 2:3] / (2.0 ** lv)
            got = cam_ops.project(
                cams, jnp.full((50,), ci, dtype=jnp.int32),
                jnp.asarray(pts, dtype=jnp.float32),
                jnp.full((50,), lv, dtype=jnp.int32))
            np.testing.assert_allclose(np.asarray(got[:, :2]), uv,
                                       rtol=2e-4, atol=2e-2)
            assert np.all(np.asarray(got[:, 2]) == 1.0)


def test_behind_camera_flagged():
    scene = make_plane_scene(n_cams=3, imgsize=64, n_points=5, seed=5)
    cams = _build(scene)
    cam = scene.model.cameras[0]
    R = _quatR(cam.rq)
    behind = cam.c - R[2] * 2.0  # 2 units behind the camera along -z
    got = cam_ops.project(cams, jnp.array([0]), jnp.asarray(behind[None],
                          dtype=jnp.float32), jnp.array([0]))
    assert np.asarray(got)[0, 2] == -1.0
    assert np.asarray(got)[0, 0] == -float(0xffff)


def test_scale_level_inverse():
    """getLevel(getScale(x, L)) == L (Camera.cpp:83-95 are inverses)."""
    scene = make_plane_scene(n_cams=3, imgsize=256, n_points=5, seed=7)
    cams = _build(scene)
    x = jnp.asarray(np.array([[0.1, -0.2, 0.0]]), dtype=jnp.float32)
    ci = jnp.array([1])
    for lv in range(5):
        s = cam_ops.get_scale(cams, ci, x, lv)
        lvl = cam_ops.get_level(cams, ci, x, s)
        np.testing.assert_allclose(np.asarray(lvl), lv, atol=1e-5)
        lvli = cam_ops.get_leveli(cams, ci, x, s, 5)
        assert int(np.asarray(lvli)[0]) == lv
    # scale formula: 2*fz*2^level/(fx+fy)
    fz = np.linalg.norm(np.asarray(x[0]) - np.asarray(cams.center[1]))
    expect = 2.0 * fz * 4.0 / float(cams.fsum[1])
    np.testing.assert_allclose(float(cam_ops.get_scale(cams, ci, x, 2)[0]),
                               expect, rtol=1e-6)


def test_level_projection_halving():
    scene = make_plane_scene(n_cams=3, imgsize=128, n_points=5, seed=9)
    cams = _build(scene)
    P = np.asarray(cams.P)
    for lv in range(1, 6):
        np.testing.assert_allclose(P[:, lv, :2], P[:, lv - 1, :2] / 2.0,
                                   rtol=1e-6)
        np.testing.assert_allclose(P[:, lv, 2], P[:, lv - 1, 2], rtol=1e-6)
