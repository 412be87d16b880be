import numpy as np
import jax.numpy as jnp

from hpmvs_tpu.geom import camera as cam_ops
from hpmvs_tpu.ops import sampling
from hpmvs_tpu.testing import make_plane_scene, scene_image_pack
from hpmvs_tpu.image.pyramid import build_pyramid


def _setup(scene, max_level=5):
    ncam = len(scene.model.cameras)
    cams = cam_ops.build_cameras(
        scene.model.cameras, [scene.imgsize] * ncam, [scene.imgsize] * ncam,
        max_level)
    imgs = scene_image_pack(scene, max_level + 1)
    imgs_dev = imgs._replace(tex=jnp.asarray(imgs.tex),
                             texb=jnp.asarray(imgs.texb),
                             row0=jnp.asarray(imgs.row0),
                             width=jnp.asarray(imgs.width),
                             height=jnp.asarray(imgs.height))
    return cams, imgs, imgs_dev


def test_sample_matches_numpy_reference(plane_scene):
    """Batched TPU sampling == scalar numpy transcription of the reference
    math (PatchOptimizer.cpp:476-529, Patch2d.hpp:46-84)."""
    scene = plane_scene
    cams, imgs_host, imgs = _setup(scene)
    max_angle_cos = float(np.cos(np.deg2rad(60)))

    rng = np.random.default_rng(42)
    n_ok = 0
    for trial in range(20):
        ci = int(rng.integers(0, len(scene.model.cameras)))
        center = np.array([rng.uniform(-0.4, 0.4), rng.uniform(-0.4, 0.4), 0.0])
        normal = np.array([rng.normal(0, 0.1), rng.normal(0, 0.1), -1.0])
        normal /= np.linalg.norm(normal)
        lv = int(rng.integers(1, 4))
        # choose scale so that getLeveli lands exactly on lv
        scale = float(cam_ops.get_scale(cams, jnp.array([ci]),
                                        jnp.asarray(center[None], jnp.float32),
                                        lv)[0])

        ci_a = jnp.array([ci], dtype=jnp.int32)
        c_a = jnp.asarray(center[None], dtype=jnp.float32)
        s_a = jnp.array([scale], dtype=jnp.float32)
        n_a = jnp.asarray(normal[None], dtype=jnp.float32)
        xax, yax, zax = sampling.patch_axes(cams, ci_a, n_a, s_a)
        tex, valid = sampling.sample_texture(cams, imgs, ci_a, c_a, s_a,
                                             xax, yax, zax, max_angle_cos, 4)

        # scalar reference on the same level plane
        pyr = build_pyramid(scene.images[ci], 6)
        plane = pyr[lv]
        P = np.asarray(cams.P[ci, lv])
        cam_c = np.asarray(cams.center[ci])
        ref = sampling.np_reference_sample(
            plane, P, cam_c, np.asarray(cams.xaxis[ci]),
            np.asarray(cams.yaxis[ci]), center, normal, scale, max_angle_cos)

        if ref is None:
            assert not bool(valid[0])
            continue
        assert bool(valid[0])
        got = np.asarray(tex[0]).reshape(7, 7, 3)
        np.testing.assert_allclose(got, ref, atol=2e-2)
        n_ok += 1
    assert n_ok >= 10  # most trials must exercise the valid path


def test_ncc_identity_and_cross_view(plane_scene):
    """A patch on the true surface has NCC ~= 1 across views; NCC with itself
    is exactly 1 after normalization."""
    scene = plane_scene
    cams, _, imgs = _setup(scene)
    max_angle_cos = float(np.cos(np.deg2rad(60)))

    center = np.array([[0.1, -0.05, 0.0]], dtype=np.float32)
    normal = np.array([[0.0, 0.0, -1.0]], dtype=np.float32)
    ci0 = jnp.array([3], dtype=jnp.int32)
    scale = cam_ops.get_scale(cams, ci0, jnp.asarray(center), 2)

    xax, yax, zax = sampling.patch_axes(cams, ci0, jnp.asarray(normal), scale)
    tex0, v0 = sampling.sample_texture(cams, imgs, ci0, jnp.asarray(center),
                                       scale, xax, yax, zax, max_angle_cos, 4)
    assert bool(v0[0])
    np.testing.assert_allclose(float(sampling.ncc(tex0, tex0)[0]), 1.0,
                               atol=1e-5)

    for other in [1, 2, 4, 5]:
        ci1 = jnp.array([other], dtype=jnp.int32)
        tex1, v1 = sampling.sample_texture(cams, imgs, ci1, jnp.asarray(center),
                                           scale, xax, yax, zax,
                                           max_angle_cos, 4)
        assert bool(v1[0])
        assert float(sampling.ncc(tex0, tex1)[0]) > 0.9

    # off-surface patch decorrelates
    bad_center = center + np.array([[0.0, 0.0, 0.15]], dtype=np.float32)
    texb, vb = sampling.sample_texture(cams, imgs, jnp.array([0]),
                                       jnp.asarray(bad_center), scale,
                                       xax, yax, zax, max_angle_cos, 4)
    texc, vc = sampling.sample_texture(cams, imgs, jnp.array([6]),
                                       jnp.asarray(bad_center), scale,
                                       xax, yax, zax, max_angle_cos, 4)
    if bool(vb[0]) and bool(vc[0]):
        assert float(sampling.ncc(texb, texc)[0]) < 0.9


def test_robust_incc():
    x = jnp.array([0.0, 0.5, 2.0])
    got = np.asarray(sampling.robust_incc(x))
    np.testing.assert_allclose(got, [0.0, 0.5 / 2.5, 2.0 / 7.0], rtol=1e-6)
