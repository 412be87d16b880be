import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from hpmvs_tpu.config import Options
from hpmvs_tpu.core import scene as scene_mod
from hpmvs_tpu.ops import optimizer as popt


@pytest.fixture(scope="module")
def built(plane_scene):
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=30)
    scene = scene_mod.build_scene(plane_scene.model, opt,
                                  images=plane_scene.images)
    return scene, opt


def test_covisibility(plane_scene, built):
    scene, opt = built
    # all cameras see the same plane and share all points -> fully covisible
    for ci in range(scene.n_cameras):
        row = scene.covis_np[ci][scene.covis_np[ci] >= 0]
        assert len(row) == scene.n_cameras - 1
        assert ci not in row


def test_seed_creation(plane_scene, built):
    scene, opt = built
    c, n, s, v, orig = scene_mod.make_seed_patches(plane_scene.model, scene, opt)
    assert c.shape[0] > 150  # most of the 200 points seed
    # normals point at the first camera
    ray = np.asarray(scene.ctx.cams.center)[v[:, 0]] - c
    ray /= np.linalg.norm(ray, axis=1, keepdims=True)
    np.testing.assert_allclose(np.sum(ray * n, axis=1), 1.0, atol=1e-5)
    assert np.all(s > 0)


def test_optimize_batch_converges_to_plane(plane_scene, built):
    """Perturbed seeds must be pulled back onto the true surface by the
    batched damped-Newton NCC refinement (replaces BOBYQA,
    PatchOptimizer.cpp:322-382)."""
    scene, opt = built
    c, n, s, v, orig = scene_mod.make_seed_patches(plane_scene.model, scene, opt)
    B = min(64, c.shape[0])
    rng = np.random.default_rng(0)
    c = c[:B].copy()
    n, s, v = n[:B], s[:B], v[:B]
    # push the seeds off the plane along z by up to ~1.5 pixels footprint
    dz = rng.uniform(-1.0, 1.0, B) * s * 1.5
    c[:, 2] += dz

    out_c, out_n, out_s, out_v, ok, color, resid = popt.optimize_batch(
        scene.ctx, opt, jnp.asarray(c), jnp.asarray(n), jnp.asarray(s),
        jnp.asarray(v))
    out_c = np.asarray(out_c)
    ok = np.asarray(ok)
    assert ok.sum() >= B * 0.7, f"only {ok.sum()}/{B} patches survived"

    err_before = np.abs(c[ok, 2] - plane_scene.plane_z)
    err_after = np.abs(out_c[ok, 2] - plane_scene.plane_z)
    # surviving patches land much closer to the plane than the perturbation
    # (single Gauss-Newton call; multi-level re-optimization in the full
    # pipeline tightens this by another ~10x, see test_pipeline). At the
    # default WINDOW_SIZE=12 a 1.5-scale perturbation sits right at the
    # cached-window drift margin, so the bound is looser than the W=16
    # intrinsic-convergence test below.
    assert np.median(err_after) < 0.45 * np.median(err_before)
    assert np.median(err_after) < 0.01

    # normals re-align with the plane normal (-z toward cameras); at the
    # default W=12 margin, worst-perturbed patches stop a little earlier
    out_n = np.asarray(out_n)[ok]
    cosang = -out_n[:, 2] / np.linalg.norm(out_n, axis=1)
    assert np.median(cosang) > 0.93

    # residual objective is small on the true surface
    assert float(np.median(np.asarray(resid)[ok])) < 0.05

    # colors match the texture (valid RGB range, not all zero)
    color = np.asarray(color)[ok]
    assert np.all(color >= 0) and np.all(color <= 255)
    assert color.std() > 5


def test_optimize_converges_wide_window(plane_scene, built):
    """Intrinsic refiner convergence with the drift margin out of the way
    (WINDOW_SIZE=16): the same 1.5-scale perturbation must tighten ~3x."""
    scene, opt = built
    opt = dataclasses.replace(opt, WINDOW_SIZE=16)
    c, n, s, v, orig = scene_mod.make_seed_patches(plane_scene.model, scene, opt)
    B = min(64, c.shape[0])
    rng = np.random.default_rng(0)
    c = c[:B].copy()
    n, s, v = n[:B], s[:B], v[:B]
    c[:, 2] += rng.uniform(-1.0, 1.0, B) * s * 1.5

    out_c, _, _, _, ok, _, _ = popt.optimize_batch(
        scene.ctx, opt, jnp.asarray(c), jnp.asarray(n), jnp.asarray(s),
        jnp.asarray(v))
    out_c, ok = np.asarray(out_c), np.asarray(ok)
    assert ok.sum() >= B * 0.7
    err_before = np.abs(c[ok, 2] - plane_scene.plane_z)
    err_after = np.abs(out_c[ok, 2] - plane_scene.plane_z)
    assert np.median(err_after) < 0.37 * np.median(err_before)
    assert np.median(err_after) < 0.008


def test_optimize_batch_rejects_garbage(plane_scene, built):
    """Patches far off-surface with inconsistent texture must fail the NCC
    filter chain."""
    scene, opt = built
    c, n, s, v, orig = scene_mod.make_seed_patches(plane_scene.model, scene, opt)
    B = 16
    c = c[:B].copy()
    c[:, 2] += 0.8  # way off the plane (80% of extent)
    out = popt.optimize_batch(scene.ctx, opt, jnp.asarray(c),
                              jnp.asarray(n[:B]), jnp.asarray(s[:B]),
                              jnp.asarray(v[:B]))
    ok = np.asarray(out[4])
    out_c = np.asarray(out[0])
    # either rejected, or the optimizer genuinely recovered the surface;
    # the NCC chain alone (like the reference's) lets the occasional
    # accidental correlation through -- those die later in depth tests /
    # regularization, so only the *rate* is asserted here
    recovered = np.abs(out_c[:, 2] - plane_scene.plane_z) < 0.05
    assert np.mean(~ok | recovered) >= 0.8


def test_engine_optimize_chunking(plane_scene, built):
    """Engine._optimize chunks batches beyond Options.BATCH (bounds the
    window-cache footprint for huge seed sets)."""
    import dataclasses as dc
    from hpmvs_tpu.runtime.wavefront import Engine
    scene, opt = built
    opt_small = dc.replace(opt, BATCH=32, LM_ITERS=4)
    eng = Engine(plane_scene.model, opt_small, images=plane_scene.images)
    c, n, s, v, _ = scene_mod.make_seed_patches(plane_scene.model,
                                                eng.scene, opt_small)
    B = 70  # > 2 chunks of 32
    out = eng._optimize(c[:B], n[:B], s[:B], v[:B])
    assert out[0].shape == (B, 3)
    assert out[4].dtype == bool
    # chunked result equals one-shot result
    opt_big = dc.replace(opt, BATCH=2048, LM_ITERS=4)
    eng2 = Engine(plane_scene.model, opt_big, images=plane_scene.images)
    out2 = eng2._optimize(c[:B], n[:B], s[:B], v[:B])
    np.testing.assert_allclose(out[0], out2[0], atol=2e-4)
    np.testing.assert_array_equal(out[4], out2[4])
