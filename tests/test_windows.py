import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from hpmvs_tpu.config import Options
from hpmvs_tpu.core import scene as scene_mod
from hpmvs_tpu.geom import camera as cam_ops
from hpmvs_tpu.ops import optimizer as popt
from hpmvs_tpu.ops import sampling, windows as win_ops


@pytest.fixture(scope="module")
def built(plane_scene):
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=30, LM_ITERS=8)
    scene = scene_mod.build_scene(plane_scene.model, opt,
                                  images=plane_scene.images)
    seeds = scene_mod.make_seed_patches(plane_scene.model, scene, opt)
    return scene, opt, seeds


def test_window_sampling_matches_direct(built):
    """Hat-weight window sampling must equal direct bilinear gathers exactly
    (same math, different memory path)."""
    scene, opt, (c, n, s, v, _) = built
    B = 32
    ci = jnp.asarray(np.maximum(v[:B], 0))
    cc = jnp.asarray(np.repeat(c[:B][:, None], v.shape[1], axis=1))
    ss = jnp.asarray(np.repeat(s[:B][:, None], v.shape[1], axis=1))
    mac = float(np.cos(opt.MAX_ANGLE))

    nrm = jnp.asarray(np.repeat(n[:B][:, None], v.shape[1], axis=1))
    xax, yax, zax = sampling.patch_axes(scene.ctx.cams, ci, nrm, ss)

    tex_d, val_d = sampling.sample_texture(scene.ctx.cams, scene.ctx.imgs,
                                           ci, cc, ss, xax, yax, zax, mac, 4)
    ws = win_ops.fetch_windows(scene.ctx.cams, scene.ctx.imgs, ci, cc, ss, 4,
                               opt.WINDOW_SIZE)
    tex_w, val_w = win_ops.sample_from_windows(scene.ctx.cams, scene.ctx.imgs,
                                               ws, ci, cc, ss, xax, yax, zax,
                                               mac, 4)
    val_d = np.asarray(val_d)
    val_w = np.asarray(val_w)
    # windowed validity is a subset of direct validity (coverage constraint)
    assert not np.any(val_w & ~val_d)
    # nearly all direct-valid samples stay valid under the window
    assert (val_w.sum() / max(val_d.sum(), 1)) > 0.95
    both = val_d & val_w
    np.testing.assert_allclose(np.asarray(tex_w)[both],
                               np.asarray(tex_d)[both], atol=1e-3)


def test_windowed_pipeline_matches_direct(built):
    """optimize_batch with USE_WINDOWS must reproduce the direct path."""
    scene, opt, (c, n, s, v, _) = built
    B = 48
    rng = np.random.default_rng(0)
    cc = c[:B].copy()
    cc[:, 2] += rng.uniform(-1, 1, B) * s[:B]
    args = (jnp.asarray(cc), jnp.asarray(n[:B]), jnp.asarray(s[:B]),
            jnp.asarray(v[:B]))

    opt_d = dataclasses.replace(opt, USE_WINDOWS=False)
    opt_w = dataclasses.replace(opt, USE_WINDOWS=True)
    out_d = popt.optimize_batch(scene.ctx, opt_d, *args)
    out_w = popt.optimize_batch(scene.ctx, opt_w, *args)

    ok_d, ok_w = np.asarray(out_d[4]), np.asarray(out_w[4])
    # acceptance agrees for nearly all patches (window-coverage edge cases
    # may differ)
    assert (ok_d == ok_w).mean() > 0.9
    both = ok_d & ok_w
    c_d, c_w = np.asarray(out_d[0])[both], np.asarray(out_w[0])[both]
    # optimized centers agree to a small fraction of the patch scale
    err = np.linalg.norm(c_d - c_w, axis=1) / np.asarray(out_d[2])[both]
    assert np.median(err) < 0.05
    # and both land on the true surface
    assert np.median(np.abs(c_w[:, 2])) < 0.01
