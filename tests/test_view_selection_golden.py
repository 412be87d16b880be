"""Golden parity: batched view-selection stages vs scalar numpy
transcriptions of the reference logic (PatchOptimizer.cpp:105-284)."""

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
    seeds = scene_mod.make_seed_patches(plane_scene.model, scene, opt)
    return scene, opt, seeds


def _np_sort_images(cams_center, cam_fsum, ref_P0_f, center, normal, scale,
                    views, opt, maxlevel):
    """sortImages (PatchOptimizer.cpp:183-223) + getAngleWeightedScales
    (:260-284), scalar transcription."""
    views = [v for v in views if v >= 0]
    if not views:
        return [], False
    # refLevel from the reference image
    fz = np.linalg.norm(center - cams_center[views[0]])
    lvl = np.log2(scale * cam_fsum[views[0]] / (2.0 * fz))
    ref_level = int(np.clip(round(lvl), 0, maxlevel - 1))

    n = normal / np.linalg.norm(normal)
    indexes, wscales, rays = [], [], []
    for v in views:
        ray = cams_center[v] - center
        ray = ray / np.linalg.norm(ray)
        cosa = float(ray @ n)
        if cosa > 0:
            fzv = np.linalg.norm(center - cams_center[v])
            sc = 2.0 * fzv * (2.0 ** ref_level) / cam_fsum[v]
            indexes.append(v)
            rays.append(ray)
            wscales.append(sc / cosa)
    if len(indexes) < 2:
        return [], False
    wscales[0] = 0.0
    threshold = 1.0 - np.cos(np.deg2rad(10.0))
    out = []
    while indexes:
        i = int(np.argmin(wscales))
        out.append(indexes[i])
        idx2, ws2, rays2 = [], [], []
        for j in range(len(rays)):
            if j == i:
                continue
            idx2.append(indexes[j])
            rays2.append(rays[j])
            ftmp = min(threshold, max(threshold / 2.0,
                                      1.0 - float(rays[i] @ rays[j])))
            ws2.append(wscales[j] * (threshold / ftmp))
        indexes, wscales, rays = idx2, ws2, rays2
    return out, len(out) >= opt.MIN_IMAGES_PER_PATCH


def test_sort_images_matches_reference_transcription(built):
    scene, opt, (c, n, s, v, _) = built
    cams_center = np.asarray(scene.ctx.cams.center)
    cam_fsum = np.asarray(scene.ctx.cams.fsum)

    rng = np.random.default_rng(5)
    n_match = 0
    for i in rng.integers(0, len(c), 25):
        got_views, got_ok, _ = popt._sort_images(
            scene.ctx, opt, jnp.asarray(c[i]), jnp.asarray(n[i]),
            jnp.asarray(s[i]), jnp.asarray(v[i]))
        want, want_ok = _np_sort_images(cams_center, cam_fsum, None,
                                        c[i], n[i], float(s[i]), v[i], opt,
                                        opt.MAXLEVEL)
        got = [int(x) for x in np.asarray(got_views) if x >= 0]
        assert got == want, f"patch {i}: {got} != {want}"
        assert bool(got_ok) == want_ok
        n_match += 1
    assert n_match == 25


def test_assure_angles_matches(built):
    scene, opt, (c, n, s, v, _) = built
    cams_center = np.asarray(scene.ctx.cams.center)
    for i in range(15):
        got = bool(popt._assure_angles(scene.ctx, opt, jnp.asarray(c[i]),
                                       jnp.asarray(v[i])))
        views = [x for x in v[i] if x >= 0]
        want = False
        for a in range(len(views) - 1):
            for b in range(a + 1, len(views)):
                ra = cams_center[views[a]] - c[i]
                rb = cams_center[views[b]] - c[i]
                ang = np.arccos(np.clip(
                    (ra / np.linalg.norm(ra)) @ (rb / np.linalg.norm(rb)),
                    -1, 1))
                if opt.MIN_ANGLE < ang < opt.MAX_ANGLE:
                    want = True
        assert got == want


def test_filter_by_angle_matches(built):
    scene, opt, (c, n, s, v, _) = built
    cams_center = np.asarray(scene.ctx.cams.center)
    for i in range(15):
        got_views, got_ok, _ = popt._filter_by_angle(
            scene.ctx, opt, jnp.asarray(c[i]), jnp.asarray(n[i]),
            jnp.asarray(v[i]))
        got = [int(x) for x in np.asarray(got_views) if x >= 0]
        want = []
        for x in v[i]:
            if x < 0:
                continue
            ray = cams_center[x] - c[i]
            ray = ray / np.linalg.norm(ray)
            if ray @ n[i] > np.cos(opt.MAX_ANGLE):
                want.append(int(x))
        assert got == want
        assert bool(got_ok) == (len(want) >= opt.MIN_IMAGES_PER_PATCH)


def test_add_images_semantics(built):
    """addImages adds only covisible, angle-, level- and bounds-passing
    candidates, preserving order, never duplicating."""
    scene, opt, (c, n, s, v, _) = built
    for i in range(10):
        base = v[i].copy()
        got_views, got_ok = popt._add_images(
            scene.ctx, opt, jnp.asarray(c[i]), jnp.asarray(n[i]),
            jnp.asarray(s[i]), jnp.asarray(base))
        got = [int(x) for x in np.asarray(got_views) if x >= 0]
        orig = [int(x) for x in base if x >= 0]
        # original views stay in front, in order
        assert got[:len(orig)] == orig
        # no duplicates, all valid camera ids
        assert len(set(got)) == len(got)
        assert all(0 <= g < scene.n_cameras for g in got)
        # every appended camera is covisible with the reference
        covis = set(scene.covis_np[orig[0]][scene.covis_np[orig[0]] >= 0])
        for g in got[len(orig):]:
            assert g in covis
