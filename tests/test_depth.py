import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from hpmvs_tpu.config import Options
from hpmvs_tpu.core import depth as depth_mod
from hpmvs_tpu.core import scene as scene_mod


@pytest.fixture(scope="module")
def built(plane_scene):
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=30)
    scene = scene_mod.build_scene(plane_scene.model, opt,
                                  images=plane_scene.images)
    pack = depth_mod.build_depth_pack(np.asarray(scene.ctx.imgs.width),
                                      np.asarray(scene.ctx.imgs.height))
    c, n, s, v, _ = scene_mod.make_seed_patches(plane_scene.model, scene, opt)
    return scene, opt, pack, (c, n, s, v)


def test_set_and_subtract_depths(built):
    scene, opt, pack, (c, n, s, v) = built
    cams = scene.ctx.cams
    B = 32
    args = (jnp.asarray(c[:B]), jnp.asarray(s[:B]), jnp.asarray(v[:B]))
    p1 = depth_mod.set_depths(pack, cams, *args)
    d1 = np.asarray(p1.depth)
    assert (d1 < depth_mod.MAX_DEPTH).sum() > 0
    # adding the same patches again changes nothing (min is idempotent)
    p2 = depth_mod.set_depths(p1, cams, *args)
    np.testing.assert_array_equal(np.asarray(p2.depth), d1)
    # subtracting restores the empty buffer
    p3 = depth_mod.set_depths(p2, cams, *args, subtract=True)
    d3 = np.asarray(p3.depth)
    np.testing.assert_array_equal(d3, np.full_like(d3, depth_mod.MAX_DEPTH))


def test_subtract_keeps_closer_surface(built):
    """subtract only clears cells that still hold exactly this depth
    (Scene.cpp:371-373)."""
    scene, opt, pack, (c, n, s, v) = built
    cams = scene.ctx.cams
    near = (jnp.asarray(c[:8]), jnp.asarray(s[:8]), jnp.asarray(v[:8]))
    # a second surface 0.3 closer to the cameras (smaller depth wins the min)
    c_far = c[:8].copy()
    c_far[:, 2] -= 0.3  # toward cameras (cameras sit at z < 0)
    far = (jnp.asarray(c_far), jnp.asarray(s[:8]), jnp.asarray(v[:8]))

    p = depth_mod.set_depths(pack, cams, *far)
    p = depth_mod.set_depths(p, cams, *near)
    d_before = np.asarray(p.depth)
    # subtracting the farther (occluded) surface must NOT clear the closer one
    p = depth_mod.set_depths(p, cams, *near, subtract=True)
    d_after = np.asarray(p.depth)
    cleared = (d_before < depth_mod.MAX_DEPTH) & (d_after == depth_mod.MAX_DEPTH)
    kept = (d_before < depth_mod.MAX_DEPTH) & (d_after == d_before)
    assert kept.sum() > 0  # closer surface cells survive


def test_depth_and_pixel_free_tests(built):
    scene, opt, pack, (c, n, s, v) = built
    cams, imgs = scene.ctx.cams, scene.ctx.imgs
    B = 48
    cc, nn, ss, vv = (jnp.asarray(c[:B]), jnp.asarray(n[:B]),
                      jnp.asarray(s[:B]), jnp.asarray(v[:B]))

    # empty buffers: depth test passes trivially, all pixels free
    dt0 = np.asarray(depth_mod.depth_tests(pack, cams, imgs, opt, cc, nn, ss,
                                           vv, opt.DEPTH_TEST_FACTOR))
    nv = (v[:B] >= 0).sum(1)
    np.testing.assert_array_equal(dt0, nv)
    pf0 = np.asarray(depth_mod.pixel_free_tests(pack, cams, imgs, opt, cc, ss, vv))
    assert (pf0 >= nv - 1).all()  # nearly all views free (level gates allowed)

    # after inserting the patches, their own depth test still passes ...
    p = depth_mod.set_depths(pack, cams, cc, ss, vv)
    dt1 = np.asarray(depth_mod.depth_tests(p, cams, imgs, opt, cc, nn, ss, vv,
                                           opt.DEPTH_TEST_FACTOR))
    assert (dt1 >= opt.MIN_IMAGES_PER_PATCH).mean() > 0.9
    # ... but their pixels are no longer free
    pf1 = np.asarray(depth_mod.pixel_free_tests(p, cams, imgs, opt, cc, ss, vv))
    assert (pf1 < pf0).mean() > 0.9

    # nothing blocks the view of on-surface patches
    vb = np.asarray(depth_mod.view_block_test(p, cams, imgs, opt, cc, nn, ss,
                                              opt.DEPTH_TEST_FACTOR,
                                              scene.n_cameras))
    assert (vb == 0).mean() > 0.9

    # a patch floating in FRONT of the confirmed surface gets blocked counts:
    # shift along the reference-view ray so it hits the same buffer cell with
    # a smaller depth (with a sparse buffer only ray-aligned shifts land on
    # written cells -- same as the reference)
    cam_c = np.asarray(cams.center)[v[:B, 0]]
    ray = c[:B] - cam_c
    ray /= np.linalg.norm(ray, axis=1, keepdims=True)
    c_float = c[:B] - 0.4 * ray
    vbf = np.asarray(depth_mod.view_block_test(
        p, cams, imgs, opt, jnp.asarray(c_float.astype(np.float32)), nn, ss,
        opt.DEPTH_TEST_FACTOR, scene.n_cameras))
    assert vbf.mean() > vb.mean()
    assert (vbf >= 1).mean() > 0.5


def test_get_full_depth_pyramid_min(built):
    scene, opt, pack, (c, n, s, v) = built
    cams = scene.ctx.cams
    cc, ss, vv = (jnp.asarray(c[:4]), jnp.asarray(s[:4]), jnp.asarray(v[:4]))
    p = depth_mod.set_depths(pack, cams, cc, ss, vv)
    # recover the exact buffer cell the write used, then query a level-0
    # pixel that maps down onto it (write rounds at level L, read shifts
    # down from level 0 -- the same one-off quirk as the reference's
    # setDepths vs getFullDepth formulas)
    from hpmvs_tpu.geom import camera as cam_ops
    ci = jnp.asarray([v[0, 0]], dtype=jnp.int32)
    lvl = cam_ops.get_leveli(cams, ci, cc[:1], ss[:1], opt.n_levels - 1)
    imgC = np.asarray(cam_ops.mult(cams, ci, cc[:1], lvl))[0]
    lv = int(lvl[0])
    xw = int(imgC[0] / imgC[2] + 0.5) // 2
    yw = int(imgC[1] / imgC[2] + 0.5) // 2
    ix = xw * (2 << lv) + (1 << lv)   # maps to xw at level lv in the read
    iy = yw * (2 << lv) + (1 << lv)
    fd = float(depth_mod.get_full_depth(p, ci, jnp.array([ix]),
                                        jnp.array([iy]), opt.n_levels)[0])
    assert fd < depth_mod.MAX_DEPTH
    np.testing.assert_allclose(fd, imgC[2], rtol=1e-3)


def test_phased_updates_match_sequential(built):
    """apply_phased_updates(add*, sub*, add*) == the same sequence of
    individual set_depths dispatches (the engine's deferred-window
    semantics, runtime/wavefront._set_depths)."""
    scene, opt, pack, (c, n, s, v) = built
    cams = scene.ctx.cams
    a0 = (jnp.asarray(c[:8]), jnp.asarray(s[:8]), jnp.asarray(v[:8]))
    sub = (jnp.asarray(c[4:12]), jnp.asarray(s[4:12]), jnp.asarray(v[4:12]))
    c2 = c[8:16].copy()
    c2[:, 2] -= 0.1
    a2 = (jnp.asarray(c2), jnp.asarray(s[8:16]), jnp.asarray(v[8:16]))

    # sequential reference: add a0, subtract sub, add a2
    p_seq = depth_mod.set_depths(pack, cams, *a0)
    p_seq = depth_mod.set_depths(p_seq, cams, *sub, subtract=True)
    p_seq = depth_mod.set_depths(p_seq, cams, *a2)

    # one phased batch
    cc = jnp.concatenate([a0[0], sub[0], a2[0]])
    ss = jnp.concatenate([a0[1], sub[1], a2[1]])
    vv = jnp.concatenate([a0[2], sub[2], a2[2]])
    ph = jnp.asarray(np.repeat([0, 1, 2], 8).astype(np.int32))
    p_bat = depth_mod.apply_depth_updates(pack, cams, cc, ss, vv, ph)

    np.testing.assert_array_equal(np.asarray(p_bat.depth),
                                  np.asarray(p_seq.depth))


def test_engine_defers_subtract_snapshot():
    """The deferred window must snapshot patch projections at deferral
    time: a freed + reallocated store slot must not corrupt a pending
    subtract (runtime/wavefront._set_depths)."""
    import dataclasses as dc

    from hpmvs_tpu.runtime.wavefront import Engine
    from hpmvs_tpu.testing import make_plane_scene

    ps = make_plane_scene(n_cams=4, imgsize=96, n_points=24, seed=3)
    opt = dc.replace(Options(), START_LEVEL=1, MAXLEVEL=3, MAX_VIEWS=6,
                     COVIS_MIN_POINTS=10, LM_ITERS=4)
    eng = Engine(ps.model, opt, images=ps.images)
    eng.seed()
    pids = np.nonzero(eng.patches.alive)[0][:4]
    eng._flush_depths()
    before = np.asarray(eng.pack.depth).copy()

    # defer a subtract, then clobber + free the slots (as filter/branch do)
    eng._set_depths(pids, subtract=True)
    eng.patches.center[pids] += 100.0  # slot reused by an unrelated patch
    eng._flush_depths()
    after = np.asarray(eng.pack.depth)
    # the subtract used the snapshotted projection: those cells cleared
    assert (before < depth_mod.MAX_DEPTH).sum() > 0
    cleared = (before < depth_mod.MAX_DEPTH) & (after == depth_mod.MAX_DEPTH)
    assert cleared.sum() > 0


def test_pooled_gates_match_reference_path(built):
    """The 2x2-pooled gate path (depth.pool_full_depth +
    _depth_test_view_pooled) is BITWISE equal to the per-neighbor gather
    path for depth_tests AND view_block_test, across perturbed lanes that
    mix pass/fail/edge/empty cases."""
    scene, opt, pack, (c, n, s, v) = built
    cams = scene.ctx.cams
    imgs = scene.ctx.imgs
    n_images = scene.n_cameras
    B = min(64, len(c))
    p = depth_mod.set_depths(pack, cams, jnp.asarray(c[:B]),
                             jnp.asarray(s[:B]), jnp.asarray(v[:B]))

    rng = np.random.default_rng(3)
    # lanes: exact surface, depth-perturbed (both signs, several scales),
    # far off-image, and behind-camera-ish extremes
    offs = rng.normal(0, 1.0, (B, 3)).astype(np.float32) * \
        np.asarray(s[:B])[:, None] * rng.choice(
            [0.0, 0.5, 2.0, 8.0, 100.0], (B, 1)).astype(np.float32)
    cc = jnp.asarray(c[:B] + offs)
    nn = jnp.asarray(n[:B])
    ss = jnp.asarray(s[:B] * rng.choice([0.5, 1.0, 2.0], B).astype(np.float32))
    vv = jnp.asarray(v[:B])
    m = jnp.float32(opt.DEPTH_TEST_FACTOR)

    pw = np.asarray(p.width)
    ph = np.asarray(p.height)
    assert (pw == pw[:1]).all() and (ph == ph[:1]).all()
    layout = tuple((int(ph[0, l]), int(pw[0, l])) for l in range(pw.shape[1]))
    full0 = depth_mod.collapse_full_depth(p.depth, layout, n_images)
    pool3 = depth_mod.pool_full_depth(full0)

    for f0, p3 in ((None, None), (full0, None), (full0, pool3)):
        dt = np.asarray(depth_mod.depth_tests(
            p, cams, imgs, opt, cc, nn, ss, vv, m, full0=f0, pool3=p3))
        vb = np.asarray(depth_mod.view_block_test(
            p, cams, imgs, opt, cc, nn, ss, m, n_images, full0=f0, pool3=p3))
        if f0 is None:
            ref_dt, ref_vb = dt, vb
            assert ref_dt.max() > 0  # the cases actually exercise passes
        else:
            np.testing.assert_array_equal(dt, ref_dt)
            np.testing.assert_array_equal(vb, ref_vb)
