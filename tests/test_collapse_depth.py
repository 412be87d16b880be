"""collapse_full_depth exactness: the dense gather-free collapsed buffer
must reproduce Scene::getFullDepth (the per-lane pyramid-min gather chain,
depth.get_full_depth) bitwise at every level-0 cell -- including the
stop-at-first-out-of-bounds rule at odd image dims (Scene.cpp:406-431) --
and the fused gate dispatch must be bitwise identical with and without the
fast path."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from hpmvs_tpu.core import depth as depth_mod


def _random_pack(h0, w0, n_levels, ncam, seed):
    rng = np.random.default_rng(seed)
    wdims = np.zeros((ncam, n_levels), np.int64)
    hdims = np.zeros((ncam, n_levels), np.int64)
    wl, hl = w0, h0
    for lv in range(n_levels):
        wdims[:, lv] = wl
        hdims[:, lv] = hl
        wl, hl = max(1, wl // 2), max(1, hl // 2)
    pack = depth_mod.build_depth_pack(wdims * 2, hdims * 2, 2)
    depth = rng.uniform(0.5, 2.0, (int(np.asarray(pack.depth).shape[0]),))
    # sprinkle empty (MAX_DEPTH) cells so the empty-vs-filled paths differ
    depth[rng.random(len(depth)) < 0.3] = depth_mod.MAX_DEPTH
    return pack._replace(depth=jnp.asarray(depth, jnp.float32))


def test_collapse_matches_get_full_depth():
    for h0, w0, L in [(16, 16, 4), (13, 21, 5), (7, 9, 6), (5, 3, 4)]:
        pack = _random_pack(h0, w0, L, ncam=3, seed=h0 * 31 + w0)
        layout = tuple((int(np.asarray(pack.height)[0, l]),
                        int(np.asarray(pack.width)[0, l]))
                       for l in range(L))
        full0 = np.asarray(depth_mod.collapse_full_depth(
            pack.depth, layout, 3))
        ys, xs = np.meshgrid(np.arange(h0), np.arange(w0), indexing="ij")
        for ci in range(3):
            ref = np.asarray(depth_mod.get_full_depth(
                pack, jnp.full(ys.shape, ci, jnp.int32),
                jnp.asarray(xs * 2, jnp.int32),
                jnp.asarray(ys * 2, jnp.int32), L, 2))
            np.testing.assert_array_equal(
                full0[ci], ref,
                err_msg=f"dims {h0}x{w0} L{L} cam{ci}")


def test_gate_dispatch_bitwise_with_collapse():
    from hpmvs_tpu.config import Options
    from hpmvs_tpu.core import scene as scene_mod
    from hpmvs_tpu.ops import optimizer as popt
    from hpmvs_tpu.testing import make_plane_scene

    opt = dataclasses.replace(Options(), START_LEVEL=1, MAXLEVEL=3,
                              MAX_VIEWS=6, COVIS_MIN_POINTS=10, LM_ITERS=4)
    ps = make_plane_scene(n_cams=4, imgsize=96, n_points=24, seed=0)
    scene = scene_mod.build_scene(ps.model, opt, images=ps.images)
    pack = depth_mod.build_depth_pack(scene.width_np, scene.height_np,
                                     opt.DEPTH_SUBSAMPLE)
    c, n, s, v, _ = scene_mod.make_seed_patches(ps.model, scene, opt)
    rng = np.random.default_rng(3)
    # occupy some z-buffer cells so depth/viewBlock gates have structure
    d0 = np.asarray(pack.depth).copy()
    occ = rng.integers(0, len(d0), 512)
    d0[occ] = rng.uniform(2.0, 4.0, len(occ))
    pack = pack._replace(depth=jnp.asarray(d0))

    B = len(c)
    xin = np.zeros((B, 11 + opt.MAX_VIEWS), np.float32)
    xin[:, 0:3] = c + rng.normal(0, 0.003, (B, 3))
    xin[:, 3:6] = n
    xin[:, 6] = s
    xin[:, 7:10] = c
    xin[:, 10] = s * 4
    xin[:, 11:] = np.ascontiguousarray(v, np.int32).view(np.float32)
    xin = jnp.asarray(xin)

    pw = np.asarray(pack.width)
    ph = np.asarray(pack.height)
    layout = tuple((int(ph[0, l]), int(pw[0, l])) for l in range(pw.shape[1]))

    slow = np.asarray(popt.optimize_and_gate_packed(
        scene.ctx, pack, opt, scene.n_cameras, xin))
    fast = np.asarray(popt.optimize_and_gate_packed(
        scene.ctx, pack, opt, scene.n_cameras, xin, pack_layout=layout))
    np.testing.assert_array_equal(slow, fast)
