"""Depth z-buffer pyramid with batched scatter-min updates and visibility tests.

Behavioral equivalent of the reference Scene depth machinery
(src/hpmvs/Scene.cpp:351-644, include/hpmvs/Scene.h:74-106): a subsampled
(factor 2) min-depth buffer per (image, pyramid level), initialized to
MAX_DEPTH = 1000, with
  - setDepths: per visible view scatter-min of the patch depth (subtract mode
    resets the cell to MAX_DEPTH when it still holds this patch's depth)
  - depthTest: level-0 projection, 3x3 neighborhood, tolerance
    scale * margin * min(2, 2 + ray.normal) * 2 against getFullDepth
    (min across the whole pyramid)
  - viewBlockTest: is the patch floating in front of a confirmed surface, over
    ALL images
  - pixelFreeTest: is the buffer cell at the patch's own level still empty.

TPU-first design: all buffers are packed into ONE flat device array; updates
are batched scatter-min ops over (B patches x K views) and the mutexes of the
reference (Scene.h:76) disappear -- wavefront batches update functionally and
an all-reduce-min merges shards (parallel/).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hpmvs_tpu.config import Options
from hpmvs_tpu.geom import camera as cam_ops

MAX_DEPTH = 1000.0


class DepthPack(NamedTuple):
    depth: jnp.ndarray    # (total_cells,) float32
    offset: jnp.ndarray   # (ncam, nlevel) int32
    width: jnp.ndarray    # (ncam, nlevel) int32  (cols)
    height: jnp.ndarray   # (ncam, nlevel) int32  (rows)


def build_depth_pack(img_width: np.ndarray, img_height: np.ndarray,
                     subsample: int = 2) -> DepthPack:
    """Allocate per-(image,level) buffers of (H/subsample, W/subsample)
    (Scene.cpp:74-81, integer division)."""
    ncam, nlevel = img_width.shape
    offset = np.zeros((ncam, nlevel), dtype=np.int32)
    width = np.zeros((ncam, nlevel), dtype=np.int32)
    height = np.zeros((ncam, nlevel), dtype=np.int32)
    pos = 0
    for ci in range(ncam):
        for lv in range(nlevel):
            w = int(img_width[ci, lv]) // subsample
            h = int(img_height[ci, lv]) // subsample
            offset[ci, lv] = pos
            width[ci, lv] = w
            height[ci, lv] = h
            pos += w * h
    return DepthPack(depth=jnp.full((pos,), MAX_DEPTH, dtype=jnp.float32),
                     offset=jnp.asarray(offset), width=jnp.asarray(width),
                     height=jnp.asarray(height))


def _trunc_div(v, d):
    """C-style int(v) truncation toward zero followed by integer division."""
    t = jnp.trunc(v).astype(jnp.int32)
    return t // d


def _patch_view_cells(pack: DepthPack, cams, centers, scales, views,
                      subsample: int):
    """Per (patch, view): flat buffer index + depth (Scene::setDepths
    projection, Scene.cpp:352-367). Returns (idx, d, valid)."""
    ci = jnp.maximum(views, 0)                       # (B, K)
    B, K = views.shape
    cc = jnp.broadcast_to(centers[:, None, :], (B, K, 3))
    ss = jnp.broadcast_to(scales[:, None], (B, K))
    nlev = cams.n_levels - 1
    lvl = cam_ops.get_leveli(cams, ci, cc, ss, nlev)
    imgC = cam_ops.mult(cams, ci, cc, lvl)           # (B, K, 3)
    d = imgC[..., 2]
    x = _trunc_div(imgC[..., 0] / d + 0.5, subsample)
    y = _trunc_div(imgC[..., 1] / d + 0.5, subsample)
    w = pack.width[ci, lvl]
    h = pack.height[ci, lvl]
    valid = (views >= 0) & (d >= 0) & (x >= 0) & (x < w) & (y >= 0) & (y < h)
    idx = pack.offset[ci, lvl] + y * w + x
    idx = jnp.where(valid, idx, 0)
    return idx, d, valid


@functools.partial(jax.jit, static_argnames=("subsample", "subtract"))
def set_depths(pack: DepthPack, cams, centers, scales, views,
               subtract: bool = False, subsample: int = 2) -> DepthPack:
    """Batched Scene::setDepths (Scene.cpp:351-381).

    add: scatter-min of patch depth; subtract: reset cells that still hold
    exactly this depth back to MAX_DEPTH."""
    idx, d, valid = _patch_view_cells(pack, cams, centers, scales, views,
                                      subsample)
    idx = idx.reshape(-1)
    d = d.reshape(-1)
    valid = valid.reshape(-1)
    if subtract:
        cur = pack.depth[idx]
        hit = valid & (cur == d)
        new = pack.depth.at[jnp.where(hit, idx, 0)].max(
            jnp.where(hit, MAX_DEPTH, -jnp.inf))
        # .max with -inf filler is a no-op for non-hits; index 0 untouched
        return pack._replace(depth=new)
    else:
        new = pack.depth.at[idx].min(jnp.where(valid, d, jnp.inf))
        return pack._replace(depth=new)


def apply_phased_updates(pack: DepthPack, cams, centers, scales, views,
                         phase, subsample: int = 2) -> DepthPack:
    """Ordered batch of deferred setDepths updates in ONE pass: phase 0
    adds (scatter-min), then phase 1 subtracts (reset-to-MAX-if-equal,
    Scene.cpp:369-379), then phase 2 adds. Phase runs reproduce the
    sequential add*/sub*/add* order the engine deferred; entries project
    once (idx/d shared across phases). NOT jitted -- embeddable in fused
    dispatches (ops.optimizer.optimize_and_gate); see apply_depth_updates
    for the standalone jitted flush."""
    idx, d, valid = _patch_view_cells(pack, cams, centers, scales, views,
                                      subsample)
    idx = idx.reshape(-1)
    d = d.reshape(-1)
    K = views.shape[1]
    ph = jnp.repeat(phase, K)
    valid = valid.reshape(-1)
    depth = pack.depth
    depth = depth.at[idx].min(jnp.where(valid & (ph == 0), d, jnp.inf))
    hit = valid & (ph == 1) & (depth[idx] == d)
    depth = depth.at[jnp.where(hit, idx, 0)].max(
        jnp.where(hit, MAX_DEPTH, -jnp.inf))
    depth = depth.at[idx].min(jnp.where(valid & (ph == 2), d, jnp.inf))
    return pack._replace(depth=depth)


@functools.partial(jax.jit, static_argnames=("subsample",))
def apply_depth_updates(pack: DepthPack, cams, centers, scales, views,
                        phase, subsample: int = 2) -> DepthPack:
    """Jitted standalone flush of deferred phased depth updates -- one
    dispatch replacing the former flush-adds + subtract pair."""
    return apply_phased_updates(pack, cams, centers, scales, views, phase,
                                subsample)


def get_depth_at_level(pack: DepthPack, ci, x, y, level, subsample: int = 2):
    """Scene::getDetphAtLevel (Scene.cpp:383-404)."""
    xs = x // subsample
    ys = y // subsample
    w = pack.width[ci, level]
    h = pack.height[ci, level]
    inb = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    idx = jnp.where(inb, pack.offset[ci, level] + ys * w + xs, 0)
    return jnp.where(inb, pack.depth[idx], MAX_DEPTH)


def get_full_depth(pack: DepthPack, ci, x, y, n_levels: int,
                   subsample: int = 2):
    """Scene::getFullDepth (Scene.cpp:406-431): min over the pyramid,
    stopping at the first out-of-bounds level."""
    depth = jnp.full(jnp.broadcast_shapes(ci.shape, x.shape), MAX_DEPTH,
                     dtype=jnp.float32)
    alive = jnp.ones_like(depth, dtype=bool)
    xs = x // subsample
    ys = y // subsample
    for lv in range(n_levels):
        w = pack.width[ci, lv]
        h = pack.height[ci, lv]
        inb = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
        alive = alive & inb
        idx = jnp.where(alive, pack.offset[ci, lv] + ys * w + xs, 0)
        depth = jnp.where(alive, jnp.minimum(depth, pack.depth[idx]), depth)
        xs = xs // 2
        ys = ys // 2
    return depth


def collapse_full_depth(depth: jnp.ndarray, layout, ncam: int) -> jnp.ndarray:
    """Collapse the per-level z-buffer pyramid into ONE level-0-resolution
    full-depth buffer: out[c, y, x] == get_full_depth(pack, c, x*ss, y*ss)
    for every level-0 (subsampled) cell -- the pyramid min with the exact
    stop-at-first-out-of-bounds rule of Scene::getFullDepth
    (Scene.cpp:406-431), reproduced by an `alive` mask that goes false at
    the first level whose cell is out of bounds and stays false.

    layout: STATIC tuple of per-level pack dims ((h0,w0),(h1,w1),...),
    valid when every camera shares them (uniform captures; the engine
    passes None otherwise and the gates fall back to per-lane pyramid
    gathers). Built from dense repeats + mins -- bandwidth-bound, ZERO
    gathers -- so the geometric gates afterwards cost ONE gather per
    (lane, view, neighbor) instead of one per pyramid level: at 150
    cameras this is the difference between the gates dominating the fused
    dispatch ~6:1 and costing less than the optimizer
    (bench/progressive.json ring leg: t_phase0 654 s of 760 s device).
    pool_full_depth below then folds the 9-neighbor reduction itself into
    2 pooled gathers per (lane, image) -- measured 44 ms -> 20 ms for the
    fused gates at 150 cams / B=2048 (bench/profile_gates.py)."""
    L = len(layout)
    h0, w0 = layout[0]
    S = sum(h * w for h, w in layout)
    d2 = depth.reshape(ncam, S)
    acc = d2[:, :h0 * w0].reshape(ncam, h0, w0)
    ys = jnp.arange(h0)[:, None]
    xs = jnp.arange(w0)[None, :]
    alive = jnp.ones((h0, w0), bool)
    pre = h0 * w0
    for lv in range(1, L):
        h, w = layout[lv]
        f = 1 << lv
        # in-bounds at this level: the L0 cell's ancestor (y>>lv, x>>lv)
        # exists; empty slabs (h*w == 0) kill every cell from here down
        alive = alive & (ys < h * f) & (xs < w * f)
        if h > 0 and w > 0:
            slab = d2[:, pre:pre + h * w].reshape(ncam, h, w)
            up = jnp.repeat(jnp.repeat(slab, f, axis=1), f, axis=2)
            uh, uw = min(h0, h * f), min(w0, w * f)
            up = up[:, :uh, :uw]
            if uh < h0 or uw < w0:
                up = jnp.pad(up, ((0, 0), (0, h0 - uh), (0, w0 - uw)),
                             constant_values=MAX_DEPTH)
            acc = jnp.minimum(acc, jnp.where(alive[None], up, MAX_DEPTH))
        pre += h * w
    return acc


def pool_full_depth(full0: jnp.ndarray):
    """2x2 forward-window pools of the collapsed full-depth buffer, the
    second half of the gather-free gate path (valid for DEPTH_SUBSAMPLE=2,
    the reference constant, Scene.h:74): the 3x3 full-resolution
    neighborhood of Scene::depthTest (Scene.cpp:534-556) projects onto
    EXACTLY the 2x2 subsampled cells {ix0//2, ix0//2+1} x {iy0//2, iy0//2+1}
    for every alignment of ix0, so the 9 per-neighbor gathers collapse to
    pooled per-cell reductions gathered ONCE per (lane, image):

      pass(depth)  = all cells empty-or-within-band
                   = nm_max < d+tol  AND  nm_min > d-tol
      blocked(vb)  = no cell empty AND all beyond band
                   = raw_max < MAX_DEPTH  AND  nm_min > d+tol

    Returns (nm_min, nm_max, raw_max), each (ncam, h0, w0): min/max over
    the window counting only non-empty cells (+/-inf when all empty), and
    the raw max (>= MAX_DEPTH iff any cell is empty or out of range --
    out-of-range subsampled cells behave as empty in the reference path,
    reproduced by MAX_DEPTH edge padding)."""
    v = jnp.pad(full0, ((0, 0), (0, 1), (0, 1)),
                constant_values=MAX_DEPTH)
    vm = jnp.where(v < MAX_DEPTH, v, jnp.inf)
    vM = jnp.where(v < MAX_DEPTH, v, -jnp.inf)
    h0, w0 = full0.shape[1], full0.shape[2]

    def pool2(a, red):
        b = red(a[:, :h0, :], a[:, 1:h0 + 1, :])
        return red(b[:, :, :w0], b[:, :, 1:w0 + 1])

    return (pool2(vm, jnp.minimum), pool2(vM, jnp.maximum),
            pool2(v, jnp.maximum))


def _depth_test_view_pooled(cams, imgs, opt: Options, centers, normals,
                            scales, ci, margin, view_block: bool, pool3):
    """Pooled-gather Scene::depthTest equivalent (see pool_full_depth):
    level-0 projection, the all-9-neighbors reduction evaluated from one
    2x2-pooled cell per (lane, image). Bitwise-equal to the 9-gather path
    (tests/test_depth.py::test_pooled_gates_match_reference_path)."""
    nm_min, nm_max, raw_max = pool3
    imgC = cam_ops.mult(cams, ci, centers, jnp.zeros_like(ci))
    d = imgC[..., 2]
    ix0 = jnp.trunc(imgC[..., 0] / d + 0.5).astype(jnp.int32) - 1
    iy0 = jnp.trunc(imgC[..., 1] / d + 0.5).astype(jnp.int32) - 1
    w0 = imgs.width[ci, 0]
    h0 = imgs.height[ci, 0]
    allinb = ((d >= 0) & (ix0 >= 0) & (ix0 + 2 < w0)
              & (iy0 >= 0) & (iy0 + 2 < h0))
    xs = jnp.clip(ix0 // 2, 0, nm_min.shape[2] - 1)
    ys = jnp.clip(iy0 // 2, 0, nm_min.shape[1] - 1)

    ray = centers - cams.center[ci]
    ray = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True),
                            1e-12)
    factor = jnp.minimum(2.0, 2.0 + jnp.sum(ray * normals, axis=-1))
    tol = scales * margin * factor * 2.0
    if view_block:
        res = (raw_max[ci, ys, xs] < MAX_DEPTH) \
            & (nm_min[ci, ys, xs] > d + tol)
    else:
        res = (nm_max[ci, ys, xs] < d + tol) \
            & (nm_min[ci, ys, xs] > d - tol)
    return res & allinb


def _depth_test_at(pack: DepthPack, cams, imgs, opt: Options, centers,
                   normals, scales, ci, ix, iy, d, margin, view_block: bool,
                   full0=None):
    """Inner Scene::depthTest (Scene.cpp:558-582) at explicit pixel coords.

    centers/normals/scales broadcast against ci/ix/iy. full0: optional
    collapsed full-depth buffer (ncam, h0, w0) from collapse_full_depth --
    one gather here instead of one per pyramid level."""
    w0 = imgs.width[ci, 0]
    h0 = imgs.height[ci, 0]
    inb = (d >= 0) & (ix >= 0) & (ix < w0) & (iy >= 0) & (iy < h0)

    if full0 is not None:
        ss = opt.DEPTH_SUBSAMPLE
        xs = ix // ss
        ys = iy // ss
        pw = pack.width[ci, 0]
        ph = pack.height[ci, 0]
        inb0 = (xs >= 0) & (xs < pw) & (ys >= 0) & (ys < ph)
        img_depth = jnp.where(
            inb0,
            full0[ci, jnp.clip(ys, 0, full0.shape[1] - 1),
                  jnp.clip(xs, 0, full0.shape[2] - 1)],
            MAX_DEPTH)
    else:
        img_depth = get_full_depth(pack, ci, ix, iy, opt.n_levels,
                                   opt.DEPTH_SUBSAMPLE)
    empty = img_depth >= MAX_DEPTH

    ray = centers - cams.center[ci]
    ray = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True), 1e-12)
    diff = img_depth - d
    factor = jnp.minimum(2.0, 2.0 + jnp.sum(ray * normals, axis=-1))
    tol = scales * margin * factor * 2.0
    if view_block:
        res = diff > tol
        res = jnp.where(empty, False, res)
    else:
        res = jnp.abs(diff) < tol
        res = jnp.where(empty, True, res)
    return jnp.where(inb, res, False)


def _depth_test_view(pack, cams, imgs, opt: Options, centers, normals, scales,
                     ci, margin, view_block: bool, full0=None):
    """Scene::depthTest with 3x3 neighborhood (Scene.cpp:534-556): level-0
    projection; ALL 9 neighbors must pass."""
    imgC = cam_ops.mult(cams, ci, centers, jnp.zeros_like(ci))
    d = imgC[..., 2]
    ix0 = jnp.trunc(imgC[..., 0] / d + 0.5).astype(jnp.int32) - 1
    iy0 = jnp.trunc(imgC[..., 1] / d + 0.5).astype(jnp.int32) - 1
    res = jnp.ones_like(ci, dtype=bool)
    for yy in range(3):
        for xx in range(3):
            res = res & _depth_test_at(pack, cams, imgs, opt, centers, normals,
                                       scales, ci, ix0 + xx, iy0 + yy, d,
                                       margin, view_block, full0=full0)
    return res


@functools.partial(jax.jit, static_argnames=("opt",))
def depth_tests(pack: DepthPack, cams, imgs, opt: Options, centers, normals,
                scales, views, margin, full0=None, pool3=None):
    """Scene::depthTests (Scene.cpp:518-524): #views passing the depth test."""
    ci = jnp.maximum(views, 0)
    B, K = views.shape
    cc = jnp.broadcast_to(centers[:, None, :], (B, K, 3))
    nn = jnp.broadcast_to(normals[:, None, :], (B, K, 3))
    ss = jnp.broadcast_to(scales[:, None], (B, K))
    if pool3 is not None:
        res = _depth_test_view_pooled(cams, imgs, opt, cc, nn, ss, ci,
                                      margin, view_block=False, pool3=pool3)
    else:
        res = _depth_test_view(pack, cams, imgs, opt, cc, nn, ss, ci, margin,
                               view_block=False, full0=full0)
    return jnp.sum(res & (views >= 0), axis=-1)


@functools.partial(jax.jit, static_argnames=("opt", "n_images"))
def view_block_test(pack: DepthPack, cams, imgs, opt: Options, centers,
                    normals, scales, margin, n_images: int, full0=None,
                    pool3=None):
    """Scene::viewBlockTest (Scene.cpp:610-644): over ALL images, count views
    where the patch floats in front of a confirmed surface."""
    B = centers.shape[0]
    ci = jnp.broadcast_to(jnp.arange(n_images, dtype=jnp.int32)[None, :],
                          (B, n_images))
    cc = jnp.broadcast_to(centers[:, None, :], (B, n_images, 3))
    nn = jnp.broadcast_to(normals[:, None, :], (B, n_images, 3))
    ss = jnp.broadcast_to(scales[:, None], (B, n_images))

    lvl_f = jnp.round(cam_ops.get_level(cams, ci, cc, ss))
    lvl_ok = (lvl_f >= 0) & (lvl_f <= cams.n_levels - 1)
    lvl = jnp.clip(lvl_f, 0, cams.n_levels - 1).astype(jnp.int32)
    uvw = cam_ops.project(cams, ci, cc, lvl)
    w = imgs.width[ci, lvl].astype(uvw.dtype)
    h = imgs.height[ci, lvl].astype(uvw.dtype)
    vis = ((uvw[..., 0] >= 0) & (uvw[..., 0] <= w)
           & (uvw[..., 1] >= 0) & (uvw[..., 1] <= h))

    if pool3 is not None:
        blocked = _depth_test_view_pooled(cams, imgs, opt, cc, nn, ss, ci,
                                          margin, view_block=True,
                                          pool3=pool3)
    else:
        blocked = _depth_test_view(pack, cams, imgs, opt, cc, nn, ss, ci,
                                   margin, view_block=True, full0=full0)
    return jnp.sum(blocked & lvl_ok & vis, axis=-1)


@functools.partial(jax.jit, static_argnames=("opt", "n_images"))
def geom_gates(pack: DepthPack, cams, imgs, opt: Options, centers, normals,
               scales, views, margin, n_images: int, full0=None):
    """Fused depthTests + viewBlockTest + pixelFreeTests in ONE device call
    (the wavefront engine runs these per candidate batch; separate dispatches
    would cost three host-device round trips)."""
    pool3 = None
    if full0 is not None and opt.DEPTH_SUBSAMPLE == 2:
        pool3 = pool_full_depth(full0)
    dt = depth_tests.__wrapped__(pack, cams, imgs, opt, centers, normals,
                                 scales, views, margin, full0=full0,
                                 pool3=pool3)
    vb = view_block_test.__wrapped__(pack, cams, imgs, opt, centers, normals,
                                     scales, margin, n_images, full0=full0,
                                     pool3=pool3)
    pf = pixel_free_tests.__wrapped__(pack, cams, imgs, opt, centers, scales,
                                      views)
    return dt, vb, pf


@functools.partial(jax.jit, static_argnames=("opt",))
def pixel_free_tests(pack: DepthPack, cams, imgs, opt: Options, centers,
                     scales, views):
    """Scene::pixelFreeTests (Scene.cpp:584-608): #views whose buffer cell at
    the patch's own level is still MAX_DEPTH."""
    ci = jnp.maximum(views, 0)
    B, K = views.shape
    cc = jnp.broadcast_to(centers[:, None, :], (B, K, 3))
    ss = jnp.broadcast_to(scales[:, None], (B, K))

    lvl_f = jnp.round(cam_ops.get_level(cams, ci, cc, ss))
    lvl_ok = (lvl_f >= 0) & (lvl_f < cams.n_levels)
    lvl = jnp.clip(lvl_f, 0, cams.n_levels - 1).astype(jnp.int32)
    uvw = cam_ops.project(cams, ci, cc, lvl)
    ix = jnp.trunc(uvw[..., 0] + 0.5).astype(jnp.int32)
    iy = jnp.trunc(uvw[..., 1] + 0.5).astype(jnp.int32)
    w = imgs.width[ci, lvl]
    h = imgs.height[ci, lvl]
    inb = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
    d = get_depth_at_level(pack, ci, ix, iy, lvl, opt.DEPTH_SUBSAMPLE)
    free = (d == MAX_DEPTH) & inb & lvl_ok & (views >= 0)
    return jnp.sum(free, axis=-1)
