"""Batched patch optimizer: the TPU replacement for PatchOptimizer + nlopt.

Behavioral equivalent of the reference per-patch pipeline
(src/hpmvs/PatchOptimizer.cpp:48-103 runOptimization/optimize):

    addImages -> filterImagesNCC(a1) -> sortImages -> assureImageAngles ->
    optimizePatch(BOBYQA) -> addImages -> filterImagesNCC(a2) ->
    filterImagesByAngle -> assureImageAngles -> setRefImage ->
    filterImagesNCC(a2) -> getColor

TPU-first inversion (SURVEY.md section 7 / BASELINE.json north star): instead
of one nlopt BOBYQA solve per patch, thousands of patches are refined
simultaneously by a finite-difference Gauss-Newton (Levenberg) loop over the
same 3-parameter space -- depth along the reference ray + two normal angles
at angleScale = pi/48 (PatchOptimizer.cpp:384-446) -- derivative-free like
the reference's BOBYQA, with every pass a plain batched NCC evaluation.
View lists are fixed-size slot arrays (MAX_VIEWS) with -1 padding; every
filter stage is a masked compaction, every selection loop a fixed-trip
lax.fori_loop, so the whole pipeline jits into one XLA program.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hpmvs_tpu.config import Options
from hpmvs_tpu.geom import camera as cam_ops
from hpmvs_tpu.ops import sampling
from hpmvs_tpu.ops import windows as win_ops

INVALID = -1
GN_EPS = 1e-5
BIG = 1e9


class SceneCtx(NamedTuple):
    """Device-side immutable scene context shared by all patch batches."""
    cams: object          # camera.Cameras
    imgs: object          # pyramid.ImagePack (jnp arrays)
    covis: jnp.ndarray    # (ncam, C) int32, -1 padded covisible image ids
    ncovis: jnp.ndarray   # (ncam,) int32


def _nviews(views):
    return jnp.sum(views >= 0, axis=-1)


def _compact(values, valid):
    """Stable compaction: keep `valid` slots in order, pad with -1."""
    k = values.shape[-1]
    order = jnp.argsort(jnp.logical_not(valid), axis=-1, stable=True)
    vals = jnp.take_along_axis(values, order, axis=-1)
    count = jnp.sum(valid, axis=-1)
    idx = jnp.arange(k)
    return jnp.where(idx < count[..., None], vals, INVALID)


def _compact_order(valid):
    """Slot permutation realizing the stable compaction (single patch)."""
    return jnp.argsort(jnp.logical_not(valid), stable=True)


def _permute_ws(ws, order):
    """Reorder the per-slot window cache alongside a view-slot permutation."""
    if ws is None:
        return None
    return win_ops.WindowState(win=ws.win[order], ox=ws.ox[order],
                               oy=ws.oy[order], level=ws.level[order])


# ---------------------------------------------------------------------------
# Single-patch stages (vmapped over the batch by optimize_batch).
# ---------------------------------------------------------------------------

def _sample_views(ctx, opt: Options, views, center, scale, xax, yax, zax,
                  ws=None):
    """Sample the 7x7 texture in every view slot. Returns (tex (K,49,3),
    valid (K,)). With a window cache `ws`, samples densely from the cached
    windows instead of gathering from HBM."""
    ci = jnp.maximum(views, 0)
    args = (ci, jnp.broadcast_to(center, ci.shape + (3,)),
            jnp.broadcast_to(scale, ci.shape),
            jnp.broadcast_to(xax, ci.shape + (3,)),
            jnp.broadcast_to(yax, ci.shape + (3,)),
            jnp.broadcast_to(zax, ci.shape + (3,)),
            jnp.cos(opt.MAX_ANGLE), opt.MAXLEVEL - 1)
    if ws is None:
        tex, valid = sampling.sample_texture(ctx.cams, ctx.imgs, *args)
    else:
        tex, valid = win_ops.sample_from_windows(ctx.cams, ctx.imgs, ws, *args)
    return tex, valid & (views >= 0)


def _set_inccs(ctx, opt: Options, views, center, normal, scale, ref_slot,
               robust: bool, ws=None):
    """PatchOptimizer::setINCCs (PatchOptimizer.cpp:448-474): per-slot
    1 - NCC against the texture of slot `ref_slot` (0 for that slot,
    2 for failed samples)."""
    ref_ci = jnp.maximum(views[ref_slot], 0)
    xax, yax, zax = sampling.patch_axes(ctx.cams, ref_ci, normal, scale)
    # the reference passes pNormal_ as the sampling z-axis here
    nz = sampling.normalize3(normal)
    tex, valid = _sample_views(ctx, opt, views, center, scale, xax, yax, nz,
                               ws)
    ref_tex = tex[ref_slot]
    ref_ok = valid[ref_slot]
    vals = 1.0 - sampling.ncc(ref_tex[None], tex)
    if robust:
        vals = sampling.robust_incc(vals)
    k = views.shape[0]
    vals = jnp.where(valid & ref_ok, vals, 2.0)
    vals = jnp.where(jnp.arange(k) == ref_slot, jnp.where(ref_ok, 0.0, 2.0),
                     vals)
    return vals


def _add_images(ctx, opt: Options, center, normal, scale, views):
    """PatchOptimizer::addImages (PatchOptimizer.cpp:225-258): grow the view
    list with covisible images of the reference passing angle / level /
    in-bounds gates."""
    ref_valid = views[0] >= 0  # addImages fails on an empty list (:227)
    ref = jnp.maximum(views[0], 0)
    cand = ctx.covis[ref]                                   # (C,)
    cand_ci = jnp.maximum(cand, 0)
    cand_valid = (cand >= 0) & ref_valid

    present = jnp.any(cand[:, None] == views[None, :], axis=-1)

    ray = sampling.normalize3(ctx.cams.center[cand_ci] - center[None])
    angle_ok = jnp.sum(ray * sampling.normalize3(normal)[None], axis=-1) \
        >= jnp.cos(opt.MAX_ANGLE)

    lvl = jnp.round(cam_ops.get_level(ctx.cams, cand_ci,
                                      jnp.broadcast_to(center, cand_ci.shape + (3,)),
                                      scale)).astype(jnp.int32)
    lvl_ok = (lvl >= opt.MINLEVEL) & (lvl < opt.MAXLEVEL - 2)
    lvl_c = jnp.clip(lvl, 0, opt.MAXLEVEL)

    uvw = cam_ops.project(ctx.cams, cand_ci,
                          jnp.broadcast_to(center, cand_ci.shape + (3,)), lvl_c)
    w = ctx.imgs.width[cand_ci, lvl_c].astype(uvw.dtype)
    h = ctx.imgs.height[cand_ci, lvl_c].astype(uvw.dtype)
    inb = ((uvw[:, 0] >= 0.0) & (uvw[:, 0] < w - 1)
           & (uvw[:, 1] >= 0.0) & (uvw[:, 1] < h - 1))

    accept = cand_valid & ~present & angle_ok & lvl_ok & inb
    ext_vals = jnp.concatenate([views, jnp.where(accept, cand, INVALID)])
    ext_valid = jnp.concatenate([views >= 0, accept])
    k = views.shape[0]
    new_views = _compact(ext_vals, ext_valid)[:k]
    ok = ref_valid & (_nviews(new_views) >= opt.MIN_IMAGES_PER_PATCH)
    return new_views, ok


def _filter_ncc(ctx, opt: Options, center, normal, scale, views, alpha,
                ws=None):
    """PatchOptimizer::filterImagesNCC (PatchOptimizer.cpp:138-152)."""
    inccs = _set_inccs(ctx, opt, views, center, normal, scale, 0,
                       robust=False, ws=ws)
    keep = (views >= 0) & (inccs < 1.0 - alpha)
    keep = keep.at[0].set(views[0] >= 0)  # always keep the reference
    order = _compact_order(keep)
    count = jnp.sum(keep)
    new_views = jnp.where(jnp.arange(views.shape[0]) < count, views[order],
                          INVALID)
    ok = _nviews(new_views) >= opt.MIN_IMAGES_PER_PATCH
    return new_views, ok, _permute_ws(ws, order)


def _sort_images(ctx, opt: Options, center, normal, scale, views, ws=None):
    """PatchOptimizer::sortImages (PatchOptimizer.cpp:183-223): greedy
    angle-weighted-scale ordering with 5-degree ray suppression."""
    k = views.shape[0]
    valid = views >= 0
    ci = jnp.maximum(views, 0)

    # getAngleWeightedScales (PatchOptimizer.cpp:260-284)
    ref_level = jnp.clip(
        jnp.round(cam_ops.get_level(ctx.cams, ci[0], center, scale)),
        0, opt.MAXLEVEL - 1).astype(jnp.int32)
    rays = sampling.normalize3(ctx.cams.center[ci] - center[None])
    cosa = jnp.sum(rays * sampling.normalize3(normal)[None], axis=-1)
    cand = valid & (cosa > 0)
    wscale = cam_ops.get_scale(ctx.cams, ci,
                               jnp.broadcast_to(center, ci.shape + (3,)),
                               ref_level) / jnp.where(cosa > 0, cosa, 1.0)

    # compact candidates, then pin the first kept entry (the reference image
    # slot after compaction) with weight 0 -- wScales[0] = 0 in the reference
    order = jnp.argsort(jnp.logical_not(cand), stable=True)
    c_views = jnp.where(jnp.arange(k) < jnp.sum(cand), views[order], INVALID)
    c_w = wscale[order]
    c_rays = rays[order]
    c_valid = c_views >= 0
    c_w = c_w.at[0].set(0.0)
    c_w = jnp.where(c_valid, c_w, BIG)

    threshold = 1.0 - jnp.cos(opt.SORT_SUPPRESS_DEG * jnp.pi / 180.0)

    def body(i, state):
        w, out, picks = state
        pick = jnp.argmin(w)
        out = out.at[i].set(jnp.where(w[pick] < BIG, c_views[pick], INVALID))
        picks = picks.at[i].set(pick)
        # suppression reweighting of remaining entries
        ftmp = jnp.clip(1.0 - jnp.sum(c_rays[pick][None] * c_rays, axis=-1),
                        threshold / 2.0, threshold)
        w = w * (threshold / ftmp)
        w = w.at[pick].set(BIG)
        return w, out, picks

    out0 = jnp.full((k,), INVALID, dtype=views.dtype)
    picks0 = jnp.zeros((k,), jnp.int32)
    _, sorted_views, picks = jax.lax.fori_loop(0, k, body,
                                               (c_w, out0, picks0))
    ok = (_nviews(sorted_views) >= opt.MIN_IMAGES_PER_PATCH) \
        & (jnp.sum(cand) >= 2)
    # composed permutation back to the original slots (for the window cache)
    perm = order[picks]
    return sorted_views, ok, _permute_ws(ws, perm)


def _assure_angles(ctx, opt: Options, center, views):
    """PatchOptimizer::assureImageAngles (PatchOptimizer.cpp:105-123): some
    view pair must subtend an angle in (MIN_ANGLE, MAX_ANGLE)."""
    ci = jnp.maximum(views, 0)
    rays = sampling.normalize3(ctx.cams.center[ci] - center[None])
    dots = jnp.clip(rays @ rays.T, -1.0, 1.0)
    ang = jnp.arccos(dots)
    valid = views >= 0
    pair = valid[:, None] & valid[None, :] \
        & ~jnp.eye(views.shape[0], dtype=bool)
    good = pair & (ang > opt.MIN_ANGLE) & (ang < opt.MAX_ANGLE)
    return jnp.any(good)


def _filter_by_angle(ctx, opt: Options, center, normal, views, ws=None):
    """PatchOptimizer::filterImagesByAngle (PatchOptimizer.cpp:125-136)."""
    ci = jnp.maximum(views, 0)
    rays = sampling.normalize3(ctx.cams.center[ci] - center[None])
    keep = (views >= 0) & (jnp.sum(rays * normal[None], axis=-1)
                           > jnp.cos(opt.MAX_ANGLE))
    order = _compact_order(keep)
    count = jnp.sum(keep)
    new_views = jnp.where(jnp.arange(views.shape[0]) < count, views[order],
                          INVALID)
    ok = _nviews(new_views) >= opt.MIN_IMAGES_PER_PATCH
    return new_views, ok, _permute_ws(ws, order)


def _set_ref_image(ctx, opt: Options, center, normal, scale, views, ws=None):
    """PatchOptimizer::setRefImage (PatchOptimizer.cpp:154-181): pick the
    view minimizing the summed robust incc against all others; swap to
    slot 0."""
    k = views.shape[0]
    valid = views >= 0

    if opt.FAST_SETREF:
        # one sampling pass with the slot-0 tangent frame; the K x K robust
        # incc matrix comes from the K textures' pairwise dots
        ref_ci = jnp.maximum(views[0], 0)
        xax, yax, _ = sampling.patch_axes(ctx.cams, ref_ci, normal, scale)
        nz = sampling.normalize3(normal)
        tex, vv = _sample_views(ctx, opt, views, center, scale, xax, yax, nz,
                                ws)
        nccs = jnp.einsum("atc,btc->ab", tex, tex) / sampling.N_TEXELS
        incc = sampling.robust_incc(1.0 - nccs)
        pair_ok = vv[:, None] & vv[None, :]
        incc = jnp.where(pair_ok, incc, 2.0)
        diag = jnp.diag(jnp.where(vv, 0.0, 2.0))
        incc = jnp.where(jnp.eye(k, dtype=bool), diag, incc)
        sums = jnp.sum(jnp.where(valid[None, :], incc, 0.0), axis=1)
    else:
        def sum_for(slot):
            inccs = _set_inccs(ctx, opt, views, center, normal, scale, slot,
                               robust=True, ws=ws)
            return jnp.sum(jnp.where(valid, inccs, 0.0))

        sums = jax.vmap(sum_for)(jnp.arange(k))
    sums = jnp.where(valid, sums, BIG)
    best = jnp.argmin(sums)
    # swap slot `best` with slot 0
    noswap = _nviews(views) <= 1
    best = jnp.where(noswap, 0, best)
    order = jnp.arange(k).at[0].set(best).at[best].set(0)
    return views[order], _permute_ws(ws, order)


# ---------------------------------------------------------------------------
# Batched stages: the same view pipeline written over a leading batch axis
# (no vmap), with the texture sampling of every NCC stage dispatched to the
# pallas scoring kernel on TPU (ops/pallas_score.py). Same semantics and
# reference citations as the single-patch versions above.
# ---------------------------------------------------------------------------

def _permute_ws_b(ws, order):
    """Batched window-cache slot permutation (pallas one-hot combine on TPU;
    the XLA gather of 3 KB window slices is ~30x slower). order: (B, K)."""
    from hpmvs_tpu.ops import pallas_score
    return pallas_score.permute_wst(ws, order)


def _fetch_ws_b(ctx, opt: Options, views, center, scale, prev=None,
                nv_old=None):
    """Batched kernel-layout window fetch: views (B, K), center (B, 3),
    scale (B,). One transpose into the slab layout here; no window moves
    downstream except slot permutes.

    prev + nv_old: selective re-fetch -- the first nv_old slots keep their
    windows from `prev` (the pre-stage cache, in matching slot order: the
    post add-images compaction keeps surviving views first); only the newly
    added slots DMA from HBM."""
    ci = jnp.maximum(views, 0)
    if prev is not None:
        k = views.shape[1]
        mask = (jnp.arange(k)[None] >= nv_old[:, None]) & (views >= 0)
    else:
        mask = views >= 0   # empty slots skip their DMA entirely
    return win_ops.fetch_windows_t(
        ctx.cams, ctx.imgs, ci,
        jnp.broadcast_to(center[:, None], ci.shape + (3,)),
        jnp.broadcast_to(scale[:, None], ci.shape),
        opt.MAXLEVEL - 1, opt.WINDOW_SIZE, fetch_mask=mask, prev=prev)


def _add_images_b(ctx, opt: Options, center, normal, scale, views):
    """Batched addImages (PatchOptimizer.cpp:225-258). normal must be unit."""
    ref_valid = views[:, 0] >= 0
    ref = jnp.maximum(views[:, 0], 0)
    cand = ctx.covis[ref]                                   # (B, C)
    cand_ci = jnp.maximum(cand, 0)
    cand_valid = (cand >= 0) & ref_valid[:, None]

    present = jnp.any(cand[:, :, None] == views[:, None, :], axis=-1)

    ray = sampling.normalize3(ctx.cams.center[cand_ci] - center[:, None])
    angle_ok = jnp.sum(ray * sampling.normalize3(normal)[:, None], axis=-1) \
        >= jnp.cos(opt.MAX_ANGLE)

    cb = jnp.broadcast_to(center[:, None], cand_ci.shape + (3,))
    lvl = jnp.round(cam_ops.get_level(ctx.cams, cand_ci, cb,
                                      scale[:, None])).astype(jnp.int32)
    lvl_ok = (lvl >= opt.MINLEVEL) & (lvl < opt.MAXLEVEL - 2)
    lvl_c = jnp.clip(lvl, 0, opt.MAXLEVEL)

    uvw = cam_ops.project(ctx.cams, cand_ci, cb, lvl_c)
    w = ctx.imgs.width[cand_ci, lvl_c].astype(uvw.dtype)
    h = ctx.imgs.height[cand_ci, lvl_c].astype(uvw.dtype)
    inb = ((uvw[..., 0] >= 0.0) & (uvw[..., 0] < w - 1)
           & (uvw[..., 1] >= 0.0) & (uvw[..., 1] < h - 1))

    accept = cand_valid & ~present & angle_ok & lvl_ok & inb
    ext_vals = jnp.concatenate([views, jnp.where(accept, cand, INVALID)], -1)
    ext_valid = jnp.concatenate([views >= 0, accept], -1)
    k = views.shape[1]
    new_views = _compact(ext_vals, ext_valid)[:, :k]
    ok = ref_valid & (_nviews(new_views) >= opt.MIN_IMAGES_PER_PATCH)
    return new_views, ok


def _sample_views_b(ctx, opt: Options, center, normal, scale, views, ws,
                    with_color=False, layout="bkpc"):
    """Batched _sample_views through the scoring kernel (TPU) / XLA fallback.
    z axis = normalize(normal), tangent frame from slot 0 -- the _set_inccs
    convention (PatchOptimizer.cpp:448-474). Returns (tex (B,K,49,3), or
    (K,3,49,B) with layout="kcpb", valid (B,K) incl. views >= 0[, center
    RGB (B,K,3) with with_color])."""
    from hpmvs_tpu.ops import pallas_score
    out = pallas_score.sample_views_batch(ctx, opt, center, normal,
                                          scale, views, ws,
                                          with_color=with_color,
                                          layout=layout)
    if with_color:
        tex, valid, col = out
        return tex, valid & (views >= 0), col
    tex, valid = out
    return tex, valid & (views >= 0)


def _filter_ncc_b(ctx, opt: Options, center, normal, scale, views, alpha,
                  ws):
    """Batched filterImagesNCC (PatchOptimizer.cpp:138-152). NCC contracted
    in the scoring kernel's lane-major (K,3,P2,B) layout -- patches stay on
    lanes, no tex transpose."""
    k = views.shape[1]
    tex, valid = _sample_views_b(ctx, opt, center, normal, scale, views, ws,
                                 layout="kcpb")
    ref_ok = valid[:, 0]
    nccs = (jnp.einsum("kcpb,cpb->bk", tex, tex[0])
            / sampling.N_TEXELS)
    inccs = jnp.where(valid & ref_ok[:, None], 1.0 - nccs, 2.0)
    inccs = inccs.at[:, 0].set(jnp.where(ref_ok, 0.0, 2.0))
    keep = (views >= 0) & (inccs < 1.0 - alpha)
    keep = keep.at[:, 0].set(views[:, 0] >= 0)  # always keep the reference
    order = jnp.argsort(jnp.logical_not(keep), axis=-1, stable=True)
    count = jnp.sum(keep, axis=-1)
    new_views = jnp.where(jnp.arange(k) < count[:, None],
                          jnp.take_along_axis(views, order, -1), INVALID)
    ok = _nviews(new_views) >= opt.MIN_IMAGES_PER_PATCH
    # callers compose `order` into one deferred window-cache permute
    return new_views, ok, order


def _sort_images_b(ctx, opt: Options, center, normal, scale, views):
    """Batched sortImages greedy ordering (PatchOptimizer.cpp:183-223)."""
    B, k = views.shape
    valid = views >= 0
    ci = jnp.maximum(views, 0)

    ref_level = jnp.clip(
        jnp.round(cam_ops.get_level(ctx.cams, ci[:, 0], center, scale)),
        0, opt.MAXLEVEL - 1).astype(jnp.int32)
    rays = sampling.normalize3(ctx.cams.center[ci] - center[:, None])
    cosa = jnp.sum(rays * sampling.normalize3(normal)[:, None], axis=-1)
    cand = valid & (cosa > 0)
    cb = jnp.broadcast_to(center[:, None], ci.shape + (3,))
    wscale = cam_ops.get_scale(ctx.cams, ci, cb,
                               jnp.broadcast_to(ref_level[:, None], ci.shape)
                               ) / jnp.where(cosa > 0, cosa, 1.0)

    order = jnp.argsort(jnp.logical_not(cand), axis=-1, stable=True)
    ncand = jnp.sum(cand, axis=-1)
    c_views = jnp.where(jnp.arange(k) < ncand[:, None],
                        jnp.take_along_axis(views, order, -1), INVALID)
    c_w = jnp.take_along_axis(wscale, order, -1)
    c_rays = jnp.take_along_axis(rays, order[:, :, None], 1)
    c_valid = c_views >= 0
    c_w = c_w.at[:, 0].set(0.0)
    c_w = jnp.where(c_valid, c_w, BIG)

    threshold = 1.0 - jnp.cos(opt.SORT_SUPPRESS_DEG * jnp.pi / 180.0)
    slot = jnp.arange(k)

    def body(i, state):
        w, out, picks = state
        pick = jnp.argmin(w, axis=-1)                        # (B,)
        pv = jnp.take_along_axis(c_views, pick[:, None], -1)[:, 0]
        wp = jnp.take_along_axis(w, pick[:, None], -1)[:, 0]
        out = out.at[:, i].set(jnp.where(wp < BIG, pv, INVALID))
        picks = picks.at[:, i].set(pick)
        pr = jnp.take_along_axis(c_rays, pick[:, None, None], 1)
        ftmp = jnp.clip(1.0 - jnp.sum(pr * c_rays, axis=-1),
                        threshold / 2.0, threshold)
        w = w * (threshold / ftmp)
        w = jnp.where(slot[None, :] == pick[:, None], BIG, w)
        return w, out, picks

    out0 = jnp.full((B, k), INVALID, dtype=views.dtype)
    picks0 = jnp.zeros((B, k), jnp.int32)
    _, sorted_views, picks = jax.lax.fori_loop(0, k, body,
                                               (c_w, out0, picks0))
    ok = (_nviews(sorted_views) >= opt.MIN_IMAGES_PER_PATCH) & (ncand >= 2)
    perm = jnp.take_along_axis(order, picks, -1)
    return sorted_views, ok, perm


def _assure_angles_b(ctx, opt: Options, center, views):
    """Batched assureImageAngles (PatchOptimizer.cpp:105-123)."""
    k = views.shape[1]
    ci = jnp.maximum(views, 0)
    rays = sampling.normalize3(ctx.cams.center[ci] - center[:, None])
    dots = jnp.clip(jnp.einsum("bkd,bjd->bkj", rays, rays), -1.0, 1.0)
    ang = jnp.arccos(dots)
    valid = views >= 0
    pair = valid[:, :, None] & valid[:, None, :] \
        & ~jnp.eye(k, dtype=bool)[None]
    good = pair & (ang > opt.MIN_ANGLE) & (ang < opt.MAX_ANGLE)
    return jnp.any(good, axis=(-1, -2))


def _run_pre_b(ctx, opt: Options, center, normal, scale, views):
    """Batched first half of runOptimization (growth + filters + sort).

    The window cache is permuted ONCE with the composition of the filter
    compaction and the sort permutation (window slabs are ~3 KB per slot;
    moving them per stage costs more than every other stage op combined)."""
    normal = sampling.normalize3(normal)
    views, ok = _add_images_b(ctx, opt, center, normal, scale, views)
    ws = _fetch_ws_b(ctx, opt, views, center, scale)
    views, ok1, o1 = _filter_ncc_b(ctx, opt, center, normal, scale, views,
                                   opt.NCC_ALPHA_1, ws)
    ok &= ok1
    views, ok2, o2 = _sort_images_b(ctx, opt, center, normal, scale, views)
    ok &= ok2
    ok &= _assure_angles_b(ctx, opt, center, views)
    ws = _permute_ws_b(ws, jnp.take_along_axis(o1, o2, axis=-1))
    return center, normal, views, ok, ws


def _run_post_b(ctx, opt: Options, center, normal, scale, views, ok,
                ws_pre=None):
    """Batched second half of runOptimization, fused: one window fetch and
    ONE texture-sampling pass; filterImagesNCC(a2), filterImagesByAngle,
    assureImageAngles, setRefImage and the final filterImagesNCC(a2)
    (PatchOptimizer.cpp:62-73) all read the same pairwise NCC matrix and
    reduce to mask/index ops -- no window permutes, no resampling.

    With ws_pre (and REUSE_POST_WINDOWS), surviving view slots keep their
    pre-stage windows and only newly added views DMA from HBM; reused
    windows were cut at the pre-refinement center, so views whose refined
    grid drifted past the coverage margin drop out via the standard
    level/coverage gates (slightly conservative vs a full re-fetch).

    Documented divergence (see README): every NCC here is evaluated in the
    incoming slot-0 tangent frame; the reference resamples after each
    reorder, so its post-setRefImage NCCs use the *new* reference frame.
    The frames differ by an in-plane rotation; near-threshold keep/drop
    decisions can flip for a small fraction of views (statistical parity,
    verified in tests/test_pallas_score.py)."""
    B, k = views.shape
    nv_old = _nviews(views)
    views, ok4 = _add_images_b(ctx, opt, center, normal, scale, views)
    ok &= ok4
    if ws_pre is not None and opt.REUSE_POST_WINDOWS:
        ws = _fetch_ws_b(ctx, opt, views, center, scale, prev=ws_pre,
                         nv_old=nv_old)
    else:
        ws = _fetch_ws_b(ctx, opt, views, center, scale)
    tex, vv, cols = _sample_views_b(ctx, opt, center, normal, scale, views,
                                    ws, with_color=True, layout="kcpb")
    nccs = jnp.einsum("acpb,kcpb->bak", tex, tex) / sampling.N_TEXELS
    pair_ok = vv[:, :, None] & vv[:, None, :]
    eye = jnp.eye(k, dtype=bool)[None]
    # plain pairwise incc (2.0 where either sample failed; 0 on the diagonal
    # of valid slots) -- the _set_inccs convention per reference row
    incc = jnp.where(pair_ok, 1.0 - nccs, 2.0)
    incc = jnp.where(eye, jnp.where(vv, 0.0, 2.0)[:, :, None], incc)

    # filterImagesNCC(NCC_ALPHA_2) against the current reference (slot 0)
    keep = (views >= 0) & (incc[:, 0] < 1.0 - opt.NCC_ALPHA_2)
    keep = keep.at[:, 0].set(views[:, 0] >= 0)  # ref always kept
    ok &= jnp.sum(keep, axis=-1) >= opt.MIN_IMAGES_PER_PATCH

    # filterImagesByAngle (PatchOptimizer.cpp:125-136)
    ci = jnp.maximum(views, 0)
    rays = sampling.normalize3(ctx.cams.center[ci] - center[:, None])
    keep &= jnp.sum(rays * normal[:, None], axis=-1) > jnp.cos(opt.MAX_ANGLE)
    ok &= jnp.sum(keep, axis=-1) >= opt.MIN_IMAGES_PER_PATCH

    # assureImageAngles over the kept views
    dots = jnp.clip(jnp.einsum("bkd,bjd->bkj", rays, rays), -1.0, 1.0)
    ang = jnp.arccos(dots)
    pair = keep[:, :, None] & keep[:, None, :] & ~eye
    ok &= jnp.any(pair & (ang > opt.MIN_ANGLE) & (ang < opt.MAX_ANGLE),
                  axis=(-1, -2))

    # setRefImage: argmin over kept slots of the summed robust incc
    # (robustify only real pair scores; masked 2.0 sentinels stay 2.0)
    rincc = jnp.where(pair_ok & ~eye, sampling.robust_incc(incc), incc)
    sums = jnp.sum(jnp.where(keep[:, None, :], rincc, 0.0), axis=-1)
    sums = jnp.where(keep, sums, BIG)
    best = jnp.argmin(sums, axis=-1)                        # (B,)
    best = jnp.where(jnp.sum(keep, axis=-1) <= 1, 0, best)
    bi = best[:, None]

    # final filterImagesNCC(NCC_ALPHA_2) against the new reference = row
    # `best` of the incc matrix (divergence note above)
    incc_b = jnp.take_along_axis(incc, best[:, None, None], 1)[:, 0]
    keep_b = jnp.take_along_axis(keep, bi, -1)
    slot = jnp.arange(k)[None]
    keep2 = keep & (incc_b < 1.0 - opt.NCC_ALPHA_2)
    keep2 = jnp.where(slot == bi, keep_b, keep2)            # new ref kept
    ok &= jnp.sum(keep2, axis=-1) >= opt.MIN_IMAGES_PER_PATCH

    # realize the swap(0, best) + stable compaction as one view-id shuffle
    order = jnp.where(slot == 0, bi, jnp.where(slot == bi, 0, slot))
    views = _compact(jnp.take_along_axis(views, order, -1),
                     jnp.take_along_axis(keep2, order, -1))
    # Scene::getColor (Scene.cpp:300-327): median-by-norm over the kept views
    # (order-independent, so evaluated in incoming slot space) using the
    # center RGB the sampling pass already produced -- no HBM gather.
    # White-pixel (sky) case: |median| > 250 -> darkest view instead.
    norms = jnp.where(keep2, jnp.linalg.norm(cols, axis=-1), BIG)
    corder = jnp.argsort(norms, axis=-1)
    nkept = jnp.maximum(jnp.sum(keep2, axis=-1), 1)
    midx = jnp.take_along_axis(corder, (nkept // 2)[:, None], -1)
    med = jnp.take_along_axis(cols, midx[:, :, None], 1)[:, 0]
    first = jnp.take_along_axis(cols, corder[:, :1, None], 1)[:, 0]
    color = jnp.where(
        jnp.linalg.norm(med, axis=-1, keepdims=True) > 250.0, first, med)
    return center, normal, scale, views, ok, color


# ---------------------------------------------------------------------------
# The NCC objective + damped-Newton refinement (replaces nlopt BOBYQA).
# ---------------------------------------------------------------------------

def _precompute_res(ctx, opt: Options, center, scale, views, ws):
    """Hoist the per-view projection terms out of the GN loop.

    With center(x) = ref_center + x0*ref_ray, the homogeneous projection is
    affine in x0: P.[center;1] = P.[ref_center;1] + x0 * P3.ref_ray, so each
    pass needs no P-table gathers, level selection or 3x4 expansion."""
    ref_ci = jnp.maximum(views[0], 0)
    ci = jnp.maximum(views, 0)
    ref_center = center
    ref_ray = sampling.normalize3(center - ctx.cams.center[ref_ci])
    ax_x = sampling.normalize3(ctx.cams.xaxis[ref_ci])
    ax_y = sampling.normalize3(ctx.cams.yaxis[ref_ci])
    ax_z = sampling.normalize3(ctx.cams.zaxis[ref_ci])

    P = ctx.cams.P[ci, ws.level]                     # (K, 3, 4)
    Pl3 = P[..., :3]                                 # (K, 3, 3)
    ch = jnp.concatenate([ref_center, jnp.ones((1,), center.dtype)])
    Pc_h = jnp.einsum("kij,j->ki", P, ch)            # (K, 3)
    Pr = jnp.einsum("kij,j->ki", Pl3, ref_ray)       # (K, 3)
    wlim = ctx.imgs.width[ci, ws.level].astype(center.dtype)
    hlim = ctx.imgs.height[ci, ws.level].astype(center.dtype)
    cam_c = ctx.cams.center[ci]                      # (K, 3)
    return (ref_center, ref_ray, ax_x, ax_y, ax_z, cam_c, Pl3, Pc_h, Pr,
            wlim, hlim)


def _residuals_fast(opt: Options, x, pre, scale, views, ws):
    """GN-loop residual pass on the precomputed terms. Same math as
    _residuals (objective_fn via setCenterNorm, PatchOptimizer.cpp:286-311,
    401-414) with the sampling level pinned to the window's level."""
    (ref_center, ref_ray, ax_x, ax_y, ax_z, cam_c, Pl3, Pc_h, Pr,
     wlim, hlim) = pre
    W = ws.win.shape[-2]
    center = ref_center + x[0] * ref_ray
    a1 = x[1] * opt.ANGLE_SCALE
    a2 = x[2] * opt.ANGLE_SCALE
    fx = jnp.sin(a1) * jnp.cos(a2)
    fy = jnp.sin(a2)
    fz = -jnp.cos(a1) * jnp.cos(a2)
    normal = ax_x * fx + ax_y * fy + ax_z * fz

    # patch axes (calculatePatchAxis, PatchOptimizer.cpp:532-548)
    z = sampling.normalize3(normal)
    y = sampling.normalize3(jnp.cross(z, ax_x))
    xax = sampling.normalize3(jnp.cross(y, z)) * scale
    yax = y * scale * jnp.dot(y, ax_y)

    # projections, affine in x0
    ph_c = Pc_h + x[0] * Pr                          # (K, 3)
    ph_x = ph_c + Pl3 @ xax
    ph_y = ph_c + Pl3 @ yax
    front = ph_c[:, 2] > 0.0
    wc = jnp.where(front, ph_c[:, 2], 1.0)
    c2 = ph_c[:, :2] / wc[:, None]
    dx = ph_x[:, :2] / jnp.where(ph_x[:, 2] != 0, ph_x[:, 2], 1.0)[:, None] - c2
    dy = ph_y[:, :2] / jnp.where(ph_y[:, 2] != 0, ph_y[:, 2], 1.0)[:, None] - c2

    ray = sampling.normalize3(cam_c - center[None])
    angle_ok = ray @ z >= jnp.cos(opt.MAX_ANGLE)

    half = sampling.PATCH_SIZE / 2.0
    tl = c2 - half * dx - half * dy
    tr = c2 + half * dx - half * dy
    bl = c2 - half * dx + half * dy
    br = c2 + half * dx + half * dy
    mn = jnp.minimum(jnp.minimum(tl, tr), jnp.minimum(bl, br))
    mx = jnp.maximum(jnp.maximum(tl, tr), jnp.maximum(bl, br))
    m = 3.0
    bounds_ok = ((mn[:, 0] >= m) & (mn[:, 1] >= m)
                 & (mx[:, 0] < wlim - m) & (mx[:, 1] < hlim - m))
    org = jnp.stack([ws.ox, ws.oy], axis=-1).astype(c2.dtype)
    cover_ok = (jnp.all(mn - org >= 0.0, axis=-1)
                & jnp.all(mx - org <= W - 1.0, axis=-1))
    valid = front & angle_ok & bounds_ok & cover_ok & (views >= 0)

    P2 = sampling.PATCH_SIZE
    ii = jnp.arange(P2, dtype=c2.dtype)
    gx = (tl[:, None, None, 0] + ii[None, :] * dx[:, None, None, 0]
          + ii[:, None] * dy[:, None, None, 0])
    gy = (tl[:, None, None, 1] + ii[None, :] * dx[:, None, None, 1]
          + ii[:, None] * dy[:, None, None, 1])
    gx = gx.reshape(gx.shape[0], P2 * P2) - ws.ox[:, None].astype(c2.dtype)
    gy = gy.reshape(gy.shape[0], P2 * P2) - ws.oy[:, None].astype(c2.dtype)
    gx = jnp.clip(gx, 0.0, W - 1.0)
    gy = jnp.clip(gy, 0.0, W - 1.0)

    tex = sampling.normalize_tex(win_ops.hat_sample(ws.win, gx, gy))
    ref_tex = tex[0]
    ref_ok = valid[0]
    others = valid & (jnp.arange(views.shape[0]) > 0)
    incc = sampling.robust_incc(1.0 - sampling.ncc(ref_tex[None], tex))
    rho = jnp.where(others, incc, 0.0)
    n = jnp.sum(others)
    return rho, n, ref_ok


def _residuals(ctx, opt: Options, x, ref_center, ref_ray, ax_x, ax_y, ax_z,
               scale, views, ws=None):
    """Per-view robustified incc residual vector of the objective
    PatchOptimizer::objective_fn via setCenterNorm
    (PatchOptimizer.cpp:286-311, 401-414). x = (depth, angle1, angle2).

    Returns (rho (K,) with invalid slots zeroed, n_valid, ref_ok)."""
    center = ref_center + x[0] * ref_ray
    a1 = x[1] * opt.ANGLE_SCALE
    a2 = x[2] * opt.ANGLE_SCALE
    fx = jnp.sin(a1) * jnp.cos(a2)
    fy = jnp.sin(a2)
    fz = -jnp.cos(a1) * jnp.cos(a2)
    normal = ax_x * fx + ax_y * fy + ax_z * fz

    ref_ci = jnp.maximum(views[0], 0)
    xax, yax, zax = sampling.patch_axes(ctx.cams, ref_ci, normal, scale)
    tex, valid = _sample_views(ctx, opt, views, center, scale, xax, yax, zax,
                               ws)
    ref_tex = tex[0]
    ref_ok = valid[0]

    others = valid & (jnp.arange(views.shape[0]) > 0)
    incc = sampling.robust_incc(1.0 - sampling.ncc(ref_tex[None], tex))
    rho = jnp.where(others, incc, 0.0)
    n = jnp.sum(others)
    return rho, n, ref_ok


def _objective(ctx, opt: Options, x, ref_center, ref_ray, ax_x, ax_y, ax_z,
               scale, views, ws=None):
    """Scalar objective: mean robustified incc over valid views, 2.0 when the
    reference sample fails or too few views remain (objective_fn:293-310)."""
    rho, n, ref_ok = _residuals(ctx, opt, x, ref_center, ref_ray, ax_x, ax_y,
                                ax_z, scale, views, ws)
    mean = jnp.sum(rho) / jnp.maximum(n, 1)
    return jnp.where(ref_ok & (n >= opt.MIN_IMAGES_PER_PATCH - 1), mean, 2.0)


def _params_from_center_norm(center, normal, ref_center, ref_ray,
                             ax_x, ax_y, ax_z, opt: Options):
    """PatchOptimizer::parametersFromCenterNorm (PatchOptimizer.cpp:416-446)."""
    x0 = jnp.dot(center - ref_center, ref_ray)
    fx = jnp.dot(ax_x, normal)
    fy = jnp.dot(ax_y, normal)
    fz = jnp.dot(ax_z, normal)
    x2 = jnp.arcsin(jnp.clip(fy, -1.0, 1.0))
    cosb = jnp.cos(x2)
    safe = cosb != 0.0
    sina = fx / jnp.where(safe, cosb, 1.0)
    cosa = -fz / jnp.where(safe, cosb, 1.0)
    x1 = jnp.arccos(jnp.clip(cosa, -1.0, 1.0))
    x1 = jnp.where(sina < 0.0, -x1, x1)
    x1 = jnp.where(safe, x1, 0.0)
    b = opt.ANGLE_BOUND
    return jnp.stack([x0,
                      jnp.clip(x1 / opt.ANGLE_SCALE, -b, b),
                      jnp.clip(x2 / opt.ANGLE_SCALE, -b, b)])


def _optimize_patch(ctx, opt: Options, center, normal, scale, views, ws=None):
    """Finite-difference Gauss-Newton refinement of (depth, angle1, angle2),
    replacing the BOBYQA call in PatchOptimizer::optimizePatch
    (PatchOptimizer.cpp:322-382).

    Derivative-free like the reference: each iteration evaluates the residual
    vector at x and x + h e_i (3 FD columns) plus one trial point, builds the
    PSD JtWJ 3x3 system with Levenberg damping and accept/reject. With a
    window cache the passes run against precomputed projection terms
    (_residuals_fast).

    The objective evaluates the first min(K, MAX_IMAGES_PER_PATCH) view
    slots -- the cap the reference computes at PatchOptimizer.cpp:298
    (its loop then ignores the variable; see ops/pallas_gn.py docstring)."""
    all_views = views
    kopt = min(views.shape[0], opt.MAX_IMAGES_PER_PATCH)
    views = views[:kopt]
    if ws is not None:
        ws = jax.tree.map(lambda a: a[:kopt], ws)
    ref_ci = jnp.maximum(views[0], 0)
    ref_center = center
    ref_ray = sampling.normalize3(center - ctx.cams.center[ref_ci])
    ax_x = sampling.normalize3(ctx.cams.xaxis[ref_ci])
    ax_y = sampling.normalize3(ctx.cams.yaxis[ref_ci])
    ax_z = sampling.normalize3(ctx.cams.zaxis[ref_ci])

    if ws is not None:
        pre = _precompute_res(ctx, opt, center, scale, views, ws)
        res_fn = functools.partial(_residuals_fast, opt, pre=pre, scale=scale,
                                   views=views, ws=ws)
    else:
        res_fn = functools.partial(_residuals, ctx, opt,
                                   ref_center=ref_center, ref_ray=ref_ray,
                                   ax_x=ax_x, ax_y=ax_y, ax_z=ax_z,
                                   scale=scale, views=views, ws=ws)

    b = opt.ANGLE_BOUND
    lo = jnp.asarray([-BIG, -b, -b])
    hi = jnp.asarray([BIG, b, b])
    x0 = _params_from_center_norm(center, normal, ref_center, ref_ray,
                                  ax_x, ax_y, ax_z, opt)
    eye3 = jnp.eye(3)
    eps = GN_EPS

    def res_vec(xx):
        rho, n, ref_ok = res_fn(xx)
        return rho, n.astype(rho.dtype), ref_ok.astype(rho.dtype)

    def mean_or_2(rho, n, ref_ok):
        mean = jnp.sum(rho) / jnp.maximum(n, 1.0)
        good = (ref_ok > 0) & (n >= opt.MIN_IMAGES_PER_PATCH - 1)
        return jnp.where(good, mean, 2.0)

    # finite-difference steps per parameter: depth in world units scaled by
    # the patch footprint, angles in units of pi/48 (the optimizer stays
    # derivative-free like the reference's BOBYQA; FD keeps every pass a
    # plain primal evaluation -- pallas-kernel friendly)
    h = jnp.stack([0.05 * scale, jnp.asarray(0.25), jnp.asarray(0.25)])

    def inner_body(_, state):
        """One damped-Newton trial step from the current (possibly
        Broyden-updated) Jacobian: 1 residual pass."""
        x, rho, n, ref_ok, f, lam, J = state
        # Gauss-Newton on rho = r^2: grad f = sum_v J_v / n,
        # H ~= sum_v J_v J_v^T / (2 rho_v) / n -- PSD 3x3
        n_f = jnp.maximum(n, 1.0)
        g = jnp.sum(J, axis=1) / n_f
        w = 0.5 / (rho + eps)
        H = (J * w[None, :]) @ J.T / n_f
        Hd = H + lam * jnp.diag(jnp.maximum(jnp.abs(jnp.diag(H)), 1e-6))
        step = -jnp.linalg.solve(Hd, g)
        step = jnp.where(jnp.isfinite(step), step, 0.0)
        x_new = jnp.clip(x + step, lo, hi)
        rho_t, n_t, ref_t = res_vec(x_new)   # trial (reused as next primal)
        # Broyden rank-1 secant update (valid whether or not we accept):
        # J += (drho - J^T dx) dx^T / |dx|^2
        dx = x_new - x
        dd = jnp.sum(dx * dx)
        pred = J.T @ dx                                      # (K,)
        upd = dx[:, None] * ((rho_t - rho - pred) / jnp.maximum(dd, 1e-20)
                             )[None, :]
        J = jnp.where(dd > 1e-20, J + upd, J)
        f_new = mean_or_2(rho_t, n_t, ref_t)
        accept = f_new < f
        x = jnp.where(accept, x_new, x)
        rho = jnp.where(accept, rho_t, rho)
        n = jnp.where(accept, n_t, n)
        ref_ok = jnp.where(accept, ref_t, ref_ok)
        f = jnp.where(accept, f_new, f)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-7, 1e7)
        return x, rho, n, ref_ok, f, lam, J

    inner = max(1, int(opt.LM_INNER))
    outer = -(-opt.LM_ITERS // inner)

    def outer_body(_, state):
        """Full finite-difference Jacobian refresh (3 residual passes) +
        LM_INNER trial steps on Broyden-updated Jacobians."""
        x, rho, n, ref_ok, f, lam = state
        cols = []
        for i in range(3):
            rho_i, _, _ = res_vec(x + h[i] * eye3[i])
            cols.append((rho_i - rho) / h[i])
        J = jnp.stack(cols)                                  # (3, K)
        x, rho, n, ref_ok, f, lam, _ = jax.lax.fori_loop(
            0, inner, inner_body, (x, rho, n, ref_ok, f, lam, J))
        return x, rho, n, ref_ok, f, lam

    if opt.LM_EXACT_J:
        # analytic-Jacobian Levenberg loop with deferred acceptance: the
        # same algorithm as the pallas kernel's exact-J mode (ops/
        # pallas_gn.py) with the Jacobian from forward-mode autodiff
        # through the sampler -- one grad pass per iteration.
        def _rj(xx):
            rho, n, ref_ok = res_vec(xx)
            return rho, (rho, n, ref_ok)

        def grad_pass(xx):
            Jk, (rho, n, ref_ok) = jax.jacfwd(_rj, has_aux=True)(xx)
            return rho, n, ref_ok, Jk.T                      # J (3, K)

        cl = h * opt.LM_STEP_CLAMP

        def exact_body(_, state):
            x, rho, n, ref_ok, f, lam, J = state
            n_f = jnp.maximum(n, 1.0)
            g = jnp.sum(J, axis=1) / n_f
            w = 0.5 / (rho + eps)
            H = (J * w[None, :]) @ J.T / n_f
            Hd = H + lam * jnp.diag(jnp.maximum(jnp.abs(jnp.diag(H)), 1e-6))
            step = -jnp.linalg.solve(Hd, g)
            step = jnp.clip(jnp.where(jnp.isfinite(step), step, 0.0),
                            -cl, cl)
            x_t = jnp.clip(x + step, lo, hi)
            rho_t, n_t, ref_t, J_t = grad_pass(x_t)
            f_t = mean_or_2(rho_t, n_t, ref_t)
            acc = f_t < f
            x = jnp.where(acc, x_t, x)
            rho = jnp.where(acc, rho_t, rho)
            n = jnp.where(acc, n_t, n)
            ref_ok = jnp.where(acc, ref_t, ref_ok)
            f = jnp.where(acc, f_t, f)
            J = jnp.where(acc, J_t, J)
            lam = jnp.clip(jnp.where(acc, lam * 0.5, lam * 4.0), 1e-7, 1e7)
            return x, rho, n, ref_ok, f, lam, J

        rho0, n0, r0, J0 = grad_pass(x0)
        f0 = mean_or_2(rho0, n0, r0)
        x, _, _, _, f, _, _ = jax.lax.fori_loop(
            0, int(opt.LM_ITERS_EXACT), exact_body,
            (x0, rho0, n0, r0, f0, jnp.asarray(opt.LM_LAMBDA0), J0))
    else:
        rho0, n0, r0 = res_vec(x0)
        f0 = mean_or_2(rho0, n0, r0)
        x, _, _, _, f, _ = jax.lax.fori_loop(
            0, outer, outer_body,
            (x0, rho0, n0, r0, f0, jnp.asarray(opt.LM_LAMBDA0)))

    # setCenterNorm(x) write-back (PatchOptimizer.cpp:401-414)
    new_center = ref_center + x[0] * ref_ray
    a1 = x[1] * opt.ANGLE_SCALE
    a2 = x[2] * opt.ANGLE_SCALE
    new_normal = (ax_x * (jnp.sin(a1) * jnp.cos(a2)) + ax_y * jnp.sin(a2)
                  + ax_z * (-jnp.cos(a1) * jnp.cos(a2)))
    ok = _nviews(all_views) >= opt.MIN_IMAGES_PER_PATCH
    return new_center, new_normal, ok, f


def _get_color(ctx, opt: Options, center, scale, views):
    """Scene::getColor (Scene.cpp:300-327): median-by-norm over views with
    the white-pixel (sky) special case. Level capped at MAXLEVEL-1 (the
    window-cache cap) rather than the reference's MAXLEVEL, so the gather
    path and the kernel center-texel path agree exactly -- documented
    divergence: the very coarsest patches read color one level coarser."""
    k = views.shape[0]
    ci = jnp.maximum(views, 0)
    valid = views >= 0
    nlev = opt.MAXLEVEL - 1
    lvl = cam_ops.get_leveli(ctx.cams, ci,
                             jnp.broadcast_to(center, ci.shape + (3,)),
                             jnp.broadcast_to(scale, ci.shape), nlev)
    uvw = cam_ops.project(ctx.cams, ci,
                          jnp.broadcast_to(center, ci.shape + (3,)), lvl)
    w = ctx.imgs.width[ci, lvl].astype(uvw.dtype)
    h = ctx.imgs.height[ci, lvl].astype(uvw.dtype)
    gx = jnp.clip(uvw[:, 0], 0.0, jnp.maximum(w - 2.0, 0.0))
    gy = jnp.clip(uvw[:, 1], 0.0, jnp.maximum(h - 2.0, 0.0))
    cols = sampling.bilinear(ctx.imgs.tex, ctx.imgs.row0, ctx.imgs.width,
                             ci, lvl, gx, gy)              # (K, 3)
    norms = jnp.where(valid, jnp.linalg.norm(cols, axis=-1), BIG)
    order = jnp.argsort(norms)
    n = jnp.maximum(jnp.sum(valid), 1)
    med = cols[order[n // 2]]
    first = cols[order[0]]
    return jnp.where(jnp.linalg.norm(med) > 250.0, first, med)


def _fetch_ws(ctx, opt: Options, views, center, scale):
    """Window fetch for the current view slots (once per pipeline half)."""
    ci = jnp.maximum(views, 0)
    return win_ops.fetch_windows(
        ctx.cams, ctx.imgs, ci, jnp.broadcast_to(center, ci.shape + (3,)),
        jnp.broadcast_to(scale, ci.shape), opt.MAXLEVEL - 1, opt.WINDOW_SIZE)


def _run_pre(ctx, opt: Options, center, normal, scale, views):
    """First half of runOptimization: view growth + filters + sort, up to
    (and excluding) optimizePatch. Returns (center, normal, views, ok, ws)."""
    normal = sampling.normalize3(normal)
    views, ok = _add_images(ctx, opt, center, normal, scale, views)
    ws = _fetch_ws(ctx, opt, views, center, scale) if opt.USE_WINDOWS else None
    views, ok1, ws = _filter_ncc(ctx, opt, center, normal, scale, views,
                                 opt.NCC_ALPHA_1, ws)
    ok &= ok1
    views, ok2, ws = _sort_images(ctx, opt, center, normal, scale, views, ws)
    ok &= ok2
    ok &= _assure_angles(ctx, opt, center, views)
    return center, normal, views, ok, ws


def _run_post(ctx, opt: Options, center, normal, scale, views, ok):
    """Second half of runOptimization: re-grow views, final filters, ref
    re-selection, color. Takes the post-refinement (merged) center/normal."""
    views, ok4 = _add_images(ctx, opt, center, normal, scale, views)
    ok &= ok4
    ws = _fetch_ws(ctx, opt, views, center, scale) if opt.USE_WINDOWS else None
    views, ok5, ws = _filter_ncc(ctx, opt, center, normal, scale, views,
                                 opt.NCC_ALPHA_2, ws)
    ok &= ok5
    views, ok6, ws = _filter_by_angle(ctx, opt, center, normal, views, ws)
    ok &= ok6
    ok &= _assure_angles(ctx, opt, center, views)
    views, ws = _set_ref_image(ctx, opt, center, normal, scale, views, ws)
    views, ok7, ws = _filter_ncc(ctx, opt, center, normal, scale, views,
                                 opt.NCC_ALPHA_2, ws)
    ok &= ok7

    color = _get_color(ctx, opt, center, scale, views)
    return center, normal, scale, views, ok, color


def _run_one(ctx, opt: Options, center, normal, scale, views):
    """Full runOptimization + write-back for a single patch (all slots static).

    Failures do not early-out (everything is traced); the `ok` flag accumulates
    every stage's success exactly as the reference's early returns would.
    With opt.USE_WINDOWS, pixel windows are fetched twice (before and after
    the refinement moves the patch) and every sampling pass runs gather-free
    against the cache."""
    center, normal, views, ok, ws = _run_pre(ctx, opt, center, normal, scale,
                                             views)
    new_center, new_normal, ok3, resid = _optimize_patch(
        ctx, opt, center, normal, scale, views, ws)
    ok &= ok3
    center = jnp.where(ok, new_center, center)
    normal = jnp.where(ok, sampling.normalize3(new_normal), normal)
    out = _run_post(ctx, opt, center, normal, scale, views, ok)
    return out + (resid,)


def _use_pallas_gn(opt: Options) -> bool:
    return (opt.USE_PALLAS_GN and opt.USE_WINDOWS
            and jax.default_backend() == "tpu")


def _use_batched_stages(opt: Options) -> bool:
    # the batched post pipeline implements the FAST_SETREF formulation only
    return (opt.USE_BATCHED_STAGES and opt.USE_WINDOWS and opt.FAST_SETREF)


def _optimize_all(ctx, opt: Options, center, normal, scale, views):
    """Batched runOptimization over B patches: the batched stage pipeline
    (scoring-kernel sampling on TPU) around either the fused Pallas
    Gauss-Newton kernel (ops/pallas_gn.py, TPU) or the vmapped XLA refiner.
    Returns the optimize_batch tuple."""
    if not _use_batched_stages(opt):
        if not _use_pallas_gn(opt):
            run = functools.partial(_run_one, ctx, opt)
            return jax.vmap(run)(center, normal, scale, views)

        from hpmvs_tpu.ops import pallas_gn

        pre = functools.partial(_run_pre, ctx, opt)
        center, normal, views, ok, ws = jax.vmap(pre)(center, normal, scale,
                                                      views)
        new_center, new_normal, ok3, resid = pallas_gn.gn_refine_batch(
            ctx, opt, center, normal, scale, views, ws)
        ok &= ok3
        center = jnp.where(ok[:, None], new_center, center)
        normal = jnp.where(ok[:, None], sampling.normalize3(new_normal),
                           normal)
        post = functools.partial(_run_post, ctx, opt)
        out = jax.vmap(post)(center, normal, scale, views, ok)
        return out + (resid,)

    # pad the batch once to the kernel lane width; all downstream stages and
    # kernels then run without internal padding
    from hpmvs_tpu.ops import pallas_gn
    B = center.shape[0]
    pad = (-B) % pallas_gn.NB if jax.default_backend() == "tpu" else 0
    if pad:
        padf = lambda a, fill: jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], 0)
        center = padf(center, 0.0)
        normal = padf(jnp.asarray(normal, jnp.float32), 0.0)
        scale = padf(scale, 1.0)
        views = padf(views, INVALID)

    center, normal, views, ok, ws = _run_pre_b(ctx, opt, center, normal,
                                               scale, views)
    if _use_pallas_gn(opt):
        new_center, new_normal, ok3, resid = pallas_gn.gn_refine_batch(
            ctx, opt, center, normal, scale, views, ws)
    else:
        refine = functools.partial(_optimize_patch, ctx, opt)
        new_center, new_normal, ok3, resid = jax.vmap(refine)(
            center, normal, scale, views, win_ops.to_window_state(ws))
    ok &= ok3
    center = jnp.where(ok[:, None], new_center, center)
    normal = jnp.where(ok[:, None], sampling.normalize3(new_normal), normal)
    out = _run_post_b(ctx, opt, center, normal, scale, views, ok, ws_pre=ws)
    out = out + (resid,)
    if pad:
        out = tuple(a[:B] for a in out)
    return out


@functools.partial(jax.jit,
                   static_argnames=("opt", "n_images", "with_gates",
                                    "pack_layout"))
def optimize_and_gate(ctx: SceneCtx, pack, opt: Options, n_images: int,
                      center, normal, scale, views, parent_c, widths,
                      pend_c=None, pend_s=None, pend_v=None, pend_ph=None,
                      gate_imgs=None, with_gates: bool = True,
                      pack_layout=None):
    """Fused extend-candidate compute: optimize + every acceptance gate of
    CellProcessor::extend (:130-142) -- scale window, drift, depthTests,
    viewBlockTest, pixelFreeTests -- in ONE device dispatch.

    pend_c/pend_s/pend_v/pend_ph: deferred setDepths updates (adds AND
    subtracts, phase-tagged 0=add/1=sub/2=add-after-sub, -1-padded views)
    accumulated since the last dispatch. They apply to the z-buffer in
    deferred order BEFORE the gates run, folding the engine's separate
    set_depths dispatches into this one (same freshness: the reference
    interleaves setDepths between cells, we between batches).

    gate_imgs: image-dim tables for the geometric gates; defaults to
    ctx.imgs. Per-block image subsets pass block-LOCAL textures in ctx.imgs
    but the GLOBAL dims here, because visibility tests span all images
    (Scene.cpp:610-644) while textures only need the block's cameras.

    Returns (center', normal', scale', views', ok, color[, new_depth when
    pending was passed])."""
    from hpmvs_tpu.core import depth as depth_mod

    if gate_imgs is None:
        gate_imgs = ctx.imgs
    has_pend = pend_c is not None
    if has_pend:
        if pend_ph is None:
            pend_ph = jnp.zeros(pend_c.shape[0], jnp.int32)
        pack = depth_mod.apply_phased_updates(
            pack, ctx.cams, pend_c, pend_s, pend_v, pend_ph,
            opt.DEPTH_SUBSAMPLE)

    oc, on, os_, ov, ok, col, _ = _optimize_all(ctx, opt, center, normal,
                                                scale, views)

    # per-lane gating: widths < 0 marks lanes that want the bare optimize
    # (seed / branch candidates -- the reference runs the SAME optimizer for
    # every phase, PatchOptimizer.cpp:78, and only extend applies these
    # acceptance gates, CellProcessor.cpp:130-142). One executable serves
    # all phases, so seed/branch dispatches fold into this fused path.
    # with_gates=False (static): the caller promises EVERY lane is bare
    # (all-branch / all-seed dispatches) -- the geometric gates are heavy
    # HBM-gather loops over n_images x levels, ~doubling the dispatch, and
    # their results would be discarded lane-wise anyway.
    if not with_gates:
        if has_pend:
            return oc, on, os_, ov, ok, col, pack.depth
        return oc, on, os_, ov, ok, col
    gate_on = widths > 0.0
    g = (os_ * 2.0 < widths) & (os_ * 2.0 > widths / 2.0)
    g &= jnp.linalg.norm(oc - parent_c, axis=1) < widths * opt.EXTEND_DRIFT

    m = opt.DEPTH_TEST_FACTOR
    # collapsed full-depth buffer (depth.collapse_full_depth): dense
    # gather-free pyramid min computed ONCE per dispatch, so the depth and
    # viewBlock tests pay 1 gather per (lane, view, neighbor) instead of
    # n_levels -- the gates scale O(n_images) per lane (Scene.cpp:610-644)
    # and dominated the device time ~6:1 on 150-camera scenes without this
    full0 = None
    pool3 = None
    if pack_layout is not None:
        full0 = depth_mod.collapse_full_depth(pack.depth, pack_layout,
                                              n_images)
        if opt.DEPTH_SUBSAMPLE == 2:
            # 2x2-pooled reduction of full0 (depth.pool_full_depth): the
            # 3x3-neighborhood tests gather 2 pooled values per
            # (lane, image) instead of 9 -- at 150 cameras viewBlockTest
            # alone cost ~2x the optimizer without this
            # (bench/profile_gates.py)
            pool3 = depth_mod.pool_full_depth(full0)
    dt = depth_mod.depth_tests.__wrapped__(pack, ctx.cams, gate_imgs, opt,
                                           oc, on, os_, ov, m, full0=full0,
                                           pool3=pool3)
    vb = depth_mod.view_block_test.__wrapped__(pack, ctx.cams, gate_imgs,
                                               opt, oc, on, os_, m, n_images,
                                               full0=full0, pool3=pool3)
    pf = depth_mod.pixel_free_tests.__wrapped__(pack, ctx.cams, gate_imgs,
                                                opt, oc, os_, ov)
    nv = jnp.sum(ov >= 0, axis=1)
    g &= dt >= opt.MIN_IMAGES_PER_PATCH
    g &= vb < opt.MIN_IMAGES_PER_PATCH
    g &= (pf >= opt.MIN_IMAGES_PER_PATCH - 1) \
        & (pf / jnp.maximum(nv, 1) > 0.75)
    ok &= g | ~gate_on
    if has_pend:
        return oc, on, os_, ov, ok, col, pack.depth
    return oc, on, os_, ov, ok, col


# ---------------------------------------------------------------------------
# Packed dispatch boundary: one f32 array in, one f32 array out.
#
# Through a host<->device transport every distinct array is a transfer RPC
# with fixed latency; the engine's fused dispatch carries 6 input arrays
# (+4 deferred-depth arrays when a pend window rides along) and fetches 6
# outputs -- measured ~30 ms of pure H2D latency per dispatch on a tunneled
# v5e at B=2048 (bench/profile_dispatch.py). Packing the batch into ONE
# (B, 11+K) f32 buffer (int views/phases bitcast to f32, exact) cuts that
# to a single transfer each way; unpacking on device is free slicing that
# XLA fuses into the consumers.
#
# Row layouts:
#   input  xin  (B, 11+K): c(3) n(3) s(1) parent_c(3) width(1) views(K,i32)
#   pend  (Pb, 5+K): c(3) s(1) ph(1,i32) views(K,i32)
#   output      (B, 11+K): c(3) n(3) s(1) color(3) ok(1) views(K,i32)
# ---------------------------------------------------------------------------

def _bc_i2f(a):
    return jax.lax.bitcast_convert_type(a, jnp.float32)


def _bc_f2i(a):
    return jax.lax.bitcast_convert_type(a, jnp.int32)


def unpack_gate_in(xin):
    """(B, 11+K) packed input -> (c, n, s, v, parent_c, widths)."""
    return (xin[:, 0:3], xin[:, 3:6], xin[:, 6], _bc_f2i(xin[:, 11:]),
            xin[:, 7:10], xin[:, 10])


def unpack_pend(pend):
    """(Pb, 5+K) packed pend window -> (c, s, v, ph)."""
    return (pend[:, 0:3], pend[:, 3], _bc_f2i(pend[:, 5:]),
            _bc_f2i(pend[:, 4]))


def pack_gate_out(oc, on, os_, ov, ok, col):
    """(B, 11+K) packed output (ok as 0/1 f32, views bitcast)."""
    return jnp.concatenate(
        [oc, on, os_[:, None], col, ok.astype(jnp.float32)[:, None],
         _bc_i2f(ov)], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("opt", "n_images", "with_gates",
                                    "pack_layout"))
def optimize_and_gate_packed(ctx: SceneCtx, pack, opt: Options,
                             n_images: int, xin, pend=None, gate_imgs=None,
                             with_gates: bool = True, pack_layout=None):
    """optimize_and_gate over the packed row layout. Returns the packed
    output array, plus the updated depth buffer when a pend window was
    passed."""
    c, n, s, v, pc, w = unpack_gate_in(xin)
    if pend is not None:
        pc_, ps_, pv_, pph_ = unpack_pend(pend)
        res = optimize_and_gate.__wrapped__(
            ctx, pack, opt, n_images, c, n, s, v, pc, w,
            pc_, ps_, pv_, pph_, gate_imgs=gate_imgs,
            with_gates=with_gates, pack_layout=pack_layout)
        return pack_gate_out(*res[:6]), res[6]
    res = optimize_and_gate.__wrapped__(ctx, pack, opt, n_images,
                                        c, n, s, v, pc, w,
                                        gate_imgs=gate_imgs,
                                        with_gates=with_gates,
                                        pack_layout=pack_layout)
    return pack_gate_out(*res[:6])


@functools.partial(jax.jit, static_argnames=("opt",))
def optimize_batch(ctx: SceneCtx, opt: Options, center, normal, scale, views):
    """Optimize B patches in one shot.

    center (B,3), normal (B,3), scale (B,), views (B,K) int32 -1-padded.
    Returns (center, normal, scale, views, ok, color, resid) batched.
    This one call is the moral equivalent of B sequential
    PatchOptimizer::optimize invocations in the reference.
    """
    return _optimize_all(ctx, opt, center, normal, scale, views)
