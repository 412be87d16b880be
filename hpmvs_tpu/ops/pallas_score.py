"""Pallas TPU kernel: batched view-texture sampling for the NCC stages.

The view-selection pipeline around the Gauss-Newton refiner (filterImagesNCC,
setRefImage -- src/hpmvs/PatchOptimizer.cpp:138-181, 448-474) is dominated by
the same 7x7 bilinear texture sampling as the refinement loop itself. The XLA
hat-weight formulation (ops/windows.sample_from_windows) materializes a
(B, K, 49, W, 3) intermediate in HBM on every pass (~10 ms per scoring stage
at B=2048); this kernel keeps the cached windows and the whole sampling
pipeline VMEM-resident per 128-patch block, exactly like the Gauss-Newton
mega-kernel (ops/pallas_gn.py), and returns only the normalized textures
(B, K, 49, 3) -- ~100x less HBM traffic.

The geometry (projected patch grid: top-left + du/dv per view) and all
validity gates are precomputed in XLA -- they are tiny (B, K) tensors; the
kernel does only the heavy part: hat-weight bilinear sampling + Patch2d
normalization (Patch2d.hpp:37-84 semantics).

Layout contract (shared with pallas_gn): patches are the LANE axis in blocks
of NB=128; windows are (K*W*3, W, NB) bf16 slabs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpmvs_tpu.config import Options
from hpmvs_tpu.geom import camera as cam_ops
from hpmvs_tpu.ops import sampling
from hpmvs_tpu.ops import pallas_gn
from hpmvs_tpu.ops import windows as win_ops

NB = pallas_gn.NB
P = sampling.PATCH_SIZE
P2 = P * P


CHALF = P / 2.0   # the true projected center sits at tl + 3.5*(dx+dy);
                  # the grid texels are tl + i*(dx,dy), i in [0,7) -- texel
                  # (3,3) is half a texel off (reference sampleTexture
                  # convention, PatchOptimizer.cpp:495-523)


def _kernel(geom_ref, win_ref, out_ref, *col_ref, W: int, K: int):
    f32 = jnp.float32
    ii = jax.lax.broadcasted_iota(jnp.int32, (P2, 1), 0)
    IX = jnp.mod(ii, P).astype(f32)       # (49, 1) texel x index
    IY = (ii // P).astype(f32)            # (49, 1) texel y index

    for k in range(K):
        g = geom_ref[k]                   # (6, NB): tlx, tly, dxx, dxy, dyx, dyy
        gx = jnp.clip(g[0:1] + IX * g[2:3] + IY * g[4:5], 0.0, W - 1.0)
        gy = jnp.clip(g[1:2] + IX * g[3:4] + IY * g[5:6], 0.0, W - 1.0)
        tex = pallas_gn.hat_sample_ch(win_ref, k * (W * 3), gx, gy, W)
        if col_ref:
            # bilinear RGB at the exact patch center (Scene::getColor's
            # sample, Scene.cpp:311-315): one extra 1-point hat sample,
            # ~2% of the pass; skipped entirely for with_color=False passes
            gxc = jnp.clip(g[0:1] + CHALF * (g[2:3] + g[4:5]), 0.0, W - 1.0)
            gyc = jnp.clip(g[1:2] + CHALF * (g[3:4] + g[5:6]), 0.0, W - 1.0)
            col = pallas_gn.hat_sample_ch(win_ref, k * (W * 3), gxc, gyc, W)
            for c in range(3):
                col_ref[0][k * 3 + c] = col[c]
        cen = pallas_gn.normalize_ch(tex, P2)
        for c in range(3):
            out_ref[k * 3 + c] = cen[c]


@functools.partial(jax.jit,
                   static_argnames=("W", "K", "interpret", "with_color"))
def _sample_pallas(geomT, winT, W: int, K: int, interpret=False,
                   with_color=False):
    """geomT (K, 6, B), winT (K*W*3, W, B) bf16 -> texT (K*3, P2, B) f32
    [+ colT (K*3, 1, B) with with_color]."""
    Bt = geomT.shape[-1]
    assert Bt % NB == 0
    grid = (Bt // NB,)

    def spec(sh):
        lead = sh[:-1]
        zeros = (0,) * len(lead)
        return pl.BlockSpec(lead + (NB,), (lambda i, z=zeros: z + (i,)),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, W=W, K=K)
    shapes = [(K * 3, P2, Bt)] + ([(K * 3, 1, Bt)] if with_color else [])
    out = pl.pallas_call(
        kern,
        out_shape=tuple(jax.ShapeDtypeStruct(sh, jnp.float32)
                        for sh in shapes),
        grid=grid,
        in_specs=[spec(geomT.shape), spec(winT.shape)],
        out_specs=[spec(sh) for sh in shapes],
        interpret=interpret,
    )(geomT, winT)
    return out if with_color else (out[0], None)


def _geometry(ctx, opt: Options, center, normal, scale, views, ws):
    """Batched XLA precompute of the per-view sampling geometry + validity.

    Mirrors ops/windows.sample_from_windows semantics exactly
    (PatchOptimizer::sampleTexture gates, PatchOptimizer.cpp:476-529):
    angle gate against normalize(normal), level pinned to the window's level,
    image-bounds margin 3, window-coverage gate.

    Returns (tl_local, dx, dy  -- (B, K, 2) at the window's level,
             valid (B, K) bool)."""
    cams, imgs = ctx.cams, ctx.imgs
    B, K = views.shape
    ci = jnp.maximum(views, 0)
    nz = sampling.normalize3(normal)                    # (B, 3)
    ref_ci = jnp.maximum(views[:, 0], 0)
    xax, yax, _ = sampling.patch_axes(cams, ref_ci, normal, scale)

    ray = sampling.normalize3(cams.center[ci] - center[:, None])
    angle_ok = jnp.sum(ray * nz[:, None], axis=-1) >= jnp.cos(opt.MAX_ANGLE)

    lvl = cam_ops.get_level_fit(
        cams, ci, jnp.broadcast_to(center[:, None], ci.shape + (3,)),
        jnp.broadcast_to(scale[:, None], ci.shape), opt.MAXLEVEL - 1,
        _win_width(ws))
    level_ok = lvl == ws.level
    level = ws.level

    cb = jnp.broadcast_to(center[:, None], ci.shape + (3,))
    c2 = cam_ops.project(cams, ci, cb, level)[..., :2]
    dx = cam_ops.project(cams, ci, cb + xax[:, None], level)[..., :2] - c2
    dy = cam_ops.project(cams, ci, cb + yax[:, None], level)[..., :2] - c2

    half = P / 2.0
    tl = c2 - half * dx - half * dy
    tr = c2 + half * dx - half * dy
    bl = c2 - half * dx + half * dy
    br = c2 + half * dx + half * dy
    mn = jnp.minimum(jnp.minimum(tl, tr), jnp.minimum(bl, br))
    mx = jnp.maximum(jnp.maximum(tl, tr), jnp.maximum(bl, br))

    m = 3.0
    w = imgs.width[ci, level].astype(c2.dtype)
    h = imgs.height[ci, level].astype(c2.dtype)
    bounds_ok = ((mn[..., 0] >= m) & (mn[..., 1] >= m)
                 & (mx[..., 0] < w - m) & (mx[..., 1] < h - m))

    W = _win_width(ws)
    org = jnp.stack([ws.ox, ws.oy], axis=-1).astype(c2.dtype)
    cover_ok = (jnp.all(mn - org >= 0.0, axis=-1)
                & jnp.all(mx - org <= W - 1.0, axis=-1))

    valid = angle_ok & bounds_ok & level_ok & cover_ok
    tl_local = tl - org
    return tl_local, dx, dy, valid


def _win_width(ws) -> int:
    return ws.W if isinstance(ws, win_ops.WinTState) else ws.win.shape[-2]


def sample_views_batch(ctx, opt: Options, center, normal, scale, views, ws,
                       use_kernel=None, interpret=False, with_color=False,
                       layout="bkpc"):
    """Batched texture sampling of every view slot from cached windows.

    center (B,3), normal (B,3), scale (B,), views (B,K), ws over (B,K) slots
    (WinTState kernel layout, or legacy WindowState for the fallback).
    Returns (tex (B,K,49,3) normalized f32, valid (B,K) bool; valid does NOT
    include views >= 0 -- same contract as windows.sample_from_windows).
    layout="kcpb" returns tex as (K, 3, P2, B) -- the kernel's native
    lane-major layout, skipping a 10 MB lane transpose per pass; NCC
    consumers contract it directly (lanes = patches stay minor).
    with_color adds a third output: the raw bilinear RGB at the patch center
    per view slot, (B, K, 3) -- the same pixel Scene::getColor would fetch
    (Scene.cpp:311-315), read from the already-sampled texture for free
    (documented divergence: at the window's level, capped at MAXLEVEL-1,
    where getColor caps at MAXLEVEL).

    use_kernel None: kernel on TPU, XLA fallback elsewhere. The fallback is
    the same math through windows.hat_sample."""
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"

    tl, dx, dy, valid = _geometry(ctx, opt, center, normal, scale, views, ws)
    W = _win_width(ws)
    B, K = views.shape

    if not (use_kernel or interpret):
        grid = sampling_grid()                           # (49, 2)
        gx = (tl[..., None, 0] + grid[:, 0] * dx[..., None, 0]
              + grid[:, 1] * dy[..., None, 0])
        gy = (tl[..., None, 1] + grid[:, 0] * dx[..., None, 1]
              + grid[:, 1] * dy[..., None, 1])
        gx = jnp.clip(gx, 0.0, W - 1.0)
        gy = jnp.clip(gy, 0.0, W - 1.0)
        win5 = (ws.to_win5() if isinstance(ws, win_ops.WinTState)
                else ws.win)
        tex = sampling.normalize_tex(win_ops.hat_sample(win5, gx, gy))
        if layout == "kcpb":
            tex = jnp.transpose(tex, (1, 3, 2, 0))
        if with_color:
            gxc = jnp.clip(tl[..., 0] + CHALF * (dx[..., 0] + dy[..., 0]),
                           0.0, W - 1.0)[..., None]
            gyc = jnp.clip(tl[..., 1] + CHALF * (dx[..., 1] + dy[..., 1]),
                           0.0, W - 1.0)[..., None]
            col = win_ops.hat_sample(win5, gxc, gyc)[..., 0, :]
            return tex, valid, col
        return tex, valid

    geom = jnp.concatenate([tl, dx, dy], axis=-1)        # (B, K, 6)
    pad = (-B) % NB
    if pad:
        geom = jnp.concatenate(
            [geom, jnp.zeros((pad, K, 6), geom.dtype)], 0)
    if isinstance(ws, win_ops.WinTState):
        assert pad == 0, "batched kernel pipeline requires B % 128 == 0"
        winT = ws.winT.astype(jnp.bfloat16)
    else:
        win = ws.win
        if pad:
            win = jnp.concatenate(
                [win, jnp.zeros((pad,) + win.shape[1:], win.dtype)], 0)
        winT = (jnp.transpose(win, (1, 3, 4, 2, 0))
                .reshape(K * W * 3, W, B + pad).astype(jnp.bfloat16))
    geomT = jnp.transpose(geom, (1, 2, 0))               # (K, 6, B)
    texT, colT = _sample_pallas(geomT, winT, W, K, interpret=interpret,
                                with_color=with_color)
    if layout == "kcpb":
        tex = texT.reshape(K, 3, P2, B + pad)
        assert pad == 0
    else:
        tex = jnp.transpose(texT.reshape(K, 3, P2, B + pad), (3, 0, 2, 1))
        if pad:
            tex = tex[:B]
    if with_color:
        col = jnp.transpose(colT.reshape(K, 3, B + pad), (2, 0, 1))
        if pad:
            col = col[:B]
        return tex, valid, col
    return tex, valid


# ---------------------------------------------------------------------------
# Slot permutation of the kernel-layout window cache.
# ---------------------------------------------------------------------------

def _permute_kernel(ordT_ref, win_ref, out_ref, *, K: int):
    """out[k] = win[order[k]] per patch lane, as a one-hot combine (the
    XLA gather for this permutation moves 3 KB slices -- ~11 ms at B=2048;
    this kernel streams the slabs once). Window planes are flattened to one
    (W*3*W, NB) tile per view slot: big contiguous vector ops instead of
    W3 x (12, 128) bf16 tiles whose sublanes pad 12 -> 16."""
    for k in range(K):
        sel = ordT_ref[k]                        # (1, NB) int32
        acc = None
        for j in range(K):
            m = (sel == j).astype(win_ref.dtype)  # (1, NB)
            t = win_ref[j] * m                    # (W3W, NB)
            acc = t if acc is None else acc + t
        out_ref[k] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def _permute_pallas(ordT, win3, interpret=False):
    """ordT (K, 1, B) int32; win3 (K, W*3*W, B) -> permuted win3."""
    K, W3W, Bt = win3.shape
    assert Bt % NB == 0
    grid = (Bt // NB,)

    def spec(sh):
        lead = sh[:-1]
        zeros = (0,) * len(lead)
        return pl.BlockSpec(lead + (NB,), (lambda i, z=zeros: z + (i,)),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_permute_kernel, K=K),
        out_shape=jax.ShapeDtypeStruct(win3.shape, win3.dtype),
        grid=grid,
        in_specs=[spec(ordT.shape), spec(win3.shape)],
        out_specs=spec(win3.shape),
        interpret=interpret,
    )(ordT, win3)


def permute_wst(ws, order, use_kernel=None, interpret=False):
    """Batched view-slot permutation of a WinTState. order: (B, K) int32,
    new slot k holds old slot order[b, k]."""
    if ws is None:
        return None
    if use_kernel is None:
        use_kernel = jax.default_backend() == "tpu"
    K, W = ws.K, ws.W
    if use_kernel or interpret:
        # (K*W3, W, B) -> (K, W3*W, B) is a free row-major regroup
        win3 = ws.winT.reshape(K, W * 3 * W, -1)
        ordT = jnp.transpose(order, (1, 0))[:, None, :]  # (K, 1, B)
        new3 = _permute_pallas(ordT, win3, interpret=interpret)
        winT = new3.reshape(ws.winT.shape)
    else:
        win4 = ws.winT.reshape(K, W * 3, W, -1)
        idx = jnp.transpose(order, (1, 0))[:, None, None, :]
        winT = jnp.take_along_axis(win4, idx, axis=0).reshape(ws.winT.shape)
    return win_ops.WinTState(
        winT=winT,
        ox=jnp.take_along_axis(ws.ox, order, axis=1),
        oy=jnp.take_along_axis(ws.oy, order, axis=1),
        level=jnp.take_along_axis(ws.level, order, axis=1))


def sampling_grid():
    """(49, 2) float32 texel (col, row) indices of the 7x7 grid."""
    ii = jnp.arange(P2)
    return jnp.stack([jnp.mod(ii, P), ii // P], axis=-1).astype(jnp.float32)
