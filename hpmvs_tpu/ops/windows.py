"""Windowed texture sampling: gather once per (patch, view), sample densely.

The direct path (ops/sampling.py) issues 4 HBM gathers per texel -- 3.1M
random fetches per batch pass, the throughput ceiling of the whole engine.
This module implements the TPU-native alternative:

  1. fetch_windows: ONE gather of a contiguous (W x W x 3) pixel window per
     (patch, view) around the projected patch center -- large slices, near
     HBM bandwidth. The window is fetched once per optimize call and reused
     by every NCC pass and every Gauss-Newton iteration.
  2. sample_from_windows: bilinear sampling of the 7x7 grid expressed as two
     small dense contractions with per-texel hat-function weight matrices
     (bilinear interpolation == matmul with hat(g - j) weights), so the inner
     loop runs on the MXU/VPU with zero gathers and stays differentiable for
     the Gauss-Newton refiner.

Samples whose grid leaves the cached window are flagged invalid (documented
divergence: the reference, re-fetching every texel, would still sample them;
the window margin is sized so this only happens when the optimizer drifts
further than the extend/branch gates allow anyway).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from hpmvs_tpu.geom import camera as cam_ops
from hpmvs_tpu.ops import sampling

PATCH_SIZE = sampling.PATCH_SIZE


class WindowState(NamedTuple):
    win: jnp.ndarray    # (..., W, W, 3) pixel windows -- f32 on the CPU
                        # fallback, bf16 from the TPU DMA kernel (uint8-exact;
                        # raw (N, W, 128) with fetch_windows(keep_raw=True))
    ox: jnp.ndarray     # (...,) int32 window origin x (global, at `level`)
    oy: jnp.ndarray     # (...,) int32 window origin y
    level: jnp.ndarray  # (...,) int32 pyramid level the window was cut at


class WinTState(NamedTuple):
    """Kernel-layout window cache for the batched pipeline: patches are the
    minor (lane) axis, so the pallas kernels (ops/pallas_gn.py,
    ops/pallas_score.py) read window slabs without any per-call transpose.
    Slab k*W*3 + x*3 + c is the (W_y, B) tile of view-slot k, column x,
    channel c."""
    winT: jnp.ndarray   # (K*W*3, W, B) bf16 (f32 on CPU) window slabs
    ox: jnp.ndarray     # (B, K) int32 window origin x (global, at `level`)
    oy: jnp.ndarray     # (B, K) int32
    level: jnp.ndarray  # (B, K) int32

    @property
    def W(self) -> int:
        return self.winT.shape[1]

    @property
    def K(self) -> int:
        return self.winT.shape[0] // (3 * self.W)

    def to_win5(self) -> jnp.ndarray:
        """(B, K, W, W, 3) float32 view for the XLA fallback paths."""
        K, W = self.K, self.W
        w4 = self.winT.reshape(K, W, 3, W, -1).astype(jnp.float32)
        return jnp.transpose(w4, (4, 0, 3, 1, 2))


def to_window_state(ws: WinTState) -> WindowState:
    """WinTState -> per-patch WindowState (for the vmapped fallback paths)."""
    return WindowState(win=ws.to_win5(), ox=ws.ox, oy=ws.oy, level=ws.level)


def fetch_windows_t(cams, imgs, ci, center, scale, maxlevel: int,
                    W: int, fetch_mask=None, prev: WinTState = None
                    ) -> WinTState:
    """fetch_windows + one transpose into the kernel layout (done once per
    fetch; every downstream kernel then reads windows without moving them).

    ci: (B, K) int32; center: (B, K, 3); scale: (B, K). B must be a multiple
    of the kernel lane width on TPU (the batched pipeline pads upstream).

    fetch_mask (B, K) bool + prev: selective re-fetch -- slots with
    fetch_mask False skip their DMA and keep `prev`'s window/origin/level
    (the post-stage reuses the pre-stage windows of surviving view slots;
    only newly added views touch HBM). Validity of a stale reused window is
    enforced downstream by the level/coverage gates (pallas_score._geometry,
    windows.sample_from_windows)."""
    B, K = ci.shape
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    ws = fetch_windows(cams, imgs, ci, center, scale, maxlevel, W,
                       fetch_mask=fetch_mask, keep_raw=True)
    if ws.win.ndim == 3:   # raw (B*K, W, 128) DMA output
        # transpose BEFORE slicing off the 128-float padding: the xc slice
        # then lands on a leading dim (a free view) instead of the lane dim
        # (a relayout) -- measured 2.1 -> 1.0 ms at B=2048, K=8
        w4 = ws.win.reshape(B, K, W, 128).astype(dt)
        winT = (jnp.transpose(w4, (1, 3, 2, 0))[:, :3 * W]
                .reshape(K * W * 3, W, B))
    else:
        # (B, K, y, x, c) -> (K, x, c, y, B), minor-to-major move done once
        winT = (jnp.transpose(ws.win.astype(dt), (1, 3, 4, 2, 0))
                .reshape(K * W * 3, W, B))
    out = WinTState(winT=winT, ox=ws.ox, oy=ws.oy, level=ws.level)
    if prev is None:
        return out
    mT = jnp.repeat(jnp.transpose(fetch_mask, (1, 0)), W * 3, 0)[:, None, :]
    return WinTState(
        winT=jnp.where(mT, out.winT, prev.winT),
        ox=jnp.where(fetch_mask, out.ox, prev.ox),
        oy=jnp.where(fetch_mask, out.oy, prev.oy),
        level=jnp.where(fetch_mask, out.level, prev.level))


def fetch_windows(cams, imgs, ci, center, scale, maxlevel: int,
                  W: int, use_dma=None, fetch_mask=None,
                  keep_raw=False) -> WindowState:
    """Cut a W x W window around the projected patch center in each view.

    ci: (...,) int32; center: (..., 3); scale: (...,). On TPU the fetch runs
    through the pallas DMA kernel (ops/pallas_fetch.py); elsewhere it falls
    back to a vmapped dynamic_slice gather. Slots with fetch_mask False come
    back zero on the DMA path (the fallback fetches everything; callers
    overwrite masked slots either way). keep_raw: on the DMA path, return
    win as the raw (N, W, 128) kernel output (floats [0:3W] = window) so
    fetch_windows_t can transpose before slicing."""
    # window-fitting level: one coarser when the grid span cannot fit W
    # (camera.get_level_fit; the sampling passes use the same rule)
    level = cam_ops.get_level_fit(cams, ci, center, scale, maxlevel, W)
    uvw = cam_ops.project(cams, ci, center, level)
    w = imgs.width[ci, level]
    h = imgs.height[ci, level]
    ox = jnp.clip(jnp.round(uvw[..., 0]).astype(jnp.int32) - W // 2, 0,
                  jnp.maximum(w - W, 0))
    oy = jnp.clip(jnp.round(uvw[..., 1]).astype(jnp.int32) - W // 2, 0,
                  jnp.maximum(h - W, 0))
    rows = imgs.row0[ci, level] + oy

    shape = rows.shape
    flat_r = rows.reshape(-1)
    flat_c = ox.reshape(-1)

    if use_dma is None:
        use_dma = jax.default_backend() == "tpu"
    if use_dma:
        from hpmvs_tpu.ops import pallas_fetch
        fcol = flat_c * 3
        blk0 = fcol // 128
        off = fcol - blk0 * 128
        winf = pallas_fetch.fetch_windows_dma(
            imgs.texb, flat_r, blk0, off, W,
            mask=None if fetch_mask is None else fetch_mask.reshape(-1))
        if keep_raw:
            return WindowState(win=winf, ox=ox, oy=oy, level=level)
        win = winf[:, :, :3 * W].reshape(shape + (W, W, 3))
    else:
        def cut(r, c):
            return jax.lax.dynamic_slice(imgs.tex, (r, c, 0), (W, W, 3))

        win = jax.vmap(cut)(flat_r, flat_c).reshape(shape + (W, W, 3))
    return WindowState(win=win, ox=ox, oy=oy, level=level)


def sample_from_windows(cams, imgs, ws: WindowState, ci, center, scale,
                        xaxis, yaxis, zaxis, max_angle_cos, maxlevel: int):
    """Windowed equivalent of sampling.sample_texture: same angle / margin /
    level semantics (PatchOptimizer.cpp:476-529), bilinear via hat-weight
    contractions against the cached windows.

    Returns (tex (..., 49, 3) normalized, valid (...,))."""
    W = ws.win.shape[-2]
    ray = sampling.normalize3(cams.center[ci] - center)
    angle_ok = jnp.sum(ray * zaxis, axis=-1) >= max_angle_cos

    level = cam_ops.get_level_fit(cams, ci, center, scale, maxlevel, W)
    level_ok = level == ws.level
    level = ws.level  # sample at the window's level

    c2 = cam_ops.project(cams, ci, center, level)[..., :2]
    dx = cam_ops.project(cams, ci, center + xaxis, level)[..., :2] - c2
    dy = cam_ops.project(cams, ci, center + yaxis, level)[..., :2] - c2

    half = PATCH_SIZE / 2.0
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

    # window coverage: the whole grid must lie inside [0, W-1] locally
    org = jnp.stack([ws.ox, ws.oy], axis=-1).astype(c2.dtype)
    cover_ok = (jnp.all(mn - org >= 0.0, axis=-1)
                & jnp.all(mx - org <= W - 1.0, axis=-1))

    valid = angle_ok & bounds_ok & level_ok & cover_ok

    # local grid coordinates (..., 49)
    ii = jnp.arange(PATCH_SIZE, dtype=c2.dtype)
    gx = (tl[..., None, None, 0] + ii[None, :] * dx[..., None, None, 0]
          + ii[:, None] * dy[..., None, None, 0])
    gy = (tl[..., None, None, 1] + ii[None, :] * dx[..., None, None, 1]
          + ii[:, None] * dy[..., None, None, 1])
    P2 = PATCH_SIZE * PATCH_SIZE
    gx = gx.reshape(gx.shape[:-2] + (P2,)) - ws.ox[..., None].astype(c2.dtype)
    gy = gy.reshape(gy.shape[:-2] + (P2,)) - ws.oy[..., None].astype(c2.dtype)
    gx = jnp.clip(gx, 0.0, W - 1.0)
    gy = jnp.clip(gy, 0.0, W - 1.0)

    tex = hat_sample(ws.win, gx, gy)
    return sampling.normalize_tex(tex), valid


def hat_sample(win, gx, gy):
    """Bilinear sampling as dense hat-weight contractions.

    win: (..., W, W, 3); gx/gy: (..., T) local window coordinates.
    Returns (..., T, 3)."""
    W = win.shape[-2]
    jw = jnp.arange(W, dtype=gx.dtype)
    Ax = jnp.maximum(0.0, 1.0 - jnp.abs(gx[..., None] - jw))   # (..., T, W)
    Ay = jnp.maximum(0.0, 1.0 - jnp.abs(gy[..., None] - jw))
    tmp = jnp.einsum("...tx,...yxc->...tyc", Ax, win,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("...ty,...tyc->...tc", Ay, tmp,
                      preferred_element_type=jnp.float32)
