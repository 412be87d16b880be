"""Batched 7x7 patch-texture sampling and NCC scoring.

Behavioral equivalent of the reference hot path:
  - PatchOptimizer::sampleTexture (src/hpmvs/PatchOptimizer.cpp:476-529):
    project patch center + tangent axes into the view at the patch's pyramid
    level, walk a 7x7 grid in image space, bilinear-fetch RGB.
  - Patch2d::normalize / dot (include/hpmvs/Patch2d.hpp:37-84): subtract
    per-channel mean, divide by global std; NCC = mean elementwise product.
  - PatchOptimizer::calculatePatchAxis (PatchOptimizer.cpp:532-548).

TPU-first design: one call samples B patches x K views as a single fused
gather + arithmetic graph (vmap-free broadcasting over arbitrary leading
dims); the per-texel work lands on the VPU, the 4-tap bilinear fetch is a
batched gather from the packed planar image buffer. Differentiable w.r.t.
patch center/normal, which is what enables the batched damped-Newton refiner
that replaces nlopt BOBYQA.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from hpmvs_tpu.geom import camera as cam_ops

PATCH_SIZE = 7
N_TEXELS = PATCH_SIZE * PATCH_SIZE * 3


def normalize3(v, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def bilinear(tex, row0, width, ci, level, x, y):
    """Bilinear RGB fetch from the packed 2D buffer.

    tex: (rows, wmax, 3); row0/width: (ncam, nlevel) tables; ci/level/x/y:
    broadcastable (...,) arrays. Matches Image::getColor (Image.h:89-115):
    integer truncation of the top-left texel (callers guarantee x,y >= 0).
    Returns (..., 3) float32.
    """
    base = row0[ci, level]
    lx = jnp.floor(x).astype(jnp.int32)
    ly = jnp.floor(y).astype(jnp.int32)
    dx1 = (x - lx)[..., None]
    dy1 = (y - ly)[..., None]
    r = base + ly
    c = (tex[r, lx] * ((1 - dx1) * (1 - dy1)) + tex[r, lx + 1] * (dx1 * (1 - dy1))
         + tex[r + 1, lx] * ((1 - dx1) * dy1) + tex[r + 1, lx + 1] * (dx1 * dy1))
    return c


def patch_axes(cams, ref_ci, normal, scale):
    """Reference-camera-aligned tangent frame (PatchOptimizer.cpp:532-548).

    normal: (..., 3) (need not be unit); scale: (...,).
    Returns (xaxis, yaxis, zaxis): xaxis/yaxis scaled by `scale`, zaxis unit.
    """
    z = normalize3(normal)
    cam_x = cams.xaxis[ref_ci]
    y = normalize3(jnp.cross(z, cam_x))
    x = normalize3(jnp.cross(y, z))
    x = x * scale[..., None]
    ys = y * scale[..., None]
    # y *= dot(unit_y, unit_cam_y): aligns/flips y toward the camera's y axis
    cam_y = normalize3(cams.yaxis[ref_ci])
    ys = ys * jnp.sum(y * cam_y, axis=-1, keepdims=True)
    return x, ys, z


def sample_texture(cams, imgs, ci, center, scale, xaxis, yaxis, zaxis,
                   max_angle_cos, maxlevel):
    """Sample the 7x7x3 patch texture in view ci (PatchOptimizer.cpp:476-529).

    cams: Cameras pytree; imgs: ImagePack pytree (device arrays).
    ci: (...,) int32; center/xaxis/yaxis/zaxis: (..., 3); scale: (...,).
    Returns (tex (..., 49, 3) normalized, valid (...,) bool).
    """
    ray = normalize3(cams.center[ci] - center)
    angle_ok = jnp.sum(ray * zaxis, axis=-1) >= max_angle_cos

    level = cam_ops.get_leveli(cams, ci, center, scale, maxlevel)
    c2 = cam_ops.project(cams, ci, center, level)[..., :2]
    dx = cam_ops.project(cams, ci, center + xaxis, level)[..., :2] - c2
    dy = cam_ops.project(cams, ci, center + yaxis, level)[..., :2] - c2

    half = PATCH_SIZE / 2.0  # 3.5, as in the reference (texture.size()/2.0f)
    tl = c2 - half * dx - half * dy
    tr = c2 + half * dx - half * dy
    bl = c2 - half * dx + half * dy
    br = c2 + half * dx + half * dy
    mn = jnp.minimum(jnp.minimum(tl, tr), jnp.minimum(bl, br))
    mx = jnp.maximum(jnp.maximum(tl, tr), jnp.maximum(bl, br))

    m = 3.0  # safety margin (PatchOptimizer.cpp:503)
    w = imgs.width[ci, level].astype(c2.dtype)
    h = imgs.height[ci, level].astype(c2.dtype)
    bounds_ok = ((mn[..., 0] >= m) & (mn[..., 1] >= m)
                 & (mx[..., 0] < w - m) & (mx[..., 1] < h - m))
    valid = angle_ok & bounds_ok

    # grid: p(yy, xx) = tl + xx*dx + yy*dy  (PatchOptimizer.cpp:511-524)
    ii = jnp.arange(PATCH_SIZE, dtype=c2.dtype)
    gx = (tl[..., None, None, 0] + ii[None, :] * dx[..., None, None, 0]
          + ii[:, None] * dy[..., None, None, 0])
    gy = (tl[..., None, None, 1] + ii[None, :] * dx[..., None, None, 1]
          + ii[:, None] * dy[..., None, None, 1])
    gx = gx.reshape(gx.shape[:-2] + (PATCH_SIZE * PATCH_SIZE,))
    gy = gy.reshape(gy.shape[:-2] + (PATCH_SIZE * PATCH_SIZE,))

    # clamp so invalid patches still gather in-bounds (masked out by `valid`)
    gx = jnp.clip(gx, 0.0, jnp.maximum(w[..., None] - 2.0, 0.0))
    gy = jnp.clip(gy, 0.0, jnp.maximum(h[..., None] - 2.0, 0.0))

    tex = bilinear(imgs.tex, imgs.row0, imgs.width,
                   ci[..., None], level[..., None], gx, gy)  # (..., 49, 3)
    return normalize_tex(tex), valid


def normalize_tex(tex):
    """Patch2d::normalize (Patch2d.hpp:46-84): per-channel mean removal,
    global std division."""
    mean = jnp.mean(tex, axis=-2, keepdims=True)             # per channel
    centered = tex - mean
    var = jnp.sum(centered * centered, axis=(-1, -2), keepdims=True) / N_TEXELS
    std = jnp.sqrt(var)
    std = jnp.where(std == 0.0, 1.0, std)
    return centered / std


def ncc(tex_a, tex_b):
    """Patch2d::dot (Patch2d.hpp:37-44): mean of elementwise product."""
    return jnp.sum(tex_a * tex_b, axis=(-1, -2)) / N_TEXELS


def robust_incc(x):
    """robustincc r/(1+3r) (PatchOptimizer.h:92-98)."""
    return x / (1.0 + 3.0 * x)


def np_reference_sample(tex_plane: np.ndarray, P: np.ndarray, cam_center,
                        cam_xaxis, cam_yaxis, center, normal, scale,
                        max_angle_cos: float):
    """Tiny NumPy reimplementation of the reference sampling math for tests.

    tex_plane: (H, W, 3) image at the chosen level; P: (3, 4) projection at
    that level. Level selection is the caller's job. Scalar, unbatched, written
    directly from PatchOptimizer.cpp:476-529 semantics for golden comparison.
    """
    z = np.asarray(normal, dtype=np.float64)
    z = z / np.linalg.norm(z)
    ray = np.asarray(cam_center) - np.asarray(center)
    ray = ray / np.linalg.norm(ray)
    if float(ray @ z) < max_angle_cos:
        return None
    y = np.cross(z, cam_xaxis)
    y /= np.linalg.norm(y)
    x = np.cross(y, z)
    x /= np.linalg.norm(x)
    x = x * scale
    ys = y * scale
    cy = cam_yaxis / np.linalg.norm(cam_yaxis)
    ys = ys * float(y @ cy)

    def proj(p):
        ph = P @ np.append(p, 1.0)
        return ph[:2] / ph[2]

    c2 = proj(center)
    dx = proj(center + x) - c2
    dy = proj(center + ys) - c2
    half = 3.5
    corners = [c2 - half * dx - half * dy, c2 + half * dx - half * dy,
               c2 - half * dx + half * dy, c2 + half * dx + half * dy]
    mn = np.min(corners, axis=0)
    mx = np.max(corners, axis=0)
    h, w = tex_plane.shape[:2]
    if mn[0] < 3 or mn[1] < 3 or mx[0] >= w - 3 or mx[1] >= h - 3:
        return None
    tl = corners[0]
    out = np.zeros((7, 7, 3), dtype=np.float64)
    img = tex_plane.astype(np.float64)
    for yy in range(7):
        for xx in range(7):
            px, py = tl + xx * dx + yy * dy
            lx, ly = int(px), int(py)
            fx, fy = px - lx, py - ly
            out[yy, xx] = (img[ly, lx] * (1 - fx) * (1 - fy)
                           + img[ly, lx + 1] * fx * (1 - fy)
                           + img[ly + 1, lx] * (1 - fx) * fy
                           + img[ly + 1, lx + 1] * fx * fy)
    flat = out.reshape(49, 3)
    mean = flat.mean(axis=0)
    centered = flat - mean
    std = np.sqrt((centered ** 2).sum() / 147.0)
    if std == 0:
        std = 1.0
    return (centered / std).reshape(7, 7, 3)
