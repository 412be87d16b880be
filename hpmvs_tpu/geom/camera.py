"""Batched pinhole camera model with per-pyramid-level projections.

Behavioral equivalent of the reference Camera (include/hpmvs/Camera.h:29-106,
src/hpmvs/Camera.cpp:34-99): K[R|t] built from the NVM quaternion + center,
principal point at the image center, per-level projection matrices with rows
0,1 halved per level, scale/level conversions based on fx+fy, and the camera
frame axes (xAxis/yAxis/zAxis/oAxis).

TPU-first design: all cameras live in one structure-of-arrays pytree and every
operation is batched/vmappable -- a "camera index" is data, not an object.
Projection of B points into B cameras is a single (B,3,4) x (B,4) contraction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class Cameras(NamedTuple):
    """Structure-of-arrays over all cameras of the scene."""
    P: jnp.ndarray        # (ncam, nlevel, 3, 4) projection per level
    center: jnp.ndarray   # (ncam, 3) optical center
    fsum: jnp.ndarray     # (ncam,) fx + fy at level 0 (Camera.cpp:85)
    xaxis: jnp.ndarray    # (ncam, 3) image x axis (unit)
    yaxis: jnp.ndarray    # (ncam, 3) image y axis (unit)
    zaxis: jnp.ndarray    # (ncam, 3) optical axis (unit)
    oaxis: jnp.ndarray    # (ncam, 4) normalized P row 2 (plane through center)
    ipscale: jnp.ndarray  # (ncam,) average pixel scale

    @property
    def n_cameras(self) -> int:
        return self.P.shape[0]

    @property
    def n_levels(self) -> int:
        return self.P.shape[1]


def _quat_to_R(rq: np.ndarray) -> np.ndarray:
    """Rotation matrix from w,x,y,z quaternion (Eigen convention)."""
    w, x, y, z = rq / np.linalg.norm(rq)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def build_cameras(nvm_cameras, widths, heights, max_level: int) -> Cameras:
    """Host-side construction from parsed NVM cameras (Camera.cpp:34-81).

    widths/heights: per-camera level-0 image sizes (after undistortion).
    """
    ncam = len(nvm_cameras)
    nlevel = max_level + 1
    P = np.zeros((ncam, nlevel, 3, 4), dtype=np.float32)
    center = np.zeros((ncam, 3), dtype=np.float32)
    fsum = np.zeros((ncam,), dtype=np.float32)
    xaxis = np.zeros((ncam, 3), dtype=np.float32)
    yaxis = np.zeros((ncam, 3), dtype=np.float32)
    zaxis = np.zeros((ncam, 3), dtype=np.float32)
    oaxis = np.zeros((ncam, 4), dtype=np.float32)
    ipscale = np.zeros((ncam,), dtype=np.float32)

    for ii, cam in enumerate(nvm_cameras):
        w, h = widths[ii], heights[ii]
        K = np.array([[cam.f, 0, w / 2.0],
                      [0, cam.f, h / 2.0],
                      [0, 0, 1]], dtype=np.float64)
        R = _quat_to_R(np.asarray(cam.rq, dtype=np.float64))
        Rt = np.zeros((3, 4), dtype=np.float64)
        Rt[:, :3] = R
        Rt[:, 3] = -R @ np.asarray(cam.c, dtype=np.float64)
        P0 = (K @ Rt).astype(np.float32)

        for lv in range(nlevel):
            scl = np.array([[0.5 ** lv], [0.5 ** lv], [1.0]], dtype=np.float32)
            P[ii, lv] = P0 * scl

        center[ii] = np.asarray(cam.c, dtype=np.float32)
        fsum[ii] = 2.0 * cam.f
        oaxis_row = P0[2].astype(np.float64)
        oaxis[ii] = (oaxis_row / np.linalg.norm(oaxis_row[:3])).astype(np.float32)
        z = oaxis[ii, :3].astype(np.float64)
        x = P0[0, :3].astype(np.float64)
        y = np.cross(z, x)
        y /= np.linalg.norm(y)
        x = np.cross(y, z)
        x /= np.linalg.norm(x)
        xaxis[ii], yaxis[ii], zaxis[ii] = x, y, z
        ipscale[ii] = (np.linalg.norm(P0[0, :3]) + np.linalg.norm(P0[1, :3])) / 2.0

    return Cameras(P=jnp.asarray(P), center=jnp.asarray(center),
                   fsum=jnp.asarray(fsum), xaxis=jnp.asarray(xaxis),
                   yaxis=jnp.asarray(yaxis), zaxis=jnp.asarray(zaxis),
                   oaxis=jnp.asarray(oaxis), ipscale=jnp.asarray(ipscale))


# ---------------------------------------------------------------------------
# Batched camera ops. All take arrays of camera indices `ci` and broadcast.
# ---------------------------------------------------------------------------

def mult(cams: Cameras, ci, x3, level):
    """Raw projective transform, no checks (Camera.h:76-78).

    ci: (...,) int32; x3: (..., 3) world points; level: (...,) int32.
    Returns (..., 3) homogeneous image coordinates (u*w, v*w, w).
    """
    Pm = cams.P[ci, level]                       # (..., 3, 4)
    xh = jnp.concatenate([x3, jnp.ones_like(x3[..., :1])], axis=-1)
    return jnp.einsum("...ij,...j->...i", Pm, xh)


def project(cams: Cameras, ci, x3, level):
    """Project with behind-camera flagging (Camera.h:45-62).

    Returns (..., 3): (u, v, w) with perspective division applied; points with
    w <= 0 map to (-0xffff, -0xffff, -1) exactly like the reference.
    """
    r = mult(cams, ci, x3, level)
    w = r[..., 2:3]
    ok = w[..., 0] > 0.0
    uv = r[..., :2] / jnp.where(ok[..., None], w, 1.0)
    bad = jnp.asarray([-float(0xffff), -float(0xffff)], dtype=uv.dtype)
    uv = jnp.where(ok[..., None], uv, bad)
    wout = jnp.where(ok, jnp.ones_like(r[..., 2]), -jnp.ones_like(r[..., 2]))
    return jnp.concatenate([uv, wout[..., None]], axis=-1)


def get_scale(cams: Cameras, ci, x3, level):
    """3D footprint of one pixel at `level` seen from camera ci (Camera.cpp:83-90)."""
    fz = jnp.linalg.norm(x3 - cams.center[ci], axis=-1)
    ftmp = cams.fsum[ci]
    lv = jnp.asarray(level)
    return jnp.where(ftmp == 0.0, 1.0,
                     2.0 * fz * (2.0 ** lv).astype(fz.dtype) / ftmp)


def get_level(cams: Cameras, ci, x3, scale):
    """Continuous pyramid level whose pixel footprint matches `scale`
    (Camera.cpp:92-95)."""
    fz = jnp.linalg.norm(x3 - cams.center[ci], axis=-1)
    return jnp.log2(scale * cams.fsum[ci] / (2.0 * fz))


def get_leveli(cams: Cameras, ci, x3, scale, max_level):
    """Rounded + clamped level (Camera.cpp:97-99)."""
    lv = jnp.round(get_level(cams, ci, x3, scale))
    lv = jnp.clip(lv, 0, max_level)
    return lv.astype(jnp.int32)


def get_level_fit(cams: Cameras, ci, x3, scale, max_level, win_w: int,
                  patch: float = 7.0):
    """Window-fitting sampling level: the reference's rounded level
    (get_leveli) bumped one coarser when the patch grid's pixel span at the
    rounded level cannot fit the cached window with a drift margin.

    Window-cache sampling (ops/windows.py) is a TPU-native construct with a
    hard per-view footprint bound -- the window width -- that the
    reference's direct full-image gathers (PatchOptimizer.cpp:476-529) do
    not have. At fractional levels just under the rounding threshold the
    7x7 grid spans patch * 2^0.5 ~ 9.9 px, which cannot sit inside a 12 px
    window once the integer window origin and optimizer drift consume the
    rest; the coverage gate then voids the view. Bumping such lanes one
    level coarser samples at ~70% of the nominal rate but keeps them valid
    (measured on the ring stress scene: extend acceptance 0.3% -> ~50%
    purely from this rule). Documented divergence: views whose fractional
    level lies in (log2((W-3)/patch), 0.5) sample one level coarser than
    the reference would."""
    import math
    raw = get_level(cams, ci, x3, scale)
    lv = jnp.round(raw)
    thresh = math.log2(max((win_w - 3.0) / patch, 1.001))
    lv = jnp.where(raw - lv > thresh, lv + 1.0, lv)
    return jnp.clip(lv, 0, max_level).astype(jnp.int32)
