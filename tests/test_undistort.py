"""VisualSFM radial undistortion (Image.cpp:68-149): both closed-form
branches (k1 > 0 real cube root, k1 < 0 complex) must invert the forward
distortion model u = d * (1 + k1 |d|^2) (normalized coords)."""

import numpy as np

from hpmvs_tpu.image import pyramid as pyr
from hpmvs_tpu.testing import smooth_texture


def _distort_image(clean: np.ndarray, f: float, k1: float) -> np.ndarray:
    """Synthesize a distorted capture: distorted[d] = clean[d (1+k1|d|^2)]."""
    h, w = clean.shape[:2]
    iy, ix = np.mgrid[0:h, 0:w]
    dx = (ix - w / 2.0) / f
    dy = (iy - h / 2.0) / f
    r2 = dx * dx + dy * dy
    ux = dx * (1.0 + k1 * r2) * f + w / 2.0
    uy = dy * (1.0 + k1 * r2) * f + h / 2.0
    ux = np.clip(ux, 0, w - 2)
    uy = np.clip(uy, 0, h - 2)
    x0 = ux.astype(np.int64)
    y0 = uy.astype(np.int64)
    fx = (ux - x0)[..., None]
    fy = (uy - y0)[..., None]
    cf = clean.astype(np.float64)
    out = (cf[y0, x0] * (1 - fx) * (1 - fy) + cf[y0, x0 + 1] * fx * (1 - fy)
           + cf[y0 + 1, x0] * (1 - fx) * fy + cf[y0 + 1, x0 + 1] * fx * fy)
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def test_identity_for_zero_k1():
    rng = np.random.default_rng(0)
    img = smooth_texture(rng, 128).astype(np.uint8)
    assert pyr.undistort_vsfm(img, 150.0, 0.0) is img


def _roundtrip(k1):
    rng = np.random.default_rng(1)
    clean = np.clip(smooth_texture(rng, 256) + 0.5, 0, 255).astype(np.uint8)
    f = 300.0
    distorted = _distort_image(clean, f, k1)
    recovered = pyr.undistort_vsfm(distorted, f, k1)
    # interior comparison (borders lose data to the distortion warp)
    m = 40
    a = recovered[m:-m, m:-m].astype(np.float64)
    b = clean[m:-m, m:-m].astype(np.float64)
    err = np.abs(a - b).mean()
    assert err < 3.0, f"k1={k1}: mean abs err {err}"


def test_positive_k1_branch():
    _roundtrip(0.12)


def test_negative_k1_branch():
    _roundtrip(-0.08)
