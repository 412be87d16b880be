"""Image loading, VisualSFM radial undistortion, pyramid build and device packing.

Behavioral equivalent of the reference Image (include/hpmvs/Image.h:54-115,
src/hpmvs/Image.cpp:34-149): JPEG decode, optional 1-parameter radial
undistortion with the closed-form inversion (including the complex branch for
k1 < 0), and a half-resolution pyramid of MAXLEVEL+1 levels.

TPU-first design: instead of per-image CImg objects with raw-pointer bilinear
fetches, every (image, level) plane is packed into ONE flat channel-planar
device buffer `tex (3, total_px)` with an offset/width/height table, so that
NCC texture sampling for thousands of patches is a single batched gather.
(The reference's interleaved-storage getWidth/getHeight quirk, Image.h:63-64,
is an internal detail we drop: here width/height mean what they say.)
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np


class ImagePack(NamedTuple):
    """All image pyramids packed into one tall 2D buffer (device-ready).

    Every (image, level) plane occupies rows [row0, row0+H) of `tex`, columns
    [0, W). The 2D layout lets window fetches (ops/windows.py) lower to one
    XLA gather with large contiguous slices -- near-bandwidth HBM traffic --
    instead of millions of per-texel gathers.
    """
    tex: np.ndarray      # (total_rows, max_width, 3) float32, values 0..255
    texb: np.ndarray     # (total_rows, nblk, 128) float32: the same rows with
                         # interleaved x*3+c floats grouped into 128-wide
                         # blocks -- the Mosaic-sliceable layout the pallas
                         # window-fetch DMA kernel reads (minor dim always
                         # full, so slices are tile-aligned)
    row0: np.ndarray     # (ncam, nlevel) int32 starting row of each plane
    width: np.ndarray    # (ncam, nlevel) int32
    height: np.ndarray   # (ncam, nlevel) int32

    @property
    def n_cameras(self) -> int:
        return self.row0.shape[0]

    @property
    def n_levels(self) -> int:
        return self.row0.shape[1]


def load_image(path: str) -> np.ndarray:
    """Decode an image file to (H, W, 3) uint8.

    PIL formats (JPEG/PNG/...) plus the benchmark raw format 'HPI1'
    (bench/export_scene.py: magic + int32 w,h + uint8 RGB), which both the
    CPU full-loop baseline and this pipeline read so e2e comparisons see
    bit-identical pixels."""
    with open(path, "rb") as fh:
        magic = fh.read(4)
        if magic == b"HPI1":
            import struct
            w, h = struct.unpack("<ii", fh.read(8))
            buf = np.frombuffer(fh.read(w * h * 3), np.uint8)
            return buf.reshape(h, w, 3).copy()
    from PIL import Image as PILImage
    img = PILImage.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def undistort_vsfm(img: np.ndarray, f: float, k1: float) -> np.ndarray:
    """VisualSFM 1-parameter radial undistortion (Image.cpp:68-149).

    Closed-form inversion of the distortion model, vectorized over all pixels;
    k1 > 0 uses the real cube-root branch, k1 < 0 the complex branch.
    Pixels whose distorted source falls outside the image keep value 0,
    matching the reference (which leaves them uninitialized-black).
    """
    if k1 == 0:
        return img
    h, w = img.shape[:2]
    iy, ix = np.mgrid[0:h, 0:w]
    y = (iy - h / 2.0) / f
    x = (ix - w / 2.0) / f
    y = np.where(y == 0, 1e-3, y)

    t2 = y * y
    t3 = t2 * t2 * t2
    t4 = x * x
    t7 = k1 * (t2 + t4)
    if k1 > 0:
        t8 = 1.0 / t7
        t10 = t3 / (t7 * t7)
        t14 = np.sqrt(t10 * (0.25 + t8 / 27.0))
        t15 = t2 * t8 * y * 0.5
        t17 = np.cbrt(t14 + t15)
        t18 = t17 - t2 * t8 / (t17 * 3.0)
        mx = t18 * x / y
        my = t18
    else:
        t9 = t3 / (t7 * t7 * 4.0)
        t11 = t3 / (t7 * t7 * t7 * 27.0)
        t12 = (t9 + t11).astype(np.complex128)
        t13 = np.sqrt(t12)
        t14 = t2 / t7
        t15 = t14 * y * 0.5
        t16 = t13 + t15
        t17 = t16 ** (1.0 / 3.0)
        t18 = (t17 + t14 / (t17 * 3.0)) * complex(0.0, np.sqrt(3.0))
        t19 = -0.5 * (t17 + t18) + t14 / (t17 * 6.0)
        mx = t19.real * x / y
        my = t19.real

    sx = mx * f + w / 2.0
    sy = my * f + h / 2.0

    valid = (sx > 1) & (sx < w - 1) & (sy > 1) & (sy < h - 1)
    sx = np.clip(sx, 0, w - 2)
    sy = np.clip(sy, 0, h - 2)
    x0 = np.floor(sx).astype(np.int64)
    y0 = np.floor(sy).astype(np.int64)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    imgf = img.astype(np.float32)
    out = (imgf[y0, x0] * (1 - fx) * (1 - fy) + imgf[y0, x0 + 1] * fx * (1 - fy)
           + imgf[y0 + 1, x0] * (1 - fx) * fy + imgf[y0 + 1, x0 + 1] * fx * fy)
    out = np.where(valid[..., None], out, 0.0)
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def build_pyramid(img: np.ndarray, n_levels: int) -> list[np.ndarray]:
    """Half-resolution pyramid via 2x2 box average (Image.cpp:56-57).

    The reference uses CImg get_resize_halfXY on uint8; a 2x2 mean is the
    behavioral equivalent (documented divergence: rounding detail).
    """
    levels = [img]
    for _ in range(n_levels - 1):
        prev = levels[-1]
        h2, w2 = max(1, prev.shape[0] // 2), max(1, prev.shape[1] // 2)
        crop = prev[: h2 * 2, : w2 * 2].astype(np.float32)
        half = (crop[0::2, 0::2] + crop[1::2, 0::2]
                + crop[0::2, 1::2] + crop[1::2, 1::2]) / 4.0
        levels.append(np.clip(half + 0.5, 0, 255).astype(np.uint8))
    return levels


def pack_pyramids(pyramids: Sequence[Sequence[np.ndarray]]) -> ImagePack:
    """Pack per-image pyramids into one tall 2D float32 buffer."""
    ncam = len(pyramids)
    nlevel = len(pyramids[0])
    row0 = np.zeros((ncam, nlevel), dtype=np.int32)
    width = np.zeros((ncam, nlevel), dtype=np.int32)
    height = np.zeros((ncam, nlevel), dtype=np.int32)
    wmax = max(p.shape[1] for pyr in pyramids for p in pyr)
    pos = 0
    for ci in range(ncam):
        for lv in range(nlevel):
            im = pyramids[ci][lv]
            row0[ci, lv] = pos
            height[ci, lv], width[ci, lv] = im.shape[:2]
            pos += im.shape[0]
    tex = np.zeros((pos, wmax, 3), dtype=np.float32)
    for ci in range(ncam):
        for lv in range(nlevel):
            im = pyramids[ci][lv]
            h, w = im.shape[:2]
            tex[row0[ci, lv]:row0[ci, lv] + h, :w] = im
    # block-interleaved copy for the DMA fetch kernel (+1 spare block so a
    # 2-block slab starting at the last real block stays in bounds).
    # (f32, not bf16: Mosaic requires DMA slices of packed-dtype memrefs to
    # be tile-aligned on the block dim, and the window fetch is DMA-issue
    # latency-bound, not bandwidth-bound -- measured no win from fewer bytes)
    nblk = -(-(wmax * 3) // 128) + 1
    texb = np.zeros((pos, nblk * 128), dtype=np.float32)
    texb[:, :wmax * 3] = tex.reshape(pos, wmax * 3)
    texb = texb.reshape(pos, nblk, 128)
    return ImagePack(tex=tex, texb=texb, row0=row0, width=width,
                     height=height)


def load_scene_images(nvm_cameras, n_levels: int,
                      workers: int = 0) -> ImagePack:
    """Load + undistort + pyramid all cameras, in parallel on the host
    (the reference uses an OpenMP loop here, Scene.cpp:60-85)."""
    import concurrent.futures as cf
    import os

    def one(cam):
        img = load_image(cam.filename)
        if cam.r != 0:
            img = undistort_vsfm(img, cam.f, cam.r)
        return build_pyramid(img, n_levels)

    if workers == 0:
        workers = min(len(nvm_cameras), (os.cpu_count() or 2) * 2)
    if workers <= 1 or len(nvm_cameras) <= 1:
        pyramids = [one(c) for c in nvm_cameras]
    else:
        with cf.ThreadPoolExecutor(max_workers=workers) as ex:
            pyramids = list(ex.map(one, nvm_cameras))
    return pack_pyramids(pyramids)
