"""Scene assembly: cameras + packed images + covisibility + seed patches.

Equivalent of the reference Scene init path (src/hpmvs/Scene.cpp:42-208,
241-298): addCameras (image load + camera init), extractCoVisiblilty
(images sharing >= 50 SfM points), and initPatches (per-SfM-point seed
creation + first optimization).

TPU-first: seeds are created as one structure-of-arrays batch and refined by
a single optimize_batch call instead of an OpenMP loop over points
(Scene.cpp:114-178).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from hpmvs_tpu.config import Options
from hpmvs_tpu.geom import camera as cam_ops
from hpmvs_tpu.geom.triangulation import triangulate_midpoint
from hpmvs_tpu.image import pyramid as pyr
from hpmvs_tpu.io import nvm as nvm_io
from hpmvs_tpu.ops import optimizer as popt


class Scene(NamedTuple):
    ctx: popt.SceneCtx       # device-side context (cams, imgs, covis)
    covis_np: np.ndarray     # (ncam, C) host copy, -1 padded
    ncovis_np: np.ndarray    # (ncam,)
    n_cameras: int
    width_np: np.ndarray = None   # (ncam, nlevel) host copies of image dims
    height_np: np.ndarray = None


def extract_covisibility(model: nvm_io.NvmModel, opt: Options,
                         visdata_path: Optional[str] = None) -> np.ndarray:
    """Scene::extractCoVisiblilty (Scene.cpp:241-298): pair counts of shared
    SfM points; covisible if >= COVIS_MIN_POINTS. Returns (ncam, C) padded."""
    ncam = len(model.cameras)
    vis = np.zeros((ncam, ncam), dtype=np.int64)
    for ii in range(model.n_points):
        s, e = model.meas_start[ii], model.meas_start[ii + 1]
        ids = model.meas_img[s:e]
        np.add.at(vis, (ids[:, None], ids[None, :]), 1)
    np.fill_diagonal(vis, 0)

    covis_lists = [np.nonzero(vis[ii] >= opt.COVIS_MIN_POINTS)[0]
                   for ii in range(ncam)]
    cmax = max(1, min(opt.MAX_COVIS, max((len(c) for c in covis_lists),
                                         default=1)))
    covis = np.full((ncam, cmax), -1, dtype=np.int32)
    for ii, lst in enumerate(covis_lists):
        # keep the most-covisible candidates if the list overflows the slots
        if len(lst) > cmax:
            order = np.argsort(-vis[ii][lst], kind="stable")
            lst = lst[order[:cmax]]
        covis[ii, :len(lst)] = np.sort(lst)

    if visdata_path is not None:
        # PMVS-style VISDATA debug dump (Scene.cpp:279-293)
        with open(visdata_path, "w") as fh:
            fh.write("VISDATA\n")
            fh.write(f"{ncam}\n")
            for ii in range(ncam):
                lst = covis[ii][covis[ii] >= 0]
                fh.write(f"{ii} {len(lst)}")
                for jj in lst:
                    fh.write(f" {jj}")
                fh.write("\n")
    return covis


def _chunked_put(a: np.ndarray, chunk_bytes: int = 64 << 20):
    """Flow-controlled device upload: large single transfers can wedge
    tunneled TPU backends, so stage in ~64MB row slices."""
    nbytes = a.size * a.itemsize
    if nbytes <= chunk_bytes:
        return jnp.asarray(a)
    rows_per = max(1, int(chunk_bytes // max(a[0:1].size * a.itemsize, 1)))
    parts = []
    for i in range(0, a.shape[0], rows_per):
        p = jnp.asarray(a[i:i + rows_per])
        p.block_until_ready()
        parts.append(p)
    out = jnp.concatenate(parts, axis=0)
    out.block_until_ready()
    return out


def build_scene(model: nvm_io.NvmModel, opt: Options,
                images: Optional[list] = None,
                visdata_path: Optional[str] = None,
                host_pack: bool = False) -> Scene:
    """Load images, build cameras and the device scene context
    (Scene::addCameras, Scene.cpp:42-88).

    host_pack: keep the packed pyramid buffers (tex/texb) as host numpy --
    for per-block image subsets, where the replicated pack may exceed one
    chip's HBM and only the per-shard slabs ever land on device
    (parallel/subsets.py). The small dim tables still device-commit."""
    if images is None:
        imgs = pyr.load_scene_images(model.cameras, opt.n_levels)
    else:
        pyramids = [pyr.build_pyramid(im, opt.n_levels) for im in images]
        imgs = pyr.pack_pyramids(pyramids)

    widths = [int(imgs.width[ci, 0]) for ci in range(imgs.n_cameras)]
    heights = [int(imgs.height[ci, 0]) for ci in range(imgs.n_cameras)]
    cams = cam_ops.build_cameras(model.cameras, widths, heights, opt.MAXLEVEL)

    covis = extract_covisibility(model, opt, visdata_path)
    ncovis = (covis >= 0).sum(axis=1).astype(np.int32)

    ctx = popt.SceneCtx(
        cams=cams,
        imgs=imgs._replace(tex=(imgs.tex if host_pack
                                else _chunked_put(imgs.tex)),
                           texb=(imgs.texb if host_pack
                                 else _chunked_put(imgs.texb)),
                           row0=jnp.asarray(imgs.row0),
                           width=jnp.asarray(imgs.width),
                           height=jnp.asarray(imgs.height)),
        covis=jnp.asarray(covis),
        ncovis=jnp.asarray(ncovis),
    )
    return Scene(ctx=ctx, covis_np=covis, ncovis_np=ncovis,
                 n_cameras=len(model.cameras),
                 width_np=np.asarray(imgs.width),
                 height_np=np.asarray(imgs.height))


def scene_center_radius(cams: cam_ops.Cameras) -> Tuple[np.ndarray, float]:
    """Scene::getSceneCenter (Scene.cpp:210-239): midpoint triangulation of
    the optical axes; radius = max camera distance (reference uses max)."""
    origins = np.asarray(cams.center, dtype=np.float64)
    rays = np.asarray(cams.oaxis[:, :3], dtype=np.float64)
    rays = rays / np.linalg.norm(rays, axis=1, keepdims=True)
    center = triangulate_midpoint(origins, rays)
    dists = np.linalg.norm(origins - center[None], axis=1)
    return center, float(np.max(dists))


def make_seed_patches(model: nvm_io.NvmModel, scene: Scene, opt: Options):
    """Seed creation from SfM points (Scene::initPatches, Scene.cpp:112-163):
    per-point visible-image list (projection in bounds at START_LEVEL with
    margin 2), normal toward the FIRST camera (Scene.cpp:159 overwrites the
    mean-direction computation), scale from camera 0 at START_LEVEL.

    Returns host numpy (centers, normals, scales, views) ready for
    optimize_batch, plus the original point positions for the drift gate.
    """
    npts = model.n_points
    K = opt.MAX_VIEWS
    cams = scene.ctx.cams
    widths = scene.width_np
    heights = scene.height_np

    cam_P = np.asarray(cams.P)           # (ncam, L, 3, 4)
    cam_center = np.asarray(cams.center)
    fsum = np.asarray(cams.fsum)

    sl = opt.START_LEVEL
    margin = opt.SEED_PROJ_MARGIN

    if opt.FILTER_SCENE_CENTER:
        ccenter, radius = scene_center_radius(cams)
    else:
        ccenter, radius = None, None

    centers, normals, scales, views_all, keep_idx = [], [], [], [], []
    for ii in range(npts):
        pt = model.points_xyz[ii]
        if ccenter is not None and np.linalg.norm(pt - ccenter) > radius:
            continue
        s, e = model.meas_start[ii], model.meas_start[ii + 1]
        if e - s < opt.MIN_IMAGES_PER_PATCH:
            continue
        vlist = []
        for mi in range(s, e):
            ci = int(model.meas_img[mi])
            if ci < 0:
                continue
            ph = cam_P[ci, sl] @ np.append(pt, 1.0)
            if ph[2] <= 0:
                continue
            u, v = ph[0] / ph[2], ph[1] / ph[2]
            if (u < margin or v < margin or u >= widths[ci, sl] - margin
                    or v >= heights[ci, sl] - margin):
                continue
            vlist.append(ci)
        if len(vlist) < 2:
            continue
        vlist = vlist[:K]
        n = cam_center[vlist[0]] - pt
        n = n / np.linalg.norm(n)
        fz = np.linalg.norm(pt - cam_center[vlist[0]])
        scale = 2.0 * fz * (1 << sl) / fsum[vlist[0]]

        centers.append(pt)
        normals.append(n)
        scales.append(scale)
        vrow = np.full((K,), -1, dtype=np.int32)
        vrow[:len(vlist)] = vlist
        views_all.append(vrow)
        keep_idx.append(ii)

    if not centers:
        z = np.zeros((0,))
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
                z.astype(np.float32), np.zeros((0, K), np.int32),
                np.zeros((0, 3), np.float32))
    return (np.asarray(centers, np.float32), np.asarray(normals, np.float32),
            np.asarray(scales, np.float32), np.stack(views_all),
            np.asarray(centers, np.float32).copy())
