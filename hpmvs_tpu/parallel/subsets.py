"""Per-block image subsets: each octree block holds only the images whose
cameras can see it.

This is the missing half of the reference's subtree decomposition: a
CellProcessor's subtree only ever touches the images its patches reference
(main.cpp:50-96 gives each subtree view the shared Scene, but the working
set per subtree is its cameras' frusta). At multi-host scale the replicated
image pack is the HBM ceiling -- a city-scale scene's pyramids do not fit
one chip -- so the spatial engine can shard the pack by block: device b
holds the row-slices of the packed pyramid buffer (image/pyramid.ImagePack)
for exactly the cameras whose frusta intersect block b's octants.

Correctness without view masking anywhere in the kernels: a patch resident
in block b projects in-bounds ONLY into cameras whose frustum intersects
b's AABB (the patch center lies inside it), and the assignment is
conservative (frustum-vs-octant-cube, unbounded when the camera plane cuts
the cube). Absent cameras get width = height = 0 in the block-local tables,
so every existing in-bounds gate (sampling, windows, view growth) rejects
them with no new code paths. Depth/visibility gates keep the GLOBAL image
dims (optimize_and_gate gate_imgs): the reference's depth tests run over
all images (Scene.cpp:610-644).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hpmvs_tpu.config import Options
from hpmvs_tpu.core import depth as depth_mod
from hpmvs_tpu.core.octree import morton_encode
from hpmvs_tpu.image.pyramid import ImagePack
from hpmvs_tpu.ops import optimizer as popt


class BlockImagePack(NamedTuple):
    """Per-block row-slices of the global ImagePack, stacked + padded to the
    largest block (leading dim = n_blocks, sharded over the mesh)."""
    tex: np.ndarray     # (n_blocks, rows_b, W, 3)
    texb: np.ndarray    # (n_blocks, rows_b, nblk, 128)
    row0: np.ndarray    # (n_blocks, ncam, nlevel) int32 (0 when absent)
    width: np.ndarray   # (n_blocks, ncam, nlevel) int32 (0 when absent)
    height: np.ndarray  # (n_blocks, ncam, nlevel) int32 (0 when absent)
    mask: np.ndarray    # (n_blocks, ncam) bool


def assign_images_to_blocks(cams, img_w0, img_h0, root_center: np.ndarray,
                            root_width: float, n_blocks: int,
                            block_level: int, near: np.ndarray = None,
                            far: np.ndarray = None,
                            oct_level: int = None,
                            occ_oct: np.ndarray = None) -> np.ndarray:
    """(n_blocks, ncam) bool: camera c's frustum intersects block b.

    Blocks are the contiguous Morton ranges of runtime/spatial.py
    (block = key * n_blocks >> 3L); each is a union of level-L octant
    cubes. Test: project the 8 corners of each octant cube with the
    level-0 P; the camera sees the cube if the corner hull's bbox meets
    the image rect, conservatively unbounded when corners straddle the
    camera plane. Cameras behind every corner are excluded.

    near/far: optional per-camera depth bounds (from the camera's SfM
    measurement depth range) truncating the otherwise infinite pyramid --
    without them, every block BEYOND the observed surface still intersects
    the frustum and spatially-distributed captures save no HBM.

    oct_level/occ_oct: optional FINER test grid (oct_level >= block_level)
    with an occupancy mask at that grid -- the frustum intersection then
    only counts octants that actually hold reconstruction (a ground-plane
    capture occupies a thin z-slab; testing whole blocks charges every
    camera whose cone grazes the block's empty volume). occ_oct is
    (8^oct_level,) in Morton order."""
    P0 = np.asarray(cams.P)[:, 0]                      # (ncam, 3, 4)
    ncam = P0.shape[0]
    L = oct_level if oct_level is not None else block_level
    assert L >= block_level
    g = 1 << L
    ix, iy, iz = np.meshgrid(np.arange(g), np.arange(g), np.arange(g),
                             indexing="ij")
    ix, iy, iz = ix.ravel(), iy.ravel(), iz.ravel()
    keys = morton_encode(ix.astype(np.uint64), iy.astype(np.uint64),
                         iz.astype(np.uint64))
    blk = ((keys >> np.uint64(3 * (L - block_level))).astype(np.int64)
           * n_blocks) >> (3 * block_level)
    cw = root_width / g
    lo = (root_center - root_width / 2.0)
    # octant corner grid: (ncell, 8, 3)
    base = lo[None, :] + np.stack([ix, iy, iz], 1) * cw
    corner = np.array([[dx, dy, dz] for dx in (0, 1) for dy in (0, 1)
                       for dz in (0, 1)], np.float64) * cw
    pts = base[:, None, :] + corner[None]              # (ncell, 8, 3)
    hom = np.concatenate([pts, np.ones_like(pts[..., :1])], -1)
    proj = np.einsum("cij,nkj->cnki", P0, hom)         # (ncam, ncell, 8, 3)
    z = proj[..., 2]
    front = z > 1e-9                                   # (ncam, ncell, 8)
    any_front = front.any(-1)
    straddle = any_front & (~front).any(-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        x = proj[..., 0] / z
        y = proj[..., 1] / z
    big = 1e12
    x = np.where(front, x, np.nan)
    y = np.where(front, y, np.nan)
    xmin = np.where(straddle, -big, np.nanmin(np.where(front, x, np.inf), -1))
    xmax = np.where(straddle, big, np.nanmax(np.where(front, x, -np.inf), -1))
    ymin = np.where(straddle, -big, np.nanmin(np.where(front, y, np.inf), -1))
    ymax = np.where(straddle, big, np.nanmax(np.where(front, y, -np.inf), -1))
    w = np.asarray(img_w0, np.float64)[:, None]
    h = np.asarray(img_h0, np.float64)[:, None]
    sees = any_front & (xmax >= 0) & (xmin < w) & (ymax >= 0) & (ymin < h)
    if near is not None and far is not None:
        zmin = np.where(front, z, np.inf).min(-1)      # (ncam, ncell)
        zmax = np.where(front, z, -np.inf).max(-1)
        bounded = np.isfinite(np.asarray(near)) & np.isfinite(np.asarray(far))
        depth_ok = ((zmax >= np.asarray(near)[:, None])
                    & (zmin <= np.asarray(far)[:, None]))
        sees &= depth_ok | ~bounded[:, None]
    if occ_oct is not None:
        occ = np.asarray(occ_oct, bool)[keys.astype(np.int64)]
        sees &= occ[None, :]
    mask = np.zeros((n_blocks, ncam), bool)
    for b in range(n_blocks):
        mask[b] = sees[:, blk == b].any(1)
    return mask


def camera_depth_bounds(cams, model, lo: float = 0.5, hi: float = 1.8):
    """Per-camera frustum depth bounds from the SfM measurement depths:
    [lo*min_depth, hi*max_depth]. Cameras with no measurements stay
    unbounded (inf markers). The working set of a camera is where its
    observed structure lives -- reconstruction densifies around the sparse
    points, so a generous margin around their depth range bounds it."""
    ncam = len(model.cameras)
    near = np.full(ncam, np.inf)
    far = np.full(ncam, -np.inf)
    if model.n_points == 0:
        return near, far
    P0 = np.asarray(cams.P)[:, 0]                     # (ncam, 3, 4)
    pt_idx = np.repeat(np.arange(model.n_points),
                       np.diff(model.meas_start))
    ci = np.asarray(model.meas_img)
    pts = np.asarray(model.points_xyz)[pt_idx]        # (M, 3)
    row2 = P0[ci, 2]                                  # (M, 4)
    z = (row2[:, :3] * pts).sum(1) + row2[:, 3]
    ok = z > 0
    np.minimum.at(near, ci[ok], z[ok])
    np.maximum.at(far, ci[ok], z[ok])
    with np.errstate(invalid="ignore"):
        near = near * lo
        far = far * hi
    far[~np.isfinite(far)] = -np.inf
    return near, far


def slab_rows(heights: np.ndarray, mask: np.ndarray) -> int:
    """Rows of the largest per-block slab for a given assignment mask."""
    rows_of = np.asarray(heights).sum(1)
    return max(int(max((rows_of * mask[b]).sum()
                       for b in range(mask.shape[0]))), 1)


def build_block_packs(imgs: ImagePack, mask: np.ndarray,
                      rows_b: int = None) -> BlockImagePack:
    """Slice the global packed pyramid buffer into per-block slabs.

    rows_b: slab height override -- owned multi-host passes the global max
    (a process cannot know remote shards' dynamic unions, only its own)."""
    n_blocks, ncam = mask.shape
    nlevel = imgs.row0.shape[1]
    g_row0 = np.asarray(imgs.row0)
    g_w = np.asarray(imgs.width)
    g_h = np.asarray(imgs.height)
    rows_of = g_h.sum(1)                                # rows per camera
    if rows_b is None:
        rows_b = slab_rows(g_h, mask)
    rows_b = max(int(rows_b), 1)
    tex = np.zeros((n_blocks, rows_b) + imgs.tex.shape[1:], imgs.tex.dtype)
    texb = np.zeros((n_blocks, rows_b) + imgs.texb.shape[1:],
                    imgs.texb.dtype)
    row0 = np.zeros((n_blocks, ncam, nlevel), np.int32)
    width = np.zeros((n_blocks, ncam, nlevel), np.int32)
    height = np.zeros((n_blocks, ncam, nlevel), np.int32)
    for b in range(n_blocks):
        pos = 0
        for c in range(ncam):
            if not mask[b, c]:
                continue
            n = int(rows_of[c])
            src = int(g_row0[c, 0])
            tex[b, pos:pos + n] = imgs.tex[src:src + n]
            texb[b, pos:pos + n] = imgs.texb[src:src + n]
            row0[b, c] = g_row0[c] - src + pos
            width[b, c] = g_w[c]
            height[b, c] = g_h[c]
            pos += n
    return BlockImagePack(tex=tex, texb=texb, row0=row0, width=width,
                          height=height, mask=mask)


def device_put_block_pack(mesh: Mesh, bpack: BlockImagePack):
    """Commit the block slabs to the mesh, sharded on the leading (block)
    dim -- done once; subsequent dispatches pass the committed arrays with
    a matching sharding, so nothing re-transfers."""
    sh = NamedSharding(mesh, P(("dp", "sp")))

    def put(a):
        a = np.asarray(a)
        # make_array_from_callback works in multi-controller too (each
        # process supplies its addressable block shards from the replicated
        # host copy); device_put with a cross-process sharding does not
        return jax.make_array_from_callback(a.shape, sh, lambda i: a[i])

    return BlockImagePack(*(put(a) for a in bpack))


def _local_imgs(tex, texb, row0, w, h):
    return ImagePack(tex=tex[0], texb=texb[0], row0=row0[0], width=w[0],
                     height=h[0])


def sharded_optimize_and_gate_subset(mesh: Mesh, ctx: popt.SceneCtx,
                                     opt: Options,
                                     pack: depth_mod.DepthPack,
                                     n_images: int, pack_layout=None):
    """sharded_optimize_and_gate twin with per-shard image slabs, over the
    packed row layout (one (B, 11+K) f32 batch in/out + replicated pend
    window, ops/optimizer.py packed-dispatch note). The geometric gates
    (depthTests / viewBlockTest / pixelFreeTests) keep the GLOBAL image
    dims via gate_imgs: visibility is scene-wide even when the texture
    working set is block-local."""
    def body(xin, depth, pend, tex, texb, row0, wd, ht):
        local = pack._replace(depth=depth)
        lctx = ctx._replace(imgs=_local_imgs(tex, texb, row0, wd, ht))
        return popt.optimize_and_gate_packed.__wrapped__(
            lctx, local, opt, n_images, xin, pend, gate_imgs=ctx.imgs,
            pack_layout=pack_layout)

    spec = P(("dp", "sp"))
    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec, P(), P()) + (spec,) * 5,
                   out_specs=(spec, P()),
                   check_vma=False)
    return jax.jit(fn), mesh.devices.size
