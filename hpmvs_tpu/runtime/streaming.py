"""Progressive streaming input: grow the scene while reconstruction runs.

Capability beyond the reference (BASELINE.json internet-scale config:
"progressive streaming input"); hpmvs loads one NVM up front. Here camera +
point chunks arrive incrementally: images append to the packed pyramid,
covisibility accumulates, depth buffers extend in place (old buffers are a
prefix of the new packing), and new SfM points seed into the EXISTING octree
-- joining occupied cells as multi-patch entries that the wavefront engine's
filter pass resolves, exactly like colliding seeds in the reference's
add() (doctree.h:378-394).

The octree root cube grows on demand: seeds outside the current cube
trigger a linear-octree reroot (every Morton key gains one level; queue
priorities shift +10), so a scene growing spatially keeps reconstructing --
capability beyond the reference, which drops outside-root patches
(CellProcessor.cpp:147). Each reroot deepens all levels by one, trading
one step of the finest resolution against the doubled extent.
"""

from __future__ import annotations

import logging
from typing import List, Optional

import numpy as np

from hpmvs_tpu.config import Options
from hpmvs_tpu.core import depth as depth_mod
from hpmvs_tpu.core import scene as scene_mod
from hpmvs_tpu.io import nvm as nvm_io
from hpmvs_tpu.runtime.wavefront import Engine

log = logging.getLogger("hpmvs_tpu")


def merge_models(base: Optional[nvm_io.NvmModel],
                 chunk: nvm_io.NvmModel) -> nvm_io.NvmModel:
    """Concatenate cameras and points; chunk measurement camera indices are
    LOCAL to the chunk and get offset by the existing camera count."""
    if base is None:
        return chunk
    off = len(base.cameras)
    return nvm_io.NvmModel(
        cameras=list(base.cameras) + list(chunk.cameras),
        points_xyz=np.concatenate([base.points_xyz, chunk.points_xyz]),
        points_rgb=np.concatenate([base.points_rgb, chunk.points_rgb]),
        meas_start=np.concatenate(
            [base.meas_start,
             base.meas_start[-1] + chunk.meas_start[1:]]),
        meas_img=np.concatenate([base.meas_img, chunk.meas_img + off]),
        meas_feat=np.concatenate([base.meas_feat, chunk.meas_feat]),
        meas_xy=np.concatenate([base.meas_xy, chunk.meas_xy]),
    )


class StreamingEngine:
    """Incremental wrapper around the wavefront Engine.

    Composes with every flagship engine mode (the internet-scale config
    needs all of them at once, BASELINE.json): pass `mesh` for multi-chip
    sharding, `spatial=True` for Morton-block ownership + halo migration,
    `image_subsets=True` for per-shard image slabs. Scene rebuilds on chunk
    arrival go through Engine.refresh_host_caches, which also invalidates
    the spatial engine's subset slabs/closures; a reroot changes the root
    cube key, so slabs rebuild automatically on the next dispatch."""

    def __init__(self, opt: Options, mesh=None, spatial: bool = False,
                 image_subsets: bool = False):
        self.opt = opt
        self.mesh = mesh
        self.spatial = spatial
        self.image_subsets = image_subsets
        if spatial and mesh is None:
            raise ValueError("spatial streaming requires a device mesh")
        self.model: Optional[nvm_io.NvmModel] = None
        self.images: Optional[List[np.ndarray]] = None
        self.engine: Optional[Engine] = None

    def _make_engine(self) -> Engine:
        if self.spatial:
            from hpmvs_tpu.runtime.spatial import SpatialEngine
            return SpatialEngine(self.model, self.opt, images=self.images,
                                 mesh=self.mesh,
                                 image_subsets=self.image_subsets)
        return Engine(self.model, self.opt, images=self.images,
                      mesh=self.mesh)

    def add_chunk(self, chunk: nvm_io.NvmModel, images=None) -> int:
        """Add cameras + points; returns the number of new seed patches."""
        first = self.model is None
        if images is not None:
            self.images = (list(images) if self.images is None
                           else self.images + list(images))
        self.model = merge_models(self.model, chunk)

        if first:
            self.engine = self._make_engine()
            return self.engine.seed()
        return self._extend(chunk)

    def _extend(self, chunk: nvm_io.NvmModel) -> int:
        eng = self.engine
        opt = self.opt
        eng._flush_depths()  # pending adds must land before the repack
        old_pack = eng.pack
        old_total = int(old_pack.depth.shape[0])

        # rebuild the device scene over the grown camera set (images append,
        # so every existing (image, level) keeps its offsets)
        eng.scene = scene_mod.build_scene(
            self.model, opt, images=self.images,
            host_pack=getattr(eng, "_host_images", False))
        eng.refresh_host_caches()
        new_pack = depth_mod.build_depth_pack(
            np.asarray(eng.scene.ctx.imgs.width),
            np.asarray(eng.scene.ctx.imgs.height), opt.DEPTH_SUBSAMPLE)
        import jax.numpy as jnp
        new_depth = np.array(new_pack.depth)  # writable host copy
        new_depth[:old_total] = np.asarray(old_pack.depth)
        eng.pack = new_pack._replace(depth=jnp.asarray(new_depth))

        # seed only the new points (global camera indices already)
        n_old_pts = self.model.n_points - chunk.n_points
        sub = nvm_io.NvmModel(
            cameras=self.model.cameras,
            points_xyz=self.model.points_xyz[n_old_pts:],
            points_rgb=self.model.points_rgb[n_old_pts:],
            meas_start=(self.model.meas_start[n_old_pts:]
                        - self.model.meas_start[n_old_pts]),
            meas_img=self.model.meas_img[self.model.meas_start[n_old_pts]:],
            meas_feat=self.model.meas_feat[self.model.meas_start[n_old_pts]:],
            meas_xy=self.model.meas_xy[self.model.meas_start[n_old_pts]:],
        )
        c, n, s, v, orig = scene_mod.make_seed_patches(sub, eng.scene, opt)
        if c.shape[0] == 0:
            return 0
        oc, on, os_, ov, ok, col, _ = eng._optimize(c, n, s, v)
        drift = np.linalg.norm(oc - orig, axis=1) <= os_ * opt.SEED_DRIFT
        keep = ok & drift
        # grow the root cube toward seeds outside it (linear-octree reroot:
        # keys shift one level, queue priorities shift +10; the reference
        # would drop them, CellProcessor.cpp:147)
        for _ in range(12):
            outside = keep & ~eng.tree.contains(oc)
            if not outside.any():
                break
            delta = oc[outside] - eng.tree.center
            direction = np.sign(np.sum(np.sign(delta), axis=0))
            eng.reroot_tree(direction)
            log.info("streaming: rerooted tree to width %.3f for %d "
                     "outside seeds", eng.tree.width, int(outside.sum()))
        still_out = keep & ~eng.tree.contains(oc)
        if still_out.any():
            log.warning("streaming: dropped %d seeds still outside after "
                        "rerooting", int(still_out.sum()))
            keep &= ~still_out
        if keep.sum() == 0:
            return 0
        c, n, s, v, col = oc[keep], on[keep], os_[keep], ov[keep], col[keep]
        s = np.maximum(s, eng.tree.width
                       / (1 << (opt.PATCH_INIT_MAXLEVEL + 1)))

        # insertion into the live tree: join an occupied containing cell as a
        # multi-patch entry (filtered later), else create a cell at
        # max(width-formula level, structure level). Fully grouped -- same
        # vectorized path as Engine.seed (add semantics, doctree.h:378-394);
        # a 10^5-point chunk inserts in milliseconds of host time.
        owner = eng.tree.containing_cell(c)
        lv = eng.tree.level_for_width(s)
        sl = eng.tree.structure_level(c)
        lv = np.maximum(lv, sl)

        pids = eng.patches.alloc(len(c))
        eng.patches.center[pids] = c
        eng.patches.normal[pids] = n
        eng.patches.scale[pids] = s
        eng.patches.views[pids] = v
        eng.patches.color[pids] = col

        cid_all = np.empty(len(c), np.int64)
        has_owner = owner >= 0
        cid_all[has_owner] = owner[has_owner]
        idx = np.nonzero(~has_owner)[0]
        if len(idx):
            lvs = lv[idx]
            keys = np.zeros(len(idx), np.uint64)
            for L in np.unique(lvs):
                m = lvs == L
                keys[m] = eng.tree.key_at(c[idx[m]], int(L))
            # several seeds may target the same missing cell: alloc each
            # distinct (level, key) once, join the rest as multi-patch
            pair = np.stack([lvs.astype(np.uint64), keys])
            uniq, inv = np.unique(pair, axis=1, return_inverse=True)
            existing = eng.tree.lookup(uniq[0].astype(np.int64),
                                       uniq[1].astype(np.uint64))
            new_mask = existing < 0
            fresh = eng.tree.alloc_cells(uniq[0][new_mask].astype(np.int8),
                                         uniq[1][new_mask].astype(np.uint64))
            cell_ids = existing.copy()
            cell_ids[new_mask] = fresh
            cid_all[idx] = cell_ids[inv]
        eng.insert_patches(pids, cid_all)
        eng._push_many(eng.tree.level[cid_all].astype(np.int64) * 10, cid_all)
        eng._set_depths(pids)
        eng.stats["stream_seeds"] += len(pids)
        return len(pids)

    def run_to(self, prio: int):
        """Process wavefronts up to `prio` (call between chunks)."""
        for p in range(prio + 1):
            self.engine.process_priority_step(p)
        return self.engine
