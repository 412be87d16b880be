"""Spatially-sharded wavefront engine: octree blocks on devices + halo
border migration.

This is the TPU-native equivalent of the reference's runtime skeleton --
the subtree decomposition of main.cpp:50-96 (getSubTrees splits the octree
into >= --subtrees subtree views, one CellProcessor each) combined with the
border-patch queues of CellProcessor.cpp:487-540 (insertBorderCell /
processBorderCellQueue / distributeBorderCell), the reference's only
cross-shard communication channel.

Design:

  - The root cube is partitioned into `n_blocks` = mesh-size contiguous
    Morton-key ranges at `block_level` (8^block_level >= n_blocks): block =
    key * n_blocks / 8^L. Every octree cell at level >= block_level belongs
    to exactly one block (its level-L ancestor octant), exactly like a
    subtree view owns a branch's descendants.
  - Device batches are laid out block-major with equal per-block segments,
    so shard i of the ('dp','sp')-flattened batch IS block i's work: the
    sp axis carries spatial meaning, and a future per-block image-subset
    sharding can key off the same layout. Padding lanes (imbalance between
    blocks) are tracked in stats["block_pad_lanes"].
  - Extend candidates whose *optimized* center lands in a different block
    than their source cell do not insert locally: they are packed into a
    per-destination payload and migrated through the vectorized all_to_all
    halo collective (parallel/mesh.make_halo_exchange). Arrivals re-check
    addConditional against the owner's tree, get `flatness_ = 0` (skip
    regularization -- CellProcessor.cpp:513-514) and `dirty_ = true`
    (re-queued on resume even when expanded, CellProcessor.cpp:443), and
    queue at the sender's priority (level+prio_red)*10, matching
    insertBorderCell.

Single-process semantics note: the host octree/patch store is global (the
reference's subtree views likewise share one underlying tree); ownership is
expressed through the batch layout and the migration path, which is the
part that must ride ICI on a real slice. Cross-process tree partitioning is
the multi-host follow-up (parallel/mesh.init_distributed).
"""

from __future__ import annotations

import time
from typing import Dict, Tuple

import numpy as np

from hpmvs_tpu.core.octree import morton_ancestor
from hpmvs_tpu.runtime.wavefront import Engine, _bucket, log


class SpatialEngine(Engine):
    """Engine whose wavefront batches are sharded by octree block with halo
    migration of border patches (reference: one CellProcessor per subtree +
    border queues, main.cpp:127-139)."""

    # payload layout: center(3) normal(3) scale(1) color(3) level(1)
    # prio_red(1) + views(K)
    _HDR = 12

    def __init__(self, model, opt, images=None, visdata_path=None,
                 mesh=None, image_subsets: bool = False):
        if mesh is None:
            raise ValueError("SpatialEngine requires a jax.sharding.Mesh")
        # with image subsets the replicated pack may exceed one chip's HBM:
        # keep it host-side; only the per-shard slabs ever device-commit
        super().__init__(model, opt, images=images,
                         visdata_path=visdata_path, mesh=mesh,
                         host_images=image_subsets)
        self.n_shards = int(mesh.devices.size)
        # oversubscribed fine Morton blocks, dynamically bin-packed onto
        # shards each dispatch round -- the analog of the reference's
        # >= 100 subtrees over ~8 threads with schedule(dynamic)
        # (main.cpp:50-96,150); a 1-block-per-device static split measured
        # 0.539 balance (SCALING.md section 4)
        self.n_blocks = max(1, int(opt.BLOCK_OVERSUB)) * self.n_shards
        L = 0
        while 8 ** L < self.n_blocks:
            L += 1
        self.block_level = max(L, 1)
        # block -> shard assignment; initially contiguous ranges (locality)
        self.block_shard = ((np.arange(self.n_blocks) * self.n_shards)
                            // self.n_blocks).astype(np.int64)
        # provisional partition cube from the SfM points: seeding runs
        # block-major BEFORE the real tree exists (required for subsets --
        # the global pack never lands on device -- and keeps one dispatch
        # layout for all phases)
        self._provisional = None
        if model.n_points > 0:
            from hpmvs_tpu.core.octree import LinearOctree
            pts = np.asarray(model.points_xyz)
            mn, mx = pts.min(0), pts.max(0)
            width = max(float((mx - mn).max()) * 1.2, 1e-6)
            self._provisional = LinearOctree((mn + mx) / 2.0, width)
        self._halo_fns: Dict[Tuple[int, int], object] = {}
        # per-block image subsets (parallel/subsets.py): shard the packed
        # pyramid buffer so device b holds only block b's cameras
        self.image_subsets = image_subsets
        self._bpack_dev = None
        self._bpack_key = None
        self._subset_gate_fn = None
        self._pending_view_mask = None
        self._pending_slot_counts = None
        self._committed_mask = None

    def refresh_host_caches(self):
        """Engine.refresh_host_caches + drop the subset closures and slabs:
        they capture the scene tables (stale after a rebuild) and the root
        cube key alone does not track scene growth."""
        super().refresh_host_caches()
        # __init__ calls the base ctor (which refreshes) before these exist
        self._bpack_dev = None
        self._bpack_key = None
        self._subset_gate_fn = None
        self._bmask_key = None
        self._bmask_cache = None
        self._depth_bounds = None
        self._committed_mask = None
        self._covis_reach = None

    # ------------------------------------------------------------------
    # per-block image subsets
    # ------------------------------------------------------------------
    @property
    def _oct_level(self) -> int:
        """Octant grid for the occupancy x frustum intersection: finer than
        the block grid (a ground capture occupies a thin z-slab; at block
        granularity the one-octant dilation marks everything occupied and
        every camera cone grazing a block's EMPTY volume still charges its
        slab -- measured 25 -> ~10 cameras/block on the ring scene from
        this refinement alone). +2 levels = 64x finer cells; capped so the
        host test stays ~10^4 octants."""
        return min(self.block_level + 2, 4)

    def _occupied_octants(self, L: int = None) -> np.ndarray:
        """(8^L,) bool: level-L octants occupied by cells (or SfM points
        pre-tree), dilated by one octant in every direction -- extends can
        step one cell width beyond the occupied frontier. Cameras of
        unoccupied blocks never serve a resident patch, so they are dropped
        from the slabs (the saving that makes subsets worthwhile on
        spatially extended captures)."""
        from hpmvs_tpu.core.octree import morton_encode
        L = self.block_level if L is None else L
        g = 1 << L
        t = self._btree()
        if self.tree is not None and self.tree.n:
            cids = np.nonzero(self.tree.alive[:self.tree.n])[0]
            pts, _ = self.tree.cell_center_width(cids) if len(cids) else \
                (np.zeros((0, 3)), None)
        else:
            pts = np.asarray(self.model.points_xyz)
        occ3 = np.zeros((g, g, g), bool)
        if len(pts):
            lo = np.asarray(t.center) - t.width / 2.0
            ijk = np.clip(((pts - lo) / (t.width / g)).astype(np.int64),
                          0, g - 1)
            occ3[ijk[:, 0], ijk[:, 1], ijk[:, 2]] = True
            # dilate one octant: successive non-wrapping axis dilations
            # compose to the full 3x3x3 box
            for ax in range(3):
                d = occ3.copy()
                fwd = [slice(None)] * 3
                bwd = [slice(None)] * 3
                fwd[ax] = slice(1, None)
                bwd[ax] = slice(None, -1)
                d[tuple(fwd)] |= occ3[tuple(bwd)]
                d[tuple(bwd)] |= occ3[tuple(fwd)]
                occ3 = d
        idx = np.arange(g)
        ii, jj, kk = np.meshgrid(idx, idx, idx, indexing="ij")
        keys = morton_encode(ii.ravel().astype(np.uint64),
                             jj.ravel().astype(np.uint64),
                             kk.ravel().astype(np.uint64))
        out = np.zeros(8 ** L, bool)
        out[keys.astype(np.int64)] = occ3.ravel()
        return out

    def _btree(self):
        """The partition cube: the real octree once seeded, else the
        provisional SfM-point cube (block-major seeding)."""
        return self.tree if self.tree is not None else self._provisional

    def _agree_rebuild(self, needed: bool) -> bool:
        """Agree the slab-rebuild decision (identity here). The owned engine
        ORs it across processes: the rebuild path runs a global collective
        (_agree_dim), so ALL processes must enter it in the same wavefront
        or none -- a process-local decision key deadlocks (r3 advisory)."""
        return bool(needed)

    def _covis_reach_mat(self) -> np.ndarray:
        """(ncam, ncam) bool: cameras an optimize lane can touch starting
        from a view of camera c. The view pipeline grows the list twice with
        one covis hop from the CURRENT reference image (_add_images_b reads
        ctx.covis[views[0]]; PatchOptimizer.cpp:225-258 runs before and
        after optimizePatch, and sortImages may promote any grown view to
        the ref slot in between), so the touchable set is the 2-hop covis
        closure of the dispatched views: I | A | A@A."""
        if self._covis_reach is not None:
            return self._covis_reach
        cv = np.asarray(self.scene.ctx.covis)            # (ncam, C), -1 pad
        ncam = cv.shape[0]
        adj = np.zeros((ncam, ncam + 1), bool)           # col ncam <- pad -1
        adj[np.repeat(np.arange(ncam), cv.shape[1]), cv.ravel()] = True
        adj = adj[:, :ncam]
        adj |= np.eye(ncam, dtype=bool)
        self._covis_reach = adj @ adj                    # I | A | A@A
        return self._covis_reach

    def _stage_pending_views(self, blocks: np.ndarray, views: np.ndarray):
        """Exact slab coverage for the dispatch being built (r4 advisory,
        closing the camera_depth_bounds truncation hole): record, per shard,
        (a) the cameras this dispatch's lanes can touch -- dispatched views
        dilated through the covis reach -- which _ensure_subsets unions into
        the slab assignment BEFORE the dispatch runs, and (b) the raw
        dispatched view-slot counts per (shard, cam), which _blockwise
        checks against the committed slabs afterwards (stats['slab_miss'],
        must stay 0: a nonzero count means a lane sampled a zeroed camera
        and silently diverged from the replicated run)."""
        ncam = self.scene.n_cameras
        sh = self.block_shard[blocks]
        need = np.zeros((self.n_shards, ncam), bool)
        slots = np.zeros((self.n_shards, ncam), np.int64)
        v = views.ravel()
        b = np.repeat(sh, views.shape[1])
        m = v >= 0
        np.add.at(slots, (b[m], v[m]), 1)
        need[b[m], v[m]] = True
        self._pending_view_mask = need @ self._covis_reach_mat()
        self._pending_slot_counts = slots

    def _count_slab_misses(self):
        """stats['slab_miss'] += dispatched view slots whose camera is
        absent from the committed shard slab (local shards only: remote
        slabs are owned -- and checked -- by their own process)."""
        if self._pending_slot_counts is None or self._committed_mask is None:
            return
        lm = self._shard_local_mask()
        miss = int(self._pending_slot_counts[lm][~self._committed_mask[lm]]
                   .sum())
        self.stats["slab_miss"] += miss
        if miss:
            log.warning("slab_miss: %d dispatched view slots lacked their "
                        "camera in the committed slab", miss)
        self._pending_slot_counts = None
        self._pending_view_mask = None

    def _resident_view_mask(self) -> np.ndarray:
        """(n_blocks, ncam) bool: cameras actually referenced by resident
        patches, per block. Unioned into the slab assignment so the
        slab-coverage invariant holds for EVERY resident patch's view list:
        the geometric depth-bound truncation (camera_depth_bounds) can drop
        a camera whose patches drifted outside its SfM depth range, which
        would silently zero that view in the gate dispatch (r3 advisory)."""
        ncam = self.scene.n_cameras
        out = np.zeros((self.n_blocks, ncam), bool)
        p = self.patches
        ids = np.nonzero(p.alive[:p.n])[0]
        if len(ids) == 0 or self._btree() is None:
            return out
        blk = self.block_of_points(p.center[ids])
        views = p.views[ids]
        v = views.ravel()
        b = np.repeat(blk, views.shape[1])
        m = v >= 0
        out[b[m], v[m]] = True
        return out

    def _ensure_subsets(self):
        """Build (or rebuild after a re-root / rebalance) the per-SHARD
        image slabs -- the union of the cameras seeing each shard's assigned
        blocks -- and commit them to the mesh, sharded on the shard dim.

        The rebuild triggers on a change of the per-shard CAMERA UNIONS (or
        the slab height), not of the raw occupancy bitmap: occupancy churns
        nearly every wavefront while the camera unions are stable, and each
        rebuild is an O(shards x rows) host copy + device_put (r3 advisory).
        The decision itself is agreed across processes (_agree_rebuild)."""
        t = self._btree()
        occ_oct = self._occupied_octants(self._oct_level)
        from hpmvs_tpu.parallel import subsets
        imgs = self.scene.ctx.imgs
        # the fine-grid frustum x occupancy test is the expensive host part
        # (8^oct_level octants x ncam projective tests) and _ensure_subsets
        # runs per dispatch: cache it on (cube geometry, occupancy bitmap)
        bm_key = (tuple(t.center), t.width, occ_oct.tobytes())
        if getattr(self, "_bmask_key", None) != bm_key:
            w0 = np.asarray(imgs.width)[:, 0]
            h0 = np.asarray(imgs.height)[:, 0]
            if getattr(self, "_depth_bounds", None) is None:
                self._depth_bounds = subsets.camera_depth_bounds(
                    self.scene.ctx.cams, self.model)
            near, far = self._depth_bounds
            # frustum x occupancy intersected at the FINE octant grid: a
            # block only charges a camera if the camera sees an octant that
            # actually holds reconstruction (empty volume no longer counts)
            self._bmask_cache = subsets.assign_images_to_blocks(
                self.scene.ctx.cams, w0, h0, np.asarray(t.center),
                t.width, self.n_blocks, self.block_level, near=near,
                far=far, oct_level=self._oct_level, occ_oct=occ_oct)
            self._bmask_key = bm_key
        bmask = self._bmask_cache.copy()
        # coverage invariant: every resident patch's views stay in its
        # block's slab even when the depth bounds would truncate them
        resident = self._resident_view_mask()
        self.stats["subset_bound_overrides"] = int((resident & ~bmask).sum())
        bmask |= resident
        # shard slab = union over its assigned blocks (main.cpp:50-96: a
        # thread's working set is the subtrees it currently processes)
        mask = np.zeros((self.n_shards, bmask.shape[1]), bool)
        for b in range(self.n_blocks):
            mask[self.block_shard[b]] |= bmask[b]
        # exact coverage of the dispatch about to run (covis-dilated view
        # lists of its lanes, _stage_pending_views): the geometric mask is
        # NOT conservative once camera_depth_bounds / occupancy truncation
        # prune it, and extend candidates inherit the parent's views into
        # a block whose residents never listed them (the r4 parity hole)
        if self._pending_view_mask is not None:
            self.stats["subset_pending_overrides"] = int(
                (self._pending_view_mask & ~mask).sum())
            mask |= self._pending_view_mask
        local_rows = subsets.slab_rows(np.asarray(imgs.height), mask)
        key = (tuple(t.center), t.width,
               mask[self._shard_local_mask()].tobytes(), local_rows)
        if self._bpack_dev is None or self._bpack_key is None:
            needed = True
        elif self._bpack_key == key:
            needed = False
        else:
            # the committed slabs may serve a DIFFERENT (superset) mask:
            # rebuild only when correctness demands it (a camera the mask
            # now needs is missing from the committed slab, or the cube
            # moved) or when the economy is material (>=20% rows saved);
            # otherwise keep serving from the superset -- growth-phase
            # unions change nearly every wavefront and each rebuild is an
            # O(shards x rows) host copy + device commit
            same_geom = (self._bpack_key[0] == tuple(t.center)
                         and self._bpack_key[1] == t.width)
            committed = np.frombuffer(self._bpack_key[2], bool).reshape(
                mask[self._shard_local_mask()].shape)
            grew = bool((mask[self._shard_local_mask()] & ~committed).any())
            rows_committed = int(self._bpack_key[3])
            needed = ((not same_geom) or grew
                      or local_rows < 0.8 * rows_committed)
        if not self._agree_rebuild(needed):
            return
        host = subsets.build_block_packs(
            subsets.ImagePack(*(np.asarray(a) for a in imgs)), mask,
            rows_b=self._agree_dim(local_rows))
        self._bpack_dev = subsets.device_put_block_pack(self.mesh, host)
        self._bpack_key = key
        self._committed_mask = mask.copy()
        self._subset_gate_fn = None
        total_rows = int(np.asarray(imgs.tex).shape[0])
        self.stats["subset_cams_max"] = int(mask.sum(1).max())
        self.stats["subset_cams_mean"] = float(mask.sum(1).mean())
        # per-BLOCK exclusion (before the shard union): the saving a larger
        # mesh realizes, since shard working sets shrink toward one block's
        # as devices grow (pod-scale projection, SCALING.md section 4b)
        occ_rows = bmask.any(1)
        if occ_rows.any():
            self.stats["subset_block_cams_mean"] = float(
                bmask[occ_rows].sum(1).mean())
        self.stats["subset_rows_per_block"] = int(host.tex.shape[1])
        self.stats["subset_rows_replicated"] = total_rows
        self.stats["subset_rebuilds"] += 1
        log.info(
            "image subsets: %d cams -> %.1f mean / %d max per shard; "
            "%d rows/shard vs %d replicated (%.0f%% HBM)",
            mask.shape[1], float(mask.sum(1).mean()), int(mask.sum(1).max()),
            host.tex.shape[1], total_rows,
            100.0 * host.tex.shape[1] / max(total_rows, 1))

    def _sharded_gate_call(self, xin, pend):
        if not self.image_subsets or self._btree() is None:
            return super()._sharded_gate_call(xin, pend)
        self._ensure_subsets()
        if self._subset_gate_fn is None:
            from hpmvs_tpu.parallel import subsets
            self._subset_gate_fn, _ = \
                subsets.sharded_optimize_and_gate_subset(
                    self.mesh, self.scene.ctx, self.opt, self.pack,
                    self.scene.n_cameras, pack_layout=self._pack_layout)
        bp = self._bpack_dev
        return self._subset_gate_fn(xin, self._dev_repl(self.pack.depth),
                                    self._dev_repl(pend),
                                    bp.tex, bp.texb, bp.row0, bp.width,
                                    bp.height)

    # ------------------------------------------------------------------
    # block partition + dynamic assignment.
    #
    # The partition is BLOCK_OVERSUB * n_shards equal contiguous Morton-key
    # ranges; balance comes from re-binning the *active* blocks onto shards
    # every dispatch round (largest-first greedy, LPT), not from moving the
    # split boundaries: a static split measured 0.539 balance and an
    # occupancy-weighted quantile split made it WORSE (0.497, +15%
    # migration) because the active wavefront is spatially clustered -- only
    # oversubscription + dynamic assignment can track a moving front, which
    # is exactly how the reference gets its balance (~100 subtrees over ~8
    # threads with schedule(dynamic), main.cpp:50-96,150).
    # ------------------------------------------------------------------
    def _agree_shard_counts(self, counts: np.ndarray) -> np.ndarray:
        """Per-shard lane counts for shape agreement (identity here; the
        owned engine sums across processes so every process compiles and
        dispatches identical global shapes)."""
        return counts

    def _agree_dim(self, n: int) -> int:
        """Agree a padded dimension across processes (identity: max of 1)."""
        return int(n)

    def _shard_local_mask(self) -> np.ndarray:
        """(n_shards,) bool: which shards this process reads arrivals from
        (all of them here; owned engine: its local devices only)."""
        return np.ones(self.n_shards, bool)

    def _agree_pair(self, pair: np.ndarray) -> np.ndarray:
        """Per-(src, dst) halo pair counts (identity; owned engine sums
        across processes -- each src shard is owned by one process, so the
        sum is the exact union)."""
        return pair

    @staticmethod
    def _lpt_assign(counts: np.ndarray, n_shards: int) -> np.ndarray:
        """Largest-first greedy bin packing of per-block work onto shards."""
        order = np.argsort(-counts, kind="stable")
        load = np.zeros(n_shards, np.int64)
        assign = np.zeros(len(counts), np.int64)
        for b in order:
            s = int(np.argmin(load))
            assign[b] = s
            load[s] += int(counts[b])
        return assign

    @staticmethod
    def _quantile_assign(counts: np.ndarray, n_shards: int) -> np.ndarray:
        """Contiguous Morton-order segments with ~equal work."""
        cum = np.cumsum(counts)
        total = max(int(cum[-1]), 1)
        return np.minimum((cum - counts / 2.0) * n_shards // total,
                          n_shards - 1).astype(np.int64)

    def _xy_order(self) -> np.ndarray:
        """Blocks ordered by the 2D Morton key of their centroid ground
        (xy) position. Contiguous quantile cuts along this order give each
        shard an xy-compact COLUMN of blocks: surface captures occupy a
        thin z-slab, so 3D-Morton-contiguous cuts spend shard locality on
        the z dimension and the per-shard camera unions span most of the
        ground plane (measured 51/60 cameras per shard on the ring scene;
        xy columns keep the union to the cameras within one column's
        footprint + view reach)."""
        if getattr(self, "_xy_order_cache", None) is not None:
            return self._xy_order_cache
        from hpmvs_tpu.core.octree import morton_encode
        L = self.block_level
        g = 1 << L
        idx = np.arange(g)
        ii, jj, kk = np.meshgrid(idx, idx, idx, indexing="ij")
        keys = morton_encode(ii.ravel().astype(np.uint64),
                             jj.ravel().astype(np.uint64),
                             kk.ravel().astype(np.uint64)).astype(np.int64)
        blk = (keys * self.n_blocks) >> (3 * L)
        cx = np.zeros(self.n_blocks)
        cy = np.zeros(self.n_blocks)
        cnt = np.bincount(blk, minlength=self.n_blocks).astype(np.float64)
        np.add.at(cx, blk, ii.ravel())
        np.add.at(cy, blk, jj.ravel())
        cx = (cx / np.maximum(cnt, 1)).astype(np.uint64)
        cy = (cy / np.maximum(cnt, 1)).astype(np.uint64)
        k2 = morton_encode(cx, cy, np.zeros(self.n_blocks, np.uint64))
        self._xy_order_cache = np.argsort(k2, kind="stable")
        return self._xy_order_cache

    def _update_assignment(self, counts: np.ndarray):
        """Re-bin blocks onto shards for this round's work distribution.

        Without image subsets the assignment is free to change every round.
        With subsets, the per-shard image slabs (committed HBM) depend on
        the assignment, so it only changes when the current one's balance
        drops below Options.REBALANCE_BELOW (hysteresis), paying one slab
        rebuild per rebalance."""
        total = int(counts.sum())
        if total == 0:
            return
        cur_bal = 0.0
        if self.image_subsets and self._bpack_dev is not None:
            cur = np.bincount(self.block_shard, weights=counts,
                              minlength=self.n_shards)
            cur_bal = total / max(self.n_shards * cur.max(), 1)
            if cur_bal >= self.opt.REBALANCE_BELOW:
                return
        if self.image_subsets:
            # contiguous quantile cuts along the 2D-xy Morton order:
            # balances the load while keeping each shard's blocks an
            # xy-compact column -- an LPT scatter (or 3D-Morton cuts, which
            # split z first) would union far-apart blocks' cameras and
            # erase the slab saving
            order = self._xy_order()
            sub = self._quantile_assign(counts[order], self.n_shards)
            new = np.empty_like(self.block_shard)
            new[order] = sub
        else:
            new = self._lpt_assign(counts, self.n_shards)
        if np.array_equal(new, self.block_shard):
            return
        if self.image_subsets and self._bpack_dev is not None:
            # churn guard: a rebalance invalidates the committed slabs (one
            # O(shards x rows) host rebuild + device_put); when the wavefront
            # sits chronically below REBALANCE_BELOW -- quantile cuts cannot
            # always reach it on a clustered front -- only pay for a
            # MATERIAL improvement, not for oscillation
            new_load = np.bincount(new, weights=counts,
                                   minlength=self.n_shards)
            new_bal = total / max(self.n_shards * new_load.max(), 1)
            if new_bal < cur_bal + 0.05:
                return
        self.block_shard = new
        self.stats["rebalances"] += 1
        if self.image_subsets:
            self._bpack_key = None   # per-shard unions changed

    def block_of_points(self, pts: np.ndarray) -> np.ndarray:
        """Contiguous Morton-range partition of the root cube: block =
        level-L key * n_blocks / 8^L. Points outside the root clamp to the
        nearest boundary cell (they are dropped by the insertion gates
        anyway, like the reference's outside-root border patches)."""
        t = self._btree()
        key = t.key_at(pts, self.block_level).astype(np.int64)
        return (key * self.n_blocks) >> (3 * self.block_level)

    def block_of_cells(self, cids: np.ndarray) -> np.ndarray:
        """Block of each occupied cell: its level-L Morton ancestor octant.
        Cells coarser than block_level (possible only in degenerate tiny
        trees) fall back to the block of their center point."""
        lv = self.tree.level[cids].astype(np.int64)
        key = self.tree.key[cids]
        anc = morton_ancestor(key, np.maximum(lv, self.block_level),
                              self.block_level).astype(np.int64)
        blk = (anc * self.n_blocks) >> (3 * self.block_level)
        coarse = lv < self.block_level
        if coarse.any():
            centers, _ = self.tree.cell_center_width(cids[coarse])
            blk[coarse] = self.block_of_points(centers)
        return blk

    # ------------------------------------------------------------------
    # block-major device layout
    # ------------------------------------------------------------------
    def _blockwise(self, blocks: np.ndarray, arrays, fills, dispatch, n_out):
        """Dispatch `arrays` (leading dim N) through the async `dispatch`
        callable in shard-major layout: the active blocks are LPT-binned
        onto shards (one bin-pack per dispatch round), then each shard owns
        an equal Lseg-lane segment of the ('dp','sp')-flattened batch.
        Shards with more than Lseg items run in multiple rounds; every
        round's dispatch is enqueued before the single blocking fetch
        (rounds have no host-side interdependency -- the depth pack threads
        on device), so round compute overlaps. Outputs return in the
        original item order."""
        import jax
        N = len(blocks)
        bcounts = np.bincount(blocks, minlength=self.n_blocks)
        self._update_assignment(bcounts)
        if self.image_subsets:
            # arrays[3] is the per-lane view list in both dispatch layouts
            # (_optimize and _extend_compute share the fused gate signature)
            self._stage_pending_views(blocks, arrays[3])
        shards = self.block_shard[blocks]
        order = np.argsort(shards, kind="stable")
        counts_l = np.bincount(shards, minlength=self.n_shards)
        # shapes (lseg/rounds) come from the GLOBAL per-shard counts so all
        # processes dispatch identically; the local packing offsets use the
        # LOCAL counts (each shard's lanes are filled only by its owner)
        counts_g = self._agree_shard_counts(counts_l)
        maxc = int(counts_g.max()) if counts_g.sum() else 1
        cap = max(self.opt.BATCH // self.n_shards, 16)
        lseg = min(_bucket(max(maxc, 1), lo=16), cap)
        rounds = -(-maxc // lseg)
        starts = np.zeros(self.n_shards + 1, np.int64)
        starts[1:] = np.cumsum(counts_l)
        within = np.arange(N) - starts[shards[order]]
        rnd = within // lseg
        pos = shards[order] * lseg + (within % lseg)

        B = self.n_shards * lseg
        outs = [None] * n_out
        t0 = time.time()
        devs, metas = [], []
        for r in range(rounds):
            m = rnd == r
            idx = order[m]
            padded = []
            for a, fill in zip(arrays, fills):
                buf = np.full((B,) + a.shape[1:], fill, a.dtype)
                buf[pos[m]] = a[idx]
                padded.append(buf)
            devs.append(dispatch(*padded))
            metas.append((idx, pos[m]))
        got = self._fetch(devs)
        self.stats["t_device"] += time.time() - t0
        for res, (idx, pm) in zip(got, metas):
            res = self._unpack_gate_out(np.asarray(res))
            for j in range(n_out):
                if outs[j] is None:
                    outs[j] = np.empty((N,) + res[j].shape[1:], res[j].dtype)
                outs[j][idx] = np.asarray(res[j])[pm]
        if self.image_subsets:
            self._count_slab_misses()
        self.stats["block_work_lanes"] += N
        self.stats["block_pad_lanes"] += B * rounds - N
        # post-assignment balance: ideal equal-split lanes vs the busiest
        # shard's lanes -- the spatial-decomposition efficiency
        self.stats["block_balance_den"] += self.n_shards * maxc
        return tuple(outs)

    def _optimize(self, centers, normals, scales, views):
        if self._btree() is None:
            # degenerate: no partition cube at all (pointless model)
            return super()._optimize(centers, normals, scales, views)
        # N may be 0 locally while other processes have work: _blockwise
        # still participates with agreed global shapes
        # bare optimize (branch / streamed seeds) in block-major layout via
        # the SAME fused dispatch as extend, gates off per-lane (widths < 0)
        blocks = self.block_of_points(centers)
        n = centers.shape[0]
        res = self._blockwise(
            blocks, (centers, normals, scales, views,
                     np.ascontiguousarray(centers, np.float32),
                     np.full(n, -1.0, np.float32)),
            (0.0, 0.0, 0.0, -1, 0.0, -1.0), self._dispatch_extend, 6)
        self.stats["patches_optimized"] += n
        return res + (np.zeros(n, np.float32),)

    def _extend_compute(self, centers, normals, scales, views, parent_c,
                        widths):
        if self._btree() is None:
            # degenerate: no partition cube at all (pointless model)
            return super()._extend_compute(centers, normals, scales, views,
                                           parent_c, widths)
        blocks = self.block_of_points(centers)
        res = self._blockwise(
            blocks, (centers, normals, scales, views, parent_c, widths),
            (0.0, 0.0, 0.0, -1, 0.0, 1.0), self._dispatch_extend, 6)
        self.stats["patches_optimized"] += centers.shape[0]
        return res

    def _lookahead_ok(self) -> bool:
        """No wave lookahead in spatial mode: the block-major fused rounds
        (and, owned, other processes' routing + halo arrivals) make
        next-wave membership non-local, and _blockwise already pipelines
        its per-round dispatches."""
        return False

    def _extend_stream(self, centers, normals, scales, views, parent_c,
                       widths):
        """Block-major layout needs all rounds gathered before the original
        order is restored, so the spatial engine routes whole-batch (the
        rounds themselves still pipeline inside _blockwise)."""
        yield 0, centers.shape[0], self._extend_compute(
            centers, normals, scales, views, parent_c, widths)

    # ------------------------------------------------------------------
    # border migration (insertBorderCell / distributeBorderCell analog)
    # ------------------------------------------------------------------
    def _route_extend(self, oc, on, os_, ov, ok, col, lv_t, prio_red,
                      src_cids) -> int:
        # migration is keyed on the OWNING SHARD (the device holding the
        # block), not the block id: a candidate crossing into a sibling
        # block on the same shard needs no wire traffic -- like the
        # reference, where only patches leaving a processor's subtree take
        # the border queue (CellProcessor.cpp:147-153)
        src_sh = self.block_shard[self.block_of_cells(src_cids)]
        dst_sh = self.block_shard[self.block_of_points(oc)]
        remote = ok & (dst_sh != src_sh) & self.tree.contains(oc)
        local = ok & ~remote
        n = self._insert_new_patches(oc, on, os_, ov, local, col, lv_t,
                                     prio_red)
        if self._count_global(int(remote.sum())):
            n += self._halo_migrate(oc, on, os_, ov, col, lv_t, prio_red,
                                    remote, src_sh, dst_sh)
        return n

    def _halo_fn(self, k: int, slots: int, dim: int):
        key = (k, slots, dim)
        if key not in self._halo_fns:
            from hpmvs_tpu.parallel import mesh as pmesh
            self._halo_fns[key] = pmesh.make_pairwise_halo(self.mesh, k,
                                                           slots)
        return self._halo_fns[key]

    def _halo_migrate(self, oc, on, os_, ov, col, lv_t, prio_red, remote,
                      src_sh, dst_sh) -> int:
        """Ship remote extend candidates through ragged halo hops, then
        insert the arrivals owner-side with flatness 0 and the dirty flag
        (CellProcessor.cpp:500-531).

        Ragged composition: migrations are grouped by shard offset
        k = (dst - src) mod n_shards; only offsets that actually carry
        patches dispatch a ppermute hop, each sized (pow-2) to its own max
        per-source count. All hops are enqueued before one blocking fetch,
        so they ride the wire concurrently. The wire volume therefore
        tracks the logical payload (SCALING.md; the dense all_to_all
        measured 13-39x amplification), and nothing can be dropped -- every
        row has a dedicated slot by construction."""
        K = ov.shape[1]
        D = self._HDR + K
        idx_all = np.nonzero(remote)[0]

        payload_all = np.zeros((len(idx_all), D), np.float32)
        payload_all[:, 0:3] = oc[idx_all]
        payload_all[:, 3:6] = on[idx_all]
        payload_all[:, 6] = os_[idx_all]
        payload_all[:, 7:10] = col[idx_all]
        payload_all[:, 10] = lv_t[idx_all]
        payload_all[:, 11] = prio_red[idx_all]
        payload_all[:, self._HDR:] = ov[idx_all].astype(np.float32)

        koff = (dst_sh[idx_all] - src_sh[idx_all]) % self.n_shards
        # per-(src, dst) pair counts, agreed globally: the hop list and
        # each hop's slots must be identical on every process
        pair_l = np.zeros((self.n_shards, self.n_shards), np.int64)
        np.add.at(pair_l, (src_sh[idx_all], dst_sh[idx_all]), 1)
        pair = self._agree_pair(pair_l)
        devs = []
        t0 = time.time()
        src_ids = np.arange(self.n_shards)
        for k in range(1, self.n_shards):
            diag = pair[src_ids, (src_ids + k) % self.n_shards]
            if diag.max() == 0:
                continue
            # exact slots: a ppermute graph is tiny, so per-size compiles
            # are cheap and the buffer carries no ladder padding
            slots = int(diag.max())
            rows = np.nonzero(koff == k)[0]
            sb = src_sh[idx_all[rows]]
            counts = np.bincount(sb, minlength=self.n_shards)
            starts = np.zeros(self.n_shards + 1, np.int64)
            starts[1:] = np.cumsum(counts)
            order = np.argsort(sb, kind="stable")
            lane = sb[order] * slots + (np.arange(len(rows)) - starts[sb[order]])
            pay = np.zeros((self.n_shards * slots, D), np.float32)
            val = np.zeros((self.n_shards * slots,), bool)
            pay[lane] = payload_all[rows[order]]
            val[lane] = True
            devs.append((slots, self._halo_fn(int(k), slots, D)(
                self._dev_batch(pay), self._dev_batch(val))))
            self.stats["halo_bytes_wire"] += self.n_shards * slots * (D * 4 + 1)
        got = self._fetch([d for _, d in devs])
        self.stats["t_device"] += time.time() - t0
        self.stats["halo_rounds"] += 1
        self.stats["halo_hops"] += len(devs)
        self.stats["migrated"] += len(idx_all)
        # wire accounting for the scaling model (SCALING.md): logical patch
        # payload vs the ragged hop buffers actually moved
        self.stats["halo_bytes_logical"] += len(idx_all) * D * 4

        recv = np.concatenate([np.asarray(g[0]) for g in got])
        # owned mode: only lanes on this process's shards are real arrivals
        # (remote shards never materialize host-side); shard = lane // slots
        lmask = self._shard_local_mask()
        valid = np.concatenate(
            [np.asarray(g[1]) & np.repeat(lmask, sl)
             for (sl, _), g in zip(devs, got)])
        a = np.nonzero(valid)[0]
        # wire-delivery invariant: every migrated patch has a dedicated slot
        # (no drops by construction), so arrivals across all processes ==
        # migrations (asserted by tests/test_spatial.py)
        self.stats["halo_arrivals"] += len(a)
        if len(a) == 0:
            return 0
        r = recv[a]
        # reference semantics: border arrivals skip regularization
        # (flatness_=0, CellProcessor.cpp:513-514) and are marked dirty so
        # initFromTree re-queues them (CellProcessor.cpp:443)
        n_ins = self._insert_new_patches(
            r[:, 0:3], r[:, 3:6], r[:, 6], r[:, self._HDR:].astype(np.int32),
            np.ones(len(a), bool), r[:, 7:10],
            r[:, 10].astype(np.int64), r[:, 11].astype(np.int32),
            flatness=0.0, dirty=True)
        self.stats["migrated_inserted"] += n_ins
        return n_ins
