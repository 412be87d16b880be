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
        super().__init__(model, opt, images=images,
                         visdata_path=visdata_path, mesh=mesh)
        self.n_blocks = int(mesh.devices.size)
        L = 0
        while 8 ** L < self.n_blocks:
            L += 1
        self.block_level = max(L, 1)
        self._halo_fns: Dict[Tuple[int, int], object] = {}
        # per-block image subsets (parallel/subsets.py): shard the packed
        # pyramid buffer so device b holds only block b's cameras
        self.image_subsets = image_subsets
        self._bpack_dev = None
        self._bpack_key = None
        self._subset_fn = None
        self._subset_gate_fn = None

    # ------------------------------------------------------------------
    # per-block image subsets
    # ------------------------------------------------------------------
    def _ensure_subsets(self):
        """Build (or rebuild after a re-root) the per-block image slabs and
        commit them to the mesh, sharded on the block dim."""
        key = (tuple(self.tree.center), self.tree.width)
        if self._bpack_dev is not None and self._bpack_key == key:
            return
        from hpmvs_tpu.parallel import subsets
        imgs = self.scene.ctx.imgs
        w0 = np.asarray(imgs.width)[:, 0]
        h0 = np.asarray(imgs.height)[:, 0]
        mask = subsets.assign_images_to_blocks(
            self.scene.ctx.cams, w0, h0, np.asarray(self.tree.center),
            self.tree.width, self.n_blocks, self.block_level)
        host = subsets.build_block_packs(
            subsets.ImagePack(*(np.asarray(a) for a in imgs)), mask)
        self._bpack_dev = subsets.device_put_block_pack(self.mesh, host)
        self._bpack_key = key
        self._subset_fn = None
        self._subset_gate_fn = None
        total_rows = int(np.asarray(imgs.tex).shape[0])
        self.stats["subset_cams_max"] = int(mask.sum(1).max())
        self.stats["subset_cams_mean"] = float(mask.sum(1).mean())
        self.stats["subset_rows_per_block"] = int(host.tex.shape[1])
        self.stats["subset_rows_replicated"] = total_rows
        log.info(
            "image subsets: %d cams -> %.1f mean / %d max per block; "
            "%d rows/block vs %d replicated (%.0f%% HBM)",
            mask.shape[1], float(mask.sum(1).mean()), int(mask.sum(1).max()),
            host.tex.shape[1], total_rows,
            100.0 * host.tex.shape[1] / max(total_rows, 1))

    def _sharded_opt_call(self, args):
        if not self.image_subsets or self.tree is None:
            return super()._sharded_opt_call(args)
        self._ensure_subsets()
        if self._subset_fn is None:
            from hpmvs_tpu.parallel import subsets
            self._subset_fn, _ = subsets.sharded_optimize_subset(
                self.mesh, self.scene.ctx, self.opt)
        bp = self._bpack_dev
        return self._subset_fn(*args, bp.tex, bp.texb, bp.row0, bp.width,
                               bp.height)

    def _sharded_gate_call(self, args, pargs):
        if not self.image_subsets or self.tree is None:
            return super()._sharded_gate_call(args, pargs)
        self._ensure_subsets()
        if self._subset_gate_fn is None:
            from hpmvs_tpu.parallel import subsets
            self._subset_gate_fn, _ = \
                subsets.sharded_optimize_and_gate_subset(
                    self.mesh, self.scene.ctx, self.opt, self.pack,
                    self.scene.n_cameras)
        bp = self._bpack_dev
        return self._subset_gate_fn(*args, self.pack.depth, *pargs,
                                    bp.tex, bp.texb, bp.row0, bp.width,
                                    bp.height)

    # ------------------------------------------------------------------
    # block assignment: equal contiguous Morton-key ranges.
    #
    # Measured alternative (SCALING.md): occupancy-weighted quantile splits
    # (the getSubTrees leaf-richest analog, main.cpp:50-96) did NOT improve
    # per-dispatch balance (0.497 vs 0.539 on the plane scene) because the
    # active wavefront is spatially clustered -- a static split cannot
    # balance a moving front -- while the boundaries bisecting the occupied
    # mass raised migration volume 15% and order-divergence with it. Equal
    # ranges win on both axes and need no split state.
    # ------------------------------------------------------------------
    def block_of_points(self, pts: np.ndarray) -> np.ndarray:
        """Contiguous Morton-range partition of the root cube: block =
        level-L key * n_blocks / 8^L. Points outside the root clamp to the
        nearest boundary cell (they are dropped by the insertion gates
        anyway, like the reference's outside-root border patches)."""
        key = self.tree.key_at(pts, self.block_level).astype(np.int64)
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
        callable in block-major layout: each block owns an equal Lseg-lane
        segment, so the ('dp','sp') batch sharding places block b's work on
        shard b. Blocks with more than Lseg items run in multiple rounds;
        every round's dispatch is enqueued before the single blocking fetch
        (rounds have no host-side interdependency -- the depth pack threads
        on device), so round compute overlaps. Outputs return in the
        original item order."""
        import jax
        N = len(blocks)
        order = np.argsort(blocks, kind="stable")
        counts = np.bincount(blocks, minlength=self.n_blocks)
        maxc = int(counts.max()) if N else 1
        cap = max(self.opt.BATCH // self.n_blocks, 16)
        lseg = min(_bucket(max(maxc, 1), lo=16), cap)
        rounds = -(-maxc // lseg)
        starts = np.zeros(self.n_blocks + 1, np.int64)
        starts[1:] = np.cumsum(counts)
        within = np.arange(N) - starts[blocks[order]]
        rnd = within // lseg
        pos = blocks[order] * lseg + (within % lseg)

        B = self.n_blocks * lseg
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
            for j in range(n_out):
                if outs[j] is None:
                    outs[j] = np.empty((N,) + res[j].shape[1:], res[j].dtype)
                outs[j][idx] = np.asarray(res[j])[pm]
        self.stats["block_work_lanes"] += N
        self.stats["block_pad_lanes"] += B * rounds - N
        # imbalance alone (before bucket rounding): ideal equal-split lanes
        # vs the max block's lanes -- the spatial-decomposition efficiency
        self.stats["block_balance_den"] += self.n_blocks * maxc
        return tuple(outs)

    def _optimize(self, centers, normals, scales, views):
        if centers.shape[0] == 0 or self.tree is None:
            # seeding runs before the tree exists: fall back to flat batches
            return super()._optimize(centers, normals, scales, views)
        blocks = self.block_of_points(centers)
        res = self._blockwise(blocks, (centers, normals, scales, views),
                              (0.0, 0.0, 0.0, -1), self._dispatch_optimize, 7)
        self.stats["patches_optimized"] += centers.shape[0]
        return res

    def _extend_compute(self, centers, normals, scales, views, parent_c,
                        widths):
        blocks = self.block_of_points(centers)
        res = self._blockwise(
            blocks, (centers, normals, scales, views, parent_c, widths),
            (0.0, 0.0, 0.0, -1, 0.0, 1.0), self._dispatch_extend, 6)
        self.stats["patches_optimized"] += centers.shape[0]
        return res

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
        src_blk = self.block_of_cells(src_cids)
        dst_blk = self.block_of_points(oc)
        remote = ok & (dst_blk != src_blk) & self.tree.contains(oc)
        local = ok & ~remote
        n = self._insert_new_patches(oc, on, os_, ov, local, col, lv_t,
                                     prio_red)
        if remote.any():
            n += self._halo_migrate(oc, on, os_, ov, col, lv_t, prio_red,
                                    remote, src_blk, dst_blk)
        return n

    def _halo_fn(self, lanes: int, dim: int):
        key = (lanes, dim)
        if key not in self._halo_fns:
            from hpmvs_tpu.parallel import mesh as pmesh
            # worst case: every lane of one source block targets the same
            # destination -> slots = lanes guarantees no drops
            self._halo_fns[key] = pmesh.make_halo_exchange(
                self.mesh, self.n_blocks, lanes)
        return self._halo_fns[key]

    def _halo_migrate(self, oc, on, os_, ov, col, lv_t, prio_red, remote,
                      src_blk, dst_blk) -> int:
        """Ship remote extend candidates through the all_to_all halo
        collective, then insert the arrivals owner-side with flatness 0 and
        the dirty flag (CellProcessor.cpp:500-531)."""
        K = ov.shape[1]
        D = self._HDR + K
        idx = np.nonzero(remote)[0]

        # block-major send layout: lane = src_block * lanes + slot
        order = np.argsort(src_blk[idx], kind="stable")
        idx = idx[order]
        sb = src_blk[idx]
        counts = np.bincount(sb, minlength=self.n_blocks)
        lanes = _bucket(max(int(counts.max()), 1), lo=16)
        starts = np.zeros(self.n_blocks + 1, np.int64)
        starts[1:] = np.cumsum(counts)
        slot = np.arange(len(idx)) - starts[sb]

        B = self.n_blocks * lanes
        payload = np.zeros((B, D), np.float32)
        block_of = np.full((B,), -1, np.int32)
        lane = sb * lanes + slot
        payload[lane, 0:3] = oc[idx]
        payload[lane, 3:6] = on[idx]
        payload[lane, 6] = os_[idx]
        payload[lane, 7:10] = col[idx]
        payload[lane, 10] = lv_t[idx]
        payload[lane, 11] = prio_red[idx]
        payload[lane, self._HDR:] = ov[idx].astype(np.float32)
        block_of[lane] = dst_blk[idx]

        import jax
        import jax.numpy as jnp
        recv, valid, dropped = self._fetch(self._halo_fn(lanes, D)(
            self._dev_batch(block_of), self._dev_batch(payload)))
        recv = np.asarray(recv)
        valid = np.asarray(valid)
        self.stats["migrated"] += len(idx)
        self.stats["halo_dropped"] += int(dropped)
        # wire accounting for the scaling model (SCALING.md): logical patch
        # payload vs the padded all_to_all buffer actually moved
        self.stats["halo_bytes_logical"] += len(idx) * D * 4
        self.stats["halo_bytes_wire"] += self.n_blocks * self.n_blocks \
            * lanes * D * 4
        self.stats["halo_rounds"] += 1

        a = np.nonzero(valid)[0]
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
