"""Level-synchronous wavefront engine: the TPU replacement for CellProcessor.

Behavioral equivalent of the reference scheduler
(src/hpmvs/CellProcessor.cpp:43-544 + the priority loop main.cpp:145-181):
a priority queue of octree cells, priority = (level + priorityReduction)*10 +
phase, with the per-cell state machine

    filter (multi-patch cell) -> extend (6 lateral candidates, phase +0) ->
    regularize (5x5 flatness test, phase +1) -> remove-or-branch (4 diagonal
    children, phase +2)

TPU-first inversion (SURVEY.md section 7): instead of popping one cell at a
time and running one nlopt solve per candidate, the engine drains *all* cells
of the current priority as one batch, generates all their candidates, and
refines them with a single optimize_batch call; all depth/visibility gates
run as batched device ops. Collision resolution on octree insertion
(addConditional, doctree.h:396-419) becomes a deterministic first-wins dedup
by target cell key within the batch (documented divergence: the reference
resolves by thread-interleaved arrival order).

The octree bookkeeping (key sets, queues) stays on host numpy -- it is
O(cells) integer work, dwarfed by the NCC/Newton device compute.
"""

from __future__ import annotations

import logging
import time
from collections import defaultdict
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from hpmvs_tpu.config import Options
from hpmvs_tpu.geom import camera as cam_ops
from hpmvs_tpu.core import depth as depth_mod
from hpmvs_tpu.core import scene as scene_mod
from hpmvs_tpu.core.octree import LinearOctree, PatchStore
from hpmvs_tpu.io import ply as ply_io
from hpmvs_tpu.ops import optimizer as popt

log = logging.getLogger("hpmvs_tpu")


def _bucket(n: int, lo: int = 512) -> int:
    """Pad batches to few, coarse shape buckets (lo, 4*lo, ... capped by the
    callers at Options.BATCH). Coarser than the obvious pow-2 ladder on
    purpose: every distinct shape costs a trace+lower on host (~seconds for
    the big optimize graphs) and a compile on first sight, while padding
    costs microseconds per lane in the 128-lane kernels -- measured 2x
    end-to-end on a 50k-patch scene."""
    b = lo
    while b < n:
        b *= 4
    return b


class Engine:
    """Owns the whole reconstruction state: device scene context + depth
    buffers, host patch store + linear octree + priority queues."""

    def __init__(self, model, opt: Options, images=None,
                 visdata_path: Optional[str] = None, mesh=None,
                 host_images: bool = False):
        self.opt = opt
        self.model = model
        self.mesh = mesh          # jax.sharding.Mesh -> sharded optimize
        self._host_images = host_images
        self._sharded_gate_fn = None
        self._flush_fn = None
        self.scene = scene_mod.build_scene(model, opt, images=images,
                                           visdata_path=visdata_path,
                                           host_pack=host_images)
        self.pack = depth_mod.build_depth_pack(
            self.scene.width_np, self.scene.height_np, opt.DEPTH_SUBSAMPLE)
        self.refresh_host_caches()
        self.patches = PatchStore(opt.MAX_VIEWS)
        self.tree: Optional[LinearOctree] = None
        # cell -> patch membership as intrusive linked arrays (head + nxt):
        # all scheduler bookkeeping is grouped numpy, no per-item Python
        self.cell_head = np.full(1024, -1, np.int64)
        # queue[prio] = list of int64 cid chunks (flattened at pop)
        self.queue: Dict[int, List[np.ndarray]] = defaultdict(list)
        # deferred setDepths adds, folded into the next fused extend
        # dispatch (optimize_and_gate pend_*) instead of their own dispatch
        self._pend: List[tuple] = []  # (pids, is_subtract) windows
        # outstanding wave-lookahead speculation (_speculate_next)
        self._spec = None
        self.stats = defaultdict(int)
        self.on_patch_event: Optional[Callable] = None
        # called as wave_hook(self) after every frontier generation
        # (process_priority_step inner loop) -- time-budget snapshots
        self.wave_hook: Optional[Callable] = None
        import jax
        # multi-controller SPMD: host scheduler state is replicated per
        # process; result fetches must allgather non-addressable shards
        self._mp = jax.process_count() > 1

    def _fetch(self, res):
        """Blocking fetch of dispatch results as host numpy. Single process:
        one device_get. Multi-controller (jax.distributed, mesh spanning
        processes): reshard the outputs to replicated first -- a cross-host
        allgather of the batch -- so every process reads the full results
        and applies identical scheduler bookkeeping (replicated host state,
        the multi-host ownership convention of pipeline.run)."""
        import jax
        if self._mp and self.mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as PS
            repl = NamedSharding(self.mesh, PS())
            res = jax.jit(lambda t: t, out_shardings=repl)(res)
        return jax.device_get(res)

    def _dev_batch(self, a):
        """Host batch array -> device arg. Multi-controller: build the
        global (dp,sp)-sharded jax.Array from the (identical) host copy."""
        if not (self._mp and self.mesh is not None):
            return jnp.asarray(a)
        import jax
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as PS
        arr = np.asarray(a)
        sh = NamedSharding(self.mesh, PS(("dp", "sp")))
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])

    def _dev_repl(self, a):
        """Host array -> replicated device arg (global in multi-controller).
        Arrays already sharded on this mesh pass through untouched."""
        if not (self._mp and self.mesh is not None):
            return jnp.asarray(a)
        import jax
        if isinstance(a, jax.Array) and not isinstance(a, jax.core.Tracer) \
                and getattr(a.sharding, "mesh", None) is not None:
            return a
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as PS
        arr = np.asarray(a)
        sh = NamedSharding(self.mesh, PS())
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])

    # -- multi-process coordination hooks (identity here; the owned
    # -- multi-host engine overrides them, runtime/owned.py) -------------
    def _count_global(self, n: int) -> int:
        """Sum a small host counter across processes (identity here)."""
        return int(n)

    def _agree_pmin(self, prio: int):
        """Next queue priority to drain, or None (global min when owned)."""
        if not self.queue:
            return None
        pmin = min(self.queue)
        return None if pmin > prio else pmin

    def _filter_owned(self, keep: np.ndarray, pts: np.ndarray) -> np.ndarray:
        """Mask a seed keep-vector down to locally-owned lanes (identity)."""
        return keep

    def _agree_bbox(self, pts: np.ndarray):
        """Bounding box of the GLOBAL seed cloud (local = identity)."""
        return pts.min(0), pts.max(0)

    def _remote_neighbor_counts(self, pts: np.ndarray) -> np.ndarray:
        """(N,) 0/1: neighbor-probe positions owned by another process
        (always 0 in single-process engines)."""
        return np.zeros(len(pts), np.int64)

    def _gather_pend(self, c, s, v, ph):
        """Merge deferred depth windows across processes (identity): the
        z-buffer is the one globally-shared mutable state, exactly like the
        reference's shared depth pyramid across all processors
        (Scene.h:75-76)."""
        return c, s, v, ph

    def refresh_host_caches(self):
        """Host copies of the camera SoA (avoid device transfers in the
        scheduler hot loop). Re-call after the scene grows (streaming)."""
        self.cam_center_np = np.asarray(self.scene.ctx.cams.center)
        self.cam_xaxis_np = np.asarray(self.scene.ctx.cams.xaxis)
        self.cam_fsum_np = np.asarray(self.scene.ctx.cams.fsum)
        # sharded closures capture scene/pack tables: rebuild after growth
        self._sharded_gate_fn = None
        self._flush_fn = None
        # static per-level pack dims for the gather-free collapsed
        # full-depth buffer (depth.collapse_full_depth): valid only when
        # every camera shares them (uniform captures); None disables the
        # fast path and the gates fall back to per-level pyramid gathers
        pw = np.asarray(self.pack.width)
        ph = np.asarray(self.pack.height)
        if (pw == pw[:1]).all() and (ph == ph[:1]).all():
            self._pack_layout = tuple(
                (int(ph[0, l]), int(pw[0, l])) for l in range(pw.shape[1]))
        else:
            self._pack_layout = None

    # ------------------------------------------------------------------
    # plumbing: cell membership as head/next chains, batched queue pushes
    # ------------------------------------------------------------------
    def _ensure_heads(self):
        need = self.tree.n
        if len(self.cell_head) < need:
            cap = len(self.cell_head)
            while cap < need:
                cap *= 2
            b = np.full(cap, -1, np.int64)
            b[:len(self.cell_head)] = self.cell_head
            self.cell_head = b

    def insert_patches(self, pids: np.ndarray, cids: np.ndarray):
        """Batch cell-membership insert. Duplicate target cells chain
        (multi-patch cells, resolved later by filter); each dedup round
        links one patch per distinct cell, so rounds = max multiplicity."""
        pids = np.asarray(pids, np.int64)
        cids = np.asarray(cids, np.int64)
        self._ensure_heads()
        self.patches.cell[pids] = cids
        while len(pids):
            u, first = np.unique(cids, return_index=True)
            p = pids[first]
            self.patches.nxt[p] = self.cell_head[u]
            self.cell_head[u] = p
            if len(first) == len(pids):
                break
            mask = np.ones(len(pids), bool)
            mask[first] = False
            pids, cids = pids[mask], cids[mask]

    def _insert_patch(self, pid: int, cid: int):
        self.insert_patches(np.asarray([pid]), np.asarray([cid]))

    def _members(self, cids: np.ndarray):
        """Padded (C, M) member-pid matrix + validity mask (M = deepest
        chain among the cells)."""
        cols = [self.cell_head[cids]]
        while True:
            cur = cols[-1]
            nxt = np.where(cur >= 0, self.patches.nxt[np.maximum(cur, 0)], -1)
            if not (nxt >= 0).any():
                break
            cols.append(nxt)
        m = np.stack(cols, 1)
        return m, m >= 0

    def cell_members(self, cid: int) -> List[int]:
        """Patch ids in one cell (oldest last; head is the newest insert)."""
        m, mask = self._members(np.asarray([cid], np.int64))
        return [int(p) for p in m[0][mask[0]]]

    def _clear_cell_patches(self, cids: np.ndarray) -> np.ndarray:
        """Free every patch of the given cells; returns the freed pids."""
        m, mask = self._members(cids)
        pids = m[mask]
        if len(pids):
            self.patches.free(pids)
        self.cell_head[cids] = -1
        return pids

    def _free_cells(self, cids: np.ndarray):
        self.tree.free_cells(np.asarray(cids))
        self._ensure_heads()
        self.cell_head[np.asarray(cids)] = -1

    def _push(self, prio: int, cid: int):
        self.queue[int(prio)].append(np.asarray([cid], np.int64))

    def _push_many(self, prios: np.ndarray, cids: np.ndarray):
        """Grouped queue append: one chunk per distinct priority."""
        if len(cids) == 0:
            return
        prios = np.asarray(prios, np.int64)
        cids = np.asarray(cids, np.int64)
        for pr in np.unique(prios):
            self.queue[int(pr)].append(cids[prios == pr])

    def _optimize(self, centers, normals, scales, views):
        """Bare batched optimize (seed / branch candidates), routed through
        the SAME fused optimize+gates+setDepths dispatch as extend with the
        per-lane gates disabled (widths < 0): one executable serves every
        phase -- the reference likewise has one optimizer for all phases
        (PatchOptimizer.cpp:78) -- and pending deferred depth updates ride
        along instead of needing their own flush. Returns the 7-tuple
        (center, normal, scale, views, ok, color, resid-placeholder)."""
        n = centers.shape[0]
        res = self._extend_compute(
            centers, normals, scales, views,
            np.ascontiguousarray(centers, np.float32),
            np.full(n, -1.0, np.float32))
        return res + (np.zeros(n, np.float32),)

    def _pad_chunk(self, arrays, fills, n):
        """Pad a <=BATCH chunk to its bucketed (mesh-divisible) shape."""
        b = min(_bucket(n), max(self.opt.BATCH, 16))
        if self.mesh is not None:
            ms = int(self.mesh.devices.size)
            b = -(-b // ms) * ms
        out = []
        for a, fill in zip(arrays, fills):
            buf = np.full((b,) + a.shape[1:], fill, a.dtype)
            buf[:n] = a[:n]
            out.append(buf)
        return tuple(out)

    def _set_depths(self, pids: np.ndarray, subtract: bool = False):
        """Scene::setDepths. BOTH adds and subtracts are DEFERRED: they
        ride the next fused extend dispatch (optimize_and_gate pend_*) in
        their original order (phase tags add*/sub*/add*), cutting the
        standalone flush + subtract dispatches. A second subtract run after
        an add-after-sub run would need a 4th phase -- flush first (rare)."""
        if len(pids) == 0:
            return
        if subtract and any(e[3] for e in self._pend) \
                and not self._pend[-1][3]:
            # pattern would become add,sub,add,sub: flush the window
            self._flush_depths()
        # SNAPSHOT the projection inputs now: subtracted patches are freed
        # (and their store slots reused) before the window flushes
        self._pend.append((self.patches.center[pids].copy(),
                           self.patches.scale[pids].copy(),
                           self.patches.views[pids].copy(), subtract))

    def _pend_raw(self, c, s, v, subtract: bool):
        """Stage raw depth windows (deep-wave add/subtract repairs) with the
        same add/sub/add flush guard as _set_depths."""
        if len(s) == 0:
            return
        if subtract and any(e[3] for e in self._pend) \
                and not self._pend[-1][3]:
            self._flush_depths()
        self._pend.append((np.ascontiguousarray(c, np.float32).copy(),
                           np.ascontiguousarray(s, np.float32).copy(),
                           np.ascontiguousarray(v, np.int32).copy(),
                           subtract))

    def _pend_arrays(self):
        """Concatenate the deferred window into (c, s, v, phase)."""
        if not self._pend:
            K = self.opt.MAX_VIEWS
            return (np.zeros((0, 3), np.float32), np.zeros((0,), np.float32),
                    np.full((0, K), -1, np.int32), np.zeros((0,), np.int32))
        c = np.concatenate([e[0] for e in self._pend])
        s = np.concatenate([e[1] for e in self._pend])
        v = np.concatenate([e[2] for e in self._pend])
        seen_sub = False
        phs = []
        for e in self._pend:
            if e[3]:
                seen_sub = True
                ph = 1
            else:
                ph = 2 if seen_sub else 0
            phs.append(np.full(len(e[1]), ph, np.int32))
        return c, s, v, np.concatenate(phs)

    # standalone-flush chunk bound: the phased scatter's HLO temps scale
    # with lanes x views x window cells (~36 KB/lane measured from the XLA
    # OOM report) -- an unbounded window (the ring scene's final level
    # defers ~500k adds) compiles to >19 GB of HBM temps on a 16 GB chip.
    # Chunks apply in deferred order, so semantics are unchanged.
    FLUSH_CHUNK = 32768

    def _flush_depths(self):
        """Apply the deferred depth window with standalone dispatches
        (external pack readers, checkpointing, overflow), chunked to bound
        the scatter's HBM temps."""
        if self._count_global(len(self._pend)) == 0:
            return
        c, s, v, ph = self._gather_pend(*self._pend_arrays())
        self._pend = []
        n = len(s)
        if n > self.FLUSH_CHUNK:
            for i in range(0, n, self.FLUSH_CHUNK):
                j = min(i + self.FLUSH_CHUNK, n)
                self._flush_depths_one(c[i:j], s[i:j], v[i:j], ph[i:j])
            return
        self._flush_depths_one(c, s, v, ph)

    def _flush_depths_one(self, c, s, v, ph):
        t0 = time.time()
        b = _bucket(len(s), lo=512)
        c, s, v, ph = self._pend_pad(c, s, v, ph, b)
        if self.mesh is not None:
            # mesh twin: composes with the globally-sharded z-buffer under
            # multi-controller SPMD (parallel/mesh.py)
            if self._flush_fn is None:
                from hpmvs_tpu.parallel import mesh as pmesh
                self._flush_fn = pmesh.sharded_apply_depth_updates(
                    self.mesh, self.scene.ctx.cams, self.pack,
                    self.opt.DEPTH_SUBSAMPLE)
            new_depth = self._flush_fn(
                self._dev_repl(self.pack.depth), self._dev_repl(c),
                self._dev_repl(s), self._dev_repl(v), self._dev_repl(ph))
            self.pack = self.pack._replace(depth=new_depth)
        else:
            self.pack = depth_mod.apply_depth_updates(
                self.pack, self.scene.ctx.cams, jnp.asarray(c),
                jnp.asarray(s), jnp.asarray(v), jnp.asarray(ph),
                subsample=self.opt.DEPTH_SUBSAMPLE)
        self.stats["t_device"] += time.time() - t0
        self.stats["dispatches"] += 1
        self.stats["disp_flush"] += 1

    def _pend_pad(self, c, s, v, ph, b):
        n = len(s)
        cb = np.zeros((b, 3), np.float32)
        sb = np.zeros((b,), np.float32)
        vb = np.full((b, self.opt.MAX_VIEWS), -1, np.int32)
        phb = np.zeros((b,), np.int32)
        cb[:n], sb[:n], vb[:n], phb[:n] = c, s, v, ph
        return cb, sb, vb, phb

    def _n_proc(self) -> int:
        return 1

    def _take_pending(self):
        """Pending depth updates as ONE packed (Pb, 5+K) f32 buffer for the
        fused extend dispatch (ops/optimizer.py packed-dispatch layout), or
        None when nothing is pending. Owned multi-host: windows from ALL
        processes merge here (the z-buffer is globally shared state), so
        participation must be global."""
        if self._count_global(len(self._pend)) == 0:
            return None
        if self._count_global(sum(len(e[1]) for e in self._pend)) \
                > 4 * self.opt.BATCH * max(self._n_proc(), 1):
            self._flush_depths()  # bound the fused shape (standalone)
            return None
        c, s, v, ph = self._gather_pend(*self._pend_arrays())
        self._pend = []
        # coarse bucket ladder: every distinct (batch, pend) shape combo is
        # a separate XLA executable (compile + per-process cache load)
        b = _bucket(len(s), lo=512)
        n = len(s)
        K = self.opt.MAX_VIEWS
        buf = np.zeros((b, 5 + K), np.float32)
        buf[:, 5:] = np.full((1, K), -1, np.int32).view(np.float32)
        buf[:n, 0:3] = c
        buf[:n, 3] = s
        buf[:n, 4] = np.ascontiguousarray(ph, np.int32).view(np.float32)
        buf[:n, 5:] = np.ascontiguousarray(v, np.int32).view(np.float32)
        return buf

    def _extend_compute(self, centers, normals, scales, views, parent_c,
                        widths):
        """Fused optimize + extend gates (one device call), bucketed/chunked
        like _optimize. Chunks pipeline: all dispatches are enqueued before
        the single blocking fetch (the depth pack threads chunk-to-chunk on
        device, so no host sync is needed between chunks)."""
        n = centers.shape[0]
        cap = max(self.opt.BATCH, 16)
        fills = (0.0, 0.0, 0.0, -1, 0.0, 1.0)
        if n > cap:
            import jax
            t0 = time.time()
            devs, lens = [], []
            for i in range(0, n, cap):
                m = min(cap, n - i)
                devs.append(self._dispatch_extend(*self._pad_chunk(
                    (centers[i:i + cap], normals[i:i + cap],
                     scales[i:i + cap], views[i:i + cap],
                     parent_c[i:i + cap], widths[i:i + cap]), fills, m)))
                lens.append(m)
            got = self._fetch(devs)
            self.stats["t_device"] += time.time() - t0
            self.stats["patches_optimized"] += n
            outs = [self._unpack_gate_out(np.array(g)[:m])
                    for g, m in zip(got, lens)]
            return tuple(np.concatenate([o[j] for o in outs])
                         for j in range(6))
        res = self._call_extend(*self._pad_chunk(
            (centers, normals, scales, views, parent_c, widths), fills, n))
        self.stats["patches_optimized"] += n
        return tuple(x[:n] for x in res)

    def _pack_gate_in(self, centers, normals, scales, views, parent_c,
                      widths):
        """Pack the 6 already-padded batch arrays into ONE (B, 11+K) f32
        buffer (views bitcast): one transfer per dispatch instead of six
        (ops/optimizer.py packed-dispatch note)."""
        B = len(scales)
        K = views.shape[1]
        buf = np.empty((B, 11 + K), np.float32)
        buf[:, 0:3] = centers
        buf[:, 3:6] = normals
        buf[:, 6] = scales
        buf[:, 7:10] = parent_c
        buf[:, 10] = widths
        buf[:, 11:] = np.ascontiguousarray(views, np.int32).view(np.float32)
        return buf

    @staticmethod
    def _unpack_gate_out(arr):
        """Packed (B, 11+K) f32 output -> (oc, on, os, ov, ok, col) numpy."""
        arr = np.asarray(arr)
        ov = np.ascontiguousarray(arr[:, 11:]).view(np.int32)
        return (arr[:, 0:3], arr[:, 3:6], arr[:, 6], ov,
                arr[:, 10] > 0.5, arr[:, 7:10])

    def _dispatch_extend(self, centers, normals, scales, views, parent_c,
                         widths):
        """Enqueue the fused optimize+gate dispatch on an already padded
        batch; returns the packed DEVICE output array without blocking
        (unpack with _unpack_gate_out after fetch). Deferred depth adds
        ride along (packed pend buffer) and the updated z-buffer stays
        on-device -- ONE dispatch for optimize + gates + setDepths, one
        H2D transfer for the batch and one D2H for the results."""
        pend = self._take_pending()
        # all-bare batches (branch / seed dispatches) statically skip the
        # geometric gates -- heavy HBM-gather loops whose per-lane results
        # those lanes discard anyway (~2x dispatch cost measured on-chip)
        gates = bool((widths > 0).any())
        xin = self._dev_batch(self._pack_gate_in(
            centers, normals, scales, views, parent_c, widths))
        if pend is not None:
            p = self._dev_repl(pend)
            if self.mesh is not None:
                out, depth = self._sharded_gate_call(xin, p)
            else:
                out, depth = popt.optimize_and_gate_packed(
                    self.scene.ctx, self.pack, self.opt,
                    self.scene.n_cameras, xin, p, with_gates=gates,
                    pack_layout=self._pack_layout)
            self.pack = self.pack._replace(depth=depth)
        else:
            if self.mesh is not None:
                out, _ = self._sharded_gate_call(xin, self._empty_pending())
            else:
                out = popt.optimize_and_gate_packed(
                    self.scene.ctx, self.pack, self.opt,
                    self.scene.n_cameras, xin, with_gates=gates,
                    pack_layout=self._pack_layout)
        self.stats["dispatches"] += 1
        self.stats["disp_extend"] += 1
        return out

    def _sharded_gate_call(self, xin, pend):
        """Mesh-path fused extend dispatch (SpatialEngine overrides to use
        the per-block image-subset variant). Returns (packed_out, depth)."""
        if self._sharded_gate_fn is None:
            from hpmvs_tpu.parallel import mesh as pmesh
            self._sharded_gate_fn, _ = pmesh.sharded_optimize_and_gate_packed(
                self.mesh, self.scene.ctx, self.opt, self.pack,
                self.scene.n_cameras, pack_layout=self._pack_layout)
        return self._sharded_gate_fn(xin, self._dev_repl(self.pack.depth),
                                     self._dev_repl(pend))

    def _call_extend(self, centers, normals, scales, views, parent_c,
                     widths):
        """Blocking dispatch+fetch of the fused optimize+gate step on an
        already padded/shaped batch. Returns 6 writable np arrays."""
        import jax
        t0 = time.time()
        res = self._fetch(self._dispatch_extend(
            centers, normals, scales, views, parent_c, widths))
        self.stats["t_device"] += time.time() - t0
        return tuple(np.array(x) for x in self._unpack_gate_out(res))

    def _empty_pending(self):
        """All-invalid packed pend block (the sharded gate fn has one
        signature)."""
        if getattr(self, "_empty_pend_cache", None) is None:
            K = self.opt.MAX_VIEWS
            buf = np.zeros((128, 5 + K), np.float32)
            buf[:, 5:] = np.full((1, K), -1, np.int32).view(np.float32)
            self._empty_pend_cache = buf
        return self._empty_pend_cache

    @staticmethod
    def _tangent_axes(normals: np.ndarray, cam_x: np.ndarray):
        """extend/branch/regularize tangent frame (CellProcessor.cpp:98-101):
        yaxis = normalize(n x imgX), xaxis = yaxis x n."""
        y = np.cross(normals, cam_x)
        y /= np.maximum(np.linalg.norm(y, axis=1, keepdims=True), 1e-12)
        x = np.cross(y, normals)
        return x, y

    # ------------------------------------------------------------------
    # seeding (Scene::initPatches + main.cpp:127-139)
    # ------------------------------------------------------------------
    def seed(self):
        opt = self.opt
        c, n, s, v, orig = scene_mod.make_seed_patches(self.model, self.scene,
                                                       opt)
        if self._count_global(c.shape[0]) == 0:
            self.tree = LinearOctree(np.zeros(3), 2.0)
            return 0
        t0 = time.time()
        out_c, out_n, out_s, out_v, ok, col, _ = self._optimize(c, n, s, v)
        with np.errstate(invalid="ignore"):
            drift = (np.linalg.norm(out_c - orig, axis=1)
                     <= out_s * opt.SEED_DRIFT)
        keep = ok & drift
        # owned multi-host: every process dispatched the full seed batch
        # but only reads its own shards (remote lanes zero-fill, so their
        # ok is already False); ownership keys on the OPTIMIZED position --
        # a seed whose optimize drifted across a process boundary is owned
        # by neither computing process and is dropped (rare; extends refill)
        self.stats["seed_ok"] = int(ok.sum())
        self.stats["seed_drift_pass"] = int((ok & drift).sum())
        keep = self._filter_owned(keep, out_c)
        log.info("created %d initPatches out of %d points (%.1fs)",
                 int(keep.sum()), self.model.n_points, time.time() - t0)

        c, n, s, v, col = (out_c[keep], out_n[keep], out_s[keep], out_v[keep],
                           col[keep])
        if self._count_global(c.shape[0]) == 0:
            self.tree = LinearOctree(np.zeros(3), 2.0)
            return 0
        # bounding cube root (Scene.cpp:186-193); global across processes
        mn, mx = self._agree_bbox(c)
        width = float(np.max(mx - mn))
        width = max(width, 1e-6)
        self.tree = LinearOctree((mn + mx) / 2.0, width,
                                 max_level=min(opt.MAX_TREE_LEVEL + 2, 20))
        # seed scale floor (Scene.cpp:196)
        s = np.maximum(s, width / (1 << (opt.PATCH_INIT_MAXLEVEL + 1)))

        # add(p, scale): level from width formula, then conflict pushdown --
        # finer structure created by co-located finer patches forces coarser
        # patches down (doctree.h:378-394 split-with-buffer semantics)
        lv = self.tree.level_for_width(s)
        from hpmvs_tpu.core import native
        if native.available() and len(c):
            lv, keys = native.seed_pushdown(c.astype(np.float64),
                                            self.tree.center, self.tree.width,
                                            self.tree.max_level, lv)
        else:
            for _ in range(self.tree.max_level):
                keys = np.zeros(len(c), np.uint64)
                for L in np.unique(lv):
                    m = lv == L
                    keys[m] = self.tree.key_at(c[m], int(L))
                # structure level induced by all patches
                tmp = LinearOctree(self.tree.center, self.tree.width,
                                   self.tree.max_level)
                tmp.alloc_cells(lv.astype(np.int8), keys)
                sl = tmp.structure_level(c)
                new_lv = np.maximum(lv, sl)
                if (new_lv == lv).all():
                    break
                lv = new_lv

            keys = np.zeros(len(c), np.uint64)
            for L in np.unique(lv):
                m = lv == L
                keys[m] = self.tree.key_at(c[m], int(L))

        pair = np.stack([lv.astype(np.uint64), keys])
        uniq, inv = np.unique(pair, axis=1, return_inverse=True)
        cids = self.tree.alloc_cells(uniq[0].astype(np.int8),
                                     uniq[1].astype(np.uint64))

        pids = self.patches.alloc(len(c))
        self.patches.center[pids] = c
        self.patches.normal[pids] = n
        self.patches.scale[pids] = s
        self.patches.views[pids] = v
        self.patches.color[pids] = col
        self.insert_patches(pids, cids[inv])
        self._set_depths(pids)

        # initFromTree (CellProcessor.cpp:422-455): queue at level*10
        self._push_many(uniq[0].astype(np.int64) * 10, cids)
        self.stats["seeds"] = len(c)
        return len(c)

    # ------------------------------------------------------------------
    # the cell state machine, batched (CellProcessor::processCell)
    # ------------------------------------------------------------------
    def process_priority_step(self, prio: int) -> bool:
        """Drain every queue entry with priority <= prio
        (one OMP-parallel processQueue sweep in the reference,
        main.cpp:150-154)."""
        changed = False
        while True:
            pmin = self._agree_pmin(prio)
            if pmin is None:
                break
            live = self._pop_live(pmin)
            if self._count_global(len(live)) == 0:
                continue
            changed = True
            t0 = time.time()
            self._process_cells(live, pmin)
            self.stats[f"t_phase{pmin % 10}"] += time.time() - t0
            self.stats["cells_processed"] += len(live)
            # per-wave-generation callback (time-budget snapshots): each
            # inner iteration drains one frontier generation, so this fires
            # every few seconds even inside a minutes-long priority step
            if self.wave_hook is not None:
                self.wave_hook(self)
        return changed

    def _pop_live(self, pmin) -> np.ndarray:
        """Pop + dedup the local queue entries at priority pmin (the owned
        engine may hold none when another process set the global pmin)."""
        chunks = self.queue.pop(int(pmin), [])
        if not chunks:
            return np.zeros((0,), np.int64)
        cells = (np.concatenate(chunks) if len(chunks) > 1
                 else np.asarray(chunks[0], np.int64))
        # dedup keeping first occurrence + drop dead/empty cells (the
        # reference dangles pointers here)
        _, first = np.unique(cells, return_index=True)
        cells = cells[np.sort(first)]
        self._ensure_heads()
        return cells[self.tree.alive[cells] & (self.cell_head[cells] >= 0)]

    def _process_cells(self, cids: np.ndarray, prio: int):
        opt = self.opt
        if prio >= opt.max_prio:
            return
        # filter multi-patch cells first (CellProcessor.cpp:377-378)
        heads = self.cell_head[cids]
        multi = cids[self.patches.nxt[heads] >= 0]
        if len(multi):
            self._filter_cells(multi)

        first_pid = self.cell_head[cids]
        expanded = self.patches.expanded[first_pid]
        flat = self.patches.flatness[first_pid]

        # extend/branch dispatch device collectives -> their participation
        # must be agreed globally in owned multi-host mode (empty local
        # batches still join); filter/regularize/remove are host-only
        ext = cids[~expanded]
        if self._count_global(len(ext)):
            self._extend_cells(ext)
        reg = cids[expanded & (flat < 0)]
        if len(reg):
            self._regularize_cells(reg)
        rem = cids[expanded & (flat > opt.FLATNESS_REMOVE)]
        if len(rem):
            self._remove_cells(rem)
        bra = cids[expanded & (flat >= 0) & (flat <= opt.FLATNESS_REMOVE)]
        if self._count_global(len(bra)):
            self._branch_cells(bra)

    # -- filter (CellProcessor::filter, :43-82) -------------------------
    def _filter_keepers(self, cids: np.ndarray):
        """The filter's deterministic keeper decision (best mean signed
        plane support), side-effect free so the branch-boundary lookahead
        can simulate the next wave's post-filter heads. Returns
        (keeper_pid_per_cell, losers)."""
        m, mask = self._members(cids)                   # (C, M)
        C, M = m.shape
        if M <= 1:
            return m[:, 0], np.zeros((0,), np.int64)
        cs = self.patches.center[np.maximum(m, 0)]      # (C, M, 3)
        ns = self.patches.normal[np.maximum(m, 0)]
        ns = ns / np.maximum(np.linalg.norm(ns, axis=2, keepdims=True),
                             1e-12)
        # mean *signed* plane distance of the others (reference quirk)
        diff = cs[:, None, :, :] - cs[:, :, None, :]    # (C, i, j, 3)
        d = np.einsum("cik,cijk->cij", ns, diff)
        pair = mask[:, None, :] & mask[:, :, None] \
            & ~np.eye(M, dtype=bool)[None]
        d = np.where(pair, d, 0.0)
        cnt = mask.sum(1)
        dist = d.sum(2) / np.maximum(cnt - 1, 1)[:, None]
        dist = np.where(mask, dist, np.inf)
        best = np.argmin(dist, axis=1)
        keeper = m[np.arange(C), best]
        losers = m[mask & (np.arange(M)[None] != best[:, None])]
        return keeper, losers

    def _filter_cells(self, cids: np.ndarray):
        """Keep the best-plane-support patch per multi-patch cell, batched
        over all cells at once (padded member matrix)."""
        keeper, losers = self._filter_keepers(cids)
        self.cell_head[cids] = keeper
        self.patches.nxt[keeper] = -1
        self.patches.cell[keeper] = cids
        if len(losers):
            self._set_depths(losers, subtract=True)
            self.patches.free(losers)
            self.stats["filtered"] += len(losers)

    # -- extend (CellProcessor::extend, :84-178) ------------------------
    def _extend_cells(self, cids: np.ndarray):
        """Optionally in EXTEND_SUBROUNDS sequential sub-rounds so later
        candidates depth-test against surfaces accepted earlier in the same
        level (freshness knob; the reference interleaves per cell)."""
        r = max(1, int(self.opt.EXTEND_SUBROUNDS))
        if r > 1 and len(cids) > 1:
            for part in np.array_split(cids, min(r, len(cids))):
                if len(part):
                    self._extend_cells_batch(part)
            return
        self._extend_cells_batch(cids)

    def _extend_cells_batch(self, cids: np.ndarray):
        opt = self.opt
        pids = self.cell_head[cids]
        spec = self._spec
        self._spec = None
        if spec is not None:
            if self._spec_matches(spec, pids):
                self.stats["lookahead_hits"] += 1
                if spec.get("deep"):
                    self._deep_consume(spec, cids, pids)
                else:
                    self._extend_finish_from(spec, cids, pids)
                return
            # speculation missed: its depth-pend side effects were real and
            # already threaded into self.pack (always correct); only the
            # gate output is dropped. Fall through to a fresh dispatch.
            # Dropped lanes never counted into patches_optimized (count=
            # False at dispatch); tracked separately as speculative waste.
            self.stats["lookahead_misses"] += 1
            self.stats["spec_dropped_lanes"] += len(spec["cand_c"])
        centers = self.patches.center[pids]
        normals = self.patches.normal[pids]
        views = self.patches.views[pids]
        prio_red = self.patches.prio_red[pids]
        _, widths = self.tree.cell_center_width(cids)
        levels = self.tree.node_level(cids)

        (c_in, n_in, s_in, v_in, p_in, w_in, src_sel, lv_lanes,
         pr_lanes) = self._extend_candidates(centers, normals, views,
                                             prio_red, widths, levels)
        self.stats["extend_candidates"] += len(c_in)
        if self._count_global(len(c_in)) == 0:
            self._finish_extend(cids, pids, levels, prio_red)
            return

        if (opt.WAVE_LOOKAHEAD and opt.EXTEND_SUBROUNDS <= 1
                and self._lookahead_ok()):
            # speculative-pipeline path: dispatch all chunks, fetch, then
            # speculate wave N+1 BEFORE routing (whole-batch route; the
            # in-batch first-wins dedup stands in for chunked ordering
            # exactly as it stands in for the reference's sequential order)
            devs = self._spec_dispatch(c_in, n_in, s_in, v_in, p_in, w_in)
            out = self._fetch_spec_chunks(devs)
            self._speculate_next(out, lv_lanes, pr_lanes)
            n_ins = self._route_extend(*out, lv_lanes, pr_lanes,
                                       cids[src_sel])
            self._commit_spec()
            self.stats["extended"] += n_ins
            self._finish_extend(cids, pids, levels, prio_red)
            return

        n_ins = 0
        for a, b, (oc, on, os_, ov, okk, col) in self._extend_stream(
                c_in, n_in, s_in, v_in, p_in, w_in):
            # routing chunk i overlaps chunks i+1..'s device compute; the
            # insert-time occupancy re-check keeps first-wins order
            # identical to whole-batch routing
            n_ins += self._route_extend(oc, on, os_, ov, okk, col,
                                        lv_lanes[a:b], pr_lanes[a:b],
                                        cids[src_sel[a:b]])
        self.stats["extended"] += n_ins

        self._finish_extend(cids, pids, levels, prio_red)

    def _extend_candidates(self, centers, normals, views, prio_red, widths,
                           levels):
        """Tangent-disc extend candidates for a batch of parent patches with
        the occupancy/level economy pre-check (CellProcessor.cpp:98-133:
        skip occupied/finer targets; outside-root candidates are dropped --
        single-tree border semantics, the halo-exchange hook for sharding).
        Returns per-lane dispatch inputs + the parent index of each lane."""
        opt = self.opt
        N = opt.EXTEND_DIRS
        cam_x = self.cam_xaxis_np[np.maximum(views[:, 0], 0)]
        xax, yax = self._tangent_axes(normals, cam_x)

        ang = 2.0 * np.pi / N * np.arange(N)
        dx, dy = np.cos(ang), np.sin(ang)
        # candidate centers (B, N, 3)
        cand_c = (centers[:, None, :]
                  + (dx[None, :, None] * xax[:, None, :]
                     + dy[None, :, None] * yax[:, None, :])
                  * widths[:, None, None])
        B = len(centers)
        cand_c = cand_c.reshape(B * N, 3).astype(np.float32)
        src = np.repeat(np.arange(B), N)

        inside = self.tree.contains(cand_c)
        occupied = self.tree.containing_cell(cand_c) >= 0
        finer = self.tree.structure_level(cand_c) > levels[src]
        todo = inside & ~occupied & ~finer
        sel = np.nonzero(todo)[0]
        seg = src[sel]
        return (cand_c[sel], normals[seg],
                (widths[seg] * opt.EXTEND_SCALE / 2.0).astype(np.float32),
                views[seg], centers[seg].astype(np.float32),
                widths[seg].astype(np.float32), seg, levels[seg],
                prio_red[seg])

    def _lookahead_ok(self) -> bool:
        """Wave lookahead runs in the single-controller engines only: with
        multi-controller replicated state every process would speculate
        identically, but the owned/spatial engines (which override this off)
        are the supported multi-process path."""
        return not self._mp

    # deep dispatches get a finer pow-2 bucket ladder up to this cap: a
    # single-chunk deep batch serves waves the classic path would chunk,
    # so chains survive the large late-level waves where the compute is.
    # The hard ceiling is the window-DMA kernel's scalar-prefetch arrays
    # (pallas_fetch.py): B x n_windows s32 indices live in the 1 MB SMEM,
    # which overflows at B=4096 on deeper pyramids (measured on-chip: the
    # megapixel facade exceeds it by 1.1 KB; B=8192 fails on every scene)
    DEEP_BATCH_CAP = 2048

    def _deep_bucket(self, n: int) -> int:
        b = 512
        while b < n:
            b *= 2
        return min(b, self.DEEP_BATCH_CAP)

    def _deep_ok(self, n: int) -> bool:
        """Deep multi-wave dispatch (ops/deepwave.py) runs in the
        single-device engine for waves up to DEEP_BATCH_CAP; larger waves
        amortize the RPC over compute and use the chunked classic path."""
        return (self.opt.WAVE_DEPTH > 1 and self.mesh is None
                and n <= self.DEEP_BATCH_CAP)

    def _deep_dispatch(self, c_in, n_in, s_in, v_in, p_in, w_in):
        """Enqueue ONE WAVE_DEPTH-generation fused dispatch (deepwave.
        optimize_and_gate_deep) WITHOUT blocking: the device router chains
        the following waves' optimize+gates behind this wave's, so the
        host<->device round trip is paid once per WAVE_DEPTH waves.
        Returns (stacked device out array, n_lanes)."""
        from hpmvs_tpu.ops import deepwave
        fills = (0.0, 0.0, 0.0, -1, 0.0, 1.0)
        n = len(c_in)
        t0 = time.time()
        pend = self._take_pending()
        b = self._deep_bucket(n)
        padded = []
        for a, fill in zip((c_in, n_in, s_in, v_in, p_in, w_in), fills):
            buf = np.full((b,) + a.shape[1:], fill, a.dtype)
            buf[:n] = a[:n]
            padded.append(buf)
        xin = jnp.asarray(self._pack_gate_in(*padded))
        outs, depth = deepwave.optimize_and_gate_deep(
            self.scene.ctx, self.pack, self.opt, self.scene.n_cameras,
            xin, jnp.asarray(np.asarray(self.tree.center, np.float32)),
            jnp.float32(self.tree.width),
            pend=None if pend is None else jnp.asarray(pend),
            n_gens=int(self.opt.WAVE_DEPTH),
            pack_layout=self._pack_layout)
        self.pack = self.pack._replace(depth=depth)
        self.stats["dispatches"] += 1
        self.stats["disp_deep"] += 1
        self.stats["t_device"] += time.time() - t0
        return outs, n

    def _deep_consume(self, spec, cids, pids):
        """Consume generation spec['g'] of a deep dispatch as the popped
        wave (the deep twin of _extend_finish_from; see ops/deepwave.py for
        the superset/fresh-recheck contract).

        Per generation: re-apply the tree pre-checks FRESH on the
        device-returned candidate positions, reconcile the DEVICE winner
        set against the host router's (device winners are a superset;
        false winners' device depth adds are repaired with staged
        subtracts, host winners the device dedup missed -- float-boundary
        quantization -- get their adds staged), route, then either step to
        the next on-device generation (when every host winner has its
        children rows) or fall back to a fresh speculative dispatch."""
        from hpmvs_tpu.ops import deepwave
        g = int(spec["g"])
        if spec["outs"] is None:
            interval = time.time() - spec["t_dispatched"]
            dev_inside = self.stats["t_device"] - spec["t_dev_mark"]
            self.stats["t_host_overlapped"] += max(interval - dev_inside, 0.0)
            t0 = time.time()
            spec["outs"] = np.asarray(self._fetch(spec["dev"]))
            self.stats["t_device"] += time.time() - t0
        W, B = spec["outs"].shape[:2]
        DIRS = int(self.opt.EXTEND_DIRS)
        full = deepwave.unpack_deep_out(spec["outs"][g])
        oc_f, on_f, os_f, ov_f, ok_f, col_f, cand_f, win_f = full
        if g == 0:
            rows = np.arange(int(spec["n_lanes"]))
            cand = spec["cand_c"]        # host-built, f64-accurate
        else:
            rows = spec["rows"]
            cand = cand_f[rows]
        lv_l = spec["lv_lanes"]
        pr_l = spec["pr_lanes"]
        src = spec["src_sel"]
        cell_lv = spec["levels"]
        cell_pr = spec["prio_red"]
        oc, on = oc_f[rows], on_f[rows]
        os_, ov = os_f[rows], ov_f[rows]
        col = col_f[rows]
        fresh = (self.tree.contains(cand)
                 & (self.tree.containing_cell(cand) < 0)
                 & (self.tree.structure_level(cand) <= lv_l))
        okf = ok_f[rows] & fresh
        self.stats["extend_candidates"] += int(fresh.sum())
        self.stats["patches_optimized"] += int(fresh.sum())
        self.stats["spec_waste_lanes"] += len(fresh) - int(fresh.sum())
        # the router's acceptance, precomputed (deterministic)
        ok2, _ = self._insert_winners(oc, okf, lv_l)
        acc = np.nonzero(ok2)[0]
        has_next = g + 1 < W
        deep_next = False
        if has_next:
            hw_full = rows[acc]
            if g == 0:
                # gen-0's winner adds happened ON DEVICE (only gen-0: see
                # optimize_and_gate_deep -- deeper gens run with add lag
                # instead of false-winner pollution). Reconcile: subtract
                # the false winners, add the host winners the device dedup
                # missed (float-boundary quantization), and have routing
                # skip its own _set_depths.
                ins_full = np.zeros(B, bool)
                ins_full[hw_full] = True
                false_w = win_f & ~ins_full
                if false_w.any():
                    self._pend_raw(oc_f[false_w], os_f[false_w],
                                   ov_f[false_w], subtract=True)
                    self.stats["deep_false_winner_repairs"] += \
                        int(false_w.sum())
                miss_add = hw_full[~win_f[hw_full]]
                if len(miss_add):
                    self._pend_raw(oc_f[miss_add], os_f[miss_add],
                                   ov_f[miss_add], subtract=False)
                self._depths_pre_added = True
            # next-gen coverage: every host winner must own children rows
            dev_lanes = np.nonzero(win_f)[0]
            n_par = B // DIRS
            if len(acc) == 0:
                self.stats["deep_fb_dead"] += 1
            elif len(dev_lanes) == 0:
                self.stats["deep_fb_mismatch"] += 1
            else:
                pos = np.searchsorted(dev_lanes, hw_full)
                safe = np.minimum(pos, len(dev_lanes) - 1)
                in_dev = (pos < len(dev_lanes)) & (dev_lanes[safe] == hw_full)
                covered = in_dev & (pos < n_par)
                deep_next = bool(covered.all())
                if not deep_next:
                    if bool(in_dev.all()):
                        self.stats["deep_fb_overflow"] += 1
                    else:
                        self.stats["deep_fb_mismatch"] += 1
        if not deep_next:
            if has_next:
                self.stats["deep_fallbacks"] += 1
                self.stats["spec_dropped_lanes"] += (W - g - 1) * B
            # last generation (or fallback): classic next-wave speculation
            # BEFORE routing mutates the tree (may itself go deep)
            self._speculate_next((oc, on, os_, ov, okf, col), lv_l, pr_l)
            n_ins = self._route_extend(oc, on, os_, ov, okf, col, lv_l,
                                       pr_l, cids[src])
            self._commit_spec()
            self.stats["extended"] += n_ins
            self._finish_extend(cids, pids, cell_lv, cell_pr)
            return
        n_ins = self._route_extend(oc, on, os_, ov, okf, col, lv_l, pr_l,
                                   cids[src])
        self.stats["extended"] += n_ins
        self._finish_extend(cids, pids, cell_lv, cell_pr)
        # step the spec to the next on-device generation: wave N+1's lanes
        # are the children rows of the just-inserted parents, in insertion
        # (ascending-lane) order == their queue pop order
        new_pids = np.asarray(self._last_inserted)
        if len(new_pids) != len(acc):       # never expected
            self._spec = None
            self.stats["deep_fallbacks"] += 1
            return
        spec["rows"] = (pos[:, None] * DIRS
                        + np.arange(DIRS)[None]).ravel()
        spec["lv_lanes"] = np.repeat(lv_l[acc], DIRS)
        spec["pr_lanes"] = np.repeat(pr_l[acc], DIRS)
        spec["src_sel"] = np.repeat(np.arange(len(acc)), DIRS)
        spec["levels"] = lv_l[acc]
        spec["prio_red"] = pr_l[acc]
        spec["n_par"] = len(acc)
        spec["par_pids"] = new_pids.copy()
        spec["par_c"] = self.patches.center[new_pids].copy()
        spec["g"] = g + 1
        self.stats["deep_gens_consumed"] += 1
        self._spec = spec

    def _spec_dispatch(self, c_in, n_in, s_in, v_in, p_in, w_in,
                       count: bool = True):
        """Enqueue a wave's extend batch as bucketed chunk dispatches
        WITHOUT blocking; returns [(dev, a, b), ...] for _fetch_spec_chunks.
        count=False for SPECULATIVE dispatches: their lanes are counted at
        consume time from the fresh re-check's survivors (the lanes a
        non-speculative engine would have dispatched), so a dropped
        speculation or stale-superset lanes never inflate
        patches_optimized (r4 advisory)."""
        fills = (0.0, 0.0, 0.0, -1, 0.0, 1.0)
        cap = max(self.opt.BATCH, 16)
        n = len(c_in)
        t0 = time.time()
        devs = []
        for i in range(0, n, cap):
            m = min(cap, n - i)
            devs.append((self._dispatch_extend(*self._pad_chunk(
                (c_in[i:i + cap], n_in[i:i + cap], s_in[i:i + cap],
                 v_in[i:i + cap], p_in[i:i + cap], w_in[i:i + cap]),
                fills, m)), i, i + m))
        if count:
            self.stats["patches_optimized"] += n
        self.stats["t_device"] += time.time() - t0
        return devs

    def _fetch_spec_chunks(self, devs):
        """Blocking fetch of _spec_dispatch chunks -> one unpacked wave."""
        t0 = time.time()
        outs = [np.array(self._fetch(dev))[:b - a] for dev, a, b in devs]
        self.stats["t_device"] += time.time() - t0
        return self._unpack_gate_out(
            outs[0] if len(outs) == 1 else np.concatenate(outs))

    def _spec_matches(self, spec, pids) -> bool:
        # pids AND content: an external mutation between waves (dense BA
        # moving centers, checkpoint restore) leaves pids equal but voids
        # the speculated inputs -- drop_speculation() covers the known
        # sites, the center comparison is the belt-and-braces
        return spec["par_pids"] is not None \
            and len(pids) == len(spec["par_pids"]) \
            and np.array_equal(spec["par_pids"], pids) \
            and np.array_equal(self.patches.center[pids], spec["par_c"])

    def drop_speculation(self):
        """Void any outstanding wave speculation. Call after mutating
        engine state outside the wave loop (dense BA, checkpoint restore,
        reroot): the speculative dispatch's inputs were captured before the
        mutation. Its depth-pend side effects remain correct either way."""
        self._spec = None

    def _commit_spec(self):
        """Bind the speculation to the router's actual alloc: the simulated
        winners and the routed winners are the same deterministic set, so
        the freshly inserted pids ARE the speculated parents (in order).
        A count mismatch (never expected) voids the speculation."""
        spec = self._spec
        if spec is None:
            return
        pids = getattr(self, "_last_inserted", None)
        if pids is None or len(pids) != spec["n_par"]:
            self._spec = None
            return
        spec["par_pids"] = np.asarray(pids).copy()

    def _extend_finish_from(self, spec, cids, pids):
        """Consume a speculative extend dispatch whose predicted wave
        membership matched the popped wave exactly."""
        # host work done between the speculative dispatch and this fetch ran
        # UNDER an in-flight device dispatch: it is off the critical path
        # (bench.py reports the residual as host_serial_fraction). Device-
        # blocking time accumulated INSIDE the interval (the intervening
        # wave's regularize/branch/optimize fetches) is already in t_device,
        # so subtract its delta to avoid double-counting (r4 advisory).
        interval = time.time() - spec["t_dispatched"]
        dev_inside = self.stats["t_device"] - spec["t_dev_mark"]
        self.stats["t_host_overlapped"] += max(interval - dev_inside, 0.0)
        out = self._fetch_spec_chunks(spec["devs"])
        # re-apply the economy pre-check FRESH (the dispatch used a one-wave
        # stale tree, so a superset of lanes ran): masking the now
        # occupied/finer candidate targets out of ok before routing makes
        # the routed lane set match a non-speculative wave up to one
        # documented asymmetry -- the mask only REMOVES lanes, so candidate
        # targets freed between speculation and consumption (remove-phase
        # frees, filters on other cells) are absent versus a non-speculative
        # wave; with the one-dispatch depth-add deferral these are the two
        # lookahead divergences (statistical parity covers both)
        cand = spec["cand_c"]
        lv = spec["lv_lanes"]
        fresh = (self.tree.contains(cand)
                 & (self.tree.containing_cell(cand) < 0)
                 & (self.tree.structure_level(cand) <= lv))
        self.stats["extend_candidates"] += int(fresh.sum())
        # the consumed wave's true optimize count: the lanes a non-speculative
        # wave would have dispatched (see _spec_dispatch count=False)
        self.stats["patches_optimized"] += int(fresh.sum())
        self.stats["spec_waste_lanes"] += len(fresh) - int(fresh.sum())
        oc, on, os_, ov, ok, col = out
        out = (oc, on, os_, ov, ok & fresh, col)
        self._speculate_next(out, spec["lv_lanes"], spec["pr_lanes"])
        n_ins = self._route_extend(*out, spec["lv_lanes"], spec["pr_lanes"],
                                   cids[spec["src_sel"]])
        self._commit_spec()
        self.stats["extended"] += n_ins
        self._finish_extend(cids, pids, spec["levels"], spec["prio_red"])

    def _speculate_next(self, out, lv_lanes, pr_lanes):
        """Wave-level lookahead (SCALING.md section 3 footnote 2): the next
        extend wave at this pmin consists EXACTLY of the patches this wave's
        routing is about to insert, and insertion is a deterministic
        function of the fetched gate output + the current tree -- simulated
        here with the router's own _insert_winners BEFORE routing mutates
        anything. Dispatching those patches' extend batch now lets wave N's
        host routing (and the per-dispatch RPC latency) overlap wave N+1's
        device compute -- the reference gets the same overlap from separate
        scheduler threads (main.cpp:150-154).

        Semantics (documented divergences, WAVE_LOOKAHEAD to disable):
        wave N's depth ADDS are pre-staged from the simulated winners and
        ride this dispatch -- the same dispatch they ride non-speculatively
        -- so the next wave's gates read a z-buffer with NO add lag; only
        subtracts created after the speculation (removal phase losers) lag
        one dispatch. The occupancy pre-check at dispatch is one wave stale
        (a superset of lanes runs); _extend_finish_from re-applies it FRESH
        before routing, which REMOVES now-invalid lanes but cannot ADD
        candidate targets freed between speculation and consumption
        (remove-phase cell frees, filters on other cells) -- those lanes
        are absent versus a non-speculative wave. Large waves route
        whole-batch (the in-batch first-wins dedup standing in for chunked
        ordering, like it stands in for the reference's sequential
        arrivals)."""
        self._spec = None
        opt = self.opt
        if not (opt.WAVE_LOOKAHEAD and opt.EXTEND_SUBROUNDS <= 1
                and self._lookahead_ok()):
            return
        oc, on, os_, ov, ok, col = out
        ok2, _ = self._insert_winners(oc, ok, lv_lanes)
        acc = np.nonzero(ok2)[0]
        if len(acc) == 0:
            return
        par_c = np.ascontiguousarray(oc[acc], np.float32)
        par_n = np.ascontiguousarray(on[acc], np.float32)
        par_v = np.ascontiguousarray(ov[acc])
        lv_a = lv_lanes[acc]
        pr_a = pr_lanes[acc]
        widths = self.tree.width / (2.0 ** lv_a.astype(np.float64))
        (c_in, n_in, s_in, v_in, p_in, w_in, src_sel, lv2,
         pr2) = self._extend_candidates(par_c, par_n, par_v, pr_a, widths,
                                        lv_a)
        if len(c_in) == 0:
            return
        # pre-stage wave N's depth ADDS from the simulated winners (the
        # identical arrays routing's _set_depths(new_pids) would snapshot):
        # they ride this speculative dispatch -- the SAME dispatch they
        # ride in the non-speculative path -- so the z-buffer the next
        # wave's gates read has NO freshness lag. Routing skips its own
        # _set_depths for these inserts (_depths_pre_added).
        self._pend.append((par_c.copy(),
                           np.ascontiguousarray(os_[acc], np.float32),
                           par_v.copy(), False))
        self._depths_pre_added = True
        # predicted pids: the router allocs deterministically in acc order;
        # recorded AFTER routing by _commit_spec (the next wave's pop is
        # compared against them)
        spec = {"src_sel": src_sel, "par_c": par_c,
                "cand_c": c_in, "lv_lanes": lv2, "pr_lanes": pr2,
                "levels": lv_a, "prio_red": pr_a, "n_par": len(acc),
                "par_pids": None, "t_dispatched": time.time(),
                "t_dev_mark": float(self.stats["t_device"])}
        if self._deep_ok(len(c_in)):
            dev, n_lanes = self._deep_dispatch(c_in, n_in, s_in, v_in,
                                               p_in, w_in)
            spec.update(deep=True, g=0, outs=None, dev=dev,
                        n_lanes=n_lanes)
        else:
            spec["devs"] = self._spec_dispatch(c_in, n_in, s_in, v_in,
                                               p_in, w_in, count=False)
        spec["t_dispatched"] = time.time()
        spec["t_dev_mark"] = float(self.stats["t_device"])
        self._spec = spec

    def _extend_stream(self, centers, normals, scales, views, parent_c,
                       widths):
        """Yield (start, stop, results) per chunk: every chunk's dispatch is
        enqueued before the first blocking fetch, so chunk i's host routing
        overlaps chunk i+1..'s device compute AND the per-dispatch RPC
        latency. The spatial engine overrides this with its block-major
        single batch."""
        import jax
        n = centers.shape[0]
        cap = max(self.opt.BATCH, 16)
        fills = (0.0, 0.0, 0.0, -1, 0.0, 1.0)
        t0 = time.time()
        devs, spans = [], []
        for i in range(0, n, cap):
            m = min(cap, n - i)
            devs.append(self._dispatch_extend(*self._pad_chunk(
                (centers[i:i + cap], normals[i:i + cap],
                 scales[i:i + cap], views[i:i + cap],
                 parent_c[i:i + cap], widths[i:i + cap]), fills, m)))
            spans.append((i, i + m))
        self.stats["patches_optimized"] += n
        self.stats["t_device"] += time.time() - t0
        for dev, (a, b) in zip(devs, spans):
            t1 = time.time()
            got = self._fetch(dev)
            self.stats["t_device"] += time.time() - t1
            yield a, b, self._unpack_gate_out(np.array(got)[:b - a])

    def _route_extend(self, oc, on, os_, ov, ok, col, lv_t, prio_red,
                      src_cids) -> int:
        """Insert the gated extend candidates. Single-tree engine: all
        candidates are local (the spatial engine overrides this to migrate
        cross-block candidates through the halo collective -- the
        distributeBorderCell analog, CellProcessor.cpp:487-540)."""
        del src_cids
        return self._insert_new_patches(oc, on, os_, ov, ok, col, lv_t,
                                        prio_red)

    def _insert_winners(self, oc, ok, lv_t):
        """The deterministic insertability decision of _insert_new_patches
        (addConditional re-checks + first-wins in-batch dedup), factored out
        so wave lookahead can SIMULATE the router's acceptances exactly
        against the same tree state. Returns (ok_mask, keys)."""
        ok = ok & self.tree.contains(oc)
        ok = ok & (self.tree.containing_cell(oc) < 0)
        ok = ok & (self.tree.structure_level(oc) <= lv_t)
        keys = np.zeros(len(oc), np.uint64)
        idx_ok = np.nonzero(ok)[0]
        if len(idx_ok):
            for L in np.unique(lv_t[idx_ok]):
                m = ok & (lv_t == L)
                keys[m] = self.tree.key_at(oc[m], int(L))
            pair = np.stack([lv_t[idx_ok].astype(np.uint64), keys[idx_ok]])
            _, first_idx = np.unique(pair, axis=1, return_index=True)
            winner = np.zeros(len(oc), bool)
            winner[idx_ok[first_idx]] = True
            ok = ok & winner
        return ok, keys

    def _insert_new_patches(self, oc, on, os_, ov, ok, col, lv_t, prio_red,
                            flatness: float = -1.0,
                            dirty: bool = False) -> int:
        """addConditional + insertion of new gated patches (extend results or
        migrated border arrivals): the target leaf must be inside the root,
        empty and not finer (doctree.h:396-419), with a deterministic
        first-wins dedup within the batch standing in for the reference's
        sequential arrival order. Accepted patches alloc a cell + patch row,
        scatter into the depth buffers and queue at (level+prio_red)*10."""
        # addConditional at the *optimized* position (CellProcessor.cpp:154)
        ok, keys = self._insert_winners(oc, ok, lv_t)
        acc = np.nonzero(ok)[0]
        if len(acc) == 0:
            # a leaked one-shot flag would make a later unrelated insert
            # skip its _set_depths (r4 advisory); unreachable today (the
            # flag is only set when the speculation simulated >0 winners on
            # the identical tree) but cleared defensively
            self._depths_pre_added = False
            self._last_inserted = acc
            return 0
        lv_a = lv_t[acc]
        pr_a = prio_red[acc]
        new_cids = self.tree.alloc_cells(lv_a.astype(np.int8), keys[acc])
        new_pids = self.patches.alloc(len(acc))
        self.patches.center[new_pids] = oc[acc]
        self.patches.normal[new_pids] = on[acc]
        self.patches.scale[new_pids] = os_[acc]
        self.patches.views[new_pids] = ov[acc]
        self.patches.color[new_pids] = col[acc]
        self.patches.flatness[new_pids] = flatness
        self.patches.expanded[new_pids] = False
        self.patches.prio_red[new_pids] = pr_a
        self.patches.dirty[new_pids] = dirty
        self._last_inserted = new_pids
        self.insert_patches(new_pids, new_cids)
        if getattr(self, "_depths_pre_added", False):
            # _speculate_next already staged these adds into the window
            # that rode the speculative dispatch (one-shot flag, set only
            # for the route call immediately following the speculation)
            self._depths_pre_added = False
        else:
            self._set_depths(new_pids)
        self._push_many((lv_a.astype(np.int64) + pr_a) * 10, new_cids)
        return len(acc)

    def _finish_extend(self, cids, pids, levels, prio_red):
        """Mark expanded + requeue at phase 1 (CellProcessor.cpp:380-387).
        Processing clears the dirty flag set by border arrivals."""
        self.patches.expanded[pids] = True
        self.patches.dirty[pids] = False
        self._push_many((levels + prio_red) * 10 + 1, cids)

    # -- regularize (CellProcessor::regularize, :309-367) ---------------
    def _regularize_cells(self, cids: np.ndarray):
        opt = self.opt
        hw = opt.REGULARIZE_HWIN
        pids = self.cell_head[cids]
        centers = self.patches.center[pids]
        normals = self.patches.normal[pids]
        views = self.patches.views[pids]
        _, widths = self.tree.cell_center_width(cids)
        levels = self.tree.node_level(cids)

        cam_x = self.cam_xaxis_np[np.maximum(views[:, 0], 0)]
        xax, yax = self._tangent_axes(normals, cam_x)

        offs = [(xx, yy) for yy in range(-hw, hw + 1)
                for xx in range(-hw, hw + 1) if not (xx == 0 and yy == 0)]
        M = len(offs)
        oo = np.asarray(offs, np.float64)               # (M, 2)
        pts = (centers[:, None, :]
               + (oo[None, :, 0, None] * xax[:, None, :]
                  + oo[None, :, 1, None] * yax[:, None, :])
               * widths[:, None, None])
        B = len(cids)
        flat_pts = pts.reshape(B * M, 3)
        owner = self.tree.containing_cell(flat_pts).reshape(B, M)
        # owned multi-host: neighbor positions in remote processes' blocks
        # are invisible to the local tree; count them as present with zero
        # plane error (leniency beats removing every process-border patch;
        # the reference's shared tree sees all neighbors, and its unlocked
        # reads tolerate similar imprecision, Scene.cpp:565)
        rc = self._remote_neighbor_counts(flat_pts).reshape(B, M).sum(1)

        # vectorized: distinct neighbor cells per row (sorted-row dedup),
        # first-patch centers straight from the cell-head array
        uniq_cells = np.unique(owner[owner >= 0])
        self._ensure_heads()
        first_pid = self.cell_head[uniq_cells] if len(uniq_cells) \
            else np.zeros((0,), np.int64)
        # owner -> index into uniq_cells (-1 stays -1)
        oidx = np.searchsorted(uniq_cells, np.maximum(owner, 0))
        oidx = np.where(owner >= 0, oidx, -1)

        srt = np.sort(np.where(oidx >= 0, oidx, np.iinfo(np.int64).max),
                      axis=1)
        distinct = np.concatenate(
            [srt[:, :1] < np.iinfo(np.int64).max,
             (srt[:, 1:] != srt[:, :-1])
             & (srt[:, 1:] < np.iinfo(np.int64).max)], axis=1)
        n_neigh = distinct.sum(1)

        n_neigh = n_neigh + rc
        pid_nb = np.where(distinct, first_pid[np.minimum(
            srt, len(uniq_cells) - 1)], -1)
        has_patch = pid_nb >= 0
        pb = self.patches.center[np.maximum(pid_nb, 0)]        # (B, M, 3)
        n_unit = normals / np.maximum(
            np.linalg.norm(normals, axis=1, keepdims=True), 1e-12)
        e = np.einsum("bj,bmj->bm", n_unit, pb - centers[:, None, :])
        sq = np.where(has_patch, e * e, 0.0)
        cnt = has_patch.sum(1) + rc
        rms = np.sqrt(sq.sum(1) / np.maximum(cnt, 1)) / widths

        flat = np.where(n_neigh < 1, opt.FLATNESS_NO_NEIGH,
                        np.where(n_neigh < 4, opt.FLATNESS_FEW_NEIGH,
                                 np.where(cnt < 1, opt.FLATNESS_NO_NEIGH,
                                          rms))).astype(np.float32)

        self.patches.flatness[pids] = flat
        self.patches.prio_red[pids] = 0  # CellProcessor.cpp:399
        self._push_many(levels * 10 + 2, cids)
        self.stats["regularized"] += B

    # -- removal (processCell flatness > 2.4 branch, :407-412) ----------
    def _remove_cells(self, cids: np.ndarray):
        pids = self.cell_head[cids]
        self._set_depths(pids, subtract=True)
        self._clear_cell_patches(cids)
        self._free_cells(cids)
        self.stats["removed"] += len(cids)

    # -- branch (CellProcessor::branch, :210-307) -----------------------
    def _branch_cells(self, cids: np.ndarray):
        opt = self.opt
        N = opt.BRANCH_DIRS
        pids = self.cell_head[cids]
        centers = self.patches.center[pids]
        normals = self.patches.normal[pids]
        scales = self.patches.scale[pids]
        views = self.patches.views[pids]
        _, widths = self.tree.cell_center_width(cids)
        levels = self.tree.node_level(cids)

        # getLevelSupport (Scene.cpp:335-344): images with resolution left
        # (host math: log2 of distance ratios, no device round trip)
        ci = np.maximum(views, 0)
        fz = np.linalg.norm(centers[:, None, :] - self.cam_center_np[ci],
                            axis=-1)
        lvl = np.round(np.log2(np.maximum(
            scales[:, None] * self.cam_fsum_np[ci] / (2.0 * fz), 1e-20)))
        support = ((lvl > opt.MINLEVEL) & (views >= 0)).sum(1)
        exhausted = support < 1
        work = np.nonzero(~exhausted)[0]
        self.stats["exhausted"] += int(exhausted.sum())
        if self._count_global(len(work)) == 0:
            return

        cam_x = self.cam_xaxis_np[np.maximum(views[work, 0], 0)]
        xax, yax = self._tangent_axes(normals[work], cam_x)
        ang = 2.0 * np.pi / N * np.arange(N) + np.pi / 4.0
        dx, dy = np.cos(ang), np.sin(ang)
        ext = widths[work] / 4.0
        cand_c = (centers[work][:, None, :]
                  + (dx[None, :, None] * xax[:, None, :]
                     + dy[None, :, None] * yax[:, None, :])
                  * ext[:, None, None])
        Bw = len(work)
        cand_c = cand_c.reshape(Bw * N, 3).astype(np.float32)
        src = np.repeat(np.arange(Bw), N)

        # candidates must stay within the parent cell (pre-gate, :252)
        lv_par = levels[work][src]
        key_par = self.tree.key[cids[work]][src]
        key_cand = np.zeros(len(cand_c), np.uint64)
        for L in np.unique(lv_par):
            m = lv_par == L
            key_cand[m] = self.tree.key_at(cand_c[m], int(L))
        in_cell = key_cand == key_par

        sel = np.nonzero(in_cell)[0]
        accepted = np.zeros(len(cand_c), bool)
        if self._count_global(len(sel)):
            c_in = cand_c[sel]
            n_in = normals[work][src[sel]]
            s_in = (widths[work][src[sel]] * opt.BRANCH_SCALE / 2.0
                    ).astype(np.float32)
            v_in = views[work][src[sel]]
            oc, on, os_, ov, ok, col, _ = self._optimize(c_in, n_in, s_in, v_in)
            # still inside the parent cell after optimization (:262)
            key_post = np.zeros(len(oc), np.uint64)
            for L in np.unique(lv_par[sel]):
                m = lv_par[sel] == L
                key_post[m] = self.tree.key_at(oc[m], int(L))
            ok &= key_post == key_par[sel]
            accepted[sel] = ok

        n_acc_per_cell = np.bincount(src[accepted], minlength=Bw)
        # no survivor && level >= PATCH_FINAL_MINLEVEL -> keep lowres (:269)
        keep_lowres = (n_acc_per_cell == 0) \
            & (levels[work] >= opt.PATCH_FINAL_MINLEVEL)
        split_mask = ~keep_lowres
        self.stats["kept_lowres"] += int(keep_lowres.sum())

        # split: remove the old patch + cell (:274-288)
        old_idx = work[split_mask]
        if len(old_idx):
            self._set_depths(pids[old_idx], subtract=True)
            self._clear_cell_patches(cids[old_idx])
            self._free_cells(cids[old_idx])

        if not accepted.any():
            return
        acc = np.nonzero(accepted)[0]
        # drop children of cells that kept their lowres patch
        child_ok = split_mask[src[acc]]
        acc = acc[child_ok]
        if len(acc) == 0:
            return

        # sel is sorted (np.nonzero), so row lookup is a binary search
        rows = np.searchsorted(sel, acc)
        child_c = oc[rows]
        child_n = on[rows]
        child_s = os_[rows]
        child_v = ov[rows]
        child_col = col[rows]
        child_lv = (lv_par[acc] + 1).astype(np.int64)
        child_key = np.zeros(len(acc), np.uint64)
        for L in np.unique(child_lv):
            m = child_lv == L
            child_key[m] = self.tree.key_at(child_c[m], int(L))

        # multiple children may share a child octant -> same cell
        # (multi-patch cells are filtered later, like the reference :291-299)
        pair = np.stack([child_lv.astype(np.uint64), child_key])
        uniq, inv = np.unique(pair, axis=1, return_inverse=True)
        # existing cells at those coords (possible when a neighbor already
        # branched here): reuse
        existing = self.tree.lookup(uniq[0].astype(np.int64),
                                    uniq[1].astype(np.uint64))
        new_mask = existing < 0
        fresh = self.tree.alloc_cells(uniq[0][new_mask].astype(np.int8),
                                      uniq[1][new_mask].astype(np.uint64))
        cell_ids = existing.copy()
        cell_ids[new_mask] = fresh

        new_pids = self.patches.alloc(len(acc))
        self.patches.center[new_pids] = child_c
        self.patches.normal[new_pids] = child_n
        self.patches.scale[new_pids] = child_s
        self.patches.views[new_pids] = child_v
        self.patches.color[new_pids] = child_col
        self.patches.flatness[new_pids] = -1.0
        self.patches.expanded[new_pids] = False
        par_prio_red = self.patches.prio_red[pids[work][src[acc]]]
        self.patches.prio_red[new_pids] = par_prio_red
        self.insert_patches(new_pids, cell_ids[inv])
        self._set_depths(new_pids)
        # queue each distinct child cell once, at its first child's priority
        _, first_of = np.unique(inv, return_index=True)
        prs = (child_lv[first_of] + par_prio_red[first_of]) * 10
        self._push_many(prs, cell_ids)
        self.stats["branched"] += len(acc)
        self._speculate_after_branch(cell_ids, prs)

    def _speculate_after_branch(self, cell_ids, prs):
        """Branch-boundary lookahead: the wave popped after a branch is the
        children's first extend wave, whose membership -- the keeper patch
        per child cell after the multi-patch filter -- is already fully
        determined by the store state the branch just wrote. Simulate the
        filter's keeper decision (_filter_keepers, side-effect free; the
        real filter still runs, and subtracts/frees the losers, when the
        wave pops) and dispatch the keepers' extend batch NOW, so the
        per-level first extend dispatch overlaps the filter + queue
        bookkeeping. Freshness: same one-dispatch deferral family as
        _speculate_next -- the filter's loser depth-subtracts ride the
        following dispatch instead of this one. Skipped when children span
        several priorities (the pop would take only the min-prio subset)
        or when an earlier extend speculation is outstanding (its wave
        pops first); any residual mismatch falls back via _spec_matches."""
        opt = self.opt
        if self._spec is not None:
            # an extend speculation is outstanding; its (lower-prio) wave
            # pops before the children
            return
        if not (opt.WAVE_LOOKAHEAD and opt.EXTEND_SUBROUNDS <= 1
                and self._lookahead_ok()):
            return
        if len(cell_ids) == 0 or len(np.unique(prs)) != 1:
            return
        # simulate _pop_live(pr) WITHOUT popping: cells already queued at
        # this priority (e.g. prio_red lanes of the previous level) pop
        # together with the freshly pushed children, in queue order
        chunks = self.queue.get(int(prs[0]))
        if not chunks:
            return
        cells = (np.concatenate(chunks) if len(chunks) > 1
                 else np.asarray(chunks[0], np.int64))
        _, first = np.unique(cells, return_index=True)
        cells = cells[np.sort(first)]
        self._ensure_heads()
        cells = cells[self.tree.alive[cells] & (self.cell_head[cells] >= 0)]
        if len(cells) == 0:
            return
        # simulate the wave's multi-patch filter to get the post-filter
        # heads (the real filter runs, and subtracts/frees the losers, when
        # the wave pops)
        heads = self.cell_head[cells]
        multi = self.patches.nxt[heads] >= 0
        sim_head = heads.copy()
        if multi.any():
            keepers, _ = self._filter_keepers(cells[multi])
            sim_head[multi] = keepers
        # only the not-expanded heads form the extend subset
        ext = ~self.patches.expanded[sim_head]
        if not ext.any():
            return
        par = sim_head[ext]
        cells_ext = cells[ext]
        centers = self.patches.center[par]
        normals = self.patches.normal[par]
        views = self.patches.views[par]
        prio_red = self.patches.prio_red[par]
        _, widths = self.tree.cell_center_width(cells_ext)
        levels = self.tree.node_level(cells_ext)
        (c_in, n_in, s_in, v_in, p_in, w_in, src_sel, lv2,
         pr2) = self._extend_candidates(centers, normals, views, prio_red,
                                        widths, levels)
        if len(c_in) == 0:
            return
        spec = {"src_sel": src_sel, "par_c": centers.copy(),
                "cand_c": c_in, "lv_lanes": lv2, "pr_lanes": pr2,
                "levels": levels, "prio_red": prio_red,
                "n_par": len(par),
                "par_pids": np.asarray(par).copy()}
        if self._deep_ok(len(c_in)):
            dev, n_lanes = self._deep_dispatch(c_in, n_in, s_in, v_in,
                                               p_in, w_in)
            spec.update(deep=True, g=0, outs=None, dev=dev,
                        n_lanes=n_lanes)
        else:
            spec["devs"] = self._spec_dispatch(c_in, n_in, s_in, v_in,
                                               p_in, w_in, count=False)
        spec["t_dispatched"] = time.time()
        spec["t_dev_mark"] = float(self.stats["t_device"])
        self._spec = spec

    # ------------------------------------------------------------------
    def reroot_tree(self, direction: np.ndarray):
        """Grow the root cube one level toward `direction` (streaming seeds
        outside the cube). Every cell level shifts +1, so queued priorities
        shift +10 to keep prio = (level + prio_red)*10 + phase consistent."""
        self.tree.reroot(direction)
        self.drop_speculation()  # cell widths/keys changed under the spec
        old = dict(self.queue)
        self.queue = defaultdict(list)
        for pr, chunks in old.items():
            self.queue[pr + 10] = chunks
        self.stats["reroots"] += 1

    def have_work(self) -> bool:
        return bool(self.queue)

    def n_alive(self) -> int:
        return int(self.patches.alive[:self.patches.n].sum())

    def alive_arrays(self):
        ids = np.nonzero(self.patches.alive[:self.patches.n])[0]
        p = self.patches
        return (p.center[ids], p.normal[ids], p.color[ids], p.scale[ids],
                p.views[ids], (p.views[ids] >= 0).sum(1))

    def save_ply(self, path: str, binary=False, normal=True, scale=True,
                 visibility=True):
        c, n, col, s, v, nv = self.alive_arrays()
        ply_io.write_ext_ply(path, c, n, col, s, v, nv, binary=binary,
                             normal=normal, scale=scale, visibility=visibility)
