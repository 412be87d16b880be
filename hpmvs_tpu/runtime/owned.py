"""Per-process scheduler ownership for multi-host spatial runs.

The replicated multi-host convention (Engine._fetch allgathers every batch;
every process runs the full host scheduler) is a correctness proof, not a
scalable backend: host memory and serial host work are O(global) per
process. This engine is the reference's actual structure -- each
CellProcessor owns its subtree + queue and only border patches cross
processors (CellProcessor.h:60-68, :487-540) -- mapped to multi-controller
JAX:

  - Blocks are STATICALLY partitioned across processes by contiguous Morton
    range (process p owns blocks [p*n_blocks/P, (p+1)*n_blocks/P)); within
    a process the dynamic LPT assignment balances its own blocks over its
    own local devices. Cross-process balance comes from oversubscription
    (BLOCK_OVERSUB blocks per device), like the reference's ~100 subtrees
    over ~8 threads; dynamic reassignment ACROSS processes would require
    bulk state migration the reference never does (its threads share
    memory).
  - Host state (PatchStore, octree cells, queues, membership chains) exists
    only for owned blocks: host memory and bookkeeping scale 1/P.
  - Dispatches stay global SPMD: every process joins every device dispatch,
    contributing its own shard lanes (possibly empty). Shape agreement and
    phase participation ride tiny host collectives (a few ints per
    wavefront: queue minima, per-shard lane counts, halo pair counts).
  - Patch records cross processes ONLY inside the halo ppermute payload
    (the border-queue analog); each process reads arrivals solely from its
    local shards.
  - The depth z-buffer remains globally shared state -- exactly the
    reference's one shared structure (Scene.h:75-76): deferred setDepths
    windows allgather across processes before riding a dispatch, so every
    process's replica sees every update in the same order.
  - Termination: psum of local queue sizes (have_work), the reference's
    haveWork OR-reduce (main.cpp:174-180).

Output: alive_arrays_global / save_ply gather to process 0.
"""

from __future__ import annotations

import numpy as np

from hpmvs_tpu.runtime.spatial import SpatialEngine
from hpmvs_tpu.runtime.wavefront import log


def _allgather(x: np.ndarray) -> np.ndarray:
    """Host allgather: (P,) + x.shape stacked array, identical everywhere."""
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


class OwnedSpatialEngine(SpatialEngine):
    """SpatialEngine whose host scheduler state is partitioned by process."""

    def __init__(self, model, opt, images=None, visdata_path=None,
                 mesh=None, image_subsets: bool = False):
        import jax
        self.pid = jax.process_index()
        self.n_proc = jax.process_count()
        if opt.EXTEND_SUBROUNDS != 1:
            raise ValueError("owned multi-host requires EXTEND_SUBROUNDS=1 "
                             "(sub-round counts are process-local)")
        super().__init__(model, opt, images=images, visdata_path=visdata_path,
                         mesh=mesh, image_subsets=image_subsets)
        # which global shard (flattened mesh position) lives on which
        # process -- identical on every process
        self.shard_proc = np.asarray(
            [d.process_index for d in self.mesh.devices.flat], np.int64)
        self.my_shards = np.nonzero(self.shard_proc == self.pid)[0]
        if len(self.my_shards) == 0:
            raise ValueError("process owns no devices of the mesh")
        # static block -> process map (contiguous Morton ranges)
        self.block_proc = ((np.arange(self.n_blocks) * self.n_proc)
                           // self.n_blocks).astype(np.int64)
        # static home shard per block: round-robin over the owner's shards
        # (a remote process only needs to hit ANY shard of the owner -- the
        # owner reads arrivals from all its local shards)
        self.block_shard = np.empty(self.n_blocks, np.int64)
        for p in range(self.n_proc):
            sh = np.nonzero(self.shard_proc == p)[0]
            mine = np.nonzero(self.block_proc == p)[0]
            self.block_shard[mine] = sh[np.arange(len(mine)) % len(sh)]
        self._home_shard = self.block_shard.copy()

    # -- coordination hooks ---------------------------------------------
    def _n_proc(self) -> int:
        return self.n_proc

    def _count_global(self, n: int) -> int:
        self.stats["host_collectives"] += 1
        return int(_allgather(np.asarray([n], np.int64)).sum())

    def _agree_pmin(self, prio: int):
        local = min(self.queue) if self.queue else np.iinfo(np.int64).max
        self.stats["host_collectives"] += 1
        g = int(_allgather(np.asarray([local], np.int64)).min())
        if g == np.iinfo(np.int64).max or g > prio:
            return None
        return g

    def _agree_shard_counts(self, counts: np.ndarray) -> np.ndarray:
        self.stats["host_collectives"] += 1
        return _allgather(counts).sum(0)

    def _agree_pair(self, pair: np.ndarray) -> np.ndarray:
        # each src shard is owned by exactly one process: sum = exact union
        self.stats["host_collectives"] += 1
        return _allgather(pair).sum(0)

    def _agree_dim(self, n: int) -> int:
        self.stats["host_collectives"] += 1
        return int(_allgather(np.asarray([n], np.int64)).max())

    def _agree_rebuild(self, needed: bool) -> bool:
        """OR the slab-rebuild decision across processes: the rebuild path
        calls the _agree_dim collective, so either every process enters it
        this wavefront or none does (a process-local key diverges in owned
        mode, where each tree holds only its own blocks' cells)."""
        self.stats["host_collectives"] += 1
        return bool(_allgather(np.asarray([int(needed)], np.int64)).max())

    def _shard_local_mask(self) -> np.ndarray:
        return self.shard_proc == self.pid

    def _owned_points(self, pts: np.ndarray) -> np.ndarray:
        return self.block_proc[self.block_of_points(pts)] == self.pid

    def _owned_seed_mask(self, pts: np.ndarray) -> np.ndarray:
        return self._owned_points(pts)

    def _filter_owned(self, keep: np.ndarray, pts: np.ndarray) -> np.ndarray:
        return keep & self._owned_points(pts)

    def _agree_bbox(self, pts: np.ndarray):
        """Pin the tree cube to the provisional SfM-point cube: ownership
        filtering ran against the provisional block boundaries, so the real
        tree must keep the SAME partition or boundary seeds would land in
        foreign blocks (deterministic and identical on every process, no
        collective needed)."""
        t = self._provisional
        half = t.width / 2.0
        return np.asarray(t.center) - half, np.asarray(t.center) + half

    def _remote_neighbor_counts(self, pts: np.ndarray) -> np.ndarray:
        return (~self._owned_points(pts)).astype(np.int64)

    def _gather_pend(self, c, s, v, ph):
        """Merge the deferred depth windows of all processes, ordered by
        process id (deterministic): the z-buffer is globally shared state
        and every replica must apply every update. ONE packed allgather,
        padded to a pow-2 bucket -- each distinct shape compiles a fresh
        collective, so unbucketed windows would compile every wavefront."""
        n = len(s)
        self.stats["host_collectives"] += 1
        ns = _allgather(np.asarray([n], np.int64))[:, 0]
        m = int(ns.max())
        if m == 0:
            return c, s, v, ph
        self.stats["pend_gathered_rows"] += int(ns.sum())
        K = v.shape[1]
        b = 64
        while b < m:
            b *= 2
        buf = np.zeros((b, 3 + 1 + K + 1), np.float32)
        buf[:n, 0:3] = c
        buf[:n, 3] = s
        buf[:n, 4:4 + K] = v
        buf[:n, 4 + K] = ph + 1          # 0 marks padding
        g = _allgather(buf)              # (P, b, D)
        rows = np.concatenate([g[p, :ns[p]] for p in range(self.n_proc)])
        return (rows[:, 0:3], rows[:, 3],
                rows[:, 4:4 + K].astype(np.int32),
                rows[:, 4 + K].astype(np.int32) - 1)

    # -- dynamic assignment constrained to the process ------------------
    def _update_assignment(self, counts: np.ndarray):
        """LPT over THIS process's blocks onto its local shards only.
        Remote blocks keep their static home shard, so every process's halo
        destinations stay valid without knowing remote assignments."""
        mine = self.block_proc == self.pid
        total = int(counts[mine].sum())
        if total == 0:
            return
        if self.image_subsets and self._bpack_dev is not None:
            cur = np.bincount(self.block_shard[mine],
                              weights=counts[mine],
                              minlength=self.n_shards)[self.my_shards]
            bal = total / max(len(self.my_shards) * cur.max(), 1)
            if bal >= self.opt.REBALANCE_BELOW:
                return
        sub = self._lpt_assign(counts[np.nonzero(mine)[0]],
                               len(self.my_shards))
        new = self.block_shard.copy()
        new[np.nonzero(mine)[0]] = self.my_shards[sub]
        if np.array_equal(new, self.block_shard):
            return
        self.block_shard = new
        self.stats["rebalances"] += 1
        if self.image_subsets:
            self._bpack_key = None

    # -- local-only result fetch ----------------------------------------
    def _fetch(self, res):
        """Materialize ONLY this process's addressable shards (plus
        replicated outputs); remote lanes stay zero and are never read --
        the owned layout places every local work item on a local shard."""
        import jax

        def to_host(a):
            if not hasattr(a, "addressable_shards"):
                return np.asarray(a)
            shards = a.addressable_shards
            if shards and shards[0].index == (slice(None),) * a.ndim:
                return np.asarray(shards[0].data)   # replicated
            out = np.zeros(a.shape, a.dtype)
            for sh in shards:
                out[sh.index] = np.asarray(sh.data)
            return out

        return jax.tree.map(to_host, res)

    # -- global views ----------------------------------------------------
    def have_work(self) -> bool:
        return self._count_global(
            sum(sum(len(ch) for ch in v) for v in self.queue.values())) > 0

    def n_alive_local(self) -> int:
        return int(self.patches.alive[:self.patches.n].sum())

    def n_alive(self) -> int:
        return self._count_global(self.n_alive_local())

    def alive_arrays(self):
        """GLOBAL alive arrays, gathered to every process (padded
        allgather) -- used by save_ply and evaluation."""
        local = super().alive_arrays()
        n = len(local[0])
        self.stats["host_collectives"] += 1
        ns = _allgather(np.asarray([n], np.int64))[:, 0]
        m = int(ns.max())
        outs = []
        for a in local:
            buf = np.zeros((m,) + a.shape[1:], a.dtype)
            buf[:n] = a
            g = _allgather(buf)
            outs.append(np.concatenate([g[p, :ns[p]]
                                        for p in range(self.n_proc)]))
        return tuple(outs)

    def save_ply(self, path: str, **kw):
        """Gather the global cloud; only process 0 writes."""
        c, n, col, s, v, nv = self.alive_arrays()
        if self.pid == 0:
            from hpmvs_tpu.io import ply as ply_io
            ply_io.write_ext_ply(path, c, n, col, s, v, nv,
                                 binary=kw.get("binary", False),
                                 normal=kw.get("normal", True),
                                 scale=kw.get("scale", True),
                                 visibility=kw.get("visibility", True))
