"""Host-scheduler throughput at 1M-patch scale (VERDICT round-1 item 4).

The reference's octree bookkeeping is O(1)-per-op pointer chasing
(doctree.h:378-450); our replacement is grouped numpy over Morton arrays.
This benchmark drives every host-side scheduler operation (insert, queue
push/drain dedup, membership walks, structure queries, filter, requeue) on
a synthetic 1M-patch population -- no device compute -- and reports ns per
patch per op.

Pass/fail: with the measured TPU optimize throughput (BENCH_r01: ~134k
patches/s on one v5e = ~7.5 us/patch of device time), host bookkeeping must
stay under 20% of wall-clock, i.e. < ~1.9 us/patch TOTAL across the ops
that run once per patch lifetime. Printed as `host_fraction_projected`.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python bench/scheduler_bench.py [N]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(n=1_000_000):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from hpmvs_tpu.config import Options
    from hpmvs_tpu.core.octree import LinearOctree, PatchStore
    from hpmvs_tpu.runtime.wavefront import Engine

    opt = Options()
    rng = np.random.default_rng(0)

    # bare engine shell: scheduler state only, no scene/device context
    eng = Engine.__new__(Engine)
    eng.opt = opt
    eng.stats = __import__("collections").defaultdict(int)
    eng.patches = PatchStore(opt.MAX_VIEWS, cap=2 * n)
    eng.tree = LinearOctree(np.zeros(3), 2.0, max_level=12)
    eng.cell_head = np.full(1024, -1, np.int64)
    from collections import defaultdict
    eng.queue = defaultdict(list)

    times = {}

    def bench(name, fn):
        t0 = time.time()
        out = fn()
        times[name] = time.time() - t0
        return out

    # 1M patches at levels 8-10, mostly distinct cells + 5% collisions
    pts = rng.random((n, 3)) * 1.9 - 0.95
    lv = rng.integers(8, 11, n).astype(np.int64)
    keys = np.zeros(n, np.uint64)
    for L in np.unique(lv):
        m = lv == L
        keys[m] = eng.tree.key_at(pts[m], int(L))
    pair = np.stack([lv.astype(np.uint64), keys])
    uniq, inv = np.unique(pair, axis=1, return_inverse=True)

    cids = bench("alloc_cells", lambda: eng.tree.alloc_cells(
        uniq[0].astype(np.int8), uniq[1].astype(np.uint64)))
    pids = bench("alloc_patches", lambda: eng.patches.alloc(n))
    eng.patches.center[pids] = pts
    bench("insert_patches", lambda: eng.insert_patches(pids, cids[inv]))
    bench("queue_push", lambda: eng._push_many(lv * 10, cids[inv]))

    def drain_dedup():
        total = 0
        for pr in sorted(eng.queue):
            chunks = eng.queue.pop(pr)
            cells = np.concatenate(chunks)
            _, first = np.unique(cells, return_index=True)
            cells = cells[np.sort(first)]
            live = cells[eng.tree.alive[cells] & (eng.cell_head[cells] >= 0)]
            total += len(live)
        return total

    n_live = bench("queue_drain_dedup", drain_dedup)

    bench("containing_cell_1M", lambda: eng.tree.containing_cell(pts))
    bench("structure_level_1M", lambda: eng.tree.structure_level(pts))
    heads = bench("first_pids", lambda: eng.cell_head[cids[inv]])
    multi_cells = bench("multi_mask", lambda: np.unique(
        cids[inv][eng.patches.nxt[heads] >= 0]))
    eng.patches.normal[pids] = rng.normal(size=(n, 3)).astype(np.float32)
    eng._set_depths = lambda *a, **k: None  # host-only benchmark
    bench(f"filter_{len(multi_cells)}_multicells",
          lambda: eng._filter_cells(multi_cells))

    from hpmvs_tpu.runtime.checkpoint import requeue_from_tree
    bench("requeue_from_tree", lambda: requeue_from_tree(eng))

    total = sum(times.values())
    per_patch_us = total / n * 1e6
    # device optimize cost from the round-1 TPU bench: 134k patches/s
    device_us = 1e6 / 134_000.0
    frac = per_patch_us / (per_patch_us + device_us)
    print(f"\n{'op':34s} {'time_s':>8s} {'ns/patch':>9s}")
    for k, v in times.items():
        print(f"{k:34s} {v:8.3f} {v / n * 1e9:9.1f}")
    print(f"\nTOTAL host scheduler: {total:.3f}s = {per_patch_us:.3f} "
          f"us/patch over {n} patches ({n_live} live after dedup)")
    print(f"projected host fraction at TPU optimize rate (134k/s): "
          f"{100 * frac:.1f}%  (target < 20%)")
    assert frac < 0.20, "host scheduler exceeds 20% of projected wall-clock"
    return frac


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
