"""Measure the replicated-vs-subsets ALIVE-COUNT spread across seeds.

The slab mechanism itself is bitwise-neutral (tests/test_subsets.py pins the
assignment and gets identical results); what differs between a replicated
spatial run and an image_subsets run is the block->shard ASSIGNMENT POLICY
(LPT re-pack every round vs xy-quantile cuts + REBALANCE_BELOW hysteresis,
runtime/spatial._update_assignment), which changes which patches migrate --
and migrated arrivals skip regularization (flatness_=0, the reference's own
border semantics, CellProcessor.cpp:513-514). This study quantifies that
policy spread over seeds so the tolerance quoted in docs is a measured
distribution, not one run (r4 verdict item 1).

Writes bench/subset_divergence.json. CPU-only (run with PALLAS_AXON_POOL_IPS=
and an 8-device virtual mesh via XLA_FLAGS/JAX_PLATFORMS like the tests).
"""
import dataclasses
import json
import os
import sys

import numpy as np


def main(n_seeds: int = 5):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from hpmvs_tpu.config import Options
    from hpmvs_tpu.parallel import mesh as pmesh
    from hpmvs_tpu.runtime.spatial import SpatialEngine
    from hpmvs_tpu.testing import make_plane_scene

    def run(eng, steps=25):
        eng.seed()
        start = min(eng.queue) if eng.queue else 0
        for prio in range(start, start + steps):
            eng.process_priority_step(prio)
            if not eng.have_work():
                break
        return eng

    rows = []
    for seed in range(n_seeds):
        opt = dataclasses.replace(Options(), START_LEVEL=1, MAXLEVEL=3,
                                  MAX_VIEWS=6, COVIS_MIN_POINTS=10,
                                  LM_ITERS=4)
        ps = make_plane_scene(n_cams=4, imgsize=96, n_points=24, seed=seed)
        mesh = pmesh.make_mesh(8, shape=(4, 2))
        e0 = run(SpatialEngine(ps.model, opt, images=ps.images, mesh=mesh))
        e1 = run(SpatialEngine(ps.model, opt, images=ps.images, mesh=mesh,
                               image_subsets=True))
        r0 = float(np.sqrt((np.abs(e0.alive_arrays()[0][:, 2] - ps.plane_z)
                            ** 2).mean()))
        r1 = float(np.sqrt((np.abs(e1.alive_arrays()[0][:, 2] - ps.plane_z)
                            ** 2).mean()))
        rows.append({
            "seed": seed, "alive_replicated": e0.n_alive(),
            "alive_subsets": e1.n_alive(),
            "migrated_replicated": int(e0.stats.get("migrated", 0)),
            "migrated_subsets": int(e1.stats.get("migrated", 0)),
            "slab_miss": int(e1.stats.get("slab_miss", 0)),
            "rms_replicated": round(r0, 5), "rms_subsets": round(r1, 5),
        })
        print(rows[-1], flush=True)

    deltas = [abs(r["alive_subsets"] - r["alive_replicated"])
              / max(r["alive_replicated"], 1) for r in rows]
    out = {
        "what": "replicated-vs-subsets alive-count spread across seeds "
                "(assignment-POLICY divergence; the slab mechanism itself "
                "is bitwise-neutral, tests/test_subsets.py)",
        "scene": "plane n_cams=4 imgsize=96 n_points=24, 8-dev CPU mesh",
        "rows": rows,
        "rel_delta_mean": round(float(np.mean(deltas)), 4),
        "rel_delta_max": round(float(np.max(deltas)), 4),
        "slab_miss_total": sum(r["slab_miss"] for r in rows),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "subset_divergence.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
