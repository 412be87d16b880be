"""Scaling-efficiency study on the virtual 8-device mesh (VERDICT item 6).

Runs the spatially-sharded engine on a plane scene and measures, per the
whole run: per-block work balance, halo traffic (logical + wire bytes),
deferred-depth-write volume, dispatch counts and host-serial fraction.
These feed the analytic 2-host projection written up in SCALING.md.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python bench/scaling_study.py
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import os
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from hpmvs_tpu.config import Options
    from hpmvs_tpu.runtime import pipeline
    from hpmvs_tpu.parallel import mesh as pmesh
    from hpmvs_tpu.testing import make_plane_scene

    scene = make_plane_scene(n_cams=7, imgsize=512, n_points=200, seed=0)
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAXLEVEL=4,
                              COVIS_MIN_POINTS=10, MAX_TREE_LEVEL=8,
                              OUTFOLDER="/tmp/scaling_out")
    mesh = pmesh.make_mesh(8)
    t0 = time.time()
    eng = pipeline.run(scene.model, opt, images=scene.images, mesh=mesh,
                       spatial=True, max_prio=70)
    wall = time.time() - t0
    s = eng.stats

    n_opt = int(s["patches_optimized"])
    work = int(s["block_work_lanes"])
    balance_den = int(s["block_balance_den"])
    pad = int(s["block_pad_lanes"])
    depth_bytes = int(np.asarray(eng.pack.depth).nbytes)

    out = {
        "devices": 8,
        "wall_s": round(wall, 1),
        "patches_optimized": n_opt,
        "alive": int(eng.n_alive()),
        "dispatches": int(s["dispatches"]),
        "migrated": int(s["migrated"]),
        "halo_arrivals": int(s["halo_arrivals"]),
        "halo_rounds": int(s["halo_rounds"]),
        "halo_bytes_logical": int(s["halo_bytes_logical"]),
        "halo_bytes_wire": int(s["halo_bytes_wire"]),
        # spatial decomposition balance: ideal equal-split lanes / max-block
        # lanes (1.0 = perfectly balanced blocks)
        "block_balance": round(work / max(balance_den, 1), 4),
        # lane utilization incl. bucket rounding (what the device executes)
        "lane_utilization": round(work / max(work + pad, 1), 4),
        "depth_buffer_bytes": depth_bytes,
        "host_fraction": round(float(s.get("host_fraction", 0.0)), 4),
        "t_device_s": round(float(s["t_device"]), 1),
        "migration_rate": round(int(s["migrated"]) / max(n_opt, 1), 4),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
