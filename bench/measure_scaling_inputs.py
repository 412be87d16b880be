"""Measured inputs for the SCALING.md section-3 efficiency projection
(r4 verdict item 8: every projection input must cite a measurement file).

Three legs, merged into bench/scaling_inputs.json:

  --leg dispatch   (REAL CHIP) per-dispatch overhead vs batch size: the
                   fused gate executable timed (a) pipelined (8 enqueued,
                   one block -> pure device compute) and (b) serial
                   (block after every dispatch -> compute + transport
                   round trip). serial - pipelined = the per-dispatch
                   fixed overhead t_rpc the cost model uses.
  --leg host       (CPU) the serial host-scheduler cost at a 16k-lane
                   wavefront: _insert_winners + cell alloc + store insert
                   + queue push on synthetic lanes against a populated
                   tree (the §3 model previously extrapolated 0.91 us/lane
                   from 2k-lane toys).
  --leg collect    (CPU, 8 virtual devices) actual collective payloads
                   from the spatial engine on the virtual mesh: halo bytes
                   per round (wire and logical) and the replicated depth
                   pack size the all-reduce-min moves.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

BENCH = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(BENCH))


def leg_dispatch() -> dict:
    import jax
    import jax.numpy as jnp

    from hpmvs_tpu.runtime import pipeline
    pipeline.enable_compile_cache()
    from hpmvs_tpu.config import Options
    from hpmvs_tpu.core import scene as scene_mod, depth as depth_mod
    from hpmvs_tpu.ops import optimizer as popt
    from hpmvs_tpu.testing import make_plane_scene

    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=30)
    ps = make_plane_scene(n_cams=7, imgsize=512, n_points=400, seed=0)
    scene = scene_mod.build_scene(ps.model, opt, images=ps.images)
    pack = depth_mod.build_depth_pack(scene.width_np, scene.height_np,
                                      opt.DEPTH_SUBSAMPLE)
    c, n, s, v, _ = scene_mod.make_seed_patches(ps.model, scene, opt)
    K = opt.MAX_VIEWS
    out = {"platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0])}
    rows = []
    for B in (512, 2048, 4096):
        reps = int(np.ceil(B / len(c)))
        idx = np.tile(np.arange(len(c)), reps)[:B]
        rng = np.random.default_rng(0)
        xin_h = np.empty((B, 11 + K), np.float32)
        xin_h[:, 0:3] = (c[idx] + rng.normal(0, 0.002, (B, 3)))
        xin_h[:, 3:6] = n[idx]
        xin_h[:, 6] = s[idx]
        xin_h[:, 7:10] = xin_h[:, 0:3]
        xin_h[:, 10] = s[idx] * 3
        xin_h[:, 11:] = np.ascontiguousarray(v[idx],
                                             np.int32).view(np.float32)

        def once():
            # fresh H2D each dispatch, like the engine
            return popt.optimize_and_gate_packed(
                scene.ctx, pack, opt, scene.n_cameras, jnp.asarray(xin_h))

        jax.block_until_ready(once())           # compile
        R = 8
        t0 = time.time()
        devs = [once() for _ in range(R)]
        jax.block_until_ready(devs)
        piped = (time.time() - t0) / R
        t0 = time.time()
        for _ in range(R):
            jax.block_until_ready(once())
        serial = (time.time() - t0) / R
        rows.append({"B": B, "pipelined_ms": round(piped * 1e3, 1),
                     "serial_ms": round(serial * 1e3, 1),
                     "overhead_ms": round((serial - piped) * 1e3, 1),
                     "us_per_lane_pipelined": round(piped / B * 1e6, 2)})
        print(rows[-1], flush=True)
    out["dispatch_curve"] = rows
    return out


def leg_host() -> dict:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from hpmvs_tpu.config import Options
    from hpmvs_tpu.runtime.wavefront import Engine
    from hpmvs_tpu.testing import make_plane_scene

    # populated engine (real mid-reconstruction tree), then a synthetic
    # 16k-lane routed wave timed through the ACTUAL router entry points
    opt = dataclasses.replace(Options(), START_LEVEL=1, MAXLEVEL=3,
                              MAX_VIEWS=6, COVIS_MIN_POINTS=10, LM_ITERS=4)
    ps = make_plane_scene(n_cams=4, imgsize=96, n_points=48, seed=0)
    eng = Engine(ps.model, opt, images=ps.images)
    eng.seed()
    for prio in range(40):
        eng.process_priority_step(prio)
        if not eng.have_work():
            break
    B = 16384
    rng = np.random.default_rng(0)
    t = eng.tree
    oc = (np.asarray(t.center)
          + rng.uniform(-0.5, 0.5, (B, 3)) * t.width).astype(np.float32)
    lv = np.full(B, 6, np.int64)
    ok = np.ones(B, bool)
    t0 = time.time()
    ok2, keys = eng._insert_winners(oc, ok, lv)
    t_win = time.time() - t0
    on = np.tile(np.array([0, 0, 1], np.float32), (B, 1))
    os_ = np.full(B, 1e-3, np.float32)
    ov = np.full((B, opt.MAX_VIEWS), -1, np.int32)
    ov[:, :3] = np.array([0, 1, 2])
    col = np.zeros((B, 3), np.float32)
    pr = np.zeros(B, np.int32)
    t0 = time.time()
    n_ins = eng._insert_new_patches(oc, on, os_, ov, ok2, col, lv, pr)
    t_ins = time.time() - t0
    return {"lanes": B, "winner_sim_s": round(t_win, 4),
            "insert_s": round(t_ins, 4), "inserted": int(n_ins),
            "us_per_lane": round((t_win + t_ins) / B * 1e6, 3)}


def leg_collect() -> dict:
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from hpmvs_tpu.config import Options
    from hpmvs_tpu.parallel import mesh as pmesh
    from hpmvs_tpu.runtime.spatial import SpatialEngine
    from hpmvs_tpu.testing import make_plane_scene

    opt = dataclasses.replace(Options(), START_LEVEL=1, MAXLEVEL=3,
                              MAX_VIEWS=6, COVIS_MIN_POINTS=10, LM_ITERS=4)
    ps = make_plane_scene(n_cams=4, imgsize=96, n_points=24, seed=0)
    mesh = pmesh.make_mesh(8, shape=(4, 2))
    eng = SpatialEngine(ps.model, opt, images=ps.images, mesh=mesh)
    eng.seed()
    for prio in range(opt.max_prio):
        eng.process_priority_step(prio)
        if not eng.have_work():
            break
    s = eng.stats
    rounds = max(int(s["halo_rounds"]), 1)
    return {
        "devices": 8,
        "halo_rounds": int(s["halo_rounds"]),
        "halo_bytes_wire_total": int(s["halo_bytes_wire"]),
        "halo_bytes_logical_total": int(s["halo_bytes_logical"]),
        "halo_kb_per_round_wire": round(s["halo_bytes_wire"] / rounds / 1024,
                                        1),
        "depth_pack_bytes": int(np.asarray(eng.pack.depth).nbytes),
        "migrated": int(s["migrated"]),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", default="all",
                    choices=["dispatch", "host", "collect", "all"])
    ap.add_argument("--out", default=os.path.join(BENCH,
                                                  "scaling_inputs.json"))
    args = ap.parse_args(argv)

    def merge(key, entry):
        out = {}
        if os.path.exists(args.out):
            try:
                out = json.load(open(args.out))
            except (json.JSONDecodeError, OSError):
                out = {}
        out[key] = entry
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
        print("wrote", key, "->", args.out)

    if args.leg in ("host", "all"):
        merge("host_16k", leg_host())
    if args.leg in ("collect", "all"):
        merge("collectives", leg_collect())
    if args.leg in ("dispatch", "all"):
        merge("dispatch", leg_dispatch())


if __name__ == "__main__":
    main()
