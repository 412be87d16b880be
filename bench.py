"""Benchmark: batched patch-optimization throughput on the real TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The metric is patches optimized per second through the FULL per-patch pipeline
(view growth, NCC filters, greedy sort, damped-Newton refinement, ref
re-selection, color) -- the hot path that dominates hpmvs runtime (SURVEY.md
section 3.2). vs_baseline compares against the measured CPU baseline in
bench/cpu_baseline.json (a faithful C++ reimplementation of the reference's
per-patch optimize loop on this machine's CPU; the reference itself is not
buildable here -- no system Eigen/gflags/glog). Falls back to a documented
estimate if the baseline file is missing.
"""

import dataclasses
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hpmvs_tpu.runtime import pipeline
    pipeline.enable_compile_cache()

    from hpmvs_tpu.config import Options
    from hpmvs_tpu.core import scene as scene_mod
    from hpmvs_tpu.ops import optimizer as popt
    from hpmvs_tpu.testing import make_plane_scene

    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=30)
    ps = make_plane_scene(n_cams=7, imgsize=512, n_points=400, seed=0)
    scene = scene_mod.build_scene(ps.model, opt, images=ps.images)
    c, n, s, v, _ = scene_mod.make_seed_patches(ps.model, scene, opt)

    B = 2048
    reps = int(np.ceil(B / len(c)))
    idx = np.tile(np.arange(len(c)), reps)[:B]
    rng = np.random.default_rng(0)
    cc = c[idx] + rng.normal(0, 0.002, (B, 3)).astype(np.float32)
    nn, ss, vv = n[idx], s[idx], v[idx]

    args = (jnp.asarray(cc), jnp.asarray(nn), jnp.asarray(ss),
            jnp.asarray(vv))

    # warmup/compile
    out = popt.optimize_batch(scene.ctx, opt, *args)
    out[0].block_until_ready()

    iters = 20
    t0 = time.time()
    for _ in range(iters):
        out = popt.optimize_batch(scene.ctx, opt, *args)
    out[0].block_until_ready()
    dt = time.time() - t0
    pps = B * iters / dt

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench", "cpu_baseline.json")
    if os.path.exists(base_path):
        with open(base_path) as fh:
            baseline_pps = json.load(fh)["patches_per_sec"]
    else:
        # rough hpmvs-CPU estimate: ~100 BOBYQA evals x ~7 views x 49 texels
        # bilinear per patch on a 2-core host ~ 500 patches/s. Replaced by the
        # measured C++ baseline as soon as bench/cpu_baseline is built.
        baseline_pps = 500.0

    # end-to-end bounded priority-loop reconstruction (the reference's own
    # metric is whole-loop wall-clock, main.cpp:183-185). Shapes are warmed
    # with a throwaway engine first: compile/cache-deserialization is a
    # per-process one-time cost that a production-length run amortizes, so
    # the steady-state loop is what gets timed. One fused dispatch per
    # extend batch (optimize + gates + deferred setDepths).
    from hpmvs_tpu.runtime.wavefront import Engine

    def run_loop(budget):
        eng = Engine(ps.model, opt, images=ps.images)
        t0 = time.time()
        eng.seed()
        waves = 0
        for prio in range(opt.max_prio):
            if eng.process_priority_step(prio):
                waves += 1
            if not eng.have_work() or time.time() - t0 > budget:
                break
        return eng, time.time() - t0, waves

    run_loop(300)                      # warmup: compile/load all shapes
    # (deep-wave graphs are large; a short warmup leaves later shapes
    # uncompiled and the first timed passes absorb the compiles)
    # steady-state: MEDIAN of five timed passes (r4 advisory: best-of-2 on
    # a >2x-variance RPC channel is thin evidence and favors the new
    # measurement; the median of 5 is robust to tunnel latency weather in
    # both directions). The reconstruction is deterministic -- identical
    # patch/dispatch counts every pass -- so passes differ only in
    # wall-clock; all rates are recorded, best kept as a separate extra.
    runs = [run_loop(90) for _ in range(5)]
    rates = [int(e.stats["patches_optimized"]) / max(dt, 1e-9)
             for e, dt, _ in runs]
    med_i = int(np.argsort(rates)[len(rates) // 2])
    eng, e2e_dt, waves = runs[med_i]
    n_e2e = int(eng.stats["patches_optimized"])
    disp = int(eng.stats["dispatches"])

    print(json.dumps({
        "metric": "patches_optimized_per_sec",
        "value": round(pps, 1),
        "unit": "patches/s",
        "vs_baseline": round(pps / baseline_pps, 2),
        "extra": {
            # median-of-5 pass (r4 advisory); best pass kept separately
            "pipeline_patches_per_sec": round(n_e2e / max(e2e_dt, 1e-9), 1),
            "pipeline_patches_per_sec_best": round(max(rates), 1),
            "pipeline_runs_per_sec": [round(r, 1) for r in rates],
            "pipeline_patches": n_e2e,
            "pipeline_alive": int(eng.n_alive()),
            "dispatches": disp,
            "dispatches_per_wavefront": round(disp / max(waves, 1), 2),
            "disp_extend": int(eng.stats["disp_extend"]),
            "disp_optimize": int(eng.stats["disp_optimize"]),
            "disp_flush": int(eng.stats["disp_flush"]),
            "disp_deep": int(eng.stats["disp_deep"]),
            "deep_gens_consumed": int(eng.stats["deep_gens_consumed"]),
            "deep_fallbacks": int(eng.stats["deep_fallbacks"]),
            "deep_fb_overflow": int(eng.stats["deep_fb_overflow"]),
            "deep_fb_mismatch": int(eng.stats["deep_fb_mismatch"]),
            "deep_fb_dead": int(eng.stats["deep_fb_dead"]),
            "spec_waste_lanes": int(eng.stats["spec_waste_lanes"]),
            "lookahead_hits": int(eng.stats["lookahead_hits"]),
            "lookahead_misses": int(eng.stats["lookahead_misses"]),
            "host_fraction": round(
                max(e2e_dt - float(eng.stats["t_device"]), 0.0)
                / max(e2e_dt, 1e-9), 4),
            # host time NOT covered by an in-flight dispatch: with wave
            # lookahead the routing of wave N runs while wave N+1 computes
            # on-device, so only this residual sits on the critical path
            # (host_fraction alone OVERSTATES serial host work under
            # overlap: the covered fetch returns instantly, shrinking
            # t_device by exactly the covered interval). t_host_overlapped
            # excludes device-blocking time accumulated inside the
            # speculation interval (r4 advisory fix in _extend_finish_from),
            # so the subtraction no longer double-counts device time.
            "host_serial_fraction": round(
                max(e2e_dt - float(eng.stats["t_device"])
                    - float(eng.stats["t_host_overlapped"]), 0.0)
                / max(e2e_dt, 1e-9), 4),
        },
    }))


if __name__ == "__main__":
    main()
