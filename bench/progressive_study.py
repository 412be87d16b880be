"""Progressive quality-vs-time head-to-head at stress scale (r4 verdict
item 3): the SAME on-disk 150-camera ring scene (BASELINE.json config 4,
bench/export_scene.export_ring) reconstructed by the CPU reference
full-loop (bench/cpu_fullloop, reference algorithm + vendored BOBYQA,
OpenMP over this host's cores) and by the TPU pipeline, both snapshotted
at fixed wall-clock budgets -- the reference's own headline metric is
densification over time (README.md:5-8; progressive PLYs, main.cpp:157-172).

Both engines read identical pixels (.hpi) and the identical NVM, and run
the identical non-default config (HPMVS_* env overrides on the CPU side).
An engine that completes before a budget carries its final state forward.

Run (CPU leg is CPU-heavy, TPU leg needs the tunnel -- run serially):
    PYTHONPATH=/root/repo:/root/.axon_site python bench/progressive_study.py
        [--budgets 300,900] [--max-minutes 30] [--skip-cpu] [--skip-tpu]
Writes bench/progressive.json (merge per leg).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np

BENCH = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(BENCH))

RING = dict(MAXLEVEL=4, START_LEVEL=1, COVIS_MIN_POINTS=5, MAX_TREE_LEVEL=10)
GSD = 3.5 / (256 * 1.2)          # ring camera height / focal (stress_study)


def quality(pts: np.ndarray, plane_z: float) -> dict:
    if len(pts) == 0:
        return {"patches": 0}
    d = np.abs(pts[:, 2] - plane_z)
    return {
        "patches": int(len(pts)),
        "inlier_frac_4gsd": float((d < 4 * GSD).mean()),
        "inlier_frac_2pct": float((d < 0.02).mean()),
        "median_err_gsd": float(np.median(d) / GSD),
    }


def run_cpu(sdir: str, gt: dict, budgets, max_minutes: float) -> dict:
    exe = os.path.join(BENCH, "build", "cpu_fullloop")
    if not os.path.exists(exe):
        subprocess.run([os.path.join(BENCH, "build_fullloop.sh")], check=True)
    env = dict(os.environ)
    env.update(HPMVS_MAXLEVEL=str(RING["MAXLEVEL"]),
               HPMVS_START_LEVEL=str(RING["START_LEVEL"]),
               HPMVS_COVIS_MIN=str(RING["COVIS_MIN_POINTS"]),
               HPMVS_MAX_TREE_LEVEL=str(RING["MAX_TREE_LEVEL"]),
               HPMVS_SNAPSHOT_SECONDS=",".join(str(int(b)) for b in budgets))
    ply = os.path.join(sdir, "cpu_final.ply")
    t0 = time.time()
    out = subprocess.run(
        [exe, os.path.join(sdir, "scene.nvm"), ply, str(max_minutes)],
        capture_output=True, text=True, check=True, env=env)
    wall = time.time() - t0
    from hpmvs_tpu.io.ply import read_ply_xyz
    snaps = []
    final = None
    for line in out.stdout.strip().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "snapshot_s" in rec:
            q = quality(read_ply_xyz(rec["ply"]), gt["plane_z"])
            snaps.append({"budget_s": rec["snapshot_s"],
                          "elapsed_s": rec["elapsed_s"], **q,
                          "hist": rec["hist"]})
        else:
            final = rec
    fq = quality(read_ply_xyz(ply), gt["plane_z"])
    return {"wall_s": round(wall, 1), "final": {**(final or {}), **fq},
            "snapshots": snaps}


def run_tpu(sdir: str, gt: dict, budgets, warm: bool = True) -> dict:
    from hpmvs_tpu.config import Options
    from hpmvs_tpu.runtime import pipeline

    pipeline.enable_compile_cache()
    opt = dataclasses.replace(Options(), OUTFOLDER=os.path.join(sdir,
                                                               "tpu_out"),
                              **RING)
    nvm = os.path.join(sdir, "scene.nvm")
    # warm the compile cache with a throwaway run (one-time cost per code
    # change; recorded separately like BASELINE_E2E first_run_wall_seconds).
    # --no-warm skips it when the persistent cache already holds this
    # build's shapes (e.g. the stress ring just ran on the same chip).
    cold = 0.0
    if warm:
        t0 = time.time()
        pipeline.run_nvm_file(nvm, opt,
                              max_prio=(RING["MAX_TREE_LEVEL"] + 1) * 10)
        cold = time.time() - t0

    snaps = []
    state = {"t0": None, "idx": 0}

    # per-wave-generation hook: fires every frontier generation (seconds),
    # so time-budget snapshots land within one wave of their budget even
    # inside the minutes-long final-level priority steps
    def hook(engine):
        if state["t0"] is None:
            state["t0"] = time.time()
        el = time.time() - state["t0"]
        while state["idx"] < len(budgets) and el >= budgets[state["idx"]]:
            c = engine.alive_arrays()[0]
            snaps.append({"budget_s": budgets[state["idx"]],
                          "elapsed_s": round(el, 1),
                          **quality(c, gt["plane_z"]),
                          "hist": [int(v) for v in engine.tree.histogram()]})
            state["idx"] += 1

    t0 = time.time()
    state["t0"] = t0
    eng = pipeline.run_nvm_file(nvm, opt, wave_hook=hook,
                                max_prio=(RING["MAX_TREE_LEVEL"] + 1) * 10)
    wall = time.time() - t0
    c = eng.alive_arrays()[0]
    final = {"wall_s": round(wall, 1), **quality(c, gt["plane_z"]),
             "hist": [int(v) for v in eng.tree.histogram()],
             "optimize_calls": int(eng.stats["patches_optimized"]),
             "dispatches": int(eng.stats["dispatches"]),
             "disp_deep": int(eng.stats["disp_deep"]),
             "stats": {k: (round(float(v), 3)
                           if isinstance(v, float) else int(v))
                       for k, v in sorted(eng.stats.items())
                       if isinstance(v, (int, float))}}
    # budgets the run finished before: final state carries forward
    for b in budgets[state["idx"]:]:
        snaps.append({"budget_s": b, "elapsed_s": round(wall, 1),
                      "completed": True,
                      **quality(c, gt["plane_z"]),
                      "hist": [int(v) for v in eng.tree.histogram()]})
    return {"wall_s": round(wall, 1), "first_run_wall_s": round(cold, 1),
            "final": final, "snapshots": snaps}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--budgets", default="300,900")
    ap.add_argument("--max-minutes", type=float, default=30.0)
    ap.add_argument("--base", default="/tmp/hpmvs_scenes/ring")
    ap.add_argument("--skip-cpu", action="store_true")
    ap.add_argument("--skip-tpu", action="store_true")
    ap.add_argument("--no-warm", action="store_true",
                    help="skip the throwaway cache-warming TPU run")
    ap.add_argument("--out", default=os.path.join(BENCH, "progressive.json"))
    args = ap.parse_args(argv)
    budgets = [float(b) for b in args.budgets.split(",")]

    from bench import export_scene
    sdir = args.base
    if not os.path.exists(os.path.join(sdir, "scene.nvm")):
        export_scene.export_ring(sdir)
    gt = json.load(open(os.path.join(sdir, "gt.json")))

    def merge(key, entry):
        out = {}
        if os.path.exists(args.out):
            try:
                out = json.load(open(args.out))
            except (json.JSONDecodeError, OSError):
                out = {}
        out["scene"] = gt
        out["budgets_s"] = budgets
        out[key] = entry
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1)
        print("wrote", key, "->", args.out)

    if not args.skip_cpu:
        entry = run_cpu(sdir, gt, budgets, args.max_minutes)
        print(json.dumps(entry, indent=1))
        merge("cpu", entry)
    if not args.skip_tpu:
        entry = run_tpu(sdir, gt, budgets, warm=not args.no_warm)
        print(json.dumps(entry, indent=1))
        merge("tpu", entry)


if __name__ == "__main__":
    main()
