"""Full-loop reference comparison: hpmvs-CPU vs hpmvs_tpu on the SAME
on-disk scenes -- the project's own success metric (BASELINE.json: quality
"accuracy/completeness within reference bounds" at matched runtime; the
reference's built-in metric is whole-loop wall-clock, main.cpp:183-185).

Runs bench/cpu_fullloop (the reference algorithm transcribed end-to-end,
linked against the reference's own vendored BOBYQA) and the TPU pipeline
(runtime/pipeline.run) on scenes exported by bench/export_scene.py, then
records for each side: end-to-end wall-clock, optimize calls/sec, final
patch count, per-level cell histogram, and quality vs analytic ground truth
(inlier fraction + RMS distance to the true surface, hpmvs_tpu/eval.py
conventions). Writes BASELINE_E2E.json.

Usage:
    python bench/baseline_e2e.py [--scene plane|facade|all] [--minutes 20]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH = os.path.dirname(os.path.abspath(__file__))


def read_ply_xyz(path: str) -> np.ndarray:
    pts = []
    with open(path) as fh:
        n = 0
        for line in fh:
            if line.startswith("element vertex"):
                n = int(line.split()[-1])
            if line.strip() == "end_header":
                break
        for _ in range(n):
            vals = fh.readline().split()
            pts.append([float(v) for v in vals[:3]])
    return np.asarray(pts, np.float64).reshape(-1, 3)


def surface_dist(pts: np.ndarray, gt: dict) -> np.ndarray:
    if gt["type"] == "plane":
        return np.abs(pts[:, 2] - gt["plane_z"])
    if gt["type"] == "facade":
        from hpmvs_tpu.testing import facade_surface_dist
        return facade_surface_dist(pts, gt["slope"])
    raise ValueError(gt["type"])


def quality(pts: np.ndarray, gt: dict, tol: float) -> dict:
    """Accuracy proxy vs analytic ground truth: fraction of patches within
    tol of the true surface + RMS of inlier distances. Completeness proxy:
    the in-extent footprint coverage on a 32x32 grid of the known surface
    domain (fraction of ground-truth area that has a patch nearby)."""
    if len(pts) == 0:
        return {"n": 0, "inlier_frac": 0.0, "rms": float("inf"),
                "coverage": 0.0}
    d = surface_dist(pts, gt)
    inl = d < tol
    ext = gt["extent"]
    G = 32
    # surface domain: x,y in [-e, e] for both scene types
    inside = (np.abs(pts[:, 0]) <= ext) & (np.abs(pts[:, 1]) <= ext)
    good = inl & inside
    gx = ((pts[good, 0] + ext) / (2 * ext) * G).astype(int).clip(0, G - 1)
    gy = ((pts[good, 1] + ext) / (2 * ext) * G).astype(int).clip(0, G - 1)
    cov = len(set(zip(gx.tolist(), gy.tolist()))) / (G * G)
    return {"n": int(len(pts)), "inlier_frac": float(inl.mean()),
            "rms": float(np.sqrt((d[inl] ** 2).mean())) if inl.any() else
            float("inf"), "coverage": float(cov)}


def run_cpu(scene_dir: str, minutes: float) -> dict:
    exe = os.path.join(BENCH, "build", "cpu_fullloop")
    if not os.path.exists(exe):
        subprocess.run([os.path.join(BENCH, "build_fullloop.sh")], check=True)
    ply = os.path.join(scene_dir, "cpu_final.ply")
    out = subprocess.run(
        [exe, os.path.join(scene_dir, "scene.nvm"), ply, str(minutes)],
        capture_output=True, text=True, check=True)
    res = json.loads(out.stdout.strip().splitlines()[-1])
    res["ply"] = ply
    return res


def run_tpu(scene_dir: str, max_prio=None, warmup: bool = True) -> dict:
    from hpmvs_tpu import config
    from hpmvs_tpu.runtime import pipeline

    outdir = os.path.join(scene_dir, "tpu_out")
    opt = config.Options(OUTFOLDER=outdir)
    cold = None
    if warmup:
        # first run pays XLA compiles (~20-40 s/shape over the tunnel; paid
        # once per code change thanks to the persistent cache) -- record it,
        # then measure the steady-state production run
        t0 = time.time()
        pipeline.run_nvm_file(os.path.join(scene_dir, "scene.nvm"), opt,
                              max_prio=max_prio)
        cold = time.time() - t0
    t0 = time.time()
    eng = pipeline.run_nvm_file(os.path.join(scene_dir, "scene.nvm"), opt,
                                max_prio=max_prio)
    wall = time.time() - t0
    hist = eng.tree.histogram()
    return {
        "wall_seconds": wall,
        "first_run_wall_seconds": cold,
        "loop_seconds": float(eng.stats["proc_time"]),
        "optimize_calls": int(eng.stats["patches_optimized"]),
        "optimize_calls_per_sec": eng.stats["patches_optimized"] / wall,
        "final_patches": eng.n_alive(),
        "hist": [int(v) for v in hist],
        "ply": os.path.join(outdir, "patches-final.ply"),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="all", choices=["plane", "facade",
                                                       "all"])
    ap.add_argument("--minutes", type=float, default=20.0,
                    help="CPU loop wall-clock cap")
    ap.add_argument("--base", default="/tmp/hpmvs_scenes")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(BENCH), "BASELINE_E2E.json"))
    ap.add_argument("--skip-cpu", action="store_true")
    ap.add_argument("--skip-tpu", action="store_true")
    args = ap.parse_args(argv)

    from bench import export_scene  # noqa: F401  (path side effect)
    scenes = ["plane", "facade"] if args.scene == "all" else [args.scene]
    # merge-load: a --skip-cpu re-measure of the TPU leg must keep the
    # committed CPU leg (and vice versa) instead of dropping it
    results = {}
    if os.path.exists(args.out):
        with open(args.out) as fh:
            results = json.load(fh)
    for name in scenes:
        sdir = os.path.join(args.base, name)
        if not os.path.exists(os.path.join(sdir, "scene.nvm")):
            if name == "plane":
                export_scene.export_plane(sdir)
            else:
                export_scene.export_facade(sdir)
        gt = json.load(open(os.path.join(sdir, "gt.json")))
        # tolerance: ~2x the seed noise / voxel size at mid depth
        tol = 0.02 * gt["extent"]
        entry = results.get(name, {})
        entry.update({"gt": gt, "tolerance": tol})
        if not args.skip_cpu:
            cpu = run_cpu(sdir, args.minutes)
            cpu["quality"] = quality(read_ply_xyz(cpu["ply"]), gt, tol)
            entry["cpu"] = cpu
        if not args.skip_tpu:
            tpu = run_tpu(sdir)
            tpu["quality"] = quality(read_ply_xyz(tpu["ply"]), gt, tol)
            entry["tpu"] = tpu
        if "cpu" in entry and "tpu" in entry:
            entry["speedup_e2e"] = (
                (entry["cpu"]["init_seconds"] + entry["cpu"]["loop_seconds"])
                / max(entry["tpu"]["wall_seconds"], 1e-9))
            entry["optimize_rate_ratio"] = (
                entry["tpu"]["optimize_calls_per_sec"]
                / max(entry["cpu"]["optimize_calls_per_sec"], 1e-9))
        results[name] = entry
        print(json.dumps({name: entry}, indent=2))

    with open(args.out, "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
