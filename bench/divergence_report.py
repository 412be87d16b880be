"""Quantify the documented NCC-frame divergence knobs (VERDICT item 7).

Runs plane + sphere + occlusion scenes with every divergence knob toggled:

  default  USE_BATCHED_STAGES + FAST_SETREF + REUSE_POST_WINDOWS (prod)
  noreuse  REUSE_POST_WINDOWS=False  (post stage re-fetches all windows)
  vmapped  USE_BATCHED_STAGES=False  (per-patch vmapped stages, FAST_SETREF)
  exactref FAST_SETREF=False         (reference setRefImage semantics;
                                      implies the batched post stage off)

and reports patch count, surface RMS and completeness (fraction of a
ground-truth sample grid with a patch within 2% of the scene extent).
The README table is generated from this output.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python bench/divergence_report.py
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def completeness(patches: np.ndarray, gt: np.ndarray, tol: float) -> float:
    """Fraction of ground-truth samples with a patch within tol."""
    if len(patches) == 0:
        return 0.0
    from scipy.spatial import cKDTree  # noqa: F401  (fallback below if absent)
    try:
        d, _ = cKDTree(patches).query(gt, k=1)
    except Exception:  # pragma: no cover
        d = np.min(np.linalg.norm(gt[:, None] - patches[None], axis=-1), 1)
    return float((d < tol).mean())


def run_config(scene_name, scene, gt_pts, err_fn, knobs):
    import jax
    from hpmvs_tpu.config import Options
    from hpmvs_tpu.runtime import pipeline

    opt = dataclasses.replace(
        Options(), START_LEVEL=2, MAXLEVEL=4, COVIS_MIN_POINTS=10,
        MAX_TREE_LEVEL=8, PATCH_FINAL_MINLEVEL=4,
        OUTFOLDER=f"/tmp/div_{scene_name}", **knobs)
    t0 = time.time()
    eng = pipeline.run(scene.model, opt, images=scene.images, mesh=None,
                       max_prio=70)
    dt = time.time() - t0
    c = eng.alive_arrays()[0]
    err = err_fn(c)
    comp = completeness(c, gt_pts, tol=0.02)
    jax.clear_caches()
    return dict(n=len(c), rms=float(np.sqrt((err ** 2).mean())),
                med=float(np.median(err)) if len(err) else np.inf,
                comp=comp, secs=round(dt, 1))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from hpmvs_tpu.testing import (make_plane_scene, make_sphere_scene,
                                   make_occlusion_scene)

    rng = np.random.default_rng(0)
    gx, gy = rng.uniform(-0.75, 0.75, (2, 400))

    scenes = {}
    pl = make_plane_scene(n_cams=7, imgsize=256, n_points=80, seed=1)
    scenes["plane"] = (pl, np.stack([gx, gy, np.full(400, pl.plane_z)], 1),
                       lambda c: np.abs(c[:, 2] - pl.plane_z))
    sp = make_sphere_scene(n_cams=7, imgsize=256, n_points=80, seed=2)
    rr = np.sqrt(gx * gx + gy * gy)
    keep = rr < 0.72
    gt_sp = np.stack([gx[keep], gy[keep],
                      -np.sqrt(np.maximum(1.0 - gx[keep] ** 2
                                          - gy[keep] ** 2, 0.0))], 1)
    scenes["sphere"] = (sp, gt_sp,
                        lambda c: np.abs(np.linalg.norm(c, axis=1) - 1.0))
    oc = make_occlusion_scene(n_cams=7, imgsize=256, n_points=120, seed=3)
    fg = (np.abs(gx) <= 0.3) & (np.abs(gy) <= 0.3)
    gz = np.where(fg, oc.fg_z, 0.0)
    scenes["occlusion"] = (
        oc, np.stack([gx, gy, gz], 1),
        lambda c: np.abs(c[:, 2] - np.where(
            (np.abs(c[:, 0]) <= oc.fg_half) & (np.abs(c[:, 1]) <= oc.fg_half)
            & (c[:, 2] < oc.fg_z / 2), oc.fg_z, 0.0)))

    configs = {
        "default": {},
        "noreuse": dict(REUSE_POST_WINDOWS=False),
        "vmapped": dict(USE_BATCHED_STAGES=False),
        "exactref": dict(FAST_SETREF=False),
    }

    print(f"{'scene':10s} {'config':9s} {'patches':>8s} {'rms':>8s} "
          f"{'median':>8s} {'compl':>6s} {'secs':>6s}")
    rows = {}
    for sname, (scene, gt, err_fn) in scenes.items():
        for cname, knobs in configs.items():
            r = run_config(sname, scene, gt, err_fn, knobs)
            rows[(sname, cname)] = r
            print(f"{sname:10s} {cname:9s} {r['n']:8d} {r['rms']:8.4f} "
                  f"{r['med']:8.4f} {r['comp']:6.3f} {r['secs']:6.1f}",
                  flush=True)
    # delta summary vs default
    print("\ndeltas vs default (count %, rms ratio, completeness pp):")
    for sname in scenes:
        base = rows[(sname, "default")]
        for cname in configs:
            if cname == "default":
                continue
            r = rows[(sname, cname)]
            dn = 100.0 * (r["n"] - base["n"]) / max(base["n"], 1)
            rr_ = r["rms"] / max(base["rms"], 1e-9)
            dc = 100.0 * (r["comp"] - base["comp"])
            print(f"{sname:10s} {cname:9s} count {dn:+6.1f}%  "
                  f"rms x{rr_:.2f}  compl {dc:+5.1f}pp")


if __name__ == "__main__":
    main()
