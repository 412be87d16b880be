"""Reconstruction quality metrics: accuracy / completeness.

The reference publishes no quantitative metrics (BASELINE.md); its paper
evaluates accuracy/completeness against ground truth. This module provides
those metrics for the benchmark configs: cloud-to-reference distances
(accuracy), reference-to-cloud coverage (completeness), and chamfer distance
-- against either another point cloud or an analytic ground-truth surface
(the synthetic scenes' plane).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _nn_dists(a: np.ndarray, b: np.ndarray, chunk: int = 2048) -> np.ndarray:
    """For each point in a, distance to the nearest point in b (brute force,
    chunked; scenes here are <= a few 100k points)."""
    try:
        from scipy.spatial import cKDTree
        return cKDTree(b).query(a, k=1)[0]
    except Exception:
        out = np.empty(len(a))
        for i in range(0, len(a), chunk):
            d = np.linalg.norm(a[i:i + chunk, None, :] - b[None], axis=-1)
            out[i:i + chunk] = d.min(1)
        return out


def accuracy(cloud: np.ndarray, reference: np.ndarray,
             percentile: float = 90.0) -> float:
    """Distance below which `percentile`% of cloud points lie from the
    reference (lower = more accurate)."""
    return float(np.percentile(_nn_dists(cloud, reference), percentile))


def completeness(cloud: np.ndarray, reference: np.ndarray,
                 tol: float) -> float:
    """Fraction of reference points with a cloud point within `tol`."""
    return float((_nn_dists(reference, cloud) < tol).mean())


def chamfer(a: np.ndarray, b: np.ndarray) -> float:
    return float(_nn_dists(a, b).mean() + _nn_dists(b, a).mean())


def plane_metrics(cloud: np.ndarray, plane_z: float, extent: float,
                  tol: float, grid: int = 40) -> Dict[str, float]:
    """Metrics against the synthetic ground-truth plane z = plane_z over
    [-extent, extent]^2: accuracy = |z - plane_z| percentiles, completeness =
    fraction of a regular grid on the plane covered within `tol`."""
    err = np.abs(cloud[:, 2] - plane_z)
    xs = np.linspace(-0.8 * extent, 0.8 * extent, grid)
    gx, gy = np.meshgrid(xs, xs)
    ref = np.stack([gx.ravel(), gy.ravel(),
                    np.full(grid * grid, plane_z)], axis=1)
    return {
        "acc_median": float(np.median(err)),
        "acc_p90": float(np.percentile(err, 90)),
        "completeness": completeness(cloud, ref, tol),
        "n_points": int(len(cloud)),
    }


def main(argv=None) -> int:
    """CLI: compare two point clouds.

    python -m hpmvs_tpu.eval reconstruction.ply reference.ply [--tau 0.01]
    prints accuracy (cloud->ref), completeness (ref->cloud at tau) and
    chamfer distance as one JSON line."""
    import argparse
    import json

    from hpmvs_tpu.io import ply as ply_io

    ap = argparse.ArgumentParser(description="point-cloud quality metrics")
    ap.add_argument("cloud", help="reconstructed PLY")
    ap.add_argument("reference", help="reference / ground-truth PLY")
    ap.add_argument("--tau", type=float, default=0.01,
                    help="completeness distance threshold")
    args = ap.parse_args(argv)
    # read_ext_ply handles both ASCII and binary bodies (the pipeline's
    # --light_output artifacts are binary)
    a = np.asarray(ply_io.read_ext_ply(args.cloud)["xyz"], dtype=np.float64)
    b = np.asarray(ply_io.read_ext_ply(args.reference)["xyz"],
                   dtype=np.float64)
    d_ab = _nn_dists(a, b)
    d_ba = _nn_dists(b, a)
    print(json.dumps({
        "n_cloud": int(len(a)), "n_reference": int(len(b)),
        "accuracy_mean": float(np.mean(d_ab)),
        "accuracy_median": float(np.median(d_ab)),
        "completeness": float((d_ba < args.tau).mean()),
        "chamfer": float(d_ab.mean() + d_ba.mean()),
    }))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
