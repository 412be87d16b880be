"""Export synthetic benchmark scenes to disk for the full-loop CPU baseline.

Writes, per scene, a directory with:
  scene.nvm   -- NVM_V3 model (io/nvm.save_nvm), camera filenames pointing at
  camNN.hpi   -- raw level-0 images: magic 'HPI1', int32 w, h, then h*w*3
                 uint8 RGB row-major (no JPEG dependency in the C++ harness)
  gt.json     -- ground-truth descriptor for quality evaluation
                 (plane: plane_z/extent; facade: slope/extent)

Both the TPU pipeline (bench/baseline_e2e.py) and the CPU full-loop harness
(bench/cpu_fullloop.cpp) consume these on-disk scenes, so the comparison is
apples-to-apples: same cameras, same pixels, same SfM seeds
(BASELINE.md: "run ./hpmvs --nvm=<scene.nvm> ... on the benchmark scenes").

The facade export uses k1=0 (no radial distortion): the CPU harness
transcribes the reference pipeline without the undistortion path, and the
distortion capability is separately proven by tests/test_facade.py.
"""

from __future__ import annotations

import dataclasses
import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hpmvs_tpu import testing
from hpmvs_tpu.io import nvm as nvm_io


def write_hpi(path: str, img: np.ndarray) -> None:
    h, w = img.shape[:2]
    with open(path, "wb") as fh:
        fh.write(b"HPI1")
        fh.write(struct.pack("<ii", w, h))
        fh.write(np.ascontiguousarray(img, np.uint8).tobytes())


def export(scene, out_dir: str, gt: dict) -> str:
    os.makedirs(out_dir, exist_ok=True)
    cams = []
    for ci, cam in enumerate(scene.model.cameras):
        name = os.path.join(out_dir, f"cam{ci:02d}.hpi")
        write_hpi(name, scene.images[ci])
        cams.append(dataclasses.replace(cam, filename=name))
    model = dataclasses.replace(scene.model, cameras=cams)
    nvm_path = os.path.join(out_dir, "scene.nvm")
    nvm_io.save_nvm(nvm_path, [model])
    with open(os.path.join(out_dir, "gt.json"), "w") as fh:
        json.dump(gt, fh)
    return nvm_path


def export_plane(out_dir: str, imgsize: int = 512, n_cams: int = 7,
                 n_points: int = 400, seed: int = 0) -> str:
    sc = testing.make_plane_scene(n_cams=n_cams, imgsize=imgsize,
                                  n_points=n_points, seed=seed)
    return export(sc, out_dir, {
        "type": "plane", "plane_z": sc.plane_z, "extent": sc.extent,
        "imgsize": imgsize, "n_cams": n_cams})


def export_facade(out_dir: str, imgsize: int = 256, n_cams: int = 11,
                  n_points: int = 200, seed: int = 0) -> str:
    sc = testing.make_facade_scene(n_cams=n_cams, imgsize=imgsize,
                                   n_points=n_points,
                                   k1_pattern=(0.0,), seed=seed)
    return export(sc, out_dir, {
        "type": "facade", "slope": sc.slope, "extent": sc.extent,
        "imgsize": imgsize, "n_cams": n_cams})


def export_ring(out_dir: str, imgsize: int = 256, n_cams: int = 150,
                n_points: int = 600, seed: int = 0) -> str:
    """The 150-camera large-outdoor stress capture (BASELINE.json config 4),
    on disk for the CPU-vs-TPU progressive head-to-head."""
    ext = 8.0 * (n_cams / 150.0) ** 0.5
    sc = testing.make_ring_plane_scene(n_cams=n_cams, imgsize=imgsize,
                                       extent=ext, n_points=n_points,
                                       seed=seed)
    return export(sc, out_dir, {
        "type": "ring_plane", "plane_z": sc.plane_z, "extent": ext,
        "imgsize": imgsize, "n_cams": n_cams})


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hpmvs_scenes"
    print(export_plane(os.path.join(base, "plane")))
    print(export_facade(os.path.join(base, "facade")))
