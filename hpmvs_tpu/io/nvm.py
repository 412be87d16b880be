"""NVM_V3 (VisualSFM) model reader/writer.

Behavioral equivalent of the reference NVMReader
(include/hpmvs/NVMReader.h:32-65, src/hpmvs/NVMReader.cpp:31-205):
multi-model files, camera lines ``<file> <focal> <qw qx qy qz> <cx cy cz>
<radial> 0``, point lines ``<xyz> <rgb> <#meas> (<img> <feat> <x> <y>)*``,
relative image paths resolved against the .nvm folder.

Pure host-side I/O -- token-stream parsing with numpy containers; no
performance stakes (L1 layer in SURVEY.md).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List

import numpy as np


@dataclasses.dataclass
class NvmCamera:
    filename: str
    f: float
    rq: np.ndarray  # (4,) quaternion w,x,y,z
    c: np.ndarray   # (3,) camera center
    r: float        # single radial distortion parameter


@dataclasses.dataclass
class NvmModel:
    cameras: List[NvmCamera]
    # structure-of-arrays point storage
    points_xyz: np.ndarray   # (P, 3) float64
    points_rgb: np.ndarray   # (P, 3) float64
    # ragged measurements in CSR form
    meas_start: np.ndarray   # (P + 1,) int64 offsets into meas_*
    meas_img: np.ndarray     # (M,) int32 image index
    meas_feat: np.ndarray    # (M,) int32 feature index
    meas_xy: np.ndarray      # (M, 2) float64

    @property
    def n_points(self) -> int:
        return self.points_xyz.shape[0]


class _Tokens:
    def __init__(self, text: str):
        self._it = iter(text.split())

    def next(self) -> str:
        return next(self._it)

    def next_float(self) -> float:
        return float(next(self._it))

    def next_int(self) -> int:
        return int(next(self._it))

    def peek_good(self) -> bool:
        try:
            tok = next(self._it)
        except StopIteration:
            return False
        self._it = _chain_one(tok, self._it)
        return True


def _chain_one(first, rest):
    yield first
    yield from rest


def _read_model(tk: _Tokens, nvmfolder: str, fix_path: bool) -> NvmModel:
    n_cams = tk.next_int()
    cameras = []
    for _ in range(n_cams):
        filename = tk.next().replace('"', ' ')
        f = tk.next_float()
        rq = np.array([tk.next_float() for _ in range(4)], dtype=np.float64)
        c = np.array([tk.next_float() for _ in range(3)], dtype=np.float64)
        r = tk.next_float()
        check = tk.next_int()
        assert check == 0, "last camera parameter should be 0"
        if fix_path and not os.path.isabs(filename):
            filename = os.path.join(nvmfolder, filename)
        cameras.append(NvmCamera(filename, f, rq, c, r))

    n_pts = tk.next_int() if n_cams > 0 else 0
    xyz = np.zeros((n_pts, 3), dtype=np.float64)
    rgb = np.zeros((n_pts, 3), dtype=np.float64)
    starts = np.zeros(n_pts + 1, dtype=np.int64)
    m_img, m_feat, m_xy = [], [], []
    for ii in range(n_pts):
        xyz[ii] = [tk.next_float() for _ in range(3)]
        rgb[ii] = [tk.next_float() for _ in range(3)]
        n_meas = tk.next_int()
        starts[ii + 1] = starts[ii] + n_meas
        for _ in range(n_meas):
            m_img.append(tk.next_int())
            m_feat.append(tk.next_int())
            m_xy.append((tk.next_float(), tk.next_float()))

    return NvmModel(
        cameras=cameras,
        points_xyz=xyz,
        points_rgb=rgb,
        meas_start=starts,
        meas_img=np.asarray(m_img, dtype=np.int32),
        meas_feat=np.asarray(m_feat, dtype=np.int32),
        meas_xy=(np.asarray(m_xy, dtype=np.float64).reshape(-1, 2)
                 if m_xy else np.zeros((0, 2))),
    )


def read_nvm(path: str, fix_path: bool = True) -> List[NvmModel]:
    """Parse an NVM_V3 file into a list of models (NVMReader.cpp:115-155)."""
    with open(path, "r") as fh:
        text = fh.read()
    tk = _Tokens(text)
    header = tk.next()
    if header.upper() != "NVM_V3":
        raise ValueError(f"<{path}> is no valid nvm file [TAG = {header}]")
    nvmfolder = os.path.dirname(path)

    models: List[NvmModel] = []
    while tk.peek_good():
        model = _read_model(tk, nvmfolder, fix_path)
        if len(model.cameras) == 0:
            break
        models.append(model)
    return models


def save_nvm(path: str, models: List[NvmModel]) -> None:
    """Write models as NVM_V3 (NVMReader.cpp:157-183)."""
    with open(path, "w") as fh:
        fh.write("NVM_V3\n")
        for m in models:
            fh.write(f"\n{len(m.cameras)}\n")
            for cam in m.cameras:
                rq = " ".join(repr(float(v)) for v in cam.rq)
                c = " ".join(repr(float(v)) for v in cam.c)
                fh.write(f"{cam.filename} {cam.f!r} {rq} {c} {cam.r!r} 0\n")
            if len(m.cameras) > 0:
                fh.write(f"\n{m.n_points}\n")
            for ii in range(m.n_points):
                x = " ".join(repr(float(v)) for v in m.points_xyz[ii])
                col = " ".join(str(int(v)) for v in m.points_rgb[ii])
                s, e = m.meas_start[ii], m.meas_start[ii + 1]
                fh.write(f"{x} {col} {e - s}")
                for jj in range(s, e):
                    fh.write(f" {int(m.meas_img[jj])} {int(m.meas_feat[jj])}"
                             f" {float(m.meas_xy[jj, 0])!r}"
                             f" {float(m.meas_xy[jj, 1])!r}")
                fh.write("\n")
        fh.write("0")


def save_sparse_ply(model: NvmModel, path: str) -> None:
    """Export the sparse point cloud (NVMReader.cpp:185-205)."""
    with open(path, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {model.n_points}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n")
        fh.write("property uchar diffuse_red\nproperty uchar diffuse_green\n"
                 "property uchar diffuse_blue\nend_header\n")
        for ii in range(model.n_points):
            x, y, z = model.points_xyz[ii]
            r = int(model.points_rgb[ii][0])
            fh.write(f"{x} {y} {z} {r} {r} {r}\n")
