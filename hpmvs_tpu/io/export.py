"""Scene/debug exporters: NVM re-export, projection matrices, depth-buffer
visualization, octree visualization.

Behavioral equivalents of the reference's auxiliary outputs:
  - Scene::saveAsNVM (src/hpmvs/Scene.cpp:646-713): re-export the whole
    reconstruction as an NVM project (cameras + every patch as a point with
    per-view measurements) plus the undistorted images.
  - Scene::savePMats / savePoseMats (Scene.cpp:715-739).
  - Scene::visualizeDepths (Scene.cpp:434-516): HTML table of jet-colormapped
    depth buffers per image x level plus the accumulated full-depth map.
  - DynOctTree::toPly (include/hpmvs/doctree.h:624-729): points +
    cube-mesh visualization of the occupied octree cells.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from hpmvs_tpu.core import depth as depth_mod
from hpmvs_tpu.io import nvm as nvm_io


def save_as_nvm(engine, folder: str) -> str:
    """Re-export the scene + patch cloud as an NVM project (Scene.cpp:646-713)."""
    os.makedirs(folder, exist_ok=True)
    img_folder = os.path.join(folder, "imgs")
    os.makedirs(img_folder, exist_ok=True)

    cams = engine.scene.ctx.cams
    imgs = engine.scene.ctx.imgs
    P0 = np.asarray(cams.P)[:, 0]
    centers = np.asarray(cams.center)
    xas = np.asarray(cams.xaxis)
    yas = np.asarray(cams.yaxis)
    zas = np.asarray(cams.zaxis)

    from hpmvs_tpu.testing import _rot_to_quat  # quaternion from R
    from PIL import Image as PILImage

    nvm_cams = []
    for ci in range(engine.scene.n_cameras):
        name = os.path.join("imgs", f"{ci}.jpg")
        # dump the level-0 image back out
        row0 = int(imgs.row0[ci, 0])
        h = int(imgs.height[ci, 0])
        w = int(imgs.width[ci, 0])
        plane = np.asarray(imgs.tex[row0:row0 + h, :w]).astype(np.uint8)
        PILImage.fromarray(plane).save(os.path.join(folder, name))

        R = np.stack([xas[ci] / np.linalg.norm(xas[ci]),
                      yas[ci] / np.linalg.norm(yas[ci]),
                      zas[ci] / np.linalg.norm(zas[ci])])
        rq = _rot_to_quat(R)
        # recover the NVM focal (kMat_[0](0,0)) from P = K[R|t]: with
        # K = [f 0 cx; 0 f cy; 0 0 1], row0 = f*R0 + cx*R2 and row2 = R2,
        # so |row0 x row2| = f exactly (the raw row norm would smuggle the
        # principal-point term sqrt(f^2+cx^2) into the focal and inflate it
        # again on re-read through build_cameras)
        r2 = P0[ci][2, :3].astype(np.float64)
        r2 /= np.linalg.norm(r2)
        f = float(np.linalg.norm(np.cross(P0[ci][0, :3].astype(np.float64),
                                          r2)))
        nvm_cams.append(nvm_io.NvmCamera(filename=name, f=f, rq=rq,
                                         c=centers[ci].astype(np.float64),
                                         r=0.0))

    c, n, col, s, v, nv = engine.alive_arrays()
    npts = c.shape[0]
    starts = np.zeros(npts + 1, dtype=np.int64)
    m_img, m_feat, m_xy = [], [], []
    for ii in range(npts):
        k = int(nv[ii])
        starts[ii + 1] = starts[ii] + k
        for j in range(k):
            ci = int(v[ii, j])
            ph = P0[ci] @ np.append(c[ii], 1.0)
            m_img.append(ci)
            m_feat.append(0)
            m_xy.append((ph[0] / ph[2], ph[1] / ph[2]))

    model = nvm_io.NvmModel(
        cameras=nvm_cams,
        points_xyz=c.astype(np.float64),
        points_rgb=col.astype(np.float64),
        meas_start=starts,
        meas_img=np.asarray(m_img, dtype=np.int32),
        meas_feat=np.asarray(m_feat, dtype=np.int32),
        meas_xy=(np.asarray(m_xy).reshape(-1, 2) if m_xy
                 else np.zeros((0, 2))))
    path = os.path.join(folder, "project.nvm")
    nvm_io.save_nvm(path, [model])
    return path


def save_pmats(engine, path: str) -> None:
    """Scene::savePMats (Scene.cpp:715-722): level-0 projection matrices."""
    P0 = np.asarray(engine.scene.ctx.cams.P)[:, 0]
    with open(path, "w") as fh:
        for ci in range(P0.shape[0]):
            for row in P0[ci]:
                fh.write(", ".join(repr(float(x)) for x in row) + "\n")


def save_pose_mats(engine, path: str) -> None:
    """Scene::savePoseMats (Scene.cpp:724-739): [R | C] per camera."""
    cams = engine.scene.ctx.cams
    xas, yas, zas = (np.asarray(cams.xaxis), np.asarray(cams.yaxis),
                     np.asarray(cams.zaxis))
    centers = np.asarray(cams.center)
    with open(path, "w") as fh:
        for ci in range(centers.shape[0]):
            R = np.stack([xas[ci] / np.linalg.norm(xas[ci]),
                          yas[ci] / np.linalg.norm(yas[ci]),
                          zas[ci] / np.linalg.norm(zas[ci])])
            pose = np.concatenate([R, centers[ci][:, None]], axis=1)
            for row in pose:
                fh.write(", ".join(repr(float(x)) for x in row) + "\n")


def _jet(x: np.ndarray) -> np.ndarray:
    """Jet colormap (CImg jet_LUT256 equivalent) for [0,1] -> uint8 RGB."""
    x = np.clip(x, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


def visualize_depths(engine, folder: str) -> str:
    """Scene::visualizeDepths (Scene.cpp:434-516): HTML overview with
    jet-colormapped per-level depth buffers and the accumulated map."""
    from PIL import Image as PILImage
    os.makedirs(folder, exist_ok=True)
    pack = engine.pack
    imgs = engine.scene.ctx.imgs
    depth = np.asarray(pack.depth)
    offs = np.asarray(pack.offset)
    ws = np.asarray(pack.width)
    hs = np.asarray(pack.height)
    ncam, nlevel = offs.shape

    def norm_save(img, name):
        m = img != depth_mod.MAX_DEPTH
        out = np.zeros_like(img)
        if m.any():
            lo, hi = img[m].min(), img[m].max()
            rng = hi - lo if hi > lo else 1.0
            out[m] = (img[m] - lo) / rng
        PILImage.fromarray(_jet(out)).save(os.path.join(folder, name))

    html = ["<!DOCTYPE html><html><head>",
            "<style>table, th, td {border: 1px solid black;"
            "border-collapse: collapse;} img { height: auto; width: 100%;}"
            "th, td {padding: 5px;text-align: left;}</style>",
            "</head><body><h2>Depth Images:</h2>",
            '<table style="width:100%">',
            "<tr><th>Color</th><th>Combined</th>"
            + "".join(f"<th>L{lv}</th>" for lv in range(nlevel)) + "</tr>"]

    for ci in range(ncam):
        html.append("<tr>")
        # color image (level 1 like the reference)
        row0 = int(imgs.row0[ci, 1])
        h1, w1 = int(imgs.height[ci, 1]), int(imgs.width[ci, 1])
        plane = np.asarray(imgs.tex[row0:row0 + h1, :w1]).astype(np.uint8)
        cname = f"{ci}_col.jpg"
        PILImage.fromarray(plane).save(os.path.join(folder, cname))
        html.append(f'<td><img src="{cname}"/></td>')

        # combined full-depth map
        per_level = []
        for lv in range(nlevel):
            w, h = int(ws[ci, lv]), int(hs[ci, lv])
            per_level.append(depth[offs[ci, lv]:offs[ci, lv] + w * h]
                             .reshape(h, w))
        h0, w0 = per_level[0].shape
        combined = np.full((h0, w0), depth_mod.MAX_DEPTH, np.float32)
        for lv, d in enumerate(per_level):
            up = np.repeat(np.repeat(d, 1 << lv, 0), 1 << lv, 1)[:h0, :w0]
            pad_h, pad_w = h0 - up.shape[0], w0 - up.shape[1]
            if pad_h or pad_w:
                up = np.pad(up, ((0, pad_h), (0, pad_w)),
                            constant_values=depth_mod.MAX_DEPTH)
            combined = np.minimum(combined, up)
        aname = f"{ci}_all.jpg"
        norm_save(combined, aname)
        html.append(f'<td><img src="{aname}"/></td>')

        for lv in range(nlevel):
            name = f"{ci}_{lv}.jpg"
            norm_save(per_level[lv], name)
            html.append(f'<td><img src="{name}"/></td>')
        html.append("</tr>")

    html.append("</table></body></html>")
    path = os.path.join(folder, "overview.html")
    with open(path, "w") as fh:
        fh.write("".join(html))
    return path


def tree_to_ply(engine, name_prefix: str, no_scalar: bool = True) -> None:
    """DynOctTree::toPly (doctree.h:624-729): '<prefix>-points.ply' with
    per-patch scalars and '<prefix>-tree.ply' with a cube mesh per occupied
    cell."""
    c, n, col, s, v, nv = engine.alive_arrays()
    pids = np.nonzero(engine.patches.alive[:engine.patches.n])[0]
    flat = engine.patches.flatness[pids]

    with open(name_prefix + "-points.ply", "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {len(c)}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n"
                 "property float nx\nproperty float ny\nproperty float nz\n"
                 "property uchar red\nproperty uchar green\n"
                 "property uchar blue\n")
        if not no_scalar:
            fh.write("property float scalar_scale\n"
                     "property float scalar_flatness\n")
        fh.write("end_header\n")
        cu = np.clip(np.floor(col + 0.5), 0, 255).astype(int)
        for i in range(len(c)):
            fh.write(f"{c[i,0]} {c[i,1]} {c[i,2]} "
                     f"{n[i,0]} {n[i,1]} {n[i,2]} "
                     f"{cu[i,0]} {cu[i,1]} {cu[i,2]}")
            if not no_scalar:
                fh.write(f" {s[i]} {flat[i]}")
            fh.write("\n")

    # cube mesh of occupied cells
    tree = engine.tree
    cids = np.nonzero(tree.alive[:tree.n])[0]
    centers, widths = tree.cell_center_width(cids)
    verts = np.array([[0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0],
                      [1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0]])
    faces = [[0, 1, 2, 3], [7, 6, 5, 4], [0, 4, 5, 1],
             [1, 5, 6, 2], [2, 6, 7, 3], [3, 7, 4, 0]]
    # mean patch color per cell (padded member matrix, vectorized)
    cell_cols = np.full((len(cids), 3), 128.0)
    if len(cids):
        m, mask = engine._members(cids)
        cols = np.where(mask[..., None], engine.patches.color[np.maximum(m, 0)],
                        0.0)
        cnt = mask.sum(1)
        got = cnt > 0
        cell_cols[got] = cols.sum(1)[got] / cnt[got][:, None]
    cell_cols = np.clip(np.floor(cell_cols + 0.5), 0, 255).astype(int)

    with open(name_prefix + "-tree.ply", "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {8 * len(cids)}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n"
                 "property uchar diffuse_red\nproperty uchar diffuse_green\n"
                 "property uchar diffuse_blue\n")
        fh.write(f"element face {6 * len(cids)}\n")
        fh.write("property list uchar int vertex_index\nend_header\n")
        for j in range(len(cids)):
            w = widths[j]
            base = centers[j] - w / 2.0
            for vtx in verts:
                p = base + vtx * w
                fh.write(f"{p[0]} {p[1]} {p[2]} {cell_cols[j,0]} "
                         f"{cell_cols[j,1]} {cell_cols[j,2]}\n")
        for j in range(len(cids)):
            si = 8 * j
            for f4 in faces:
                fh.write("4 " + " ".join(str(si + k) for k in f4) + "\n")
