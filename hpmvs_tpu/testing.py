"""Synthetic scene generation for tests and benchmarks.

The reference repo ships no test data (SURVEY.md section 4: hpmvs has no
first-party tests), and this sandbox has no network access to fetch Tsukuba /
Strecha scenes, so we build fully-determined synthetic scenes: a textured
plane (optionally several) observed by an arc of pinhole cameras that follow
the NVM camera convention (principal point at image center, single focal).
Ground-truth geometry is known, so reconstruction accuracy is measurable
exactly -- distance of every output patch to the true surface.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np

from hpmvs_tpu.io import nvm as nvm_io


def _rot_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(1.0 + R[i, i] - R[j, j] - R[k, k]) * 2
        q = np.zeros(4)
        q[1 + i] = 0.25 * s
        q[0] = (R[k, j] - R[j, k]) / s
        q[1 + j] = (R[j, i] + R[i, j]) / s
        q[1 + k] = (R[k, i] + R[i, k]) / s
        w, x, y, z = q
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def _lookat(eye: np.ndarray, target: np.ndarray, up=(0.0, 1.0, 0.0)):
    """World->camera rotation with +z forward (pinhole convention)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, dtype=np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], axis=0)
    return R


def smooth_texture(rng: np.random.Generator, size: int, cells: int = 24) -> np.ndarray:
    """Smooth random RGB texture in [0,255]: bilinear upsample of a coarse grid."""
    grid = rng.uniform(30, 225, size=(cells + 1, cells + 1, 3))
    u = np.linspace(0, cells, size)
    iu = np.minimum(u.astype(np.int64), cells - 1)
    fu = u - iu
    rows = (grid[iu] * (1 - fu)[:, None, None] + grid[iu + 1] * fu[:, None, None])
    cols = (rows[:, iu] * (1 - fu)[None, :, None] + rows[:, iu + 1] * fu[None, :, None])
    return cols


@dataclasses.dataclass
class PlaneScene:
    model: nvm_io.NvmModel
    images: List[np.ndarray]      # (H, W, 3) uint8 per camera
    plane_z: float                # ground-truth plane z = const
    extent: float                 # plane spans [-extent, extent]^2 in x,y
    f: float
    imgsize: int


def make_plane_scene(
    n_cams: int = 7,
    imgsize: int = 512,
    n_points: int = 400,
    extent: float = 1.0,
    cam_dist: float = 3.5,
    arc_deg: float = 55.0,
    seed: int = 0,
    out_dir: Optional[str] = None,
    plane_z: float = 0.0,
) -> PlaneScene:
    """Textured plane z=plane_z seen from an arc of cameras above it (-z side).

    Cameras sit at distance cam_dist on an arc, all looking at the origin.
    Every image is an exact pinhole rendering of the plane texture, so NCC
    across views is consistent by construction.
    """
    rng = np.random.default_rng(seed)
    f = imgsize * 1.2
    tex_size = 2048
    tex = smooth_texture(rng, tex_size)

    def tex_at(x, y):
        # world (x, y) -> texture pixel, bilinear
        u = (x / extent * 0.5 + 0.5) * (tex_size - 1)
        v = (y / extent * 0.5 + 0.5) * (tex_size - 1)
        u = np.clip(u, 0, tex_size - 1.001)
        v = np.clip(v, 0, tex_size - 1.001)
        iu, iv = u.astype(np.int64), v.astype(np.int64)
        fu, fv = (u - iu)[..., None], (v - iv)[..., None]
        return (tex[iv, iu] * (1 - fu) * (1 - fv) + tex[iv, iu + 1] * fu * (1 - fv)
                + tex[iv + 1, iu] * (1 - fu) * fv + tex[iv + 1, iu + 1] * fu * fv)

    cameras, images = [], []
    angles = np.linspace(-np.deg2rad(arc_deg) / 2, np.deg2rad(arc_deg) / 2, n_cams)
    for ci, a in enumerate(angles):
        eye = np.array([cam_dist * np.sin(a), 0.4 * np.sin(2.3 * a),
                        plane_z - cam_dist * np.cos(a)])
        R = _lookat(eye, np.array([0.0, 0.0, plane_z]))
        q = _rot_to_quat(R)

        # render: pixel (u,v) -> ray -> intersect plane z=plane_z
        uu, vv = np.meshgrid(np.arange(imgsize), np.arange(imgsize))
        d_cam = np.stack([(uu - imgsize / 2.0) / f,
                          (vv - imgsize / 2.0) / f,
                          np.ones_like(uu, dtype=np.float64)], axis=-1)
        d_world = d_cam @ R  # R^T @ d per pixel
        t = (plane_z - eye[2]) / d_world[..., 2]
        px = eye[0] + t * d_world[..., 0]
        py = eye[1] + t * d_world[..., 1]
        img = np.clip(tex_at(px, py) + 0.5, 0, 255).astype(np.uint8)
        # pixels whose ray misses the textured region -> dark falloff
        outside = (np.abs(px) > extent) | (np.abs(py) > extent) | (t <= 0)
        img[outside] = 8

        name = f"cam{ci:02d}.png"
        if out_dir is not None:
            from PIL import Image as PILImage
            os.makedirs(out_dir, exist_ok=True)
            name = os.path.join(out_dir, name)
            PILImage.fromarray(img).save(name)
        cameras.append(nvm_io.NvmCamera(filename=name, f=f, rq=q,
                                        c=eye.copy(), r=0.0))
        images.append(img)

    # SfM points: random points on the plane, measured in all viewing cameras
    pts = np.zeros((n_points, 3))
    pts[:, 0] = rng.uniform(-0.8 * extent, 0.8 * extent, n_points)
    pts[:, 1] = rng.uniform(-0.8 * extent, 0.8 * extent, n_points)
    pts[:, 2] = plane_z
    # slight SfM noise along z
    pts[:, 2] += rng.normal(0, 0.002, n_points)

    rgb = np.zeros((n_points, 3))
    m_img, m_feat, m_xy = [], [], []
    starts = np.zeros(n_points + 1, dtype=np.int64)
    for ii in range(n_points):
        cnt = 0
        for ci, cam in enumerate(cameras):
            R = _quatR(cam.rq)
            pc = R @ (pts[ii] - cam.c)
            if pc[2] <= 0:
                continue
            u = f * pc[0] / pc[2] + imgsize / 2.0
            v = f * pc[1] / pc[2] + imgsize / 2.0
            if 10 <= u < imgsize - 10 and 10 <= v < imgsize - 10:
                m_img.append(ci)
                m_feat.append(ii)
                m_xy.append((u - imgsize / 2.0, v - imgsize / 2.0))
                cnt += 1
        starts[ii + 1] = starts[ii] + cnt
        rgb[ii] = tex_at(np.array([pts[ii, 0]]), np.array([pts[ii, 1]]))[0]

    model = nvm_io.NvmModel(
        cameras=cameras, points_xyz=pts, points_rgb=rgb, meas_start=starts,
        meas_img=np.asarray(m_img, dtype=np.int32),
        meas_feat=np.asarray(m_feat, dtype=np.int32),
        meas_xy=(np.asarray(m_xy, dtype=np.float64).reshape(-1, 2)
                 if m_xy else np.zeros((0, 2))))
    return PlaneScene(model=model, images=images, plane_z=plane_z,
                      extent=extent, f=f, imgsize=imgsize)


@dataclasses.dataclass
class SphereScene:
    model: nvm_io.NvmModel
    images: List[np.ndarray]
    center: np.ndarray          # sphere center
    radius: float
    f: float
    imgsize: int


def make_sphere_scene(
    n_cams: int = 7,
    imgsize: int = 512,
    n_points: int = 300,
    radius: float = 1.0,
    cam_dist: float = 3.5,
    arc_deg: float = 55.0,
    seed: int = 0,
    out_dir: Optional[str] = None,
) -> SphereScene:
    """Textured sphere (center at origin) seen from an arc of cameras on the
    -z side: exact pinhole renders via ray-sphere intersection. Texture is
    attached to surface world coordinates, so multi-view NCC is consistent.
    Exercises curved geometry + spatially varying normals (the plane scene
    cannot catch normal-estimation sign/axis bugs)."""
    rng = np.random.default_rng(seed)
    f = imgsize * 1.2
    tex_size = 2048
    tex = smooth_texture(rng, tex_size)
    ext = radius * 1.2

    def tex_at(x, y):
        u = np.clip((x / ext * 0.5 + 0.5) * (tex_size - 1), 0,
                    tex_size - 1.001)
        v = np.clip((y / ext * 0.5 + 0.5) * (tex_size - 1), 0,
                    tex_size - 1.001)
        iu, iv = u.astype(np.int64), v.astype(np.int64)
        fu, fv = (u - iu)[..., None], (v - iv)[..., None]
        return (tex[iv, iu] * (1 - fu) * (1 - fv)
                + tex[iv, iu + 1] * fu * (1 - fv)
                + tex[iv + 1, iu] * (1 - fu) * fv
                + tex[iv + 1, iu + 1] * fu * fv)

    cameras, images = [], []
    angles = np.linspace(-np.deg2rad(arc_deg) / 2, np.deg2rad(arc_deg) / 2,
                         n_cams)
    for ci, a in enumerate(angles):
        eye = np.array([cam_dist * np.sin(a), 0.3 * np.sin(2.3 * a),
                        -cam_dist * np.cos(a)])
        R = _lookat(eye, np.zeros(3))
        q = _rot_to_quat(R)

        uu, vv = np.meshgrid(np.arange(imgsize), np.arange(imgsize))
        d_cam = np.stack([(uu - imgsize / 2.0) / f,
                          (vv - imgsize / 2.0) / f,
                          np.ones_like(uu, dtype=np.float64)], axis=-1)
        d = d_cam @ R
        dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
        # |eye + t d|^2 = r^2
        b = np.einsum("ijk,k->ij", dn, eye)
        disc = b * b - (eye @ eye - radius * radius)
        hit = disc > 0
        t = -b - np.sqrt(np.maximum(disc, 0.0))
        hit &= t > 0
        px = eye[0] + t * dn[..., 0]
        py = eye[1] + t * dn[..., 1]
        img = np.clip(tex_at(px, py) + 0.5, 0, 255).astype(np.uint8)
        img[~hit] = 8

        name = f"cam{ci:02d}.png"
        if out_dir is not None:
            from PIL import Image as PILImage
            os.makedirs(out_dir, exist_ok=True)
            name = os.path.join(out_dir, name)
            PILImage.fromarray(img).save(name)
        cameras.append(nvm_io.NvmCamera(filename=name, f=f, rq=q,
                                        c=eye.copy(), r=0.0))
        images.append(img)

    # SfM points on the visible (-z) cap
    rr = radius * 0.75 * np.sqrt(rng.uniform(0, 1, n_points))
    th = rng.uniform(0, 2 * np.pi, n_points)
    pts = np.zeros((n_points, 3))
    pts[:, 0] = rr * np.cos(th)
    pts[:, 1] = rr * np.sin(th)
    pts[:, 2] = -np.sqrt(np.maximum(radius ** 2 - rr ** 2, 0.0))
    pts += rng.normal(0, 0.002, pts.shape)

    rgb = np.zeros((n_points, 3))
    m_img, m_feat, m_xy = [], [], []
    starts = np.zeros(n_points + 1, dtype=np.int64)
    for ii in range(n_points):
        cnt = 0
        for ci, cam in enumerate(cameras):
            R = _quatR(cam.rq)
            pc = R @ (pts[ii] - cam.c)
            if pc[2] <= 0:
                continue
            u = f * pc[0] / pc[2] + imgsize / 2.0
            v = f * pc[1] / pc[2] + imgsize / 2.0
            if 10 <= u < imgsize - 10 and 10 <= v < imgsize - 10:
                m_img.append(ci)
                m_feat.append(ii)
                m_xy.append((u - imgsize / 2.0, v - imgsize / 2.0))
                cnt += 1
        starts[ii + 1] = starts[ii] + cnt
        rgb[ii] = tex_at(np.array([pts[ii, 0]]), np.array([pts[ii, 1]]))[0]

    model = nvm_io.NvmModel(
        cameras=cameras, points_xyz=pts, points_rgb=rgb, meas_start=starts,
        meas_img=np.asarray(m_img, dtype=np.int32),
        meas_feat=np.asarray(m_feat, dtype=np.int32),
        meas_xy=(np.asarray(m_xy, dtype=np.float64).reshape(-1, 2)
                 if m_xy else np.zeros((0, 2))))
    return SphereScene(model=model, images=images, center=np.zeros(3),
                       radius=radius, f=f, imgsize=imgsize)


def _quatR(q):
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def make_occlusion_scene(
    n_cams: int = 7,
    imgsize: int = 256,
    n_points: int = 160,
    extent: float = 1.0,
    cam_dist: float = 3.5,
    arc_deg: float = 50.0,
    seed: int = 0,
    fg_half: float = 0.35,
    fg_z: float = -0.8,
) -> PlaneScene:
    """Background plane z=0 plus a smaller foreground square at z=fg_z
    (closer to the cameras): exercises occlusion -- depth conflicts,
    viewBlockTest and per-view visibility differ across cameras.

    Returned PlaneScene.plane_z refers to the background; ground truth for a
    point (x, y, z): z is fg_z if |x|,|y| <= fg_half else 0.
    """
    rng = np.random.default_rng(seed)
    f = imgsize * 1.2
    tex_size = 1024
    tex_bg = smooth_texture(rng, tex_size)
    tex_fg = smooth_texture(rng, tex_size, cells=16)

    def bg_at(x, y):
        return _tex_bilinear(tex_bg, tex_size, x / extent, y / extent)

    def fg_at(x, y):
        return _tex_bilinear(tex_fg, tex_size, x / fg_half, y / fg_half)

    cameras, images = [], []
    angles = np.linspace(-np.deg2rad(arc_deg) / 2, np.deg2rad(arc_deg) / 2,
                         n_cams)
    for ci, a in enumerate(angles):
        eye = np.array([cam_dist * np.sin(a), 0.3 * np.sin(2.1 * a),
                        -cam_dist * np.cos(a)])
        R = _lookat(eye, np.zeros(3))
        q = _rot_to_quat(R)
        uu, vv = np.meshgrid(np.arange(imgsize), np.arange(imgsize))
        d_cam = np.stack([(uu - imgsize / 2.0) / f,
                          (vv - imgsize / 2.0) / f,
                          np.ones_like(uu, dtype=np.float64)], axis=-1)
        d_world = d_cam @ R
        # foreground plane first (closer): hit if inside the square
        t_fg = (fg_z - eye[2]) / d_world[..., 2]
        fx = eye[0] + t_fg * d_world[..., 0]
        fy = eye[1] + t_fg * d_world[..., 1]
        hit_fg = (np.abs(fx) <= fg_half) & (np.abs(fy) <= fg_half) & (t_fg > 0)
        t_bg = (0.0 - eye[2]) / d_world[..., 2]
        bx = eye[0] + t_bg * d_world[..., 0]
        by = eye[1] + t_bg * d_world[..., 1]
        img = np.clip(bg_at(bx, by) + 0.5, 0, 255).astype(np.uint8)
        outside = (np.abs(bx) > extent) | (np.abs(by) > extent) | (t_bg <= 0)
        img[outside] = 8
        fg_img = np.clip(fg_at(fx, fy) + 0.5, 0, 255).astype(np.uint8)
        img[hit_fg] = fg_img[hit_fg]
        cameras.append(nvm_io.NvmCamera(filename=f"occ{ci:02d}.png", f=f,
                                        rq=q, c=eye.copy(), r=0.0))
        images.append(img)

    # SfM points on both surfaces, measured only where actually visible
    pts = np.zeros((n_points, 3))
    n_fg = n_points // 3
    pts[:n_fg, 0] = rng.uniform(-0.85 * fg_half, 0.85 * fg_half, n_fg)
    pts[:n_fg, 1] = rng.uniform(-0.85 * fg_half, 0.85 * fg_half, n_fg)
    pts[:n_fg, 2] = fg_z
    bgm = n_points - n_fg
    pts[n_fg:, 0] = rng.uniform(-0.8 * extent, 0.8 * extent, bgm)
    pts[n_fg:, 1] = rng.uniform(-0.8 * extent, 0.8 * extent, bgm)
    pts[n_fg:, 2] = 0.0

    def visible(p, cam, R):
        pc = R @ (p - cam.c)
        if pc[2] <= 0:
            return None
        u = f * pc[0] / pc[2] + imgsize / 2.0
        v = f * pc[1] / pc[2] + imgsize / 2.0
        if not (10 <= u < imgsize - 10 and 10 <= v < imgsize - 10):
            return None
        # occlusion: background point hidden if the ray crosses the fg square
        if p[2] > fg_z + 1e-9:
            t = (fg_z - cam.c[2]) / (p[2] - cam.c[2])
            q = cam.c + t * (p - cam.c)
            if abs(q[0]) <= fg_half and abs(q[1]) <= fg_half:
                return None
        return u, v

    rgb = np.zeros((n_points, 3))
    m_img, m_feat, m_xy = [], [], []
    starts = np.zeros(n_points + 1, dtype=np.int64)
    Rs = [_quatR(c.rq) for c in cameras]
    for ii in range(n_points):
        cnt = 0
        for ci, cam in enumerate(cameras):
            uv = visible(pts[ii], cam, Rs[ci])
            if uv is None:
                continue
            m_img.append(ci)
            m_feat.append(ii)
            m_xy.append((uv[0] - imgsize / 2.0, uv[1] - imgsize / 2.0))
            cnt += 1
        starts[ii + 1] = starts[ii] + cnt
        rgb[ii] = 128

    model = nvm_io.NvmModel(
        cameras=cameras, points_xyz=pts, points_rgb=rgb, meas_start=starts,
        meas_img=np.asarray(m_img, dtype=np.int32),
        meas_feat=np.asarray(m_feat, dtype=np.int32),
        meas_xy=(np.asarray(m_xy, dtype=np.float64).reshape(-1, 2)
                 if m_xy else np.zeros((0, 2))))
    scene = PlaneScene(model=model, images=images, plane_z=0.0,
                       extent=extent, f=f, imgsize=imgsize)
    scene.fg_half = fg_half  # type: ignore[attr-defined]
    scene.fg_z = fg_z        # type: ignore[attr-defined]
    return scene


def make_facade_scene(
    n_cams: int = 11,
    imgsize: int = 256,
    n_points: int = 200,
    extent: float = 1.0,
    slope: float = 0.55,
    cam_dist: float = 3.5,
    arc_deg: float = 110.0,
    k1_pattern=(0.25, -0.18, 0.2, -0.12, 0.15),
    seed: int = 0,
    out_dir: Optional[str] = None,
) -> PlaneScene:
    """Strecha-fountain-like scene: a convex building corner (two textured
    faces z = slope*|x| meeting at the ridge x=0, which is the closest line
    to the cameras), observed by a wide arc of 10+ cameras whose images are
    rendered WITH VisualSFM radial distortion (per-camera k1, both signs).

    This is the hardest synthetic config: wide baselines, a self-occluding
    silhouette (the ridge hides part of the far face from oblique views),
    and nonzero k1 end-to-end -- the full pipeline must undistort before
    reconstructing (Image.cpp:68-149 model: undistorted = d*(1+k1*|d|^2) in
    normalized coords, rendered forward here, inverted by
    image/pyramid.undistort_vsfm).

    Ground-truth distance of a point p to the surface:
    |p.z - slope*|p.x|| / sqrt(1+slope^2). Returns PlaneScene with
    plane_z=0.0 (unused); extra attrs slope, k1s.
    """
    rng = np.random.default_rng(seed)
    f = imgsize * 1.2
    tex_size = 1024
    tex_l = smooth_texture(rng, tex_size, cells=20)
    tex_r = smooth_texture(rng, tex_size, cells=20)

    def face_tex(x, y, left):
        t = tex_l if left else tex_r
        return _tex_bilinear(t, tex_size, x / extent, y / extent)

    def ray_hit(eye, d):
        """First intersection with z = slope*|x| (two half-planes).
        Returns (t, px, py, left_mask, hit)."""
        best_t = np.full(d.shape[:-1], np.inf)
        best_left = np.zeros(d.shape[:-1], bool)
        for left in (True, False):
            s = -slope if left else slope
            den = d[..., 2] - s * d[..., 0]
            den = np.where(np.abs(den) < 1e-12, 1e-12, den)
            t = (s * eye[0] - eye[2]) / den
            px = eye[0] + t * d[..., 0]
            py = eye[1] + t * d[..., 1]
            okx = (px <= 0) if left else (px >= 0)
            ok = (t > 0.1) & okx & (np.abs(px) <= extent) \
                & (np.abs(py) <= extent)
            closer = ok & (t < best_t)
            best_t = np.where(closer, t, best_t)
            best_left = np.where(closer, left, best_left)
        hit = np.isfinite(best_t)
        tt = np.where(hit, best_t, 1.0)
        return tt, eye[0] + tt * d[..., 0], eye[1] + tt * d[..., 1], \
            best_left, hit

    cameras, images, k1s = [], [], []
    angles = np.linspace(-np.deg2rad(arc_deg) / 2, np.deg2rad(arc_deg) / 2,
                         n_cams)
    for ci, a in enumerate(angles):
        eye = np.array([cam_dist * np.sin(a), 0.35 * np.sin(2.7 * a),
                        -cam_dist * np.cos(a)])
        R = _lookat(eye, np.array([0.0, 0.0, 0.35]))
        q = _rot_to_quat(R)
        k1 = float(k1_pattern[ci % len(k1_pattern)])
        k1s.append(k1)

        # render the DISTORTED image: distorted pixel d -> undistorted ray
        # direction u = d * (1 + k1 |d|^2) (the model undistort_vsfm inverts)
        uu, vv = np.meshgrid(np.arange(imgsize), np.arange(imgsize))
        xd = (uu - imgsize / 2.0) / f
        yd = (vv - imgsize / 2.0) / f
        fac = 1.0 + k1 * (xd * xd + yd * yd)
        d_cam = np.stack([xd * fac, yd * fac,
                          np.ones_like(xd, dtype=np.float64)], axis=-1)
        d_world = d_cam @ R
        _, px, py, left, hit = ray_hit(eye, d_world)
        img = np.where(left[..., None], face_tex(px, py, True),
                       face_tex(px, py, False))
        img = np.clip(img + 0.5, 0, 255).astype(np.uint8)
        img[~hit] = 8

        name = f"facade{ci:02d}.png"
        if out_dir is not None:
            from PIL import Image as PILImage
            os.makedirs(out_dir, exist_ok=True)
            name = os.path.join(out_dir, name)
            PILImage.fromarray(img).save(name)
        cameras.append(nvm_io.NvmCamera(filename=name, f=f, rq=q,
                                        c=eye.copy(), r=k1))
        images.append(img)

    # SfM points on both faces; visibility honors the self-occluding ridge
    pts = np.zeros((n_points, 3))
    pts[:, 0] = rng.uniform(-0.8 * extent, 0.8 * extent, n_points)
    pts[:, 1] = rng.uniform(-0.8 * extent, 0.8 * extent, n_points)
    pts[:, 2] = slope * np.abs(pts[:, 0])
    pts[:, 2] += rng.normal(0, 0.002, n_points)

    Rs = [_quatR(c.rq) for c in cameras]

    def visible(p, cam, R):
        pc = R @ (p - cam.c)
        if pc[2] <= 0:
            return None
        u = f * pc[0] / pc[2] + imgsize / 2.0
        v = f * pc[1] / pc[2] + imgsize / 2.0
        if not (12 <= u < imgsize - 12 and 12 <= v < imgsize - 12):
            return None
        # occluded if the camera->p ray hits the wedge clearly before p
        d = (p - cam.c)[None, None, :]
        t, _, _, _, hit = ray_hit(cam.c, d)
        if hit[0, 0] and t[0, 0] < 1.0 - 5e-3:
            return None
        return u, v

    rgb = np.zeros((n_points, 3))
    m_img, m_feat, m_xy = [], [], []
    starts = np.zeros(n_points + 1, dtype=np.int64)
    for ii in range(n_points):
        cnt = 0
        for ci, cam in enumerate(cameras):
            uv = visible(pts[ii], cam, Rs[ci])
            if uv is None:
                continue
            m_img.append(ci)
            m_feat.append(ii)
            m_xy.append((uv[0] - imgsize / 2.0, uv[1] - imgsize / 2.0))
            cnt += 1
        starts[ii + 1] = starts[ii] + cnt
        rgb[ii] = 128

    model = nvm_io.NvmModel(
        cameras=cameras, points_xyz=pts, points_rgb=rgb, meas_start=starts,
        meas_img=np.asarray(m_img, dtype=np.int32),
        meas_feat=np.asarray(m_feat, dtype=np.int32),
        meas_xy=(np.asarray(m_xy, dtype=np.float64).reshape(-1, 2)
                 if m_xy else np.zeros((0, 2))))
    scene = PlaneScene(model=model, images=images, plane_z=0.0,
                       extent=extent, f=f, imgsize=imgsize)
    scene.slope = slope       # type: ignore[attr-defined]
    scene.k1s = k1s           # type: ignore[attr-defined]
    return scene


def facade_surface_dist(pts: np.ndarray, slope: float) -> np.ndarray:
    """Distance of points to the z = slope*|x| wedge surface."""
    return (np.abs(pts[:, 2] - slope * np.abs(pts[:, 0]))
            / np.sqrt(1.0 + slope * slope))


def _tex_bilinear(tex, tex_size, u, v):
    """Sample a texture grid with normalized coords in [-1, 1]."""
    uu = np.clip((np.asarray(u) * 0.5 + 0.5) * (tex_size - 1), 0,
                 tex_size - 1.001)
    vv = np.clip((np.asarray(v) * 0.5 + 0.5) * (tex_size - 1), 0,
                 tex_size - 1.001)
    iu, iv = uu.astype(np.int64), vv.astype(np.int64)
    fu, fv = (uu - iu)[..., None], (vv - iv)[..., None]
    return (tex[iv, iu] * (1 - fu) * (1 - fv) + tex[iv, iu + 1] * fu * (1 - fv)
            + tex[iv + 1, iu] * (1 - fu) * fv
            + tex[iv + 1, iu + 1] * fu * fv)


def scene_image_pack(scene: PlaneScene, n_levels: int):
    """Build the packed pyramid directly from in-memory rendered images."""
    from hpmvs_tpu.image import pyramid as pyr
    pyramids = [pyr.build_pyramid(img, n_levels) for img in scene.images]
    return pyr.pack_pyramids(pyramids)


def make_ring_plane_scene(
    n_cams: int = 150,
    imgsize: int = 128,
    n_points: int = 600,
    extent: float = 8.0,
    cam_height: float = 3.5,
    seed: int = 0,
    roll: bool = True,
) -> PlaneScene:
    """Large-outdoor-shaped capture (BASELINE.json config 4): a big textured
    ground plane observed by cameras on an outer ring plus an inner grid,
    each looking almost straight down at its own neighborhood. Frusta are
    spatially distributed -- a camera's footprint (~2*h*0.5*imgsize/f) is a
    tiny fraction of the scene extent -- so per-block image subsets
    genuinely exclude faraway cameras, unlike the compact arc scenes where
    every camera sees everything."""
    rng = np.random.default_rng(seed)
    f = imgsize * 1.2
    # BROADBAND texture (multiple octaves), like natural ground imagery:
    # the reconstruction works across patch scales from the coarse seed
    # footprint down to the finest branch level, and every scale needs
    # structure that is (a) present INSIDE a 7x7 NCC window at that
    # scale (feature wavelength <= the patch footprint, else the window
    # sees a featureless gradient) and (b) above the Nyquist rate of the
    # rendered views (wavelength >= 2 pixels at the working image level,
    # else cross-view aliasing decorrelates the NCC). Both bounds are
    # ABSOLUTE world sizes -- the ground sample distance is set by camera
    # height/f, not by the scene extent -- so the octave cell counts must
    # scale with the extent. Measured failure modes: one octave at 0.105
    # world = gradient inside fine patches (11% extend acceptance), one
    # octave at 0.016 world = aliased at level 1 (<1% acceptance);
    # isolated patches then die to the flatness-removal gate either way.
    tex_size = 2048
    gsd = cam_height / f                 # level-0 ground sample distance
    feat = (14.0 * gsd, 5.0 * gsd, 2.3 * gsd)   # world wavelengths
    tex = sum(w * smooth_texture(rng, tex_size,
                                 cells=max(int(2 * extent / fz), 8))
              for w, fz in zip((0.4, 0.33, 0.27), feat))

    def tex_at(x, y):
        return _tex_bilinear(tex, tex_size, x / extent, y / extent)

    # camera ground positions: 2/3 on a ring, 1/3 on an inner grid
    n_ring = (2 * n_cams) // 3
    n_grid = n_cams - n_ring
    gpos = []
    for i in range(n_ring):
        a = 2.0 * np.pi * i / n_ring
        r = 0.72 * extent
        gpos.append((r * np.cos(a), r * np.sin(a)))
    g = max(int(np.ceil(np.sqrt(n_grid))), 1)
    for i in range(n_grid):
        gx = (i % g + 0.5) / g * 2 - 1
        gy = (i // g + 0.5) / g * 2 - 1
        gpos.append((gx * 0.55 * extent, gy * 0.55 * extent))

    cameras, images = [], []
    for ci, (gx, gy) in enumerate(gpos):
        eye = np.array([gx, gy, -cam_height])
        # look at a slightly offset ground point (adds parallax baselines)
        tgt = np.array([gx + 0.35 * np.cos(ci), gy + 0.35 * np.sin(ci), 0.0])
        up = (np.cos(ci * 0.7), np.sin(ci * 0.7), 0.0) if roll \
            else (1.0, 0.0, 0.0)
        R = _lookat(eye, tgt, up=up)
        q = _rot_to_quat(R)
        uu, vv = np.meshgrid(np.arange(imgsize), np.arange(imgsize))
        d_cam = np.stack([(uu - imgsize / 2.0) / f,
                          (vv - imgsize / 2.0) / f,
                          np.ones_like(uu, dtype=np.float64)], axis=-1)
        d_world = d_cam @ R
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (0.0 - eye[2]) / d_world[..., 2]
        px = eye[0] + t * d_world[..., 0]
        py = eye[1] + t * d_world[..., 1]
        img = np.clip(tex_at(px, py) + 0.5, 0, 255).astype(np.uint8)
        bad = (np.abs(px) > extent) | (np.abs(py) > extent) | (t <= 0) \
            | ~np.isfinite(t)
        img[bad] = 8
        cameras.append(nvm_io.NvmCamera(filename=f"ring{ci:03d}.png", f=f,
                                        rq=q, c=eye.copy(), r=0.0))
        images.append(img)

    # SfM points near the camera ground tracks (where coverage exists)
    pts = np.zeros((n_points, 3))
    base = rng.integers(0, n_cams, n_points)
    for ii in range(n_points):
        gx, gy = gpos[base[ii]]
        pts[ii, 0] = np.clip(gx + rng.normal(0, 0.5), -extent, extent)
        pts[ii, 1] = np.clip(gy + rng.normal(0, 0.5), -extent, extent)
    pts[:, 2] = rng.normal(0, 0.002, n_points)

    rgb = np.full((n_points, 3), 128.0)
    m_img, m_feat, m_xy = [], [], []
    starts = np.zeros(n_points + 1, dtype=np.int64)
    Rs = [_quatR(c.rq) for c in cameras]
    for ii in range(n_points):
        cnt = 0
        for ci, cam in enumerate(cameras):
            pc = Rs[ci] @ (pts[ii] - cam.c)
            if pc[2] <= 0:
                continue
            u = f * pc[0] / pc[2] + imgsize / 2.0
            v = f * pc[1] / pc[2] + imgsize / 2.0
            if 6 <= u < imgsize - 6 and 6 <= v < imgsize - 6:
                m_img.append(ci)
                m_feat.append(ii)
                m_xy.append((u - imgsize / 2.0, v - imgsize / 2.0))
                cnt += 1
        starts[ii + 1] = starts[ii] + cnt

    model = nvm_io.NvmModel(
        cameras=cameras, points_xyz=pts, points_rgb=rgb, meas_start=starts,
        meas_img=np.asarray(m_img, dtype=np.int32),
        meas_feat=np.asarray(m_feat, dtype=np.int32),
        meas_xy=(np.asarray(m_xy, dtype=np.float64).reshape(-1, 2)
                 if m_xy else np.zeros((0, 2))))
    return PlaneScene(model=model, images=images, plane_z=0.0,
                      extent=extent, f=f, imgsize=imgsize)
