"""Distributed sparse bundle adjustment via Schur-complement reduction.

New capability beyond the reference (BASELINE.json north star: "distributed
sparse bundle-adjustment refinement of cameras+patches runs via
Schur-complement reduction over the same collectives"); hpmvs itself has no
BA. Standard structure:

  - residuals: reprojection of every (point, camera) measurement,
    r = project(R0 exp([w]x) X + t) - uv, camera parameterized by a local
    so(3) twist + translation delta, points by their 3D position.
  - Gauss-Newton with point-block elimination: H_pp is 3x3 block-diagonal,
    so points are eliminated in closed form; the reduced camera system
    S = H_cc - H_cp H_pp^-1 H_pc is assembled from per-shard partial sums.
  - distribution: measurements are sharded BY POINT over the ('dp','sp')
    mesh, every per-camera block accumulation is a psum, and the reduced
    system is solved by (preconditioned) conjugate gradients whose matvec
    is itself a psum -- the collectives ride ICI exactly like the depth
    all-reduce of the wavefront engine.

All Jacobians come from jax.jacfwd of the per-measurement residual (8 params
-> 2 residuals), fully batched.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


class BAProblem(NamedTuple):
    """Measurement table in point-sorted order (host-built)."""
    cam_K: jnp.ndarray      # (C, 3, 3) intrinsics (fixed)
    cam_R0: jnp.ndarray     # (C, 3, 3) initial rotations (world->cam)
    cam_t0: jnp.ndarray     # (C, 3) initial translations
    pts0: jnp.ndarray       # (Pn, 3) initial points
    m_cam: jnp.ndarray      # (M,) int32 camera index per measurement
    m_pt: jnp.ndarray       # (M,) int32 point index per measurement
    m_uv: jnp.ndarray       # (M, 2) observed pixel coordinates
    m_w: jnp.ndarray        # (M,) weight (0 pads)


def _skew(w):
    return jnp.array([[0.0, -w[2], w[1]],
                      [w[2], 0.0, -w[0]],
                      [-w[1], w[0], 0.0]])


def _exp_so3(w):
    """Rodrigues with Taylor-safe coefficients: differentiable at w = 0
    (a plain norm() NaNs the forward-mode Jacobian there)."""
    th2 = jnp.dot(w, w)
    th = jnp.sqrt(th2 + 1e-24)
    small = th2 < 1e-8
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2)
    K = _skew(w)
    return jnp.eye(3) + A * K + B * (K @ K)


def _residual(cam_param, pt, K, R0, t0, uv):
    """cam_param = (w(3), dt(3)); returns (2,) reprojection residual."""
    R = R0 @ _exp_so3(cam_param[:3])
    t = t0 + cam_param[3:6]
    xc = R @ pt + t
    z = jnp.maximum(xc[2], 1e-6)
    uvp = (K @ (xc / z))[:2]
    return uvp - uv


def build_problem(model, max_points: int = 0) -> BAProblem:
    """Host-side assembly from a parsed NVM model (measurements sorted by
    point already, NVM stores them per point)."""
    ncam = len(model.cameras)
    K = np.zeros((ncam, 3, 3))
    R0 = np.zeros((ncam, 3, 3))
    t0 = np.zeros((ncam, 3))
    from hpmvs_tpu.testing import _quatR
    for ci, cam in enumerate(model.cameras):
        # principal point convention: image center; uv in NVM is relative to
        # the center (VisualSFM convention), so cx=cy=0 here
        K[ci] = np.array([[cam.f, 0, 0], [0, cam.f, 0], [0, 0, 1]])
        R0[ci] = _quatR(cam.rq)
        t0[ci] = -R0[ci] @ cam.c

    npts = model.n_points if max_points <= 0 else min(model.n_points,
                                                      max_points)
    m_cam, m_pt, m_uv = [], [], []
    for ii in range(npts):
        s, e = model.meas_start[ii], model.meas_start[ii + 1]
        for mi in range(s, e):
            m_cam.append(int(model.meas_img[mi]))
            m_pt.append(ii)
            m_uv.append(model.meas_xy[mi])
    return BAProblem(
        cam_K=jnp.asarray(K, jnp.float32),
        cam_R0=jnp.asarray(R0, jnp.float32),
        cam_t0=jnp.asarray(t0, jnp.float32),
        pts0=jnp.asarray(model.points_xyz[:npts], jnp.float32),
        m_cam=jnp.asarray(m_cam, jnp.int32),
        m_pt=jnp.asarray(m_pt, jnp.int32),
        m_uv=jnp.asarray(np.asarray(m_uv, np.float64), jnp.float32),
        m_w=jnp.ones((len(m_cam),), jnp.float32))


@functools.partial(jax.jit, static_argnames=("n_cams", "n_pts", "iters",
                                             "cg_iters", "fix_count"))
def ba_solve(prob: BAProblem, n_cams: int, n_pts: int, iters: int = 5,
             cg_iters: int = 30, damping: float = 1e-3,
             fix_count: int = 1):
    """Gauss-Newton BA with point elimination; single-device version.

    Returns (cam_params (C,6), points (Pn,3), rms_history (iters+1,))."""

    res_fn = jax.vmap(_residual, in_axes=(0, 0, 0, 0, 0, 0))
    jac_c = jax.vmap(jax.jacfwd(_residual, argnums=0),
                     in_axes=(0, 0, 0, 0, 0, 0))
    jac_p = jax.vmap(jax.jacfwd(_residual, argnums=1),
                     in_axes=(0, 0, 0, 0, 0, 0))

    def rms(r, w):
        return jnp.sqrt(jnp.sum(w * jnp.sum(r * r, -1))
                        / jnp.maximum(jnp.sum(w), 1.0))

    def gn_step(state, _):
        cam, pts, lam = state
        cc = prob.m_cam
        pp = prob.m_pt
        args = (cam[cc], pts[pp], prob.cam_K[cc], prob.cam_R0[cc],
                prob.cam_t0[cc], prob.m_uv)
        r = res_fn(*args)                               # (M, 2)
        Jc = jac_c(*args)                               # (M, 2, 6)
        Jp = jac_p(*args)                               # (M, 2, 3)
        w = prob.m_w[:, None, None]

        # block accumulations (segment sums over cameras / points)
        Hcc = jax.ops.segment_sum(
            w * jnp.einsum("mia,mib->mab", Jc, Jc), cc, n_cams)  # (C,6,6)
        bc = jax.ops.segment_sum(
            prob.m_w[:, None] * jnp.einsum("mia,mi->ma", Jc, r), cc, n_cams)
        Hpp = jax.ops.segment_sum(
            w * jnp.einsum("mia,mib->mab", Jp, Jp), pp, n_pts)   # (P,3,3)
        bp = jax.ops.segment_sum(
            prob.m_w[:, None] * jnp.einsum("mia,mi->ma", Jp, r), pp, n_pts)

        Hpp = Hpp + lam * jnp.eye(3)
        Hpp_inv = jnp.linalg.inv(Hpp)                   # (P,3,3)

        # Schur RHS: b_s = bc - Hcp Hpp^-1 bp  (assembled per measurement)
        y = jnp.einsum("pab,pb->pa", Hpp_inv, bp)       # (P,3)
        Hcp_y = jax.ops.segment_sum(
            prob.m_w[:, None] * jnp.einsum("mia,mib,mb->ma", Jc, Jp, y[pp]),
            cc, n_cams)
        b_s = bc - Hcp_y

        # gauge fix: freeze the first fix_count cameras. ONE camera pins
        # 6 DoF but leaves the global-scale gauge free (reprojection-only
        # BA); solutions then drift along a scale-about-camera-0 direction.
        # TWO anchors pin the full 7-DoF similarity gauge.
        mask_c = jnp.ones((n_cams, 1))
        if fix_count > 0:
            mask_c = mask_c.at[:fix_count].set(0.0)

        def s_matvec(xc):
            """S @ xc without materializing S: per-measurement assembly."""
            xc = xc.reshape(n_cams, 6) * mask_c
            t1 = jnp.einsum("cab,cb->ca", Hcc, xc) \
                + lam * xc                              # (C,6)
            # Hpc xc accumulated per point
            z = jax.ops.segment_sum(
                prob.m_w[:, None] * jnp.einsum("mia,mib,mb->ma", Jp, Jc,
                                               xc[cc]), pp, n_pts)
            z = jnp.einsum("pab,pb->pa", Hpp_inv, z)
            t2 = jax.ops.segment_sum(
                prob.m_w[:, None] * jnp.einsum("mia,mib,mb->ma", Jc, Jp,
                                               z[pp]), cc, n_cams)
            return ((t1 - t2) * mask_c).reshape(-1)

        # Jacobi-preconditioned CG on the reduced camera system
        b_vec = (b_s * mask_c).reshape(-1)
        diag = jnp.maximum(jax.vmap(jnp.diag)(Hcc).reshape(-1) + lam, 1e-8)

        def cg_body(_, cgs):
            x, rr, p, rz = cgs
            Ap = s_matvec(p)
            alpha = rz / jnp.maximum(p @ Ap, 1e-20)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = rr / diag
            rz_new = rr @ z
            beta = rz_new / jnp.maximum(rz, 1e-20)
            p = z + beta * p
            return x, rr, p, rz_new

        x0 = jnp.zeros_like(b_vec)
        z0 = b_vec / diag
        x, _, _, _ = jax.lax.fori_loop(
            0, cg_iters, cg_body, (x0, b_vec, z0, b_vec @ z0))
        dc = -x.reshape(n_cams, 6) * mask_c

        # back-substitute points: dp = -Hpp^-1 (bp + Hpc dc)
        z = jax.ops.segment_sum(
            prob.m_w[:, None] * jnp.einsum("mia,mib,mb->ma", Jp, Jc, dc[cc]),
            pp, n_pts)
        dp = -jnp.einsum("pab,pb->pa", Hpp_inv, bp + z)

        new_cam = cam + dc
        new_pts = pts + dp
        # Levenberg adaptation: accept + relax on improvement, reject +
        # stiffen otherwise (a fixed damping stalls when the first full GN
        # step overshoots on large dense-cloud problems)
        r_new = res_fn(new_cam[cc], new_pts[pp], prob.cam_K[cc],
                       prob.cam_R0[cc], prob.cam_t0[cc], prob.m_uv)
        better = rms(r_new, prob.m_w) < rms(r, prob.m_w)
        cam = jnp.where(better, new_cam, cam)
        pts = jnp.where(better, new_pts, pts)
        lam = jnp.where(better, jnp.maximum(lam / 3.0, 1e-6), lam * 10.0)
        return (cam, pts, lam), rms(r, prob.m_w)

    cam0 = jnp.zeros((n_cams, 6), jnp.float32)
    (cam, pts, _), hist = jax.lax.scan(
        gn_step, (cam0, prob.pts0, jnp.float32(damping)), None,
        length=iters)
    cc = prob.m_cam
    r_fin = res_fn(cam[cc], pts[prob.m_pt], prob.cam_K[cc], prob.cam_R0[cc],
                   prob.cam_t0[cc], prob.m_uv)
    hist = jnp.concatenate([hist, rms(r_fin, prob.m_w)[None]])
    return cam, pts, hist


def ba_solve_sharded(mesh: Mesh, prob: BAProblem, n_cams: int, n_pts: int,
                     iters: int = 5, cg_iters: int = 30,
                     damping: float = 1e-3, fix_count: int = 1):
    """Distributed BA: measurements sharded by point over the mesh; every
    per-camera accumulation and every CG matvec psums across shards.

    The measurement table must be padded so that (a) M divides the mesh size
    and (b) no point's measurements straddle a shard boundary (pad with
    m_w = 0 rows); use shard_problem()."""
    n_shards = mesh.devices.size

    def body(m_cam, m_pt, m_uv, m_w):
        local = prob._replace(m_cam=m_cam, m_pt=m_pt, m_uv=m_uv, m_w=m_w)

        # replicate the single-device algebra but psum every global reduce
        res_fn = jax.vmap(_residual, in_axes=(0, 0, 0, 0, 0, 0))
        jac_c = jax.vmap(jax.jacfwd(_residual, argnums=0),
                         in_axes=(0, 0, 0, 0, 0, 0))
        jac_p = jax.vmap(jax.jacfwd(_residual, argnums=1),
                         in_axes=(0, 0, 0, 0, 0, 0))

        def psum(x):
            return jax.lax.psum(x, ("dp", "sp"))

        def gn_step(state, _):
            cam, pts, lam = state
            cc, pp = local.m_cam, local.m_pt
            args = (cam[cc], pts[pp], prob.cam_K[cc], prob.cam_R0[cc],
                    prob.cam_t0[cc], local.m_uv)
            r = res_fn(*args)
            Jc = jac_c(*args)
            Jp = jac_p(*args)
            w3 = local.m_w[:, None, None]
            w2 = local.m_w[:, None]

            Hcc = psum(jax.ops.segment_sum(
                w3 * jnp.einsum("mia,mib->mab", Jc, Jc), cc, n_cams))
            bc = psum(jax.ops.segment_sum(
                w2 * jnp.einsum("mia,mi->ma", Jc, r), cc, n_cams))
            # point blocks live entirely on one shard (sharded by point):
            # no psum needed for Hpp/bp, but indices are global
            Hpp = jax.ops.segment_sum(
                w3 * jnp.einsum("mia,mib->mab", Jp, Jp), pp, n_pts)
            bp = jax.ops.segment_sum(
                w2 * jnp.einsum("mia,mi->ma", Jp, r), pp, n_pts)
            Hpp_local = Hpp + lam * jnp.eye(3) \
                * (jnp.abs(Hpp).sum((1, 2), keepdims=True) > 0)
            # gather the full point-block table (points partitioned by shard)
            Hpp_all = psum(Hpp)
            bp_all = psum(bp)
            Hpp_inv = jnp.linalg.inv(Hpp_all + lam * jnp.eye(3))
            del Hpp_local

            y = jnp.einsum("pab,pb->pa", Hpp_inv, bp_all)
            b_s = bc - psum(jax.ops.segment_sum(
                w2 * jnp.einsum("mia,mib,mb->ma", Jc, Jp, y[pp]), cc, n_cams))

            mask_c = jnp.ones((n_cams, 1)).at[:fix_count].set(0.0)

            def s_matvec(xc):
                xc = xc.reshape(n_cams, 6) * mask_c
                t1 = jnp.einsum("cab,cb->ca", Hcc, xc) + lam * xc
                z = jax.ops.segment_sum(
                    w2 * jnp.einsum("mia,mib,mb->ma", Jp, Jc, xc[cc]),
                    pp, n_pts)
                z = jnp.einsum("pab,pb->pa", Hpp_inv, psum(z))
                t2 = psum(jax.ops.segment_sum(
                    w2 * jnp.einsum("mia,mib,mb->ma", Jc, Jp, z[pp]),
                    cc, n_cams))
                return ((t1 - t2) * mask_c).reshape(-1)

            b_vec = (b_s * mask_c).reshape(-1)
            diag = jnp.maximum(jax.vmap(jnp.diag)(Hcc).reshape(-1) + lam,
                               1e-8)

            def cg_body(_, cgs):
                x, rr, p, rz = cgs
                Ap = s_matvec(p)
                alpha = rz / jnp.maximum(p @ Ap, 1e-20)
                x = x + alpha * p
                rr = rr - alpha * Ap
                zz = rr / diag
                rz_new = rr @ zz
                beta = rz_new / jnp.maximum(rz, 1e-20)
                p = zz + beta * p
                return x, rr, p, rz_new

            x0 = jnp.zeros_like(b_vec)
            z0 = b_vec / diag
            x, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body,
                                           (x0, b_vec, z0, b_vec @ z0))
            dc = -x.reshape(n_cams, 6) * mask_c

            z = psum(jax.ops.segment_sum(
                w2 * jnp.einsum("mia,mib,mb->ma", Jp, Jc, dc[cc]), pp, n_pts))
            dp = -jnp.einsum("pab,pb->pa", Hpp_inv, bp_all + z)

            def prms(rr, ww):
                sq = psum(jnp.sum(ww * jnp.sum(rr * rr, -1)))
                nw = psum(jnp.sum(ww))
                return jnp.sqrt(sq / jnp.maximum(nw, 1.0))

            new_cam, new_pts = cam + dc, pts + dp
            r_new = res_fn(new_cam[cc], new_pts[pp], prob.cam_K[cc],
                           prob.cam_R0[cc], prob.cam_t0[cc], local.m_uv)
            better = prms(r_new, local.m_w) < prms(r, local.m_w)
            cam = jnp.where(better, new_cam, cam)
            pts = jnp.where(better, new_pts, pts)
            lam = jnp.where(better, jnp.maximum(lam / 3.0, 1e-6), lam * 10.0)
            return (cam, pts, lam), prms(r, local.m_w)

        cam0 = jnp.zeros((n_cams, 6), jnp.float32)
        (cam, pts, _), hist = jax.lax.scan(
            gn_step, (cam0, prob.pts0, jnp.float32(damping)), None,
            length=iters)
        return cam, pts, hist

    spec = P(("dp", "sp"))
    fn = shard_map(body, mesh=mesh,
                   in_specs=(spec, spec, spec, spec),
                   out_specs=(P(), P(), P()),
                   check_vma=False)
    return jax.jit(fn)(prob.m_cam, prob.m_pt, prob.m_uv, prob.m_w)


def shard_problem(prob: BAProblem, n_shards: int) -> BAProblem:
    """Pad + reorder the measurement table so points don't straddle shards."""
    m_pt = np.asarray(prob.m_pt)
    m_cam = np.asarray(prob.m_cam)
    m_uv = np.asarray(prob.m_uv)
    m_w = np.asarray(prob.m_w)
    order = np.argsort(m_pt, kind="stable")
    m_pt, m_cam, m_uv, m_w = (m_pt[order], m_cam[order], m_uv[order],
                              m_w[order])
    M = len(m_pt)
    per = -(-M // n_shards)
    # greedy: walk points, close a shard when it would overflow `per`
    rows = [[] for _ in range(n_shards)]
    shard = 0
    i = 0
    while i < M:
        j = i
        while j < M and m_pt[j] == m_pt[i]:
            j += 1
        if len(rows[shard]) + (j - i) > per and shard + 1 < n_shards:
            shard += 1
        rows[shard].extend(range(i, j))
        i = j
    width = max(per, max(len(r) for r in rows))
    out_cam = np.zeros((n_shards, width), np.int32)
    out_pt = np.zeros((n_shards, width), np.int32)
    out_uv = np.zeros((n_shards, width, 2), np.float32)
    out_w = np.zeros((n_shards, width), np.float32)
    for s, r in enumerate(rows):
        out_cam[s, :len(r)] = m_cam[r]
        out_pt[s, :len(r)] = m_pt[r]
        out_uv[s, :len(r)] = m_uv[r]
        out_w[s, :len(r)] = m_w[r]
    return prob._replace(m_cam=jnp.asarray(out_cam.reshape(-1)),
                         m_pt=jnp.asarray(out_pt.reshape(-1)),
                         m_uv=jnp.asarray(out_uv.reshape(-1, 2)),
                         m_w=jnp.asarray(out_w.reshape(-1)))


def build_dense_problem(model, centers: np.ndarray,
                        views: np.ndarray) -> BAProblem:
    """BAProblem over DENSIFIED PATCHES: point i = patch center i, with one
    measurement per entry of its view list, uv = the patch's reprojection
    under the given cameras (its creation-time observation).

    This is the cameras+PATCHES bundle adjustment of the north star
    (BASELINE.json; no reference referent): the dense cloud acts as a large
    tie-point set. When cameras drift after densification (streaming SfM
    updates, perturbation), re-solving against these stored observations
    recovers the cameras and re-consistencies the patch centers -- the
    Schur point-block elimination scales to 10^5+ patches because H_pp
    stays 3x3 block-diagonal exactly as for sparse points."""
    from hpmvs_tpu.testing import _quatR
    ncam = len(model.cameras)
    K = np.zeros((ncam, 3, 3))
    R0 = np.zeros((ncam, 3, 3))
    t0 = np.zeros((ncam, 3))
    f = np.zeros(ncam)
    for ci, cam in enumerate(model.cameras):
        K[ci] = np.array([[cam.f, 0, 0], [0, cam.f, 0], [0, 0, 1]])
        R0[ci] = _quatR(cam.rq)
        t0[ci] = -R0[ci] @ cam.c
        f[ci] = cam.f

    views = np.asarray(views)
    centers = np.asarray(centers, np.float64)
    pt_idx, k_idx = np.nonzero(views >= 0)
    cam_idx = views[pt_idx, k_idx].astype(np.int64)
    # uv (principal-point-relative, the NVM/VisualSFM convention the
    # residual's cx=cy=0 intrinsics expect)
    xc = np.einsum("mij,mj->mi", R0[cam_idx], centers[pt_idx]) + t0[cam_idx]
    z = np.maximum(xc[:, 2], 1e-6)
    uv = f[cam_idx, None] * xc[:, :2] / z[:, None]
    keep = xc[:, 2] > 1e-6
    return BAProblem(
        cam_K=jnp.asarray(K, jnp.float32),
        cam_R0=jnp.asarray(R0, jnp.float32),
        cam_t0=jnp.asarray(t0, jnp.float32),
        pts0=jnp.asarray(centers, jnp.float32),
        m_cam=jnp.asarray(cam_idx[keep], jnp.int32),
        m_pt=jnp.asarray(pt_idx[keep], jnp.int32),
        m_uv=jnp.asarray(uv[keep], jnp.float32),
        m_w=jnp.ones((int(keep.sum()),), jnp.float32))


def _cam_tables(model):
    """(R0 (C,3,3), t0 (C,3), f (C,)) world->cam tables from an NVM model."""
    from hpmvs_tpu.testing import _quatR
    ncam = len(model.cameras)
    R0 = np.zeros((ncam, 3, 3))
    t0 = np.zeros((ncam, 3))
    f = np.zeros(ncam)
    for ci, cam in enumerate(model.cameras):
        R0[ci] = _quatR(cam.rq)
        t0[ci] = -R0[ci] @ cam.c
        f[ci] = cam.f
    return R0, t0, f


def stamp_obs(model, centers: np.ndarray, views: np.ndarray) -> np.ndarray:
    """(N, K, 2) uv reprojections of each patch center into its view
    cameras under `model` -- the creation-time observation record for
    periodic dense BA. Invalid/behind-camera slots are NaN."""
    R0, t0, f = _cam_tables(model)
    centers = np.asarray(centers, np.float64)
    views = np.asarray(views)
    N, K = views.shape
    uv = np.full((N, K, 2), np.nan, np.float32)
    pt_idx, k_idx = np.nonzero(views >= 0)
    ci = views[pt_idx, k_idx].astype(np.int64)
    xc = np.einsum("mij,mj->mi", R0[ci], centers[pt_idx]) + t0[ci]
    ok = xc[:, 2] > 1e-6
    z = np.maximum(xc[:, 2], 1e-6)
    vals = (f[ci, None] * xc[:, :2] / z[:, None]).astype(np.float32)
    vals[~ok] = np.nan
    uv[pt_idx, k_idx] = vals
    return uv


class DenseObsStore:
    """Per-patch creation-time observations for periodic dense BA
    (--ba_dense_every): each alive patch's uv reprojections are stamped
    ONCE, under the cameras current when the patch is first seen by a
    periodic pass. Later passes then solve cameras+centers against these
    earlier measurements, so camera drift accumulated since (streaming SfM
    updates, perturbations) is genuinely constrained -- a problem built
    fresh from the current state would be self-consistent and the solve a
    no-op. pids are append-only (PatchStore.alloc never reuses slots), so
    stamps stay valid for a patch's lifetime."""

    def __init__(self, max_views: int):
        self.K = max_views
        self.uv = np.full((0, max_views, 2), np.nan, np.float32)
        self.stamped = np.zeros((0,), bool)

    def _ensure(self, n: int):
        if len(self.stamped) >= n:
            return
        cap = max(1024, len(self.stamped))
        while cap < n:
            cap *= 2
        uv = np.full((cap, self.K, 2), np.nan, np.float32)
        uv[:len(self.uv)] = self.uv
        st = np.zeros((cap,), bool)
        st[:len(self.stamped)] = self.stamped
        self.uv, self.stamped = uv, st


def build_dense_problem_obs(model, centers: np.ndarray, views: np.ndarray,
                            uv: np.ndarray) -> BAProblem:
    """BAProblem whose measurements are the STORED observations `uv`
    ((N, K, 2), NaN = invalid) instead of reprojections under the current
    cameras (cf. build_dense_problem)."""
    from hpmvs_tpu.testing import _quatR
    ncam = len(model.cameras)
    K = np.zeros((ncam, 3, 3))
    R0, t0, f = _cam_tables(model)
    for ci in range(ncam):
        K[ci] = np.diag([f[ci], f[ci], 1.0])
    views = np.asarray(views)
    centers = np.asarray(centers, np.float64)
    pt_idx, k_idx = np.nonzero(views >= 0)
    cam_idx = views[pt_idx, k_idx].astype(np.int64)
    muv = uv[pt_idx, k_idx]
    keep = np.isfinite(muv).all(1)
    return BAProblem(
        cam_K=jnp.asarray(K, jnp.float32),
        cam_R0=jnp.asarray(R0, jnp.float32),
        cam_t0=jnp.asarray(t0, jnp.float32),
        pts0=jnp.asarray(centers, jnp.float32),
        m_cam=jnp.asarray(cam_idx[keep], jnp.int32),
        m_pt=jnp.asarray(pt_idx[keep], jnp.int32),
        m_uv=jnp.asarray(muv[keep], jnp.float32),
        m_w=jnp.ones((int(keep.sum()),), jnp.float32))


def periodic_dense_ba(engine, obs: DenseObsStore, iters: int = 6,
                      cg_iters: int = 40):
    """One --ba_dense_every pass: stamp observations for patches created
    since the last pass, then re-solve cameras+patches against ALL stamped
    observations and fold the result back (apply_dense_ba plumbing).

    Owned multi-host engines take the consistency-solve path (problem
    built from the globally gathered current state): per-process stamp
    stores would need gather-order bookkeeping; the owned dense-BA
    mechanics themselves are exercised with an explicit drift problem in
    tests/multihost_worker.py."""
    if hasattr(engine, "n_alive_local"):
        return apply_dense_ba(engine, iters=iters, cg_iters=cg_iters)
    p = engine.patches
    pids = np.nonzero(p.alive[:p.n])[0]
    if len(pids) < 16:
        return None
    obs._ensure(p.n)
    new = pids[~obs.stamped[pids]]
    if len(new):
        obs.uv[new] = stamp_obs(engine.model, p.center[new], p.views[new])
        obs.stamped[new] = True
    prob = build_dense_problem_obs(engine.model, p.center[pids],
                                   p.views[pids], obs.uv[pids])
    return apply_dense_ba(engine, iters=iters, cg_iters=cg_iters,
                          problem=prob)


def apply_cameras_to_model(model, cam_params: np.ndarray):
    """Write refined camera parameters back into a (copied) NVM model,
    leaving the sparse points untouched."""
    import copy
    from hpmvs_tpu.testing import _quatR, _rot_to_quat
    out = copy.deepcopy(model)
    cam_params = np.asarray(cam_params, np.float64)
    for ci, cam in enumerate(out.cameras):
        R0 = _quatR(cam.rq)
        t0 = -R0 @ cam.c
        w = cam_params[ci, :3]
        th = np.linalg.norm(w) + 1e-12
        Km = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                       [-w[1], w[0], 0]]) / th
        R = R0 @ (np.eye(3) + np.sin(th) * Km + (1 - np.cos(th)) * (Km @ Km))
        t = t0 + cam_params[ci, 3:6]
        cam.rq = _rot_to_quat(R)
        cam.c = -R.T @ t
    return out


def apply_dense_ba(engine, iters: int = 8, cg_iters: int = 40,
                   problem: BAProblem = None, fix_count: int = 2):
    """Run cameras+patches BA on a densified engine and fold the result
    back in: camera SoA rebuilt, patch centers updated, depth z-buffers
    replayed from scratch (one _set_depths pass over the live patches).

    problem: pass a pre-built BAProblem whose observations were recorded
    under earlier cameras (drift correction); default builds one from the
    CURRENT state (then the solve is a consistency no-op unless cameras
    have been perturbed since densification).

    Sharding: with engine.mesh, the measurement table shards by patch over
    the mesh and every reduction is a psum (ba_solve_sharded)."""
    import jax
    p = engine.patches
    pids = np.nonzero(p.alive[:p.n])[0]
    owned = hasattr(engine, "n_alive_local")   # per-process store
    if owned:
        # solve the GLOBAL problem identically on every process (patch
        # gather via the engine's padded allgather), fold back the local
        # segment; the solve itself shards by patch over the global mesh
        centers, _, _, _, views, _ = engine.alive_arrays()
        local_n = len(pids)
        from hpmvs_tpu.runtime.owned import _allgather
        ns = _allgather(np.asarray([local_n], np.int64))[:, 0]
        my_off = int(ns[:engine.pid].sum())
    else:
        if len(pids) == 0:
            return None
        centers = p.center[pids]
        views = p.views[pids]
    if len(centers) == 0:
        return None
    if problem is None:
        problem = build_dense_problem(engine.model, centers, views)
    n_cams = len(engine.model.cameras)
    n_pts = len(centers)
    if engine.mesh is not None:
        prob = shard_problem(problem, engine.mesh.devices.size)
        cam, pts, hist = ba_solve_sharded(engine.mesh, prob, n_cams, n_pts,
                                          iters=iters, cg_iters=cg_iters,
                                          fix_count=fix_count)
    else:
        cam, pts, hist = ba_solve(problem, n_cams, n_pts, iters=iters,
                                  cg_iters=cg_iters, fix_count=fix_count)
    cam, pts, hist = (np.asarray(cam), np.asarray(pts), np.asarray(hist))

    # fold back: cameras -> model + device SoA, centers -> patch store,
    # depth z-buffers replayed under the new geometry
    from hpmvs_tpu.geom import camera as cam_ops
    from hpmvs_tpu.core import depth as depth_mod
    import jax.numpy as jnp
    # any in-flight wave speculation captured pre-BA cameras/centers
    engine.drop_speculation()
    engine.model = apply_cameras_to_model(engine.model, cam)
    widths = [int(w) for w in engine.scene.width_np[:, 0]]
    heights = [int(h) for h in engine.scene.height_np[:, 0]]
    cams = cam_ops.build_cameras(engine.model.cameras, widths, heights,
                                 engine.opt.MAXLEVEL)
    engine.scene = engine.scene._replace(
        ctx=engine.scene.ctx._replace(cams=cams))
    if owned:
        engine.patches.center[pids] = pts[my_off:my_off + local_n]
    else:
        engine.patches.center[pids] = pts
    engine.refresh_host_caches()
    engine._pend = []
    fresh = depth_mod.build_depth_pack(engine.scene.width_np,
                                       engine.scene.height_np,
                                       engine.opt.DEPTH_SUBSAMPLE)
    engine.pack = engine.pack._replace(depth=fresh.depth)
    engine._set_depths(pids)
    engine._flush_depths()
    return hist


def apply_to_model(model, cam_params: np.ndarray, points: np.ndarray):
    """Write the refined cameras/points back into a (copied) NVM model."""
    import copy
    from hpmvs_tpu.testing import _quatR, _rot_to_quat
    out = copy.deepcopy(model)
    cam_params = np.asarray(cam_params, np.float64)
    for ci, cam in enumerate(out.cameras):
        R0 = _quatR(cam.rq)
        t0 = -R0 @ cam.c
        w = cam_params[ci, :3]
        th = np.linalg.norm(w) + 1e-12
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                      [-w[1], w[0], 0]]) / th
        R = R0 @ (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K))
        t = t0 + cam_params[ci, 3:6]
        cam.rq = _rot_to_quat(R)
        cam.c = -R.T @ t
    out.points_xyz = np.asarray(points, np.float64).copy()
    return out
