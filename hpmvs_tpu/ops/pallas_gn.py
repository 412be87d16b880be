"""Pallas TPU mega-kernel: the complete Gauss-Newton patch refinement loop.

This is the speed-of-light implementation of the reference's per-patch
optimization (PatchOptimizer::optimizePatch + objective_fn,
src/hpmvs/PatchOptimizer.cpp:286-382) as ONE fused TPU kernel.

Why a kernel: the XLA graph version (ops/optimizer._optimize_patch) re-reads
the (B, K, W, W, 3) window cache from HBM and materializes ~350 MB of
bilinear-sampling intermediates on EVERY residual pass -- ~2 GB of HBM traffic
per pass x 49 passes (measured with XLA cost analysis). This kernel keeps the
windows and every intermediate VMEM-resident for the whole 12-iteration
Levenberg loop: HBM traffic collapses to one bf16 window read per block.

Layout strategy (the whole point):
  - grid over blocks of NB=128 patches; the PATCH axis is the LANE axis, so
    every elementwise geometry op runs on fully-packed (r, 128) vregs instead
    of (B, K, 3)-shaped tensors whose minor dim pads 3 -> 128 lanes.
  - windows are stored (K*W*3, W, NB) bf16 (pixel values are uint8-exact in
    bf16): slice [k*W*3 + x*3 + c] is a native (W, 128) tile.
  - bilinear sampling = hat-weight accumulation: for each window column x,
    tmp[t, y] += hat(gx[t]-x) * win[y, x]; then tex[t] = sum_y hat(gy[t]-y)
    * tmp[t, y]. All on the VPU, zero gathers, zero HBM round trips.
  - the view loop, finite-difference loop and iteration loop are
    lax.fori_loops so the program stays compact.

The objective evaluates the first min(K, MAX_IMAGES_PER_PATCH) view slots:
the reference computes exactly this cap (optImgs, PatchOptimizer.cpp:298)
though its loop then ignores it -- an evident bug we do not reproduce; view
lists at optimize time are <= 6 after the NCC/sort pipeline anyway.

Numerics match ops/optimizer._optimize_patch (same parameterization, FD
steps, damping and acceptance) except windows are read through bf16: exact
for level-0 pixels, ~0.4% relative rounding on averaged pyramid levels.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hpmvs_tpu.config import Options
from hpmvs_tpu.ops import sampling

NB = 128          # patches per grid step (= lane width)
P = sampling.PATCH_SIZE
P2 = P * P
BIG = 1e9
GN_EPS = 1e-5


class GNStatics(NamedTuple):
    W: int
    K: int
    iters: int
    inner: int
    angle_scale: float
    cos_max: float
    min_images: int
    angle_bound: float
    lam0: float
    ftol: float
    h_shrink: float
    exact_j: bool
    iters_exact: int
    step_clamp: float = 4.0
    debug_j: bool = False


def _rows(v):
    """Split a (3, NB) value into a tuple of (1, NB) rows."""
    return v[0:1], v[1:2], v[2:3]


def hat_sample_ch(win_ref, base: int, gx, gy, W: int):
    """Bilinear sampling of one view's cached window via hat-weight
    accumulation (the gather-free TPU bilinear; see module docstring).

    win_ref: (K*W*3, W, NB) bf16 window slabs; base = k*W*3 selects view k.
    gx/gy: (T, NB) local window coordinates. Returns [c0, c1, c2] float32
    (T, NB) channel planes."""
    f32 = jnp.float32
    # x-stage: tmp_c[y, t] = sum_x hat(gx[t]-x) * win[y, x]; y is the
    # leading (slab) dim so the y-stage below slices it for free
    tmp = [None, None, None]
    for xx in range(W):
        ax = jnp.maximum(0.0, 1.0 - jnp.abs(gx - float(xx)))
        axb = ax[None, :, :]                       # (1, T, NB)
        for c in range(3):
            wsl = win_ref[base + xx * 3 + c].astype(f32)  # (W, NB)
            term = axb * wsl[:, None, :]           # (W, T, NB)
            tmp[c] = term if xx == 0 else tmp[c] + term
    # y-stage: tex_c[t] = sum_y hat(gy[t]-y) * tmp_c[y, t]
    tex = [None, None, None]
    for yy in range(W):
        ay = jnp.maximum(0.0, 1.0 - jnp.abs(gy - float(yy)))
        for c in range(3):
            term = ay * tmp[c][yy]
            tex[c] = term if yy == 0 else tex[c] + term
    return tex


def hat_sample_grad_ch(win_ref, base: int, gx, gy, W: int):
    """hat_sample_ch + exact partials w.r.t. the sample coordinates.

    Returns (tex, Gx, Gy): lists of 3 channel planes (T, NB) with
    Gx = d tex / d gx, Gy = d tex / d gy. Uses both factorization orders of
    the separable bilinear sum (x-then-y for tex/Gy, y-then-x for Gx), so a
    gradient pass costs ~2.2x a value pass instead of 3 FD passes.
    hat'(u) = -sign(u) on |u| < 1 (subgradient 0 at the kinks)."""
    f32 = jnp.float32
    AY, AYD = [], []
    for yy in range(W):
        u = gy - float(yy)
        AY.append(jnp.maximum(0.0, 1.0 - jnp.abs(u)))
        AYD.append(jnp.where(jnp.abs(u) < 1.0, -jnp.sign(u), 0.0))
    # stage A (x-then-y): T2_c[y, t] = sum_x hat(gx-x) win[y, x]
    tmp = [None, None, None]
    for xx in range(W):
        ax = jnp.maximum(0.0, 1.0 - jnp.abs(gx - float(xx)))
        axb = ax[None, :, :]
        for c in range(3):
            wsl = win_ref[base + xx * 3 + c].astype(f32)   # (W, NB)
            term = axb * wsl[:, None, :]
            tmp[c] = term if xx == 0 else tmp[c] + term
    tex = [None, None, None]
    Gy = [None, None, None]
    for yy in range(W):
        for c in range(3):
            tv = AY[yy] * tmp[c][yy]
            dv = AYD[yy] * tmp[c][yy]
            tex[c] = tv if yy == 0 else tex[c] + tv
            Gy[c] = dv if yy == 0 else Gy[c] + dv
    # stage B (y-then-x): colsum_c[t] = sum_y hat(gy-y) win[y, xx];
    # Gx_c = sum_xx hat'(gx-xx) colsum_c
    Gx = [None, None, None]
    for xx in range(W):
        u = gx - float(xx)
        axd = jnp.where(jnp.abs(u) < 1.0, -jnp.sign(u), 0.0)
        for c in range(3):
            wsl = win_ref[base + xx * 3 + c].astype(f32)   # (W, NB)
            colsum = None
            for yy in range(W):
                t = AY[yy] * wsl[yy:yy + 1]
                colsum = t if yy == 0 else colsum + t
            gv = axd * colsum
            Gx[c] = gv if xx == 0 else Gx[c] + gv
    return tex, Gx, Gy


def normalize_ch(tex, n_texels: int, with_inv=False):
    """Patch2d::normalize (Patch2d.hpp:46-84) on channel planes: subtract
    per-channel mean, divide by the global std. tex: [3 x (T, NB)].
    with_inv additionally returns inv = 1/std (for tangent propagation)."""
    f32 = jnp.float32
    cen = []
    var = None
    for c in range(3):
        mc = jnp.sum(tex[c], axis=0, keepdims=True) / n_texels
        cc_ = tex[c] - mc
        v = jnp.sum(cc_ * cc_, axis=0, keepdims=True)
        var = v if var is None else var + v
        cen.append(cc_)
    std = jnp.sqrt(var / (n_texels * 3.0))
    inv = jnp.where(std == 0.0, 1.0, 1.0 / std).astype(f32)
    out = [cen[0] * inv, cen[1] * inv, cen[2] * inv]
    return (out, inv) if with_inv else out


def normalize_grad_ch(cen, inv, dtex, n_texels: int):
    """Tangent of Patch2d::normalize at (cen, inv=1/std) for a texture
    tangent dtex: d cen_c = (dtex_c - mean(dtex_c)) * inv - cen_c * ds * inv
    with ds = sum_ct cen_c dtex_c / (3T) (exact: sum_t u_c = 0)."""
    ds = None
    dm = []
    for c in range(3):
        dm.append(jnp.sum(dtex[c], axis=0, keepdims=True) / n_texels)
        v = jnp.sum(cen[c] * dtex[c], axis=0, keepdims=True)
        ds = v if ds is None else ds + v
    ds = ds / (n_texels * 3.0)
    return [(dtex[c] - dm[c]) * inv - cen[c] * (ds * inv) for c in range(3)]


def _norm3(x, y, z):
    rn = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-24))
    return x * rn, y * rn, z * rn


def _cross(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _kernel(x0_ref, h_ref, ref_ref, scale_ref, pc_ref, pr_ref, p9_ref,
            camc_ref, lim_ref, org_ref, mask_ref, win_ref,
            xout_ref, fout_ref, *jout_ref, st: GNStatics):
    W, K = st.W, st.K
    f32 = jnp.float32

    ii = jax.lax.broadcasted_iota(jnp.int32, (P2, 1), 0)
    IX = jnp.mod(ii, P).astype(f32)       # (49, 1) texel x index
    IY = (ii // P).astype(f32)            # (49, 1) texel y index

    scale = scale_ref[:]                   # (1, NB)
    rc = ref_ref[0]                        # (3, NB) ref center
    rr = ref_ref[1]                        # ref ray
    e0 = ref_ref[2]                        # ref cam x axis
    e1 = ref_ref[3]                        # ref cam y axis
    e2 = ref_ref[4]                        # ref cam z axis
    rcx, rcy, rcz = _rows(rc)
    rrx, rry, rrz = _rows(rr)
    e0x, e0y, e0z = _rows(e0)
    e1x, e1y, e1z = _rows(e1)
    e2x, e2y, e2z = _rows(e2)

    def grad_pass(x, with_grad=True):
        """Value (+ exact Jacobian) pass; the ONE implementation of the
        objective geometry for both refiner modes (FD and exact-J share
        every gate and every grid formula by construction).

        x: (3, NB). Returns (rho (K, NB), n (1, NB), ref_ok (1, NB),
        J (3, K, NB) or None) with J[p, k] = d rho_k / d x_p -- the analytic
        chain through center shift, normal rotation, patch axes, projection,
        bilinear sampling (hat_sample_grad_ch) and Patch2d normalization
        (normalize_grad_ch). A grad pass costs ~2.2x a value pass;
        with_grad=False skips all tangent code at trace time. Validity
        gates are treated as constants (piecewise-smooth objective, same
        as the reference's BOBYQA sees)."""
        sA = st.angle_scale
        x0v, x1v, x2v = _rows(x)
        cx = rcx + x0v * rrx
        cy = rcy + x0v * rry
        cz = rcz + x0v * rrz
        a1 = x1v * sA
        a2 = x2v * sA
        sa1, ca1 = jnp.sin(a1), jnp.cos(a1)
        sa2, ca2 = jnp.sin(a2), jnp.cos(a2)
        ffx = sa1 * ca2
        ffy = sa2
        ffz = -ca1 * ca2

        def world(fx, fy, fz):
            return (e0x * fx + e1x * fy + e2x * fz,
                    e0y * fx + e1y * fy + e2y * fz,
                    e0z * fx + e1z * fy + e2z * fz)

        zx, zy, zz = _norm3(*world(ffx, ffy, ffz))
        # normal tangents (f is unit, e orthonormal -> z = world(f))
        dz = [None,
              world(ca1 * ca2 * sA, jnp.zeros_like(sa2), sa1 * ca2 * sA),
              world(-sa1 * sa2 * sA, ca2 * sA, ca1 * sa2 * sA)]
        for p in (1, 2):
            dx_, dy_, dz_ = dz[p]
            dot = dx_ * zx + dy_ * zy + dz_ * zz
            dz[p] = (dx_ - zx * dot, dy_ - zy * dot, dz_ - zz * dot)

        # y axis = normalize(z x e0); x axis = normalize(y x z)
        ux, uy, uz = _cross(zx, zy, zz, e0x, e0y, e0z)
        rnu = jax.lax.rsqrt(jnp.maximum(ux * ux + uy * uy + uz * uz, 1e-24))
        yx, yy_, yz = ux * rnu, uy * rnu, uz * rnu
        vx, vy, vz = _norm3(*_cross(yx, yy_, yz, zx, zy, zz))
        xax = (vx * scale, vy * scale, vz * scale)
        ydot = (yx * e1x + yy_ * e1y + yz * e1z) * scale
        yax = (yx * ydot, yy_ * ydot, yz * ydot)

        dxax = [None, None, None]
        dyax = [None, None, None]
        for p in (1, 2) if with_grad else ():
            dup = _cross(*dz[p], e0x, e0y, e0z)
            ydu = yx * dup[0] + yy_ * dup[1] + yz * dup[2]
            dyp = ((dup[0] - yx * ydu) * rnu, (dup[1] - yy_ * ydu) * rnu,
                   (dup[2] - yz * ydu) * rnu)
            dv = tuple(a + b for a, b in
                       zip(_cross(*dyp, zx, zy, zz),
                           _cross(yx, yy_, yz, *dz[p])))
            vdv = vx * dv[0] + vy * dv[1] + vz * dv[2]
            dxax[p] = ((dv[0] - vx * vdv) * scale, (dv[1] - vy * vdv) * scale,
                       (dv[2] - vz * vdv) * scale)
            ddot_e1 = (dyp[0] * e1x + dyp[1] * e1y + dyp[2] * e1z) * scale
            dyax[p] = (dyp[0] * ydot + yx * ddot_e1,
                       dyp[1] * ydot + yy_ * ddot_e1,
                       dyp[2] * ydot + yz * ddot_e1)

        def viewg(k):
            """Returns (valid, cen [3 x (T,NB)], dcen [3 params][3 ch])."""
            pc = pc_ref[k]
            pr = pr_ref[k]
            p9 = p9_ref[k]
            cc = camc_ref[k]
            lim = lim_ref[k]
            org = org_ref[k]
            mk = mask_ref[k]

            phc = [pc[i:i + 1] + x0v * pr[i:i + 1] for i in range(3)]
            prr = [pr[i:i + 1] for i in range(3)]

            def pmul(v3, i):
                return (p9[3 * i:3 * i + 1] * v3[0]
                        + p9[3 * i + 1:3 * i + 2] * v3[1]
                        + p9[3 * i + 2:3 * i + 3] * v3[2])

            phx = [phc[i] + pmul(xax, i) for i in range(3)]
            phy = [phc[i] + pmul(yax, i) for i in range(3)]
            front = phc[2] > 0.0
            rwc = 1.0 / jnp.where(front, phc[2], 1.0)
            c2x = phc[0] * rwc
            c2y = phc[1] * rwc
            rwx = 1.0 / jnp.where(phx[2] != 0.0, phx[2], 1.0)
            xx2, xy2 = phx[0] * rwx, phx[1] * rwx
            dxx = xx2 - c2x
            dxy = xy2 - c2y
            rwy = 1.0 / jnp.where(phy[2] != 0.0, phy[2], 1.0)
            yx2, yy2v = phy[0] * rwy, phy[1] * rwy
            dyx = yx2 - c2x
            dyy = yy2v - c2y

            rx, ry, rz = _norm3(cc[0:1] - cx, cc[1:2] - cy, cc[2:3] - cz)
            angle_ok = rx * zx + ry * zy + rz * zz >= st.cos_max

            half = P / 2.0
            adx = half * (jnp.abs(dxx) + jnp.abs(dyx))
            ady = half * (jnp.abs(dxy) + jnp.abs(dyy))
            mnx, mxx = c2x - adx, c2x + adx
            mny, mxy = c2y - ady, c2y + ady
            m = 3.0
            bounds_ok = ((mnx >= m) & (mny >= m)
                         & (mxx < lim[0:1] - m) & (mxy < lim[1:2] - m))
            oxf, oyf = org[0:1], org[1:2]
            cover_ok = ((mnx - oxf >= 0.0) & (mny - oyf >= 0.0)
                        & (mxx - oxf <= W - 1.0) & (mxy - oyf <= W - 1.0))
            valid = front & angle_ok & bounds_ok & cover_ok & (mk > 0.0)

            # per-param tangents of (c2, dxx, dxy, dyx, dyy)
            if with_grad:
                dc2x = [(prr[0] - c2x * prr[2]) * rwc, None, None]
                dc2y = [(prr[1] - c2y * prr[2]) * rwc, None, None]
                ddxx = [(prr[0] - xx2 * prr[2]) * rwx - dc2x[0], None, None]
                ddxy = [(prr[1] - xy2 * prr[2]) * rwx - dc2y[0], None, None]
                ddyx = [(prr[0] - yx2 * prr[2]) * rwy - dc2x[0], None, None]
                ddyy = [(prr[1] - yy2v * prr[2]) * rwy - dc2y[0], None, None]
            zero = jnp.zeros_like(c2x)
            for p in (1, 2) if with_grad else ():
                a0, a1_, a2_ = (pmul(dxax[p], 0), pmul(dxax[p], 1),
                                pmul(dxax[p], 2))
                b0, b1_, b2_ = (pmul(dyax[p], 0), pmul(dyax[p], 1),
                                pmul(dyax[p], 2))
                dc2x[p] = zero
                dc2y[p] = zero
                ddxx[p] = (a0 - xx2 * a2_) * rwx
                ddxy[p] = (a1_ - xy2 * a2_) * rwx
                ddyx[p] = (b0 - yx2 * b2_) * rwy
                ddyy[p] = (b1_ - yy2v * b2_) * rwy

            tlx = c2x - half * (dxx + dyx) - oxf
            tly = c2y - half * (dxy + dyy) - oyf
            gx = jnp.clip(tlx + IX * dxx + IY * dyx, 0.0, W - 1.0)
            gy = jnp.clip(tly + IX * dxy + IY * dyy, 0.0, W - 1.0)
            # (no clip masks on the tangents: cover_ok valid views never clip)

            if not with_grad:
                tex = hat_sample_ch(win_ref, k * (W * 3), gx, gy, W)
                return valid, normalize_ch(tex, P2), None
            tex, Gxs, Gys = hat_sample_grad_ch(win_ref, k * (W * 3), gx, gy,
                                               W)
            cen, inv = normalize_ch(tex, P2, with_inv=True)
            dcen = []
            for p in range(3):
                dtlx = dc2x[p] - half * (ddxx[p] + ddyx[p])
                dtly = dc2y[p] - half * (ddxy[p] + ddyy[p])
                dgx = dtlx + IX * ddxx[p] + IY * ddyx[p]     # (T, NB)
                dgy = dtly + IX * ddxy[p] + IY * ddyy[p]
                dtex = [Gxs[c] * dgx + Gys[c] * dgy for c in range(3)]
                dcen.append(normalize_grad_ch(cen, inv, dtex, P2))
            return valid, cen, dcen

        ref_valid, cenr, dcenr = viewg(0)
        ref_ok = jnp.where(ref_valid, 1.0, 0.0)
        krow = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

        def kbody(k, carry):
            rho, n, Jm = carry
            valid, cen, dcen = viewg(k)
            dot = None
            for c in range(3):
                v = jnp.sum(cenr[c] * cen[c], axis=0, keepdims=True)
                dot = v if dot is None else dot + v
            incc = 1.0 - dot / (P2 * 3.0)
            rob = incc / (1.0 + 3.0 * incc)
            rho_k = jnp.where(valid, rob, 0.0)
            rho = jnp.where(krow == k, rho_k, rho)
            n = n + jnp.where(valid, 1.0, 0.0)
            if not with_grad:
                return rho, n, Jm
            dr = 1.0 / ((1.0 + 3.0 * incc) * (1.0 + 3.0 * incc))
            drho = []
            for p in range(3):
                ddot = None
                for c in range(3):
                    v = jnp.sum(dcenr[p][c] * cen[c] + cenr[c] * dcen[p][c],
                                axis=0, keepdims=True)
                    ddot = v if ddot is None else ddot + v
                drho.append(jnp.where(valid, -ddot / (P2 * 3.0) * dr, 0.0))
            # (3,1,NB) update broadcast into slot k (no scatter: Mosaic
            # cannot lower .at[].set on the TPU path)
            Jm = jnp.where((krow == k)[None], jnp.stack(drho, 0), Jm)
            return rho, n, Jm

        rho0 = jnp.zeros((K, NB), f32)
        n0 = jnp.zeros((1, NB), f32)
        J0 = jnp.zeros((3, K, NB) if with_grad else (1, 1, NB), f32)
        rho, n, Jm = jax.lax.fori_loop(1, K, kbody, (rho0, n0, J0))
        return rho, n, ref_ok, (Jm if with_grad else None)

    def sample_pass(x):
        rho, n, ref_ok, _ = grad_pass(x, with_grad=False)
        return rho, n, ref_ok

    def mean_or_2(rho, n, ref_ok):
        mean = jnp.sum(rho, axis=0, keepdims=True) / jnp.maximum(n, 1.0)
        good = (ref_ok > 0.0) & (n >= st.min_images - 1)
        return jnp.where(good, mean, 2.0)

    x = x0_ref[:]                                           # (3, NB)
    h = h_ref[:]                                            # (3, NB)

    b = st.angle_bound
    i3 = jax.lax.broadcasted_iota(jnp.int32, (3, 1), 0)
    is_depth = i3 == 0
    lo = jnp.where(is_depth, -BIG, -b)
    hi = jnp.where(is_depth, BIG, b)

    def newton_step(cols, rho, n, lam):
        """Damped GN step from per-view residual columns cols (3, K, NB):
        g = mean col, H = robust-weighted col outer products, Cramer 3x3
        solve of (H + lam diag) step = -g."""
        nf = jnp.maximum(n, 1.0)
        wgt = 0.5 / (rho + GN_EPS)                          # (K, NB)
        g = [jnp.sum(cols[i], axis=0, keepdims=True) / nf for i in range(3)]
        Hm = {}
        for i in range(3):
            for j in range(i, 3):
                Hm[(i, j)] = jnp.sum(cols[i] * wgt * cols[j],
                                     axis=0, keepdims=True) / nf
        d = 1e-6
        h00 = Hm[(0, 0)] + lam * jnp.maximum(jnp.abs(Hm[(0, 0)]), d)
        h11 = Hm[(1, 1)] + lam * jnp.maximum(jnp.abs(Hm[(1, 1)]), d)
        h22 = Hm[(2, 2)] + lam * jnp.maximum(jnp.abs(Hm[(2, 2)]), d)
        h01, h02, h12 = Hm[(0, 1)], Hm[(0, 2)], Hm[(1, 2)]
        c00 = h11 * h22 - h12 * h12
        c01 = h02 * h12 - h01 * h22
        c02 = h01 * h12 - h02 * h11
        c11 = h00 * h22 - h02 * h02
        c12 = h01 * h02 - h00 * h12
        c22 = h00 * h11 - h01 * h01
        det = h00 * c00 + h01 * c01 + h02 * c02
        rdet = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
        s0 = -(c00 * g[0] + c01 * g[1] + c02 * g[2]) * rdet
        s1 = -(c01 * g[0] + c11 * g[1] + c12 * g[2]) * rdet
        s2 = -(c02 * g[0] + c12 * g[1] + c22 * g[2]) * rdet
        step = jnp.concatenate([s0, s1, s2], axis=0)        # (3, NB)
        return jnp.where(jnp.isfinite(step), step, 0.0)

    if st.debug_j:
        # debug: emit rho and the analytic J at x0, no refinement
        rho, n, ref_ok, Jm = grad_pass(x)
        xout_ref[:] = x
        fout_ref[:] = mean_or_2(rho, n, ref_ok)
        jout_ref[0][:] = Jm.reshape(3 * st.K, NB)
        jout_ref[1][:] = rho
        return

    if st.exact_j:
        # ---- exact-Jacobian Levenberg loop (deferred acceptance): every
        # iteration is ONE grad_pass (~2.2 value passes) that yields both the
        # trial objective and, if accepted, the next iteration's Jacobian.
        rho, n, ref_ok, Jm = grad_pass(x)
        f = mean_or_2(rho, n, ref_ok)
        lam = jnp.full((1, NB), st.lam0, f32)

        def lm_cond(carry):
            i, dry = carry[0], carry[1]
            return jnp.logical_and(i < st.iters_exact - 1, dry < 2)

        cl = h * f32(st.step_clamp)   # trust region in natural param scales

        def lm_body(carry):
            i, dry, x, rho, n, ref_ok, f, Jm, lam = carry
            step = jnp.clip(newton_step(Jm, rho, n, lam), -cl, cl)
            x_t = jnp.clip(x + step, lo, hi)
            rho_t, n_t, ref_t, J_t = grad_pass(x_t)
            f_t = mean_or_2(rho_t, n_t, ref_t)
            acc = f_t < f                                   # (1, NB)
            improved = jnp.max(jnp.where(acc, f - f_t, 0.0))
            x = jnp.where(acc, x_t, x)
            rho = jnp.where(acc, rho_t, rho)
            n = jnp.where(acc, n_t, n)
            ref_ok = jnp.where(acc, ref_t, ref_ok)
            f = jnp.where(acc, f_t, f)
            Jm = jnp.where(acc[None], J_t, Jm)
            lam = jnp.clip(jnp.where(acc, lam * 0.5, lam * 4.0), 1e-7, 1e7)
            dry = jnp.where(improved > st.ftol, 0, dry + 1)
            return i + 1, dry, x, rho, n, ref_ok, f, Jm, lam

        _, _, x, rho, n, ref_ok, f, Jm, lam = jax.lax.while_loop(
            lm_cond, lm_body,
            (jnp.int32(0), jnp.int32(0), x, rho, n, ref_ok, f, Jm, lam))
        if st.iters_exact > 0:
            # final trial: the trajectory never uses the last iteration's
            # Jacobian, so it is a plain value pass (1x instead of ~2.2x)
            step = jnp.clip(newton_step(Jm, rho, n, lam), -cl, cl)
            x_t = jnp.clip(x + step, lo, hi)
            rho_t, n_t, ref_t = sample_pass(x_t)
            f_t = mean_or_2(rho_t, n_t, ref_t)
            acc = f_t < f
            x = jnp.where(acc, x_t, x)
            f = jnp.where(acc, f_t, f)
        xout_ref[:] = x
        fout_ref[:] = f
        return

    rho, n, ref_ok = sample_pass(x)
    f = mean_or_2(rho, n, ref_ok)
    lam = jnp.full((1, NB), st.lam0, f32)

    def inner_body(_, carry):
        """One damped-Newton trial (1 sampling pass) on the current Jacobian
        + Broyden rank-1 secant update."""
        x, rho, n, ref_ok, f, lam, cols = carry
        step = newton_step(cols, rho, n, lam)
        x_new = jnp.clip(x + step, lo, hi)

        rho_t, n_t, ref_t = sample_pass(x_new)
        # Broyden rank-1 secant update (applied whether or not we accept):
        # cols[i] += dx_i * (rho_t - rho - sum_j cols[j] dx_j) / |dx|^2
        dx = x_new - x                                       # (3, NB)
        dd = jnp.sum(dx * dx, axis=0, keepdims=True)         # (1, NB)
        pred = (cols[0] * dx[0:1] + cols[1] * dx[1:2]
                + cols[2] * dx[2:3])                         # (K, NB)
        resb = (rho_t - rho - pred) / jnp.maximum(dd, 1e-20)
        okd = dd > 1e-20
        cols = jnp.stack([
            jnp.where(okd, cols[i] + dx[i:i + 1] * resb, cols[i])
            for i in range(3)])
        f_new = mean_or_2(rho_t, n_t, ref_t)
        acc = f_new < f                                     # (1, NB)
        x = jnp.where(acc, x_new, x)
        rho = jnp.where(acc, rho_t, rho)
        n = jnp.where(acc, n_t, n)
        ref_ok = jnp.where(acc, ref_t, ref_ok)
        f = jnp.where(acc, f_new, f)
        lam = jnp.clip(jnp.where(acc, lam * 0.5, lam * 4.0), 1e-7, 1e7)
        return x, rho, n, ref_ok, f, lam, cols

    irow = jax.lax.broadcasted_iota(jnp.int32, (3, 1, 1), 0)
    outer = -(-st.iters // st.inner)

    def outer_cond(carry):
        """Run refresh rounds until the whole block stops improving (the
        batched analog of BOBYQA's xtol_rel stop, PatchOptimizer.cpp:352)."""
        i, go, *_ = carry
        return jnp.logical_and(i < outer, go)

    def outer_body(carry):
        """Full finite-difference Jacobian refresh (3 sampling passes) +
        st.inner Broyden trial steps. The FD step shrinks every round (the
        batched analog of BOBYQA's contracting trust region): a fixed h
        cannot resolve curvature below h and stalls tail convergence."""
        i, _, hs, x, rho, n, ref_ok, f, lam = carry
        f_before = f
        hr = h * hs

        def fd_body(i, cols):
            hi_ = jnp.sum(jnp.where(i3 == i, hr, 0.0), axis=0, keepdims=True)
            xp = x + jnp.where(i3 == i, 1.0, 0.0) * hi_
            rho_i, _, _ = sample_pass(xp)
            col = (rho_i - rho) / hi_                       # (K, NB)
            return jnp.where(irow == i, col[None], cols)

        cols = jax.lax.fori_loop(0, 3, fd_body,
                                 jnp.zeros((3, K, NB), f32))
        x, rho, n, ref_ok, f, lam, _ = jax.lax.fori_loop(
            0, st.inner, inner_body, (x, rho, n, ref_ok, f, lam, cols))
        # accepted steps only lower f; the round helped if ANY lane moved
        go = jnp.max(f_before - f) > st.ftol
        return i + 1, go, hs * f32(st.h_shrink), x, rho, n, ref_ok, f, lam

    _, _, _, x, rho, n, ref_ok, f, lam = jax.lax.while_loop(
        outer_cond, outer_body,
        (jnp.int32(0), jnp.bool_(True), f32(1.0), x, rho, n, ref_ok, f,
         lam))
    xout_ref[:] = x
    fout_ref[:] = f


def _specs(shapes):
    """One BlockSpec per input, blocking the trailing (batch) dim by NB."""
    out = []
    for sh in shapes:
        lead = sh[:-1]
        zeros = (0,) * len(lead)
        out.append(pl.BlockSpec(lead + (NB,),
                                (lambda i, z=zeros: z + (i,)),
                                memory_space=pltpu.VMEM))
    return out


@functools.partial(jax.jit, static_argnames=("st", "interpret"))
def gn_refine_pallas(st: GNStatics, x0T, hT, refT, scaleT, pcT, prT, p9T,
                     camcT, limT, orgT, maskT, winT, interpret=False):
    """All inputs batch-minor; see _prep. Returns (x (3, B), f (1, B))."""
    Bt = x0T.shape[-1]
    assert Bt % NB == 0
    grid = (Bt // NB,)
    ins = [x0T, hT, refT, scaleT, pcT, prT, p9T, camcT, limT, orgT, maskT,
           winT]
    in_specs = _specs([a.shape for a in ins])
    out_shapes = [(3, Bt), (1, Bt)]
    if st.debug_j:
        out_shapes += [(3 * st.K, Bt), (st.K, Bt)]
    out_specs = _specs(out_shapes)
    kern = functools.partial(_kernel, st=st)
    out = pl.pallas_call(
        kern,
        out_shape=tuple(jax.ShapeDtypeStruct(sh, jnp.float32)
                        for sh in out_shapes),
        grid=grid,
        in_specs=in_specs,
        out_specs=list(out_specs),
        interpret=interpret,
    )(*ins)
    return out if st.debug_j else (out[0], out[1])


def _prep(ctx, opt: Options, center, normal, scale, views, ws):
    """XLA-side packing: per-patch precomputed terms, batch-minor layouts.

    center (B,3), normal (B,3), scale (B,), views (B,K'), ws over K' slots;
    only the first K = min(K', MAX_IMAGES_PER_PATCH) slots enter the kernel.
    """
    from hpmvs_tpu.ops import optimizer as popt
    from hpmvs_tpu.ops import windows as win_ops

    B = center.shape[0]
    K = min(views.shape[1], opt.MAX_IMAGES_PER_PATCH)
    views_k = views[:, :K]
    if isinstance(ws, win_ops.WinTState):
        W = ws.W
        # kernel layout already: slice the first K view slots (free)
        winT_pre = (ws.winT.reshape(ws.K, W * 3 * W, B)[:K]
                    .reshape(K * W * 3, W, B).astype(jnp.bfloat16))
    else:
        winT_pre = None
        win = ws.win[:, :K]
    level = ws.level[:, :K]
    ox = ws.ox[:, :K]
    oy = ws.oy[:, :K]

    ref_ci = jnp.maximum(views[:, 0], 0)
    ref_center = center
    ref_ray = sampling.normalize3(center - ctx.cams.center[ref_ci])
    ax_x = sampling.normalize3(ctx.cams.xaxis[ref_ci])
    ax_y = sampling.normalize3(ctx.cams.yaxis[ref_ci])
    ax_z = sampling.normalize3(ctx.cams.zaxis[ref_ci])

    ci = jnp.maximum(views_k, 0)                    # (B, K)
    Pm = ctx.cams.P[ci, level]                      # (B, K, 3, 4)
    Pl3 = Pm[..., :3]                               # (B, K, 3, 3)
    ch = jnp.concatenate([ref_center, jnp.ones((B, 1), center.dtype)], -1)
    Pc = jnp.einsum("bkij,bj->bki", Pm, ch)         # (B, K, 3)
    Pr = jnp.einsum("bkij,bj->bki", Pl3, ref_ray)   # (B, K, 3)
    camc = ctx.cams.center[ci]                      # (B, K, 3)
    lim = jnp.stack([ctx.imgs.width[ci, level], ctx.imgs.height[ci, level]],
                    axis=-1).astype(center.dtype)   # (B, K, 2)
    org = jnp.stack([ox, oy], axis=-1).astype(center.dtype)
    mask = (views_k >= 0).astype(center.dtype)      # (B, K)

    x0 = jax.vmap(functools.partial(popt._params_from_center_norm, opt=opt))(
        center, sampling.normalize3(normal), ref_center, ref_ray,
        ax_x, ax_y, ax_z)                           # (B, 3)
    h = jnp.stack([0.05 * scale,
                   jnp.full_like(scale, 0.25),
                   jnp.full_like(scale, 0.25)], axis=-1)   # (B, 3)

    refT = jnp.stack([ref_center, ref_ray, ax_x, ax_y, ax_z], 0)  # (5,B,3)

    if winT_pre is None:
        W = win.shape[-2]
        winT_pre = (jnp.transpose(win, (1, 3, 4, 2, 0))
                    .reshape(K * W * 3, W, B).astype(jnp.bfloat16))
    else:
        W = ws.W
    args = dict(
        x0T=x0.T,
        hT=h.T,
        refT=jnp.transpose(refT, (0, 2, 1)),                 # (5, 3, B)
        scaleT=scale[None, :],
        pcT=jnp.transpose(Pc, (1, 2, 0)),                    # (K, 3, B)
        prT=jnp.transpose(Pr, (1, 2, 0)),
        p9T=jnp.transpose(Pl3.reshape(B, K, 9), (1, 2, 0)),  # (K, 9, B)
        camcT=jnp.transpose(camc, (1, 2, 0)),
        limT=jnp.transpose(lim, (1, 2, 0)),
        orgT=jnp.transpose(org, (1, 2, 0)),
        maskT=jnp.transpose(mask, (1, 0))[:, None, :],       # (K, 1, B)
        # (K*W*3, W, B) bf16 window slabs
        winT=winT_pre,
    )
    import math
    st = GNStatics(W=W, K=K, iters=opt.LM_ITERS,
                   inner=max(1, int(opt.LM_INNER)),
                   angle_scale=float(opt.ANGLE_SCALE),
                   cos_max=float(math.cos(opt.MAX_ANGLE)),
                   min_images=int(opt.MIN_IMAGES_PER_PATCH),
                   angle_bound=float(opt.ANGLE_BOUND),
                   lam0=float(opt.LM_LAMBDA0),
                   ftol=float(opt.LM_FTOL),
                   h_shrink=float(opt.LM_H_SHRINK),
                   exact_j=bool(opt.LM_EXACT_J),
                   iters_exact=int(opt.LM_ITERS_EXACT),
                   step_clamp=float(opt.LM_STEP_CLAMP))
    extra = (ref_center, ref_ray, ax_x, ax_y, ax_z)
    return st, args, extra


def gn_refine_batch(ctx, opt: Options, center, normal, scale, views, ws,
                    interpret=False):
    """Batched drop-in for vmapped optimizer._optimize_patch (window path).

    Returns (new_center (B,3), new_normal (B,3), ok (B,), f (B,)).
    """
    from hpmvs_tpu.ops import windows as win_ops

    B = center.shape[0]
    pad = (-B) % NB
    if pad:
        assert not isinstance(ws, win_ops.WinTState), \
            "WinTState callers must pad the batch to the lane width upstream"
        padf = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
        center = padf(center)
        normal = padf(jnp.asarray(normal, jnp.float32))
        scale = padf(scale)
        views = jnp.concatenate(
            [views, jnp.full((pad, views.shape[1]), -1, views.dtype)], 0)
        ws = jax.tree.map(padf, ws)

    st, args, extra = _prep(ctx, opt, center, normal, scale, views, ws)
    x, f = gn_refine_pallas(st, interpret=interpret, **args)
    x = x.T                                           # (B, 3)
    ref_center, ref_ray, ax_x, ax_y, ax_z = extra

    new_center = ref_center + x[:, 0:1] * ref_ray
    a1 = x[:, 1:2] * opt.ANGLE_SCALE
    a2 = x[:, 2:3] * opt.ANGLE_SCALE
    new_normal = (ax_x * (jnp.sin(a1) * jnp.cos(a2)) + ax_y * jnp.sin(a2)
                  + ax_z * (-jnp.cos(a1) * jnp.cos(a2)))
    ok = jnp.sum(views >= 0, axis=1) >= opt.MIN_IMAGES_PER_PATCH
    out = (new_center, new_normal, ok, f[0])
    if pad:
        out = tuple(a[:B] for a in out)
    return out
