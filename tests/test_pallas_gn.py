"""The fused Pallas Gauss-Newton kernel must match the XLA refiner.

Runs the kernel in pallas interpret mode on CPU (the TPU lowering is
exercised by bench.py on hardware); tolerances cover the kernel's bf16
window reads (exact for level-0 uint8 pixels, ~0.4% relative on averaged
pyramid levels)."""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpmvs_tpu.config import Options
from hpmvs_tpu.core import scene as scene_mod
from hpmvs_tpu.ops import optimizer as popt
from hpmvs_tpu.ops import pallas_gn
from hpmvs_tpu.testing import make_plane_scene


@pytest.fixture(scope="module")
def setup():
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=30, LM_ITERS=3)
    ps = make_plane_scene(n_cams=7, imgsize=256, n_points=60, seed=0)
    scene = scene_mod.build_scene(ps.model, opt, images=ps.images)
    c, n, s, v, _ = scene_mod.make_seed_patches(ps.model, scene, opt)
    B = 16
    idx = np.arange(B) % len(c)
    rng = np.random.default_rng(0)
    cc = jnp.asarray(c[idx] + rng.normal(0, 0.002, (B, 3)).astype(np.float32))
    nn, ss, vv = jnp.asarray(n[idx]), jnp.asarray(s[idx]), jnp.asarray(v[idx])
    pre = jax.vmap(functools.partial(popt._run_pre, scene.ctx, opt))(
        cc, nn, ss, vv)
    return opt, scene, ps, pre, ss


def test_kernel_matches_xla_refiner(setup):
    opt, scene, ps, (c0, n0, v1, ok0, ws), ss = setup
    opt = dataclasses.replace(opt, LM_EXACT_J=False)  # FD-path parity
    xc, xn, xok, xf = jax.vmap(
        functools.partial(popt._optimize_patch, scene.ctx, opt))(
        c0, n0, ss, v1, ws)
    kc, kn, kok, kf = pallas_gn.gn_refine_batch(
        scene.ctx, opt, c0, n0, ss, v1, ws, interpret=True)
    assert bool(jnp.all(xok == kok))
    np.testing.assert_allclose(np.asarray(kc), np.asarray(xc), atol=2e-3)
    np.testing.assert_allclose(np.asarray(kn), np.asarray(xn), atol=5e-3)
    np.testing.assert_allclose(np.asarray(kf), np.asarray(xf), atol=5e-3)


def test_kernel_converges_to_plane(setup):
    opt, scene, ps, (c0, n0, v1, ok0, ws), ss = setup
    kc, kn, kok, kf = pallas_gn.gn_refine_batch(
        scene.ctx, opt, c0, n0, ss, v1, ws, interpret=True)
    good = np.asarray(kok & ok0)
    assert good.sum() >= 8
    d = np.abs(np.asarray(kc)[good, 2] - ps.plane_z)
    assert np.median(d) < 0.02


def test_kernel_pads_ragged_batch(setup):
    opt, scene, ps, (c0, n0, v1, ok0, ws), ss = setup
    B = 5  # not a multiple of the kernel block
    out = pallas_gn.gn_refine_batch(
        scene.ctx, opt, c0[:B], n0[:B], ss[:B], v1[:B],
        jax.tree.map(lambda a: a[:B], ws), interpret=True)
    full = pallas_gn.gn_refine_batch(
        scene.ctx, opt, c0, n0, ss, v1, ws, interpret=True)
    for a, b in zip(out, full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b[:B]),
                                   atol=1e-6)


def test_exact_jacobian_descends_and_beats_fd(setup):
    """The analytic-Jacobian Levenberg path (LM_EXACT_J) must (a) accept its
    very first GN step for nearly every patch -- a wrong gradient would make
    the predicted descent direction fail - and (b) converge at least as well
    as the FD/Broyden path at the same pass budget."""
    opt, scene, ps, (c0, n0, v1, ok0, ws), ss = setup
    good = np.asarray(ok0)

    one = dataclasses.replace(opt, LM_EXACT_J=True, LM_ITERS_EXACT=1)
    _, _, _, f1 = pallas_gn.gn_refine_batch(
        scene.ctx, opt=one, center=c0, normal=n0, scale=ss, views=v1, ws=ws,
        interpret=True)
    zero = dataclasses.replace(opt, LM_EXACT_J=True, LM_ITERS_EXACT=0)
    _, _, _, f0 = pallas_gn.gn_refine_batch(
        scene.ctx, opt=zero, center=c0, normal=n0, scale=ss, views=v1, ws=ws,
        interpret=True)
    f0, f1 = np.asarray(f0)[good], np.asarray(f1)[good]
    assert (f1 <= f0 + 1e-7).all()
    assert (f1 < f0 - 1e-6).mean() >= 0.8

    ex = dataclasses.replace(opt, LM_EXACT_J=True, LM_ITERS_EXACT=6)
    ec, en, eok, ef = pallas_gn.gn_refine_batch(
        scene.ctx, opt=ex, center=c0, normal=n0, scale=ss, views=v1, ws=ws,
        interpret=True)
    fd = dataclasses.replace(opt, LM_EXACT_J=False, LM_ITERS=6)
    _, _, _, ff = pallas_gn.gn_refine_batch(
        scene.ctx, opt=fd, center=c0, normal=n0, scale=ss, views=v1, ws=ws,
        interpret=True)
    ef_, ff_ = np.asarray(ef)[good], np.asarray(ff)[good]
    assert ef_.mean() <= ff_.mean() + 1e-4
    d = np.abs(np.asarray(ec)[np.asarray(eok) & good, 2] - ps.plane_z)
    assert np.median(d) < 0.02


def test_analytic_jacobian_matches_fd(setup):
    """The exact-J kernel's analytic Jacobian (grad_pass) must match central
    finite differences of its own objective (debug_j emits rho + J at x0)."""
    opt, scene, ps, (c0, n0, v1, ok0, ws), ss = setup
    B = c0.shape[0]
    pad = 128 - B
    padf = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], 0)
    center = padf(c0)
    normal = padf(jnp.asarray(n0, jnp.float32))
    scale = padf(ss)
    views = jnp.concatenate(
        [v1, jnp.full((pad, v1.shape[1]), -1, v1.dtype)], 0)
    ws_p = jax.tree.map(padf, ws)
    st, args, _ = pallas_gn._prep(scene.ctx, opt, center, normal, scale,
                                  views, ws_p)
    std = st._replace(debug_j=True)
    _, _, JT, _ = pallas_gn.gn_refine_pallas(std, interpret=True, **args)
    J = np.asarray(JT).reshape(3, std.K, -1)[:, :, :B]

    for p in range(3):
        eps = 1e-3 if p == 0 else 1e-2
        e = jnp.zeros_like(args["x0T"]).at[p].set(eps)
        a2 = dict(args)
        a2["x0T"] = args["x0T"] + e
        _, _, _, rp = pallas_gn.gn_refine_pallas(std, interpret=True, **a2)
        a2["x0T"] = args["x0T"] - e
        _, _, _, rm = pallas_gn.gn_refine_pallas(std, interpret=True, **a2)
        fd = (np.asarray(rp)[:, :B] - np.asarray(rm)[:, :B]) / (2 * eps)
        m = (np.abs(fd) > 1e-5) | (np.abs(J[p]) > 1e-5)
        assert m.sum() > 20
        rel = np.abs(J[p] - fd)[m] / np.maximum(np.abs(fd[m]), 1e-4)
        # FD is itself noisy across hat-function kinks: median must be tight
        assert np.median(rel) < 0.05, (p, np.median(rel))


def test_exact_kernel_matches_xla_exact(setup):
    """Exact-J kernel vs the XLA exact-J refiner (jax.jacfwd): same
    algorithm, two independent gradient implementations -- refined geometry
    must agree to window-bf16 tolerance."""
    opt, scene, ps, (c0, n0, v1, ok0, ws), ss = setup
    opt = dataclasses.replace(opt, LM_EXACT_J=True, LM_ITERS_EXACT=4)
    xc, xn, xok, xf = jax.vmap(
        functools.partial(popt._optimize_patch, scene.ctx, opt))(
        c0, n0, ss, v1, ws)
    kc, kn, kok, kf = pallas_gn.gn_refine_batch(
        scene.ctx, opt, c0, n0, ss, v1, ws, interpret=True)
    assert bool(jnp.all(xok == kok))
    np.testing.assert_allclose(np.asarray(kc), np.asarray(xc), atol=2e-3)
    np.testing.assert_allclose(np.asarray(kn), np.asarray(xn), atol=5e-3)
    np.testing.assert_allclose(np.asarray(kf), np.asarray(xf), atol=5e-3)
