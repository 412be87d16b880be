import numpy as np
import jax.numpy as jnp
import pytest

from hpmvs_tpu.parallel import ba
from hpmvs_tpu.parallel import mesh as pmesh
from hpmvs_tpu.testing import make_plane_scene, _quatR


def _perturb(model, rng, rot=0.004, trans=0.01, pts=0.01, keep=1):
    import copy
    out = copy.deepcopy(model)
    for cam in out.cameras[keep:]:  # keep gauge-anchor cameras untouched
        w = rng.normal(0, rot, 3)
        th = np.linalg.norm(w) + 1e-12
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                      [-w[1], w[0], 0]]) / th
        dR = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
        R = _quatR(cam.rq) @ dR
        from hpmvs_tpu.testing import _rot_to_quat
        cam.rq = _rot_to_quat(R)
        cam.c = cam.c + rng.normal(0, trans, 3)
    out.points_xyz = out.points_xyz + rng.normal(0, pts,
                                                 out.points_xyz.shape)
    return out


@pytest.fixture(scope="module")
def ba_setup():
    scene = make_plane_scene(n_cams=6, imgsize=256, n_points=120, seed=17)
    rng = np.random.default_rng(3)
    noisy = _perturb(scene.model, rng)
    prob = ba.build_problem(noisy)
    return scene, noisy, prob


def test_ba_reduces_reprojection_error(ba_setup):
    """Perturbed cameras+points; measurements from the true geometry ->
    BA must drive reprojection RMS down by >10x."""
    scene, noisy, prob = ba_setup
    n_cams = len(noisy.cameras)
    n_pts = noisy.n_points
    cam, pts, hist = ba.ba_solve(prob, n_cams, n_pts, iters=8, cg_iters=40)
    hist = np.asarray(hist)
    assert hist[0] > 1.0          # perturbation produced real error (pixels)
    assert hist[-1] < hist[0] * 0.1
    assert hist[-1] < 0.5         # sub-pixel residual after refinement

    # gauge: fixing camera 0 still leaves a scale freedom (scaling about its
    # center preserves its projections), so compare structure up to gauge:
    # the refined points must be (nearly) coplanar again, unlike the noisy
    # input
    def plane_rms(p):
        c = p - p.mean(0)
        return np.linalg.svd(c, compute_uv=False)[-1] / np.sqrt(len(p))

    pts = np.asarray(pts)
    assert plane_rms(pts) < 0.5 * plane_rms(noisy.points_xyz)
    assert plane_rms(pts) < 0.005


def test_ba_sharded_matches_single(ba_setup):
    """8-device Schur BA == single-device BA (same math, psum'd reduces)."""
    scene, noisy, prob = ba_setup
    n_cams = len(noisy.cameras)
    n_pts = noisy.n_points
    mesh = pmesh.make_mesh(8, shape=(2, 4))
    probs = ba.shard_problem(prob, 8)
    cam_s, pts_s, hist_s = ba.ba_solve_sharded(mesh, probs, n_cams, n_pts,
                                               iters=4, cg_iters=30)
    # single device on the SAME padded problem (weights zero on pads)
    cam_1, pts_1, hist_1 = ba.ba_solve(prob, n_cams, n_pts, iters=4,
                                       cg_iters=30)
    np.testing.assert_allclose(np.asarray(hist_s)[0], np.asarray(hist_1)[0],
                               rtol=1e-3)
    # both reach comparable final residuals and similar camera solutions
    assert np.asarray(hist_s)[-1] < np.asarray(hist_s)[0]
    np.testing.assert_allclose(np.asarray(cam_s), np.asarray(cam_1),
                               atol=5e-3)


def test_apply_to_model_roundtrip(ba_setup):
    scene, noisy, prob = ba_setup
    n_cams = len(noisy.cameras)
    cam, pts, hist = ba.ba_solve(prob, n_cams, noisy.n_points, iters=6,
                                 cg_iters=40)
    refined = ba.apply_to_model(noisy, np.asarray(cam), np.asarray(pts))
    # rebuilt problem from the refined model has small initial RMS
    prob2 = ba.build_problem(refined)
    _, _, hist2 = ba.ba_solve(prob2, n_cams, refined.n_points, iters=1,
                              cg_iters=5)
    assert float(np.asarray(hist2)[0]) < 1.5 * float(np.asarray(hist)[-1]) + 0.1


@pytest.mark.slow
def test_periodic_dense_ba_recovers_midrun_drift(plane_scene, tmp_path):
    """--ba_dense_every as a REFINEMENT mode inside the progressive loop:
    the first periodic pass stamps creation-time observations
    (ba.DenseObsStore), cameras then drift mid-run (streaming-SfM-update
    stand-in, injected via snapshot_hook), and the next periodic pass must
    pull the cameras back toward truth because the pre-drift observations
    constrain the joint solve. No reference referent (north-star mode)."""
    import dataclasses
    from hpmvs_tpu.config import Options
    from hpmvs_tpu.geom import camera as cam_ops
    from hpmvs_tpu.runtime import pipeline

    opt = dataclasses.replace(Options(), START_LEVEL=2, MAXLEVEL=4,
                              COVIS_MIN_POINTS=10, MAX_TREE_LEVEL=6,
                              OUTFOLDER=str(tmp_path))
    true_model = plane_scene.model
    true_centers = np.asarray([c.c for c in true_model.cameras])
    state = {"injected": False, "pre_err": None}

    def inject_drift(engine, prio):
        # after the prio-29 BA pass stamped the early patches, drift every
        # camera but the two gauge anchors; rebuild the device camera SoA
        # exactly as a streaming SfM update would
        if prio != 35 or state["injected"]:
            return
        rng = np.random.default_rng(21)
        pert = _perturb(engine.model, rng, rot=0.002, trans=0.005, pts=0.0,
                        keep=2)
        pert.points_xyz = engine.model.points_xyz
        engine.model = pert
        widths = [int(w) for w in engine.scene.width_np[:, 0]]
        heights = [int(h) for h in engine.scene.height_np[:, 0]]
        cams = cam_ops.build_cameras(pert.cameras, widths, heights,
                                     engine.opt.MAXLEVEL)
        engine.scene = engine.scene._replace(
            ctx=engine.scene.ctx._replace(cams=cams))
        engine.refresh_host_caches()
        state["injected"] = True
        state["pre_err"] = np.linalg.norm(
            np.asarray([c.c for c in pert.cameras]) - true_centers, axis=1)

    eng = pipeline.run(true_model, opt, images=plane_scene.images,
                       mesh=None, ba_dense_every=2,
                       snapshot_hook=inject_drift)
    assert state["injected"], "drift hook never fired"
    assert eng.n_alive() > 200
    post_err = np.linalg.norm(
        np.asarray([c.c for c in eng.model.cameras]) - true_centers, axis=1)
    pre = np.median(state["pre_err"][2:])
    assert np.median(post_err[2:]) < pre / 2.0, (state["pre_err"], post_err)
    # the final cloud stays on the true surface despite the mid-run drift
    p = eng.patches
    pids = np.nonzero(p.alive[:p.n])[0]
    z = np.abs(p.center[pids][:, 2] - plane_scene.plane_z)
    assert float(np.sqrt((z ** 2).mean())) < 0.02


@pytest.mark.slow
def test_dense_ba_recovers_cameras_and_patches(plane_scene, tmp_path):
    """Cameras+PATCHES BA (north star; no reference referent): densify with
    true cameras, record the patch observations, perturb every camera but
    the gauge anchor, re-solve with parallel.ba.apply_dense_ba -> cameras
    recover, reprojection RMS collapses, patch quality survives."""
    import dataclasses
    from hpmvs_tpu.config import Options
    from hpmvs_tpu.runtime import pipeline

    opt = dataclasses.replace(Options(), START_LEVEL=2, MAXLEVEL=4,
                              COVIS_MIN_POINTS=10, MAX_TREE_LEVEL=6,
                              OUTFOLDER=str(tmp_path))
    eng = pipeline.run(plane_scene.model, opt, images=plane_scene.images,
                       mesh=None)
    assert eng.n_alive() > 200
    p = eng.patches
    pids = np.nonzero(p.alive[:p.n])[0]
    true_model = eng.model
    true_centers = np.asarray([c.c for c in true_model.cameras])

    # observations recorded under the TRUE cameras (creation time)
    prob_true = ba.build_dense_problem(true_model, p.center[pids],
                                       p.views[pids])

    # cameras drift (streaming SfM updates); reprojection-only BA has a
    # 7-DoF similarity gauge, so TWO anchor cameras stay true (matching
    # apply_dense_ba's fix_count=2 -- one anchor leaves global scale free
    # and the solution drifts along a scale-about-the-anchor direction)
    rng = np.random.default_rng(5)
    pert_model = _perturb(true_model, rng, rot=0.004, trans=0.01, pts=0.0,
                          keep=2)
    eng.model = pert_model
    prob = ba.build_dense_problem(pert_model, p.center[pids],
                                  p.views[pids])._replace(
        m_uv=prob_true.m_uv)   # perturbed init, true observations

    pre_err = np.linalg.norm(
        np.asarray([c.c for c in pert_model.cameras]) - true_centers, axis=1)
    z0 = np.abs(p.center[pids][:, 2] - plane_scene.plane_z)
    hist = ba.apply_dense_ba(eng, problem=prob)
    hist = np.asarray(hist)

    # reprojection RMS collapses (>5x)
    assert hist[-1] < hist[0] / 5.0, hist
    # cameras recover: median center error shrinks >= 3x
    post_err = np.linalg.norm(
        np.asarray([c.c for c in eng.model.cameras]) - true_centers, axis=1)
    assert np.median(post_err[2:]) < np.median(pre_err[2:]) / 3.0, (
        pre_err, post_err)
    # patch quality survives the joint re-solve
    z1 = np.abs(eng.patches.center[pids][:, 2] - plane_scene.plane_z)
    assert np.sqrt((z1 ** 2).mean()) < max(np.sqrt((z0 ** 2).mean()) * 1.3,
                                           0.01)
    # depth buffers were replayed under the new geometry
    d = np.asarray(eng.pack.depth)
    assert (d < 999.0).any()
