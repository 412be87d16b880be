"""Worker process for the multi-host (2-process jax.distributed) test.

Launched twice by tests/test_multihost.py: each process owns 4 virtual CPU
devices of a global 8-device ('dp','sp') mesh, exactly the SURVEY.md
section 4 prescription (jax.distributed local multiprocess + mesh over CPU
devices as the fake backend for distributed logic). Process 0 is the
coordinator. Scheduler state ownership: every process deterministically
rebuilds the same scene/batch (the host scheduler is replicated state,
like the reference's shared tree across OpenMP threads); device arrays are
global jax.Arrays assembled per process from its addressable shards.

Usage: python multihost_worker.py <process_id> <port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

PID = int(sys.argv[1])
PORT = int(sys.argv[2])
jax.distributed.initialize(f"127.0.0.1:{PORT}", num_processes=2,
                           process_id=PID)

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hpmvs_tpu.config import Options  # noqa: E402
from hpmvs_tpu.runtime import pipeline as _pl  # noqa: E402

_pl.enable_compile_cache()   # compiles dominate this worker's runtime
from hpmvs_tpu.core import depth as depth_mod  # noqa: E402
from hpmvs_tpu.core import scene as scene_mod  # noqa: E402
from hpmvs_tpu.ops import optimizer as popt  # noqa: E402
from hpmvs_tpu.parallel import mesh as pmesh  # noqa: E402
from hpmvs_tpu.testing import make_plane_scene  # noqa: E402


def main():
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    opt = dataclasses.replace(Options(), START_LEVEL=1, MAXLEVEL=3,
                              MAX_VIEWS=6, COVIS_MIN_POINTS=10, LM_ITERS=4)
    ps = make_plane_scene(n_cams=4, imgsize=96, n_points=24, seed=0)
    scene = scene_mod.build_scene(ps.model, opt, images=ps.images)
    pack = depth_mod.build_depth_pack(np.asarray(scene.ctx.imgs.width),
                                      np.asarray(scene.ctx.imgs.height),
                                      opt.DEPTH_SUBSAMPLE)
    c, n, s, v, _ = scene_mod.make_seed_patches(ps.model, scene, opt)

    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("dp", "sp"))
    shard = NamedSharding(mesh, P(("dp", "sp")))
    repl = NamedSharding(mesh, P())

    (cp, np_, sp_, vp), B = pmesh.pad_to_multiple(
        (c, n, s, v), len(c), 8, (0.0, 0.0, 0.0, -1))

    def g(arr, sh=shard):
        arr = np.asarray(arr)
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda idx: arr[idx])

    # 1) full sharded wavefront step across both processes
    step, _ = pmesh.sharded_optimize_step(mesh, scene.ctx, opt, pack)
    out = step(g(cp), g(np_), g(sp_), g(vp), g(pack.depth, repl))

    def gather(x):
        """Sharded output -> replicated -> host (cross-process all-gather)."""
        return np.asarray(jax.device_get(
            jax.jit(lambda a: a, out_shardings=repl)(x)))

    oc, on, os_, ov, ok = (gather(x) for x in out[:5])
    depth = np.asarray(jax.device_get(out[6]))  # replicated -> readable

    # cross-process depth correctness: the pmin-merged buffer equals a
    # single-process set_depths over the same accepted patches
    ref = popt.optimize_batch(scene.ctx, opt, jnp.asarray(cp),
                              jnp.asarray(np_), jnp.asarray(sp_),
                              jnp.asarray(vp))
    ref_ok = np.asarray(ref[4])
    assert (ok == ref_ok).all(), "sharded ok mask differs from single-process"
    v_ok = np.where(ref_ok[:, None], np.asarray(ref[3]), -1)
    ref_pack = depth_mod.set_depths(pack, scene.ctx.cams, ref[0], ref[2],
                                    jnp.asarray(v_ok))
    np.testing.assert_allclose(depth, np.asarray(ref_pack.depth), atol=1e-5)
    assert (depth < depth_mod.MAX_DEPTH).sum() > 0

    # 2) halo exchange across the process boundary: patches from process-0
    # shards (devices 0-3) target process-1 shards (devices 4-7) and back
    payload = np.zeros((B, 4), np.float32)
    payload[:, 0] = np.arange(B)
    blocks = (np.arange(B) % 8).astype(np.int32)
    blocks = ((blocks + 4) % 8).astype(np.int32)  # everyone sends across
    recv, valid, dropped = pmesh.make_halo_exchange(mesh, 8, B // 8)(
        g(blocks), g(payload))
    lv = gather(valid)
    lr = gather(recv)
    assert int(dropped) == 0
    got = sorted(lr[lv][:, 0].astype(int).tolist())
    assert got == list(range(B)), got

    # 3) termination psum across both processes (each of the 8 shards holds
    # its own queue count; the psum must see all of them)
    counts = np.arange(1, 9, dtype=np.int32)
    total = pmesh.have_work_psum(mesh, g(counts))
    assert total == 36, total

    # 4) FULL spatially-sharded engine across both processes: every process
    # runs the identical replicated host scheduler; device batches are
    # global (dp,sp)-sharded arrays; results allgather back (Engine._fetch).
    # The expected patch count comes from the launcher's single-process
    # 8-virtual-device run of the SAME mesh shape -- the multi-controller
    # run must reproduce it exactly.
    expected_alive = int(sys.argv[3]) if len(sys.argv) > 3 else -1
    from hpmvs_tpu.runtime.spatial import SpatialEngine
    pm = pmesh.Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "sp"))
    eng = SpatialEngine(ps.model, opt, images=ps.images, mesh=pm)
    eng.seed()
    start = min(eng.queue) if eng.queue else 0
    for prio in range(start, start + 25):
        eng.process_priority_step(prio)
        if not eng.have_work():
            break
    n_alive = eng.n_alive()
    from jax.experimental import multihost_utils
    counts = multihost_utils.process_allgather(
        np.asarray([n_alive], np.int64))
    assert (np.asarray(counts) == n_alive).all(), \
        f"process patch counts diverge: {np.asarray(counts)}"
    if expected_alive >= 0:
        assert n_alive == expected_alive, (n_alive, expected_alive)

    # 5) OWNED multi-host engine (runtime/owned.py): per-process scheduler
    # state partitioned by Morton range; patch records cross processes only
    # inside the halo payload; z-buffer updates gathered (the one shared
    # structure, Scene.h:75-76). Each process must hold a REAL share of the
    # patches (not a replica), and the merged total must match the
    # replicated run statistically.
    from hpmvs_tpu.runtime.owned import OwnedSpatialEngine
    eng2 = OwnedSpatialEngine(ps.model, opt, images=ps.images, mesh=pm)
    eng2.seed()
    # starting priority must be the GLOBAL queue minimum (a process's local
    # queue may be empty or start later)
    start2 = eng2._agree_pmin(np.iinfo(np.int64).max - 1)
    start2 = 0 if start2 is None else int(start2)
    # 10 steps: this proves the distributed MECHANICS (partitioned stores,
    # halo-only crossings, lockstep collectives); owned-vs-replicated
    # output parity is proven cheaply single-process by
    # tests/test_owned_parity.py (the gloo-coordinated 2-process CPU
    # dispatches cost seconds each on this 2-core box)
    for prio in range(start2, start2 + 10):
        eng2.process_priority_step(prio)
        if not eng2.have_work():
            break
    nl = eng2.n_alive_local()
    counts2 = np.asarray(multihost_utils.process_allgather(
        np.asarray([nl], np.int64)))[:, 0]
    total2 = int(counts2.sum())
    # partitioned, not replicated: every process holds a nontrivial share
    assert counts2.min() > 0, counts2
    assert counts2.max() < total2, counts2
    # ownership invariant: every local patch's block belongs to this process
    pp = eng2.patches
    live2 = np.nonzero(pp.alive[:pp.n])[0]
    own = eng2.block_proc[eng2.block_of_points(pp.center[live2])]
    assert (own == PID).all(), "foreign patches in local store"
    # the merged global cloud gathers identically on every process
    cg = eng2.alive_arrays()[0]
    assert len(cg) == total2
    assert total2 > 24   # grew beyond the seeds: extends/halo worked

    # 6) owned + image_subsets run TO COMPLETION: the full wavefront loop
    # with partitioned host state AND per-block camera slabs drains all
    # work; the merged cloud statistically matches the launcher's completed
    # single-process reference; every process keeps a real (~1/P) share of
    # the patches throughout. (CellProcessor.h:60-68 ownership structure
    # driven to the reference's own stopping condition, main.cpp:174-180.)
    exp_final = int(sys.argv[4]) if len(sys.argv) > 4 else -1
    opt3 = dataclasses.replace(opt, MAX_TREE_LEVEL=8)
    eng3 = OwnedSpatialEngine(ps.model, opt3, images=ps.images, mesh=pm,
                              image_subsets=True)
    eng3.seed()
    share_floor_ok = True
    for prio in range(opt3.max_prio):
        eng3.process_priority_step(prio)
        if prio % 20 == 19:
            cts = np.asarray(multihost_utils.process_allgather(np.asarray(
                [eng3.n_alive_local()], np.int64)))[:, 0]
            if cts.sum() > 40 and cts.min() < 0.05 * cts.sum():
                share_floor_ok = False
        if not eng3.have_work():
            break
    nl3 = eng3.n_alive_local()
    counts3 = np.asarray(multihost_utils.process_allgather(
        np.asarray([nl3], np.int64)))[:, 0]
    total3 = int(counts3.sum())
    assert share_floor_ok, "a process's share collapsed mid-run"
    assert counts3.min() > 0.1 * total3, counts3
    live3 = np.nonzero(eng3.patches.alive[:eng3.patches.n])[0]
    own3 = eng3.block_proc[eng3.block_of_points(eng3.patches.center[live3])]
    assert (own3 == PID).all(), "foreign patches in local store"
    if exp_final >= 0:
        assert abs(total3 - exp_final) <= max(0.15 * exp_final, 10), \
            (total3, exp_final)
    cg3, ng3, _, sg3, vg3, _ = eng3.alive_arrays()
    assert len(cg3) == total3
    # plane-scene ground truth: surface z == 0 within spatial tolerance
    z_rms = float(np.sqrt(np.mean(cg3[:, 2] ** 2)))
    assert z_rms < 0.05, z_rms

    # 7) owned-mode cameras+patches dense BA (parallel/ba.py:483-496 owned
    # branch, BASELINE.json north-star wording): record observations under
    # the true cameras, perturb all but two gauge anchors (deterministic
    # rng -> identical on both processes), re-solve jointly -> cameras
    # recover and reprojection RMS collapses.
    from hpmvs_tpu.parallel import ba as ba_mod
    from hpmvs_tpu.testing import _quatR, _rot_to_quat
    import copy
    true_model = eng3.model
    true_centers = np.asarray([c.c for c in true_model.cameras])
    prob_true = ba_mod.build_dense_problem(true_model, cg3, vg3)
    rng = np.random.default_rng(11)
    pert_model = copy.deepcopy(true_model)
    for cam in pert_model.cameras[2:]:
        w = rng.normal(0, 0.004, 3)
        th = np.linalg.norm(w) + 1e-12
        Km = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                       [-w[1], w[0], 0]]) / th
        dR = np.eye(3) + np.sin(th) * Km + (1 - np.cos(th)) * (Km @ Km)
        cam.rq = _rot_to_quat(_quatR(cam.rq) @ dR)
        cam.c = cam.c + rng.normal(0, 0.01, 3)
    pre_err = np.linalg.norm(np.asarray(
        [c.c for c in pert_model.cameras]) - true_centers, axis=1)
    eng3.model = pert_model
    prob = ba_mod.build_dense_problem(pert_model, cg3, vg3)._replace(
        m_uv=prob_true.m_uv)
    hist = np.asarray(ba_mod.apply_dense_ba(eng3, problem=prob))
    assert hist[-1] < hist[0] / 3.0, hist
    post_err = np.linalg.norm(np.asarray(
        [c.c for c in eng3.model.cameras]) - true_centers, axis=1)
    assert np.median(post_err[2:]) < np.median(pre_err[2:]) / 2.0, \
        (pre_err, post_err)

    print(f"MULTIHOST_OK pid={PID} accepted={int(ok.sum())} "
          f"depth_cells={int((depth < depth_mod.MAX_DEPTH).sum())} "
          f"engine_alive={n_alive} migrated={eng.stats['migrated']} "
          f"owned_local={nl} owned_total={total2} "
          f"owned_collectives={eng2.stats['host_collectives']} "
          f"owned_complete_total={total3} owned_complete_zrms={z_rms:.4f} "
          f"owned_ba_rms={hist[0]:.3f}->{hist[-1]:.3f}")


if __name__ == "__main__":
    main()
