import dataclasses

import numpy as np
import pytest

from hpmvs_tpu.config import Options
from hpmvs_tpu.io import nvm as nvm_io
from hpmvs_tpu.runtime.streaming import StreamingEngine, merge_models
from hpmvs_tpu.testing import make_plane_scene

pytestmark = pytest.mark.slow  # e2e scene test; quick run: pytest -m 'not slow'


def _split_model(scene, cam_split, pt_split):
    """Split a plane scene into two chunks (cameras and points)."""
    m = scene.model
    first = nvm_io.NvmModel(
        cameras=m.cameras[:cam_split],
        points_xyz=m.points_xyz[:pt_split],
        points_rgb=m.points_rgb[:pt_split],
        meas_start=m.meas_start[:pt_split + 1].copy(),
        meas_img=m.meas_img[:m.meas_start[pt_split]],
        meas_feat=m.meas_feat[:m.meas_start[pt_split]],
        meas_xy=m.meas_xy[:m.meas_start[pt_split]],
    )
    # first chunk must only reference its own cameras
    keep = first.meas_img < cam_split
    # rebuild CSR with filtered measurements
    starts = np.zeros(pt_split + 1, np.int64)
    mi, mf, mx = [], [], []
    for ii in range(pt_split):
        s, e = m.meas_start[ii], m.meas_start[ii + 1]
        sel = [j for j in range(s, e) if m.meas_img[j] < cam_split]
        starts[ii + 1] = starts[ii] + len(sel)
        mi.extend(m.meas_img[sel])
        mf.extend(m.meas_feat[sel])
        mx.extend(m.meas_xy[sel])
    first = dataclasses.replace(
        first, meas_start=starts, meas_img=np.asarray(mi, np.int32),
        meas_feat=np.asarray(mf, np.int32),
        meas_xy=np.asarray(mx).reshape(-1, 2))

    # second chunk: remaining cameras (local indices!) + remaining points
    # whose measurements reference the FULL camera set minus offset handling:
    # merge_models offsets chunk meas_img by the existing camera count, so
    # chunk indices are local (global - 0 for old cams is impossible; we
    # remap: measurements of new points may see old cameras too -- keep only
    # new-camera measurements for simplicity of the chunk format)
    starts2 = np.zeros(m.n_points - pt_split + 1, np.int64)
    mi2, mf2, mx2 = [], [], []
    for k, ii in enumerate(range(pt_split, m.n_points)):
        s, e = m.meas_start[ii], m.meas_start[ii + 1]
        sel = [j for j in range(s, e)]
        starts2[k + 1] = starts2[k] + len(sel)
        mi2.extend(m.meas_img[sel] - cam_split)  # local to chunk cameras
        mf2.extend(m.meas_feat[sel])
        mx2.extend(m.meas_xy[sel])
    second = nvm_io.NvmModel(
        cameras=m.cameras[cam_split:],
        points_xyz=m.points_xyz[pt_split:],
        points_rgb=m.points_rgb[pt_split:],
        meas_start=starts2,
        meas_img=np.asarray(mi2, np.int32),
        meas_feat=np.asarray(mf2, np.int32),
        meas_xy=np.asarray(mx2).reshape(-1, 2),
    )
    return first, second


def test_streaming_two_chunks():
    """Feed the scene in two chunks; the second chunk's cameras and points
    join the running reconstruction and densify further."""
    scene = make_plane_scene(n_cams=7, imgsize=192, n_points=120, seed=21)
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=15, MAX_TREE_LEVEL=6,
                              PATCH_FINAL_MINLEVEL=4, LM_ITERS=8)
    first, second = _split_model(scene, cam_split=4, pt_split=70)

    se = StreamingEngine(opt)
    n1 = se.add_chunk(first, images=scene.images[:4])
    assert n1 > 20
    se.run_to(45)
    alive_mid = se.engine.n_alive()

    # chunk 2: 3 more cameras + 50 more points (note: chunk measurements
    # reference chunk-local cameras; merge offsets them)
    n2 = se.add_chunk(second, images=scene.images[4:])
    assert n2 > 10
    assert se.engine.scene.n_cameras == 7
    eng = se.run_to(opt.max_prio - 1)

    assert eng.n_alive() > alive_mid  # new data densified the cloud
    c = eng.alive_arrays()[0]
    err = np.abs(c[:, 2] - scene.plane_z)
    assert np.median(err) < 0.02

    # depth buffers extended: old region preserved semantics (has entries)
    assert (np.asarray(eng.pack.depth) < 1000).sum() > 0


def test_merge_models_offsets():
    scene = make_plane_scene(n_cams=5, imgsize=64, n_points=30, seed=2)
    a, b = _split_model(scene, cam_split=3, pt_split=15)
    merged = merge_models(a, b)
    assert len(merged.cameras) == 5
    assert merged.n_points == 30
    # chunk measurement indices got offset back into the global camera space
    m = scene.model
    np.testing.assert_array_equal(merged.meas_img[merged.meas_start[15]:],
                                  m.meas_img[m.meas_start[15]:])
    assert merged.meas_img.max() < 5
    # CSR consistency
    assert merged.meas_start[-1] == len(merged.meas_img)


def _sort_points_by_x(m):
    """Permute a model's points by ascending x (CSR re-pack)."""
    order = np.argsort(m.points_xyz[:, 0])
    starts = np.zeros(m.n_points + 1, np.int64)
    mi, mf, mx = [], [], []
    for k, ii in enumerate(order):
        s, e = m.meas_start[ii], m.meas_start[ii + 1]
        starts[k + 1] = starts[k] + e - s
        mi.extend(m.meas_img[s:e])
        mf.extend(m.meas_feat[s:e])
        mx.extend(m.meas_xy[s:e])
    return dataclasses.replace(
        m, points_xyz=m.points_xyz[order], points_rgb=m.points_rgb[order],
        meas_start=starts, meas_img=np.asarray(mi, np.int32),
        meas_feat=np.asarray(mf, np.int32),
        meas_xy=np.asarray(mx).reshape(-1, 2))


def test_streaming_reroots_outside_cube():
    """A second chunk lying outside the first chunk's root cube grows the
    cube (linear-octree reroot) instead of being dropped (VERDICT item 9;
    the reference drops outside-root patches, CellProcessor.cpp:147)."""
    scene = make_plane_scene(n_cams=7, imgsize=256, n_points=120, seed=5)
    scene = dataclasses.replace(scene, model=_sort_points_by_x(scene.model))
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=10, MAX_TREE_LEVEL=7,
                              PATCH_FINAL_MINLEVEL=4, LM_ITERS=8)
    # chunk 1: left-half points (x < 0) -> small root cube on the left
    first, second = _split_model(scene, cam_split=4, pt_split=60)

    se = StreamingEngine(opt)
    n1 = se.add_chunk(first, images=scene.images[:4])
    assert n1 > 10
    se.run_to(45)
    width_before = se.engine.tree.width
    x_max_before = se.engine.alive_arrays()[0][:, 0].max()

    n2 = se.add_chunk(second, images=scene.images[4:])
    assert n2 > 5
    assert se.engine.stats["reroots"] >= 1
    assert se.engine.tree.width > width_before
    eng = se.run_to(opt.max_prio - 1)

    c = eng.alive_arrays()[0]
    # the right half reconstructed beyond the original cube's reach
    assert c[:, 0].max() > x_max_before + 0.1
    err = np.abs(c[:, 2] - scene.plane_z)
    assert np.median(err) < 0.02


def test_streaming_spatial_subsets_checkpoint_compose():
    """The flagship features COMPOSED (internet-scale config,
    BASELINE.json): streaming chunks with a reroot into an 8-device spatial
    engine with per-shard image subsets, checkpointed mid-run with live
    migration state, resumed, and finishing within tolerance of the
    uninterrupted run (resume semantics: CellProcessor.cpp:422-455)."""
    from hpmvs_tpu.parallel import mesh as pmesh
    from hpmvs_tpu.runtime import checkpoint as ckpt
    from hpmvs_tpu.runtime.spatial import SpatialEngine

    scene = make_plane_scene(n_cams=7, imgsize=256, n_points=120, seed=5)
    scene = dataclasses.replace(scene, model=_sort_points_by_x(scene.model))
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=10, MAX_TREE_LEVEL=7,
                              PATCH_FINAL_MINLEVEL=4, LM_ITERS=8)
    first, second = _split_model(scene, cam_split=4, pt_split=60)
    mesh = pmesh.make_mesh(8)

    def stream_to_mid():
        se = StreamingEngine(opt, mesh=mesh, spatial=True,
                             image_subsets=True)
        assert se.add_chunk(first, images=scene.images[:4]) > 10
        se.run_to(45)
        assert se.add_chunk(second, images=scene.images[4:]) > 5
        assert se.engine.stats["reroots"] >= 1        # cube actually grew
        se.run_to(55)
        return se

    # uninterrupted run
    se_a = stream_to_mid()
    assert se_a.engine.stats["migrated"] > 0          # halo state exercised
    assert se_a.engine.stats["subset_rebuilds"] >= 1  # slabs really built
    eng_a = se_a.run_to(opt.max_prio - 1)

    # interrupted run: checkpoint at the same midpoint, resume into a FRESH
    # spatial engine over the merged model, finish
    se_b = stream_to_mid()
    path = "/tmp/compose_ckpt.npz"
    ckpt.save_checkpoint(se_b.engine, path)
    eng_c = SpatialEngine(se_b.model, opt, images=se_b.images, mesh=mesh,
                          image_subsets=True)
    ckpt.load_checkpoint(eng_c, path)
    ckpt.requeue_from_tree(eng_c)
    for p in range(opt.max_prio):
        eng_c.process_priority_step(p)
        if not eng_c.have_work():
            break

    n_a, n_c = eng_a.n_alive(), eng_c.n_alive()
    assert abs(n_c - n_a) <= max(0.08 * n_a, 30), (n_a, n_c)
    ca = eng_a.alive_arrays()[0]
    cc = eng_c.alive_arrays()[0]
    for c in (ca, cc):
        err = np.abs(c[:, 2] - scene.plane_z)
        assert np.median(err) < 0.02
    # both reached past the original cube (reroot survived the checkpoint)
    assert cc[:, 0].max() > 0.1
