"""Per-block image subsets (parallel/subsets.py): assignment is
conservative, the sharded-slab dispatch path reproduces the replicated
result, and the slabs actually shrink the per-device working set."""

import dataclasses

import numpy as np
import pytest

from hpmvs_tpu.config import Options
from hpmvs_tpu.core import scene as scene_mod
from hpmvs_tpu.parallel import mesh as pmesh
from hpmvs_tpu.parallel import subsets
from hpmvs_tpu.runtime.spatial import SpatialEngine
from hpmvs_tpu.testing import make_plane_scene


def _tiny():
    opt = dataclasses.replace(Options(), START_LEVEL=1, MAXLEVEL=3,
                              MAX_VIEWS=6, COVIS_MIN_POINTS=10, LM_ITERS=4)
    ps = make_plane_scene(n_cams=4, imgsize=96, n_points=24, seed=0)
    return opt, ps


def _run(eng, steps=25):
    eng.seed()
    start = min(eng.queue) if eng.queue else 0
    for prio in range(start, start + steps):
        eng.process_priority_step(prio)
        if not eng.have_work():
            break
    return eng


class _FullSlabEngine(SpatialEngine):
    """Subsets engine whose slabs are forced to the full pack on every
    shard: semantically identical to the replicated engine, but running
    the IDENTICAL assignment policy + hysteresis path as true subsets --
    the pinned-assignment control for the parity test."""
    def _resident_view_mask(self):
        out = super()._resident_view_mask()
        out[:] = True
        return out


def test_subset_parity_with_replicated():
    """image_subsets=True must reproduce the replicated-image result. With
    the block->shard assignment PINNED (a full-slab subsets twin, identical
    quantile+hysteresis policy), parity is BITWISE: the slab mechanism --
    per-shard row slices, remapped row0 tables, zeroed absent cameras --
    changes nothing the kernels compute.

    Diagnosis of the r3/r4 red statistical test (2026-08, this scene):
    replicated=137 vs subsets=130 alive came entirely from the ASSIGNMENT
    POLICY, not the slabs. Without subsets the engine re-LPT-packs blocks
    every round; with subsets it uses xy-quantile cuts + REBALANCE_BELOW
    hysteresis (runtime/spatial._update_assignment), so the two runs
    migrate different patches (116 vs 77 on this scene) and migrated
    arrivals legitimately skip regularization (flatness_=0,
    CellProcessor.cpp:513-514) -- a path-dependent policy divergence with
    no referent bug. The full-slab twin reproduces the subsets run
    bitwise (alive counts, centers, every stat), proving slab innocence;
    the cross-POLICY spread is measured over seeds in
    bench/subset_divergence.json (bench/subset_divergence_study.py)."""
    opt, ps = _tiny()
    mesh = pmesh.make_mesh(8, shape=(4, 2))
    e0 = _run(_FullSlabEngine(ps.model, opt, images=ps.images, mesh=mesh,
                              image_subsets=True))
    e1 = _run(SpatialEngine(ps.model, opt, images=ps.images, mesh=mesh,
                            image_subsets=True))
    assert e1.stats["subset_rows_per_block"] > 0
    # the true subsets run must prune rows vs the full-pack twin
    assert (e1.stats["subset_rows_per_block"]
            <= e0.stats["subset_rows_per_block"])
    # no dispatched view slot may ever lack its camera in the committed
    # slab (the r4 hypothesis hole: camera_depth_bounds truncation
    # dropping inherited views of migrated/extended candidates)
    assert e1.stats.get("slab_miss", 0) == 0
    n0, n1 = e0.n_alive(), e1.n_alive()
    assert n0 == n1, (n0, n1)
    c0 = np.sort(e0.alive_arrays()[0], axis=0)
    c1 = np.sort(e1.alive_arrays()[0], axis=0)
    np.testing.assert_array_equal(c0, c1)
    d1 = np.abs(e1.alive_arrays()[0][:, 2] - ps.plane_z)
    rms1 = float(np.sqrt((d1 ** 2).mean()))
    assert rms1 < 0.05, rms1


def test_pending_views_force_slab_coverage():
    """Adversarial depth bounds that geometrically exclude EVERY camera
    from every block: the dispatch-time pending-view union must still give
    each shard's slab all the cameras its lanes (and their covis reach)
    can touch -- slab_miss stays 0 and the run completes with patches.
    This is the exact failure mode of the r4 red parity test, forced."""
    opt, ps = _tiny()
    mesh = pmesh.make_mesh(8, shape=(4, 2))
    eng = SpatialEngine(ps.model, opt, images=ps.images, mesh=mesh,
                        image_subsets=True)
    ncam = eng.scene.n_cameras
    # bounded-but-absurd: every octant fails the depth window
    eng._depth_bounds = (np.full(ncam, 1e9), np.full(ncam, 2e9))
    _run(eng)
    assert eng.n_alive() > 0
    assert eng.stats.get("slab_miss", 0) == 0
    # coverage had to come from the pending-view (or resident) overrides
    assert (eng.stats.get("subset_pending_overrides", 0) > 0
            or eng.stats.get("subset_bound_overrides", 0) > 0)


def test_assignment_conservative_for_resident_patches():
    """Every view of every patch must be in its block's camera subset."""
    opt, ps = _tiny()
    mesh = pmesh.make_mesh(8, shape=(4, 2))
    eng = _run(SpatialEngine(ps.model, opt, images=ps.images, mesh=mesh))
    imgs = eng.scene.ctx.imgs
    mask = subsets.assign_images_to_blocks(
        eng.scene.ctx.cams, np.asarray(imgs.width)[:, 0],
        np.asarray(imgs.height)[:, 0], np.asarray(eng.tree.center),
        eng.tree.width, eng.n_blocks, eng.block_level)
    pids = np.nonzero(eng.patches.alive)[0]
    blk = eng.block_of_points(eng.patches.center[pids])
    views = eng.patches.views[pids]
    for k in range(views.shape[1]):
        v = views[:, k]
        m = v >= 0
        assert mask[blk[m], v[m]].all()


def test_assignment_prunes_far_blocks():
    """With a root cube much larger than the camera frusta, far blocks get
    strictly fewer cameras."""
    opt, ps = _tiny()
    scene = scene_mod.build_scene(ps.model, opt, images=ps.images)
    imgs = scene.ctx.imgs
    w0 = np.asarray(imgs.width)[:, 0]
    h0 = np.asarray(imgs.height)[:, 0]
    # plane sits near the origin; a 400-unit root puts most octants far
    # outside every frustum
    mask = subsets.assign_images_to_blocks(
        scene.ctx.cams, w0, h0, np.array([190.0, 190.0, 190.0]), 400.0,
        n_blocks=8, block_level=1)
    assert mask.sum() < mask.size  # some (block, cam) pairs pruned
    assert mask.sum(1).max() <= mask.shape[1]
    bp = subsets.build_block_packs(
        subsets.ImagePack(*(np.asarray(a) for a in imgs)), mask)
    # absent cameras have zeroed dims -> in-bounds gates reject them
    absent_b, absent_c = np.nonzero(~mask)
    assert len(absent_b) > 0
    assert (bp.width[absent_b, absent_c] == 0).all()
    assert (bp.height[absent_b, absent_c] == 0).all()


def test_slabs_shrink_for_disjoint_frusta():
    """Two cameras looking at opposite corners of the root: no block needs
    both, so the per-device slab is half the replicated pack (the padded
    slab height is the MAX over blocks -- the per-device HBM ceiling)."""
    from typing import NamedTuple

    f, w, h = 100.0, 64, 64

    def pmat(C, flip):
        # axis-aligned pinhole at C looking along +/-z
        K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
        R = np.diag([1.0, 1.0, 1.0]) if not flip else np.diag([1.0, -1.0, -1.0])
        return K @ np.hstack([R, -R @ np.asarray(C, float)[:, None]])

    class FakeCams(NamedTuple):
        P: np.ndarray

    P = np.stack([pmat([0.0, 0.0, -30.0], False),       # sees low corner
                  pmat([380.0, 380.0, 420.0], True)])   # sees high corner
    cams = FakeCams(P=P[:, None])                        # (2, 1, 3, 4)
    mask = subsets.assign_images_to_blocks(
        cams, np.array([w, w]), np.array([h, h]),
        np.array([190.0, 190.0, 190.0]), 400.0, n_blocks=8, block_level=1)
    assert mask.any(1).any()            # every camera lands somewhere
    assert (mask.sum(1) <= 1).all()     # no block needs both cameras

    # build a fake 2-image pack: slab height must be half the global pack
    rows = 20
    gtex = np.zeros((2 * rows, 8, 3), np.float32)
    gtexb = np.zeros((2 * rows, 1, 128), np.float32)
    row0 = np.array([[0], [rows]], np.int32)
    wid = np.full((2, 1), 8, np.int32)
    hei = np.full((2, 1), rows, np.int32)
    bp = subsets.build_block_packs(
        subsets.ImagePack(gtex, gtexb, row0, wid, hei), mask)
    assert bp.tex.shape[1] == rows      # half of the 2*rows replicated pack


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
