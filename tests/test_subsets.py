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


def test_subset_parity_with_replicated():
    """image_subsets=True must reproduce the replicated-image spatial run
    STATISTICALLY (count within 5%, equal plane quality): the conservative
    assignment gives every block-resident patch all the views it can
    geometrically use, and absent cameras are rejected by the zeroed
    width/height tables exactly where the in-bounds gates already rejected
    them.

    Parity is statistical, not bitwise (same form and reason as
    test_spatial.test_spatial_parity_with_single_device): the dynamic block
    assignment is path-dependent -- without subsets the engine re-LPT-packs
    blocks every round, with subsets it uses contiguous quantile cuts plus
    REBALANCE_BELOW hysteresis -- so lane order differs between the two
    runs, XLA reduction order flips near-threshold NCC gates, and the
    first-wins insertion dedup can resolve collisions differently
    (round-3 measured delta on this scene: 199 vs 201 alive, 1%)."""
    opt, ps = _tiny()
    mesh = pmesh.make_mesh(8, shape=(4, 2))
    e0 = _run(SpatialEngine(ps.model, opt, images=ps.images, mesh=mesh))
    e1 = _run(SpatialEngine(ps.model, opt, images=ps.images, mesh=mesh,
                            image_subsets=True))
    assert e1.stats["subset_rows_per_block"] > 0
    n0, n1 = e0.n_alive(), e1.n_alive()
    assert abs(n1 - n0) <= max(0.05 * n0, 5), (n0, n1)
    d0 = np.abs(e0.alive_arrays()[0][:, 2] - ps.plane_z)
    d1 = np.abs(e1.alive_arrays()[0][:, 2] - ps.plane_z)
    rms0 = float(np.sqrt((d0 ** 2).mean()))
    rms1 = float(np.sqrt((d1 ** 2).mean()))
    assert rms1 <= rms0 * 1.1 + 1e-4, (rms0, rms1)


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
