"""Owned-engine semantics vs the plain spatial engine, single process.

The 2-process test (test_multihost.py) proves the distributed mechanics;
this proves the owned mode's SEMANTIC divergences -- provisional-pinned
root cube, ownership-filtered seeding, remote-neighbor regularization
leniency (inert at P=1), quantile/LPT assignment -- keep the completed
reconstruction statistically identical, without paying gloo-coordinated
cross-process dispatch costs."""

import dataclasses

import numpy as np
import pytest

from hpmvs_tpu.config import Options
from hpmvs_tpu.parallel import mesh as pmesh
from hpmvs_tpu.runtime import pipeline

pytestmark = pytest.mark.slow


def test_owned_single_process_parity(plane_scene, tmp_path_factory):
    from hpmvs_tpu.runtime.owned import OwnedSpatialEngine
    from hpmvs_tpu.runtime.spatial import SpatialEngine

    def opts(d):
        return dataclasses.replace(Options(), START_LEVEL=2, MAXLEVEL=4,
                                   OUTFOLDER=str(d), COVIS_MIN_POINTS=10,
                                   MAX_TREE_LEVEL=8)

    mesh = pmesh.make_mesh(8)

    def run(cls, d):
        eng = cls(plane_scene.model, opts(d), images=plane_scene.images,
                  mesh=mesh)
        eng.seed()
        start = eng._agree_pmin(np.iinfo(np.int64).max - 1)
        for prio in range(int(start or 0), opts(d).max_prio):
            eng.process_priority_step(prio)
            if not eng.have_work():
                break
        return eng

    spat = run(SpatialEngine, tmp_path_factory.mktemp("sp"))
    owned = run(OwnedSpatialEngine, tmp_path_factory.mktemp("ow"))

    n_s, n_o = spat.n_alive(), owned.n_alive()
    assert abs(n_o - n_s) <= max(0.08 * n_s, 30), (n_s, n_o)
    z = plane_scene.plane_z
    ds = np.abs(spat.alive_arrays()[0][:, 2] - z)
    do = np.abs(owned.alive_arrays()[0][:, 2] - z)
    assert np.sqrt((do ** 2).mean()) <= np.sqrt((ds ** 2).mean()) * 1.15 + 1e-4
    # ownership invariant holds trivially at P=1 but the filters ran
    assert owned.stats["seeds"] > 0
