"""Native (C++) octree-core runtime vs the numpy fallback."""

import numpy as np
import pytest

from hpmvs_tpu.core import native
from hpmvs_tpu.core.octree import LinearOctree

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="libhpmvs_octree.so not built")


@needs_native
def test_morton_matches_numpy(rng):
    from hpmvs_tpu.core.octree import morton_encode as np_encode
    ix = rng.integers(0, 1 << 20, 500)
    iy = rng.integers(0, 1 << 20, 500)
    iz = rng.integers(0, 1 << 20, 500)
    got = native.morton_encode(ix, iy, iz)
    want = np_encode(ix.astype(np.uint64), iy.astype(np.uint64),
                     iz.astype(np.uint64))
    np.testing.assert_array_equal(got, want)


@needs_native
def test_queries_match_numpy_fallback(rng, monkeypatch):
    tree = LinearOctree(np.zeros(3), 2.0, max_level=12)
    pts_cells = rng.uniform(-0.95, 0.95, (80, 3))
    lv = rng.integers(2, 8, 80)
    keys = np.array([tree.key_at(pts_cells[i:i + 1], int(lv[i]))[0]
                     for i in range(80)])
    pair = np.stack([lv.astype(np.uint64), keys])
    _, uniq = np.unique(pair, axis=1, return_index=True)
    tree.alloc_cells(lv[uniq].astype(np.int8), keys[uniq])

    queries = np.concatenate([pts_cells[:40],
                              rng.uniform(-1.2, 1.2, (200, 3))])

    sl_native = tree.structure_level(queries)
    cc_native = tree.containing_cell(queries)
    lk_native = tree.lookup(lv[uniq].astype(np.int64), keys[uniq])

    monkeypatch.setattr(native, "available", lambda: False)
    tree._index = None
    sl_np = tree.structure_level(queries)
    cc_np = tree.containing_cell(queries)
    lk_np = tree.lookup(lv[uniq].astype(np.int64), keys[uniq])

    np.testing.assert_array_equal(sl_native, sl_np)
    np.testing.assert_array_equal(cc_native, cc_np)
    np.testing.assert_array_equal(lk_native, lk_np)


@needs_native
def test_seed_pushdown_matches_fallback(rng):
    center = np.zeros(3)
    width = 2.0
    max_level = 12
    n = 120
    pts = rng.uniform(-0.9, 0.9, (n, 3))
    # clustered points with mixed target levels force conflicts
    pts[:40] = pts[0] + rng.normal(0, 0.02, (40, 3))
    levels = rng.integers(2, 9, n).astype(np.int64)

    got_lv, got_keys = native.seed_pushdown(pts, center, width, max_level,
                                            levels.copy())

    # numpy emulation (the fallback loop in Engine.seed)
    lv = levels.copy()
    tree0 = LinearOctree(center, width, max_level)
    for _ in range(max_level):
        keys = np.array([tree0.key_at(pts[i:i + 1], int(lv[i]))[0]
                         for i in range(n)])
        tmp = LinearOctree(center, width, max_level)
        tmp.alloc_cells(lv.astype(np.int8), keys)
        sl = tmp.structure_level(pts)
        new_lv = np.maximum(lv, sl)
        if (new_lv == lv).all():
            break
        lv = new_lv

    np.testing.assert_array_equal(got_lv, lv)
    want_keys = np.array([tree0.key_at(pts[i:i + 1], int(lv[i]))[0]
                          for i in range(n)])
    np.testing.assert_array_equal(got_keys, want_keys)
    # pushdown never raises a patch above its requested level
    assert (got_lv >= levels).all()
