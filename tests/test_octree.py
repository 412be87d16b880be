import numpy as np

from hpmvs_tpu.core.octree import (LinearOctree, PatchStore, morton_encode,
                                   morton_ancestor, _compact_bits)


def test_morton_roundtrip(rng):
    ix = rng.integers(0, 1 << 21, 1000).astype(np.uint64)
    iy = rng.integers(0, 1 << 21, 1000).astype(np.uint64)
    iz = rng.integers(0, 1 << 21, 1000).astype(np.uint64)
    k = morton_encode(ix, iy, iz)
    np.testing.assert_array_equal(_compact_bits(k), ix)
    np.testing.assert_array_equal(_compact_bits(k >> np.uint64(1)), iy)
    np.testing.assert_array_equal(_compact_bits(k >> np.uint64(2)), iz)
    # ancestors drop 3 bits per level
    k5 = morton_encode(ix >> np.uint64(5), iy >> np.uint64(5),
                       iz >> np.uint64(5))
    np.testing.assert_array_equal(morton_ancestor(k, 21, 16), k5)


def test_structure_and_containing():
    tree = LinearOctree(np.zeros(3), 2.0)  # cube [-1,1]^3
    # occupied cell at level 3 around point p
    p = np.array([[0.3, 0.3, 0.3]])
    k3 = tree.key_at(p, 3)
    cid = tree.alloc_cells(np.array([3]), k3)

    # point inside that cell: contained, structure level == 3
    assert tree.containing_cell(p)[0] == cid[0]
    assert tree.structure_level(p)[0] == 3

    # sibling point (same level-2 parent, different level-3 cell):
    # empty leaf at level 3 -> structure level 3, no containing cell
    q = np.array([[0.3, 0.3, 0.1]])
    assert (tree.key_at(q, 3) != k3).all()
    assert (tree.key_at(q, 2) == tree.key_at(p, 2)).all()
    assert tree.containing_cell(q)[0] == -1
    assert tree.structure_level(q)[0] == 3

    # far-away point: completely unsplit region -> level 1 leaf (the root
    # Branch always has 8 children, doctree.h:201-203)
    far = np.array([[-0.9, -0.9, -0.9]])
    assert tree.containing_cell(far)[0] == -1
    assert tree.structure_level(far)[0] == 1

    # removing the cell collapses the structure
    tree.free_cells(cid)
    assert tree.structure_level(p)[0] == 0
    assert tree.containing_cell(p)[0] == -1


def test_level_for_width():
    tree = LinearOctree(np.zeros(3), 2.0)
    # add(e, width) splits while leaf_width/2 > width
    # width=0.9*cellwidth at level L must land exactly on level L
    for L in [1, 3, 5, 8]:
        cw = 2.0 / (1 << L)
        assert tree.level_for_width(np.array([cw * 0.9]))[0] == L
        assert tree.level_for_width(np.array([cw * 0.45]))[0] == L + 1
    # width >= rootW/2 -> level 0
    assert tree.level_for_width(np.array([1.5]))[0] == 0


def test_lookup_and_histogram():
    tree = LinearOctree(np.zeros(3), 2.0)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.99, 0.99, (50, 3))
    lv = rng.integers(2, 6, 50)
    keys = np.array([tree.key_at(pts[i:i + 1], int(lv[i]))[0]
                     for i in range(50)])
    # dedup (level,key)
    _, uniq = np.unique(np.stack([lv.astype(np.uint64), keys]), axis=1,
                        return_index=True)
    lv, keys, pts = lv[uniq], keys[uniq], pts[uniq]
    cids = tree.alloc_cells(lv.astype(np.int8), keys)
    got = tree.lookup(lv.astype(np.int64), keys)
    np.testing.assert_array_equal(got, cids)
    # missing entries
    assert tree.lookup(np.array([1]), np.array([0], np.uint64))[0] == -1
    hist = tree.histogram()
    assert hist.sum() == len(cids)
    # cell center/width roundtrip: centers must map back to the same keys
    cc, cw = tree.cell_center_width(cids)
    for i in range(len(cids)):
        assert tree.key_at(cc[i:i + 1], int(lv[i]))[0] == keys[i]
        np.testing.assert_allclose(cw[i], 2.0 / (1 << lv[i]))


def test_patch_store_growth():
    ps = PatchStore(max_views=4, cap=2)
    ids1 = ps.alloc(3)
    ps.center[ids1] = 1.0
    ids2 = ps.alloc(100)
    assert ps.n == 103
    assert ps.alive[ids1].all() and ps.alive[ids2].all()
    np.testing.assert_array_equal(ps.center[ids1], np.ones((3, 3)))
    ps.free(ids1)
    assert not ps.alive[ids1].any()
    assert (ps.views[ids1] == -1).all()


def test_reroot_preserves_cells():
    """reroot doubles the cube; every cell keeps its geometry (center,
    width) and stays query-consistent at level+1."""
    from hpmvs_tpu.core.octree import LinearOctree
    rng = np.random.default_rng(7)
    tree = LinearOctree(np.zeros(3), 2.0, max_level=10)
    pts = rng.random((40, 3)) * 1.8 - 0.9
    lv = rng.integers(2, 6, 40).astype(np.int64)
    keys = np.zeros(40, np.uint64)
    for L in np.unique(lv):
        m = lv == L
        keys[m] = tree.key_at(pts[m], int(L))
    _, uniq = np.unique(np.stack([lv.astype(np.uint64), keys]), axis=1,
                        return_index=True)
    lv, keys, pts = lv[uniq], keys[uniq], pts[uniq]
    cids = tree.alloc_cells(lv.astype(np.int8), keys)
    cc0, cw0 = tree.cell_center_width(cids)
    own0 = tree.containing_cell(pts)

    for direction in ([1, 1, 1], [-1, 1, -1]):
        tree.reroot(np.asarray(direction, np.float64))
    assert tree.width == 8.0
    cc1, cw1 = tree.cell_center_width(cids)
    np.testing.assert_allclose(cc1, cc0, atol=1e-12)
    np.testing.assert_allclose(cw1, cw0, atol=1e-12)
    np.testing.assert_array_equal(tree.level[cids], lv + 2)
    np.testing.assert_array_equal(tree.containing_cell(pts), own0)
    # old root is inside the new cube, new corners are new territory
    assert tree.contains(np.asarray([[0.0, 0.0, 0.0]]))[0]
    assert tree.containing_cell(np.asarray([[3.5, 3.5, 3.5]]))[0] == -1
