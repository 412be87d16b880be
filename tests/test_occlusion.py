import dataclasses

import numpy as np
import pytest

from hpmvs_tpu.config import Options
from hpmvs_tpu.runtime import pipeline
from hpmvs_tpu.testing import make_occlusion_scene

pytestmark = pytest.mark.slow  # e2e scene test; quick run: pytest -m 'not slow'


@pytest.fixture(scope="module")
def occ_run(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("occ"))
    scene = make_occlusion_scene(n_cams=7, imgsize=224, n_points=150, seed=13)
    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=15, OUTFOLDER=d,
                              MAX_TREE_LEVEL=6, PATCH_FINAL_MINLEVEL=4,
                              PATCH_INIT_MAXLEVEL=6, LM_ITERS=10)
    eng = pipeline.run(scene.model, opt, images=scene.images)
    return scene, opt, eng


def test_both_surfaces_reconstructed(occ_run):
    """Foreground square and background plane both densify; each patch sits
    on ITS surface (the depth tests keep occluded-background and floating
    hypotheses apart)."""
    scene, opt, eng = occ_run
    c = eng.alive_arrays()[0]
    fg_half, fg_z = scene.fg_half, scene.fg_z

    in_fg_xy = (np.abs(c[:, 0]) <= fg_half * 0.9) \
        & (np.abs(c[:, 1]) <= fg_half * 0.9)
    near_fg = np.abs(c[:, 2] - fg_z) < 0.05
    near_bg = np.abs(c[:, 2]) < 0.05

    n_fg = int((in_fg_xy & near_fg).sum())
    n_bg = int((~in_fg_xy & near_bg).sum())
    assert n_fg > 50, f"foreground too sparse: {n_fg}"
    assert n_bg > 200, f"background too sparse: {n_bg}"

    # patches on neither surface ("floaters") stay rare
    on_surface = near_fg | near_bg
    frac_floaters = 1.0 - on_surface.mean()
    assert frac_floaters < 0.05, f"{frac_floaters:.3f} floaters"

    # the background directly behind the foreground square is occluded in
    # most views -- nothing should reconstruct deep inside that shadow
    shadow = in_fg_xy & near_bg
    # (graze views can legitimately see the shadow edge; demand sparsity
    # relative to the visible background density)
    bg_density = n_bg / max(1e-9, (2 * scene.extent) ** 2
                            - (2 * fg_half) ** 2)
    shadow_density = shadow.sum() / max((2 * fg_half * 0.9) ** 2, 1e-9)
    assert shadow_density < 0.6 * bg_density


def test_view_lists_respect_occlusion(occ_run):
    """Foreground patches keep consistent views; their NCC-filtered view
    count stays >= MIN (the filters removed occluded views)."""
    scene, opt, eng = occ_run
    c, n, col, s, v, nv = eng.alive_arrays()
    near_fg = np.abs(c[:, 2] - scene.fg_z) < 0.05
    assert (nv[near_fg] >= opt.MIN_IMAGES_PER_PATCH).all()


def test_extend_subrounds_consistent(tmp_path):
    """EXTEND_SUBROUNDS > 1 (fresher depth buffers within a level) must
    produce a reconstruction of comparable density and quality."""
    import dataclasses
    import numpy as np
    from hpmvs_tpu.config import Options
    from hpmvs_tpu.runtime import pipeline
    from hpmvs_tpu.testing import make_plane_scene

    scene = make_plane_scene(n_cams=5, imgsize=128, n_points=40, seed=11)
    base = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                               COVIS_MIN_POINTS=20, MAX_TREE_LEVEL=5,
                               PATCH_FINAL_MINLEVEL=3)
    outs = []
    for r in (1, 3):
        opt = dataclasses.replace(base, EXTEND_SUBROUNDS=r,
                                  OUTFOLDER=str(tmp_path / f"o{r}"))
        eng = pipeline.run(scene.model, opt, images=scene.images)
        c = eng.alive_arrays()[0]
        err = np.abs(c[:, 2] - scene.plane_z).mean()
        outs.append((len(c), err))
    (n1, e1), (n3, e3) = outs
    assert n3 > 0.7 * n1 and n3 < 1.4 * n1
    assert e3 < 0.02 and e1 < 0.02
