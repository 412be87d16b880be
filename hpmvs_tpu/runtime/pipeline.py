"""End-to-end progressive reconstruction driver: the hp_pmvs() equivalent.

Behavioral equivalent of src/main.cpp:98-206: load NVM -> build scene ->
extract covisibility -> seed + optimize -> priority loop over
(MAX_TREE_LEVEL+1)*10 steps with progressive PLY snapshots every 10 steps
(one octree level) -> final PLY. The reference's subtree decomposition +
OpenMP fan-out collapses into the Engine's batched wavefronts; multi-chip
sharding lives in hpmvs_tpu.parallel.
"""

from __future__ import annotations

import logging
import os
import time
from typing import List, Optional

import numpy as np

from hpmvs_tpu.config import Options
from hpmvs_tpu.io import nvm as nvm_io
from hpmvs_tpu.runtime.wavefront import Engine

log = logging.getLogger("hpmvs_tpu")


def enable_compile_cache(path: str = None):
    """Persistent XLA compilation cache: kernel compiles (~20-40 s each on a
    tunneled TPU) are paid once per shape across ALL runs. Called by run()
    and the CLI; safe to call repeatedly."""
    import jax
    if jax.config.jax_compilation_cache_dir:
        return  # respect a cache the embedding application configured
    path = path or os.path.expanduser("~/.cache/hpmvs_tpu_xla")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover - cache is best-effort
        log.warning("compilation cache unavailable: %s", e)


def run(model: nvm_io.NvmModel, opt: Options, images=None,
        more_output: bool = False, light_output: int = 0,
        snapshot_hook=None, wave_hook=None,
        max_prio: Optional[int] = None,
        bundle_adjust: bool = False, resume: Optional[str] = None,
        mesh="auto", spatial: bool = False,
        image_subsets: bool = False, ba_dense: bool = False,
        ba_dense_every: int = 0) -> Engine:
    """Progressive densification main loop (main.cpp:145-202).

    bundle_adjust: refine cameras + sparse points by Schur-complement BA
    (parallel/ba.py) before densification -- capability beyond the reference.
    mesh: a jax.sharding.Mesh to shard wavefront batches over, None for
    single-device, or "auto" (default): build a mesh over all local devices
    when more than one is visible (the OpenMP-over-subtrees analog,
    main.cpp:127-139).
    spatial: partition the octree into Morton blocks on the mesh with halo
    border migration (the getSubTrees + border-queue analog, main.cpp:50-96,
    CellProcessor.cpp:487-540) instead of flat batch sharding.
    image_subsets: with spatial, shard the packed image pyramids by block
    so each device only holds the cameras whose frusta see its blocks
    (parallel/subsets.py) -- the per-subtree working set, for scenes whose
    pyramids exceed one chip's HBM.

    Multi-host entry: on a pod slice / multi-process launch, mesh="auto"
    first calls parallel.mesh.init_distributed() (jax.distributed bring-up,
    no-op without a coordinator env) and then builds the mesh over ALL
    global devices. Host scheduler state (octree, patch store, queues) is
    deterministically replicated per process -- the multi-controller SPMD
    convention, proven by tests/test_multihost.py -- while device batches
    are global arrays sharded over the slice."""
    if mesh == "auto":
        import jax
        from hpmvs_tpu.parallel import mesh as pmesh
        pmesh.init_distributed()
        mesh = None
        if len(jax.devices()) > 1:
            mesh = pmesh.make_mesh()
            log.info("sharding wavefronts over %d devices %s",
                     mesh.devices.size, dict(zip(mesh.axis_names,
                                                 mesh.devices.shape)))
    os.makedirs(opt.OUTFOLDER, exist_ok=True)
    enable_compile_cache()
    if bundle_adjust and model.n_points > 0:
        from hpmvs_tpu.parallel import ba
        prob = ba.build_problem(model)
        cam, pts, hist = ba.ba_solve(prob, len(model.cameras),
                                     model.n_points, iters=6, cg_iters=40)
        log.info("bundle adjustment: reprojection RMS %.4f -> %.4f px",
                 float(np.asarray(hist)[0]), float(np.asarray(hist)[-1]))
        model = ba.apply_to_model(model, np.asarray(cam), np.asarray(pts))
    # PMVS-style VISDATA debug dump, like the reference's always-written
    # /tmp/testvis.dat (Scene.cpp:243,279) but into the output folder
    kw = {}
    cls = Engine
    if spatial:
        if mesh is None:
            raise ValueError("spatial=True requires a device mesh")
        import jax
        if jax.process_count() > 1:
            # per-process scheduler ownership: host state partitioned by
            # Morton range, patch records cross only in the halo payload
            # (runtime/owned.py; the reference's per-processor subtree +
            # border-queue structure, CellProcessor.h:60-68)
            from hpmvs_tpu.runtime.owned import OwnedSpatialEngine
            cls = OwnedSpatialEngine
        else:
            from hpmvs_tpu.runtime.spatial import SpatialEngine
            cls = SpatialEngine
        kw["image_subsets"] = image_subsets
    engine = cls(model, opt, images=images,
                 visdata_path=os.path.join(opt.OUTFOLDER, "testvis.dat"),
                 mesh=mesh, **kw)
    engine.wave_hook = wave_hook
    if resume:
        from hpmvs_tpu.runtime import checkpoint as ckpt
        ckpt.load_checkpoint(engine, resume)
        ckpt.requeue_from_tree(engine)
        log.info("resumed %d patches from <%s>", engine.n_alive(), resume)
    else:
        engine.seed()
    if more_output:
        engine.save_ply(os.path.join(opt.OUTFOLDER, "patches-init.ply"))

    t0 = time.time()
    top = opt.max_prio if max_prio is None else max_prio
    ba_obs = None
    for prio in range(top):
        changed = engine.process_priority_step(prio)

        if changed and prio % 10 < 3:
            if prio % 10 == 0 or more_output:
                engine.save_ply(os.path.join(opt.OUTFOLDER,
                                             f"patches-{prio}.ply"))
            if light_output > 0 and prio == light_output:
                engine.save_ply(os.path.join(opt.OUTFOLDER,
                                             "patches-light.ply"),
                                binary=True, normal=False, scale=False,
                                visibility=False)
            log.info("prio %d finished: %d patches alive", prio,
                     engine.n_alive())
        if snapshot_hook is not None:
            snapshot_hook(engine, prio)

        if (ba_dense_every > 0 and prio % 10 == 9
                and (prio // 10) % ba_dense_every == 0
                and engine.n_alive() > 0):
            # periodic cameras+patches refinement between octree levels
            # (north-star mode, BASELINE.json): the growing cloud is the
            # tie-point set. Patches created since the previous pass get
            # their observations stamped under the then-current cameras
            # (ba.DenseObsStore); cameras + centers then re-solve jointly
            # against all stamped observations and the z-buffers replay
            # under the refined geometry, so subsequent levels densify
            # against better cameras. Composes with the owned multi-host
            # engine (consistency-solve path, parallel/ba.py).
            from hpmvs_tpu.parallel import ba
            if ba_obs is None:
                ba_obs = ba.DenseObsStore(opt.MAX_VIEWS)
            hist = ba.periodic_dense_ba(engine, ba_obs)
            if hist is not None:
                log.info("periodic dense BA at prio %d (%d patches): "
                         "reprojection RMS %.4f -> %.4f px", prio,
                         engine.n_alive(), float(hist[0]), float(hist[-1]))

        if not engine.have_work():
            break

    hist = engine.tree.histogram()
    log.info("Tree Cell Histogram: %s", {f"L{i}": int(v)
                                         for i, v in enumerate(hist) if v})
    proc_time = time.time() - t0
    n_opt = engine.stats["patches_optimized"]
    t_dev = float(engine.stats["t_device"])
    host_frac = max(proc_time - t_dev, 0.0) / max(proc_time, 1e-9)
    log.info("Done within %.1f seconds (%d patches optimized, %.1f/s; "
             "host scheduler fraction %.1f%%)",
             proc_time, n_opt, n_opt / max(proc_time, 1e-9),
             100.0 * host_frac)
    engine.stats["proc_time"] = proc_time
    engine.stats["host_fraction"] = host_frac

    if ba_dense and engine.n_alive() > 0:
        # cameras+PATCHES bundle adjustment (north-star capability): the
        # dense cloud is the tie-point set; cameras + centers re-solve
        # jointly by Schur point-block elimination, then the depth buffers
        # replay under the refined geometry (parallel/ba.apply_dense_ba)
        from hpmvs_tpu.parallel import ba
        hist = ba.apply_dense_ba(engine)
        if hist is not None:
            log.info("dense BA over %d patches: reprojection RMS "
                     "%.4f -> %.4f px", engine.n_alive(),
                     float(hist[0]), float(hist[-1]))

    engine.save_ply(os.path.join(opt.OUTFOLDER, "patches-final.ply"))
    if light_output > 0:
        engine.save_ply(os.path.join(opt.OUTFOLDER, "patches-final-light.ply"),
                        binary=True, normal=False, scale=False,
                        visibility=False)
    return engine


def run_nvm_file(path: str, opt: Options, **kw) -> Engine:
    models = nvm_io.read_nvm(path)
    if not models:
        raise ValueError(f"no models found in NVM file <{path}>")
    return run(models[0], opt, **kw)
