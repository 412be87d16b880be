"""Gate-vs-optimize device-time split at many-camera scale (dev tool).

The progressive ring run (bench/progressive.json) is 99.5% device-bound at
~4.3k optimize-calls/s -- 3% of the 7-camera kernel benchmark rate. The
geometric gates scale O(n_images) per lane (viewBlockTest runs over ALL
images, Scene.cpp:610-644), so at 150 cameras they may dominate the fused
dispatch. This measures the split on the real chip.

Usage: python bench/profile_gates.py [--n_cams 150] [--B 2048]
"""
import argparse
import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=10, **kw):
    import jax
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_cams", type=int, default=150)
    ap.add_argument("--B", type=int, default=2048)
    ap.add_argument("--imgsize", type=int, default=256)
    args = ap.parse_args()

    from hpmvs_tpu.runtime import pipeline
    pipeline.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from hpmvs_tpu.config import Options
    from hpmvs_tpu.core import depth as depth_mod
    from hpmvs_tpu.core import scene as scene_mod
    from hpmvs_tpu.ops import optimizer as popt
    from hpmvs_tpu.testing import make_ring_plane_scene

    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=9,
                              COVIS_MIN_POINTS=8)
    ps = make_ring_plane_scene(n_cams=args.n_cams, imgsize=args.imgsize,
                               extent=8.0, n_points=400, seed=0)
    scene = scene_mod.build_scene(ps.model, opt, images=ps.images)
    c, n, s, v, _ = scene_mod.make_seed_patches(ps.model, scene, opt)

    B = args.B
    reps = int(np.ceil(B / len(c)))
    idx = np.tile(np.arange(len(c)), reps)[:B]
    rng = np.random.default_rng(0)
    cc = jnp.asarray(c[idx] + rng.normal(0, 0.002, (B, 3)).astype(np.float32))
    nn, ss, vv = jnp.asarray(n[idx]), jnp.asarray(s[idx]), jnp.asarray(v[idx])
    ctx = scene.ctx
    n_images = scene.n_cameras

    pack = depth_mod.build_depth_pack(scene.width_np, scene.height_np,
                                      opt.DEPTH_SUBSAMPLE)
    print(f"n_cams={n_images} B={B} imgsize={args.imgsize} "
          f"platform={jax.devices()[0].platform}")

    t_opt = timeit(functools.partial(popt.optimize_batch, ctx, opt),
                   cc, nn, ss, vv)
    print(f"optimize_batch        : {t_opt:8.2f} ms  ({B/t_opt*1e3:,.0f}/s)")

    layout = [(int(h), int(w)) for h, w in
              zip(np.asarray(pack.height)[0], np.asarray(pack.width)[0])]

    @jax.jit
    def gates(depth, c_, n_, s_, v_):
        full0 = depth_mod.collapse_full_depth(depth, tuple(layout), n_images)
        local = pack._replace(depth=depth)
        return depth_mod.geom_gates.__wrapped__(
            local, ctx.cams, ctx.imgs, opt, c_, n_, s_, v_,
            jnp.float32(opt.DEPTH_TEST_FACTOR), n_images, full0=full0)

    t_gate = timeit(gates, pack.depth, cc, nn, ss, vv)
    print(f"geom_gates (fused)    : {t_gate:8.2f} ms")

    @jax.jit
    def collapse_only(depth):
        return depth_mod.collapse_full_depth(depth, tuple(layout), n_images)

    t_col = timeit(collapse_only, pack.depth)
    print(f"  collapse_full_depth : {t_col:8.2f} ms")

    full0 = jax.block_until_ready(collapse_only(pack.depth))

    @jax.jit
    def vb_only(depth, full0, c_, n_, s_):
        local = pack._replace(depth=depth)
        return depth_mod.view_block_test.__wrapped__(
            local, ctx.cams, ctx.imgs, opt, c_, n_, s_,
            jnp.float32(opt.DEPTH_TEST_FACTOR), n_images, full0=full0)

    t_vb = timeit(vb_only, pack.depth, full0, cc, nn, ss)
    print(f"  view_block_test     : {t_vb:8.2f} ms")

    @jax.jit
    def dt_only(depth, full0, c_, n_, s_, v_):
        local = pack._replace(depth=depth)
        return depth_mod.depth_tests.__wrapped__(
            local, ctx.cams, ctx.imgs, opt, c_, n_, s_, v_,
            jnp.float32(opt.DEPTH_TEST_FACTOR), full0=full0)

    t_dt = timeit(dt_only, pack.depth, full0, cc, nn, ss, vv)
    print(f"  depth_tests         : {t_dt:8.2f} ms")

    @jax.jit
    def pf_only(depth, c_, s_, v_):
        local = pack._replace(depth=depth)
        return depth_mod.pixel_free_tests.__wrapped__(
            local, ctx.cams, ctx.imgs, opt, c_, s_, v_)

    t_pf = timeit(pf_only, pack.depth, cc, ss, vv)
    print(f"  pixel_free_tests    : {t_pf:8.2f} ms")

    tot = t_opt + t_gate
    print(f"fused dispatch approx : {tot:8.2f} ms  "
          f"gate share {t_gate/tot:.1%}  ({B/tot*1e3:,.0f} lanes/s)")


if __name__ == "__main__":
    main()
