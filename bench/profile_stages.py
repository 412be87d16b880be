"""Per-stage TPU timing for the optimize_batch pipeline (dev tool)."""
import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from hpmvs_tpu.config import Options
    from hpmvs_tpu.core import scene as scene_mod
    from hpmvs_tpu.ops import optimizer as popt
    from hpmvs_tpu.ops import pallas_gn
    from hpmvs_tpu.testing import make_plane_scene

    opt = dataclasses.replace(Options(), START_LEVEL=2, MAX_VIEWS=8,
                              COVIS_MIN_POINTS=30)
    ps = make_plane_scene(n_cams=7, imgsize=512, n_points=400, seed=0)
    scene = scene_mod.build_scene(ps.model, opt, images=ps.images)
    c, n, s, v, _ = scene_mod.make_seed_patches(ps.model, scene, opt)

    B = 2048
    reps = int(np.ceil(B / len(c)))
    idx = np.tile(np.arange(len(c)), reps)[:B]
    rng = np.random.default_rng(0)
    cc = jnp.asarray(c[idx] + rng.normal(0, 0.002, (B, 3)).astype(np.float32))
    nn, ss, vv = jnp.asarray(n[idx]), jnp.asarray(s[idx]), jnp.asarray(v[idx])
    ctx = scene.ctx

    full = timeit(functools.partial(popt.optimize_batch, ctx, opt),
                  cc, nn, ss, vv)
    print(f"full optimize_batch: {full:.2f} ms  ({B / full * 1e3:,.0f}/s)")

    pre_j = jax.jit(functools.partial(popt._run_pre_b, ctx, opt))
    pre = timeit(pre_j, cc, nn, ss, vv)
    print(f"_run_pre_b:          {pre:.2f} ms")

    pc, pn, pv, pok, pws = jax.block_until_ready(pre_j(cc, nn, ss, vv))

    gn_j = jax.jit(functools.partial(pallas_gn.gn_refine_batch, ctx, opt))
    gn = timeit(gn_j, pc, pn, ss, pv, pws)
    print(f"gn_refine_batch:     {gn:.2f} ms")

    nc, nnm, ok3, resid = jax.block_until_ready(gn_j(pc, pn, ss, pv, pws))
    ok = pok & ok3

    post_j = jax.jit(functools.partial(popt._run_post_b, ctx, opt))
    post = timeit(post_j, nc, nnm, ss, pv, ok, ws_pre=pws)
    print(f"_run_post_b:         {post:.2f} ms")
    print(f"sum of stages:       {pre + gn + post:.2f} ms")


if __name__ == "__main__":
    main()
