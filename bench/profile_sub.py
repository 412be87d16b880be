"""Sub-stage TPU timing inside _run_pre_b/_run_post_b (dev tool)."""
import dataclasses
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=30, **kw):
    import jax
    out = fn(*args, **kw)
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
    nn = jnp.asarray(n[idx])
    ss = jnp.asarray(s[idx])
    vv = jnp.asarray(v[idx])
    ctx = scene.ctx

    normal = jnp.asarray(nn)

    def j(f):
        return jax.jit(functools.partial(f, ctx, opt))

    add = j(popt._add_images_b)
    t = timeit(add, cc, normal, ss, vv)
    print(f"_add_images_b:   {t:.2f} ms")
    views, ok = jax.block_until_ready(add(cc, normal, ss, vv))

    fetch = jax.jit(functools.partial(popt._fetch_ws_b, ctx, opt))
    t = timeit(fetch, views, cc, ss)
    print(f"_fetch_ws_b:     {t:.2f} ms")
    ws = jax.block_until_ready(fetch(views, cc, ss))

    filt = jax.jit(functools.partial(popt._filter_ncc_b, ctx, opt,
                                     alpha=Options().NCC_ALPHA_1))
    fn = lambda c_, n_, s_, v_, w_: popt._filter_ncc_b(
        ctx, opt, c_, n_, s_, v_, opt.NCC_ALPHA_1, w_)
    filt = jax.jit(fn)
    t = timeit(filt, cc, normal, ss, views, ws)
    print(f"_filter_ncc_b:   {t:.2f} ms")
    views2, ok1, o1 = jax.block_until_ready(filt(cc, normal, ss, views, ws))

    srt = j(popt._sort_images_b)
    t = timeit(srt, cc, normal, ss, views2)
    print(f"_sort_images_b:  {t:.2f} ms")
    views3, ok2, o2 = jax.block_until_ready(srt(cc, normal, ss, views2))

    perm = jax.jit(popt._permute_ws_b)
    comp = jnp.take_along_axis(o1, o2, axis=-1)
    t = timeit(perm, ws, comp)
    print(f"_permute_ws_b:   {t:.2f} ms")

    ang = j(popt._assure_angles_b)
    t = timeit(ang, cc, views3)
    print(f"_assure_angles:  {t:.2f} ms")

    samp = jax.jit(lambda *a: popt._sample_views_b(ctx, opt, *a))
    t = timeit(samp, cc, normal, ss, views3, ws)
    print(f"_sample_views_b: {t:.2f} ms (one scoring pass)")

    col = j(popt._get_color_b)
    t = timeit(col, cc, ss, views3)
    print(f"_get_color_b:    {t:.2f} ms")

    post = jax.jit(lambda c_, n_, s_, v_, o_, w_: popt._run_post_b(
        ctx, opt, c_, n_, s_, v_, o_, ws_pre=w_))
    wsp = jax.tree.map(lambda a: a, ws)
    t = timeit(post, cc, normal, ss, views3, ok2, wsp)
    print(f"_run_post_b:     {t:.2f} ms")


if __name__ == "__main__":
    main()
