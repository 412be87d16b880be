"""Profile ONE fused optimize+gate dispatch under the exact e2e
configuration (default Options: MAX_VIEWS=16, START_LEVEL=4) to explain the
per-dispatch cost of the BASELINE_E2E loop: warm kernel time per bucket
shape, H2D and D2H transfer cost, and the pend-window variants."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n=5):
    fn()  # warm
    t0 = time.time()
    for _ in range(n):
        r = fn()
    try:
        import jax
        jax.block_until_ready(r)
    except Exception:
        pass
    return (time.time() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from hpmvs_tpu.runtime import pipeline
    pipeline.enable_compile_cache()
    from hpmvs_tpu.config import Options
    from hpmvs_tpu.core import depth as depth_mod
    from hpmvs_tpu.core import scene as scene_mod
    from hpmvs_tpu.io import nvm as nvm_io
    from hpmvs_tpu.ops import optimizer as popt

    opt = Options()
    model = nvm_io.read_nvm("/tmp/hpmvs_scenes/plane/scene.nvm")[0]
    scene = scene_mod.build_scene(model, opt)
    pack = depth_mod.build_depth_pack(scene.width_np, scene.height_np,
                                      opt.DEPTH_SUBSAMPLE)
    c, n, s, v, _ = scene_mod.make_seed_patches(model, scene, opt)
    K = v.shape[1]
    out = {}

    for B in (512, 2048):
        reps = int(np.ceil(B / len(c)))
        idx = np.tile(np.arange(len(c)), reps)[:B]
        cc = np.ascontiguousarray(c[idx])
        nn, ss, vv = n[idx], s[idx], v[idx]
        pc = cc.copy()
        w = np.full(B, -1.0, np.float32)

        def h2d():
            a = (jnp.asarray(cc), jnp.asarray(nn), jnp.asarray(ss),
                 jnp.asarray(vv), jnp.asarray(pc), jnp.asarray(w))
            jax.block_until_ready(a)
            return a

        out[f"h2d_6arrays_B{B}_ms"] = round(timeit(h2d) * 1e3, 1)
        args = h2d()

        def disp():
            r = popt.optimize_and_gate(scene.ctx, pack, opt,
                                       scene.n_cameras, *args)
            jax.block_until_ready(r)
            return r

        t0 = time.time()
        res = popt.optimize_and_gate(scene.ctx, pack, opt,
                                     scene.n_cameras, *args)
        jax.block_until_ready(res)
        out[f"first_call_B{B}_s"] = round(time.time() - t0, 1)
        out[f"fused_gate_B{B}_ms"] = round(timeit(disp) * 1e3, 1)

        def fetch():
            return jax.device_get(res[:6])

        out[f"d2h_6outputs_B{B}_ms"] = round(timeit(fetch) * 1e3, 1)

        # pend variant (the in-loop common case): pend block of 2048 rows
        P = 2048
        pend = (jnp.zeros((P, 3), jnp.float32), jnp.zeros((P,), jnp.float32),
                jnp.full((P, K), -1, jnp.int32), jnp.zeros((P,), jnp.int32))
        jax.block_until_ready(pend)

        def disp_pend():
            r = popt.optimize_and_gate(scene.ctx, pack, opt,
                                       scene.n_cameras, *args, *pend)
            jax.block_until_ready(r)
            return r

        t0 = time.time()
        r = popt.optimize_and_gate(scene.ctx, pack, opt, scene.n_cameras,
                                   *args, *pend)
        jax.block_until_ready(r)
        out[f"first_call_pend_B{B}_s"] = round(time.time() - t0, 1)
        out[f"fused_gate_pend2048_B{B}_ms"] = round(timeit(disp_pend) * 1e3, 1)

    print(json.dumps(out, indent=2))
    with open("/tmp/profile_dispatch.json", "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
