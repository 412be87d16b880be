"""Deep wave speculation: W consecutive extend waves in ONE fused dispatch.

The progressive loop's critical path is a chain of DEPENDENT dispatches:
wave N+1's extend batch is a function of wave N's gate results, so through a
host<->device transport every wave-generation costs at least one RPC round
trip no matter how the host overlaps its routing (the round-4 one-wave
lookahead hides the host work, not the chain). The reference has no such
chain -- its scheduler threads run compute continuously (main.cpp:150-154).

This module halves-to-quarters the chain by simulating the router ON DEVICE:
one dispatch optimizes wave N's candidate batch, dedups its winners exactly
like the host router (first-wins by target cell, Engine._insert_winners)
MINUS the tree-occupancy checks that need the host octree, applies the
winners' depth adds, derives their tangent-disc extend candidates
(Engine._extend_candidates minus the same occupancy pre-check), and
optimizes those as wave N+1 -- iterated to `n_gens` generations, all in one
XLA executable, one H2D and one D2H.

Because the device cannot see the host octree, each speculative generation
runs a SUPERSET of the lanes the host router would have dispatched:
  - device winners  = host winners + lanes whose target cell is occupied /
    finer host-side (the host re-applies those checks fresh at consume and
    they only REMOVE lanes);
  - device candidates = all EXTEND_DIRS directions (the host pre-check
    prunes occupied/finer targets at consume instead of at dispatch).
Superset lanes are wasted FLOPs, not errors. The one real divergence is the
z-buffer: false winners' depth adds pollute the buffer the LATER generations
of the same dispatch gate against (the host stages subtract-repairs into the
next dispatch, so the pollution lives for one dispatch, same family as the
round-4 lookahead's one-dispatch subtract lag). Statistical parity is
asserted by tests/test_lookahead.py / test_deepwave.py.

Reference map: the whole module replaces nothing visible in the reference --
it is how CellProcessor::processQueue's sequential pops pipeline onto an
accelerator behind a latency-bound transport.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hpmvs_tpu.config import Options
from hpmvs_tpu.core import depth as depth_mod
from hpmvs_tpu.ops import optimizer as popt


def level_from_width(widths, root_w):
    """Target level from the parent-cell width column: widths are exactly
    root_w / 2^lv (cell_center_width computes them that way), so the log2
    ratio rounds to the integer level robustly in f32."""
    r = jnp.maximum(root_w / jnp.maximum(widths, 1e-30), 1.0)
    return jnp.round(jnp.log2(r)).astype(jnp.int32)


def winner_dedup(oc, ok, lv, root_c, root_w):
    """Device twin of Engine._insert_winners minus the occupancy checks:
    inside-root test + first-wins dedup by (level, cell ijk), stable in
    lane order (the host's np.unique first-index == first lane). Returns
    the winner mask; a SUPERSET of the host's (containing_cell /
    structure_level rejections happen host-side at consume)."""
    B = oc.shape[0]
    lo = root_c - root_w * 0.5
    hi = root_c + root_w * 0.5
    inside = jnp.all((oc >= lo[None]) & (oc < hi[None]), axis=1)
    ok = ok & inside & (lv >= 0)
    res = jnp.left_shift(jnp.int32(1), lv)
    cw = root_w / res.astype(jnp.float32)
    ijk = jnp.floor((oc - lo[None]) / cw[:, None]).astype(jnp.int32)
    ijk = jnp.clip(ijk, 0, (res - 1)[:, None])
    big = jnp.int32(2 ** 30)
    k0 = jnp.where(ok, lv, big)
    k1 = jnp.where(ok, ijk[:, 0], big)
    k2 = jnp.where(ok, ijk[:, 1], big)
    k3 = jnp.where(ok, ijk[:, 2], big)
    lane = jnp.arange(B, dtype=jnp.int32)
    s0, s1, s2, s3, sl = jax.lax.sort((k0, k1, k2, k3, lane), num_keys=5)
    first = jnp.ones(B, bool).at[1:].set(
        (s0[1:] != s0[:-1]) | (s1[1:] != s1[:-1])
        | (s2[1:] != s2[:-1]) | (s3[1:] != s3[:-1]))
    win_sorted = first & (s0 < big)
    return jnp.zeros(B, bool).at[sl].set(win_sorted)


def _compact_winner_lanes(winner, n_par):
    """First n_par winner lanes in ascending lane order (-1 padded): the
    parent slots of the next generation. Hosts recover the same mapping
    from the returned winner mask (np.nonzero is ascending too)."""
    B = winner.shape[0]
    lane = jnp.arange(B, dtype=jnp.int32)
    key = jnp.where(winner, lane, jnp.int32(2 ** 30))
    srt = jax.lax.sort(key)
    par = srt[:n_par]
    return jnp.where(par < 2 ** 30, par, -1)


def next_gen_inputs(ctx, opt: Options, oc, on, os_, ov, width, winner):
    """Tangent-disc extend candidates of the compacted winner lanes as the
    next generation's packed gate input (Engine._extend_candidates without
    the tree pre-check; CellProcessor.cpp:104-116 geometry). Row layout:
    parent slot p (ascending winner-lane order), direction d -> row
    p * EXTEND_DIRS + d; rows past the last live parent are dead
    (views = -1, width = -1). Returns (xin2, par_lane)."""
    B = oc.shape[0]
    DIRS = int(opt.EXTEND_DIRS)
    n_par = B // DIRS
    par = _compact_winner_lanes(winner, n_par)
    safe = jnp.maximum(par, 0)
    alive = par >= 0
    pc = oc[safe]
    pn = on[safe]
    pv = ov[safe]
    pw = width[safe]
    # tangent frame (Engine._tangent_axes / CellProcessor.cpp:98-101)
    cam_x = ctx.cams.xaxis[jnp.maximum(pv[:, 0], 0)]
    yax = jnp.cross(pn, cam_x)
    yax = yax / jnp.maximum(jnp.linalg.norm(yax, axis=1, keepdims=True),
                            1e-12)
    xax = jnp.cross(yax, pn)
    ang = 2.0 * jnp.pi / DIRS * jnp.arange(DIRS, dtype=jnp.float32)
    dx = jnp.cos(ang)
    dy = jnp.sin(ang)
    cand = (pc[:, None, :]
            + (dx[None, :, None] * xax[:, None, :]
               + dy[None, :, None] * yax[:, None, :]) * pw[:, None, None])
    cand = cand.reshape(n_par * DIRS, 3)
    rep = lambda a: jnp.repeat(a, DIRS, axis=0)
    alive_r = rep(alive)
    c2 = cand
    n2 = rep(pn)
    s2 = rep(pw) * (opt.EXTEND_SCALE / 2.0)
    v2 = jnp.where(alive_r[:, None], rep(pv), -1)
    p2 = rep(pc)
    w2 = jnp.where(alive_r, rep(pw), -1.0)
    pad = B - n_par * DIRS
    if pad:
        c2 = jnp.pad(c2, ((0, pad), (0, 0)))
        n2 = jnp.pad(n2, ((0, pad), (0, 0)))
        s2 = jnp.pad(s2, ((0, pad),))
        v2 = jnp.pad(v2, ((0, pad), (0, 0)), constant_values=-1)
        p2 = jnp.pad(p2, ((0, pad), (0, 0)))
        w2 = jnp.pad(w2, ((0, pad),), constant_values=-1.0)
    xin2 = jnp.concatenate(
        [c2, n2, s2[:, None], p2, w2[:, None], popt._bc_i2f(v2)], axis=1)
    return xin2, par


def _winner_depth_adds(pack, cams, opt: Options, oc, os_, ov, winner):
    """Scatter-min the winners' depth windows (Scene::setDepths adds) so the
    next generation's gates read a fresh z-buffer -- the device version of
    the host's pre-staged adds (wavefront._speculate_next)."""
    v = jnp.where(winner[:, None], ov, -1)
    ph = jnp.zeros(oc.shape[0], jnp.int32)
    return depth_mod.apply_phased_updates(pack, cams, oc, os_, v, ph,
                                          opt.DEPTH_SUBSAMPLE)


def pack_deep_out(oc, on, os_, ov, ok, col, cand, winner):
    """(B, 15+K): [oc3 on3 os1 col3 okf1 cand3 winf1 viewsK]."""
    return jnp.concatenate(
        [oc, on, os_[:, None], col, ok.astype(jnp.float32)[:, None],
         cand, winner.astype(jnp.float32)[:, None], popt._bc_i2f(ov)],
        axis=1)


def unpack_deep_out(arr):
    """Host-side: packed row -> (oc, on, os, ov, ok, col, cand, winner)."""
    import numpy as np
    arr = np.asarray(arr)
    ov = np.ascontiguousarray(arr[:, 15:]).view(np.int32)
    return (arr[:, 0:3], arr[:, 3:6], arr[:, 6], ov, arr[:, 10] > 0.5,
            arr[:, 7:10], arr[:, 11:14], arr[:, 14] > 0.5)


@functools.partial(jax.jit,
                   static_argnames=("opt", "n_images", "n_gens",
                                    "pack_layout"))
def optimize_and_gate_deep(ctx, pack, opt: Options, n_images: int, xin,
                           root_c, root_w, pend=None, n_gens: int = 2,
                           pack_layout=None):
    """n_gens consecutive extend waves in one dispatch (see module doc).

    xin: (B, 11+K) packed gate input of wave N (host-built, host-prechecked
    like any extend dispatch). root_c (3,) f32 / root_w () f32: the octree
    root cube (dynamic args -- reroots don't recompile).

    Returns (outs, depth): outs (n_gens, B, 15+K) -- generation g's packed
    results (pack_deep_out layout; gen-g's `cand` column is the lane's own
    pre-optimize candidate position, `winner` its device-winner mask) --
    and the threaded z-buffer including every non-final generation's
    winner adds."""
    c, n, s, v, pc, w = popt.unpack_gate_in(xin)
    if pend is not None:
        pc_, ps_, pv_, pph_ = popt.unpack_pend(pend)
        pack = depth_mod.apply_phased_updates(
            pack, ctx.cams, pc_, ps_, pv_, pph_, opt.DEPTH_SUBSAMPLE)

    outs = []
    cand_in = c
    for g in range(n_gens):
        res = popt.optimize_and_gate.__wrapped__(
            ctx, pack, opt, n_images, c, n, s, v, pc, w,
            pack_layout=pack_layout)
        oc, on, os_, ov, ok, col = res[:6]
        lv = level_from_width(w, root_w)
        win = winner_dedup(oc, ok, jnp.where(w > 0, lv, -1), root_c, root_w)
        outs.append(pack_deep_out(oc, on, os_, ov, ok, col, cand_in, win))
        if g + 1 < n_gens:
            if g == 0:
                # gen-0's lanes are host-prechecked, so its device winner
                # set matches the host router's up to the one-dispatch tree
                # staleness -- applying its adds keeps gen-1's gates fresh.
                # Deeper generations' lanes have NO occupancy pre-check, so
                # their device winner sets include interior-targeting false
                # winners whose z-adds would poison the following
                # generations' pixelFree gates (measured -18..-58% alive);
                # those generations run with an add LAG instead (the host
                # stages their real adds at routing, riding the next
                # dispatch) -- the same freshness family as the pre-r4
                # one-dispatch lookahead lag, statistically tested.
                pack = _winner_depth_adds(pack, ctx.cams, opt, oc, os_, ov,
                                          win)
            xin2, _ = next_gen_inputs(ctx, opt, oc, on, os_, ov, w, win)
            c, n, s, v, pc, w = popt.unpack_gate_in(xin2)
            cand_in = c
    return jnp.stack(outs), pack.depth
