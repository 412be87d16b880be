"""Pallas TPU kernel: batched window fetch (DMA + lane-roll compaction).

Replaces the vmapped dynamic_slice in ops/windows.fetch_windows. XLA lowers
per-window slices to a sequential per-element gather (~34 ms for a 16k-pair
batch); this kernel instead

  1. double-buffered async-DMAs a (W, 2, 128)-float slab per window from the
     block-interleaved texture (hpmvs_tpu/image/pyramid.py `texb`) -- every
     slice is tile-aligned because the minor dim is always the full 128 block,
  2. concatenates the two blocks, lane-rotates by the window's in-block float
     offset (tpu dynamic_rotate), and writes the compacted (W, 128) window
     whose first 72 floats are the interleaved 24x24x3 pixels.

One grid step per window; the output block pipeline overlaps the VMEM->HBM
writeback with the next window's DMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_T = 32  # windows per grid step (amortizes grid/pipeline overhead)


def _kernel(rows_ref, blk_ref, off_ref, mask_ref, tex_ref, out_ref, slab,
            sems, *, W: int, n_steps: int):
    i = pl.program_id(0)

    def dma(step, j):
        slot = jax.lax.rem(step, 2)
        w = step * _T + j
        return pltpu.make_async_copy(
            tex_ref.at[pl.ds(rows_ref[w], W), pl.ds(blk_ref[w], 2), :],
            slab.at[slot, j],
            sems.at[slot, j],
        )

    def start_step(step):
        for j in range(_T):
            @pl.when(mask_ref[step * _T + j] != 0)
            def _():
                dma(step, j).start()

    @pl.when(i == 0)
    def _():
        start_step(0)

    @pl.when(i + 1 < n_steps)
    def _():
        start_step(i + 1)

    slot = jax.lax.rem(i, 2)
    for j in range(_T):
        fetched = mask_ref[i * _T + j] != 0

        @pl.when(fetched)
        def _():
            dma(i, j).wait()
            flat = jnp.concatenate([slab[slot, j, :, 0, :],
                                    slab[slot, j, :, 1, :]],
                                   axis=-1)                    # (W, 256)
            rolled = pltpu.roll(flat, -off_ref[i * _T + j], 1)
            out_ref[j] = rolled[:, :128].astype(out_ref.dtype)

        @pl.when(jnp.logical_not(fetched))
        def _():
            out_ref[j] = jnp.zeros_like(out_ref[j])


@functools.partial(jax.jit, static_argnames=("W",))
def fetch_windows_dma(texb: jnp.ndarray, rows: jnp.ndarray,
                      blk0: jnp.ndarray, off: jnp.ndarray,
                      W: int, mask: jnp.ndarray = None) -> jnp.ndarray:
    """texb: (R, nblk, 128) f32; rows/blk0/off: (N,) int32 -- window top row,
    starting 128-float block, in-block float offset of the window's first
    pixel. mask: optional (N,) int32/bool; windows with mask == 0 skip their
    DMA and come back zero (the selective post-stage re-fetch).
    Returns (N, W, 128) with floats [0:3W] = the interleaved window."""
    n = rows.shape[0]
    if mask is None:
        mask = jnp.ones((n,), jnp.int32)
    else:
        mask = mask.astype(jnp.int32)
    pad = (-n) % _T
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((pad,), rows.dtype)])
        blk0 = jnp.concatenate([blk0, jnp.zeros((pad,), blk0.dtype)])
        off = jnp.concatenate([off, jnp.zeros((pad,), off.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])
    n_steps = (n + pad) // _T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((_T, W, 128), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _T, W, 2, 128), texb.dtype),
            pltpu.SemaphoreType.DMA((2, _T)),
        ],
    )
    # output bf16: pixel values are uint8-exact in bf16 and every consumer
    # (slab transpose, hat kernels) reads windows as bf16 anyway -- halves
    # the writeback and the downstream transpose's read traffic
    out = pl.pallas_call(
        functools.partial(_kernel, W=W, n_steps=n_steps),
        out_shape=jax.ShapeDtypeStruct((n + pad, W, 128), jnp.bfloat16),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(rows, blk0, off, mask, texb)
    return out[:n]
