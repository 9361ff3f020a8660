"""Pallas overlap-add stitch kernel.

The big-mask evaluation accumulates patch probability maps into a slide
canvas at dynamic offsets (SURVEY.md §5.7).  The XLA path
(:func:`pistoseg_tpu.ops.stitch.stitch_canvas`) carries the full canvas
through a ``lax.scan`` — functional, but each step rewrites the whole
canvas value.  This kernel keeps the canvas in HBM and, per patch, DMAs
only the P×P target window into VMEM, accumulates, and writes it back:
O(P²) traffic per patch instead of O(H·W).

Layout: the count canvas is fused in by appending a ones-channel to each
patch (wrapper), so one kernel produces value+count in a single pass.
Patch coordinates arrive as scalar-prefetch arrays (SMEM) so each grid
step can start its window DMA immediately.

Status: validated in interpret mode; on real TPU hardware Mosaic rejects
the dynamic (y, x) window DMA because slices along the lane-tiled channel
dim must be 128-aligned (C = num_classes+1 ≈ 5).  Until the kernel is
re-laid-out around that constraint (e.g. (H, C, W) with masked lane
adds), :func:`stitch_accumulate` automatically uses the XLA
``lax.scan``/dynamic-update-slice path on TPU — which XLA already
executes as in-place updates.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ys_ref, xs_ref, valid_ref, patch_ref, canvas_in_ref, canvas_ref,
            scratch, sems):
    t = pl.program_id(0)
    y = ys_ref[t]
    x = xs_ref[t]
    p = patch_ref.shape[1]

    window = canvas_ref.at[pl.ds(y, p), pl.ds(x, p), :]
    load = pltpu.make_async_copy(window, scratch, sems.at[0])
    load.start()
    load.wait()

    @pl.when(valid_ref[t] != 0)
    def _():
        scratch[:] = scratch[:] + patch_ref[0]

    store = pltpu.make_async_copy(scratch, window, sems.at[1])
    store.start()
    store.wait()


def _stitch_pallas(patches, ys, xs, valid, canvas_h, canvas_w, interpret):
    n, p, _, c = patches.shape
    canvas0 = jnp.zeros((canvas_h, canvas_w, c), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, p, p, c), lambda t, ys, xs, vd: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((p, p, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((canvas_h, canvas_w, c), jnp.float32),
        input_output_aliases={4: 0},  # canvas input buffer reused as output
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        ys.astype(jnp.int32),
        xs.astype(jnp.int32),
        valid.astype(jnp.int32),
        patches.astype(jnp.float32),
        canvas0,
    )


@functools.partial(
    jax.jit, static_argnames=("canvas_h", "canvas_w", "interpret", "use_pallas")
)
def stitch_accumulate(
    patches: jnp.ndarray,  # (N, P, P, C)
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    valid: jnp.ndarray,
    canvas_h: int,
    canvas_w: int,
    interpret: bool = False,
    use_pallas: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (value_canvas (H, W, C), count_canvas (H, W, 1))."""
    ones = jnp.ones(patches.shape[:-1] + (1,), patches.dtype)
    fused = jnp.concatenate([patches, ones], axis=-1)
    run_pallas = use_pallas and (interpret or False)  # see module docstring
    if not run_pallas:
        from pistoseg_tpu.ops.stitch import stitch_canvas

        value, count = stitch_canvas(fused, ys, xs, valid, canvas_h, canvas_w)
        return value[..., :-1], value[..., -1:]
    out = _stitch_pallas(fused, ys, xs, valid, canvas_h, canvas_w, interpret)
    return out[..., :-1], out[..., -1:]
