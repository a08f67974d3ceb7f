"""Pallas TPU kernel: batched keypoint-patch extraction via async DMA.

The XLA formulation (vmapped dynamic_slice) lowers to a gather of thousands
of misaligned 45-element row segments — ~2 ms/image on v5e.  This kernel
instead issues one strided DMA per keypoint from the HBM-resident pyramid
canvas into VMEM scratch (all of a program's BLOCK copies are in flight
together), then recentres with one-hot shift matmuls.  Patch geometry is padded to a lane-friendly
``48 × 64`` window (the extra rows/columns hold real neighbouring canvas
pixels, which downstream sampling never touches: the BRIEF template reach is
<19 px from the centre at (22, 22)).

A numerically identical XLA fallback drives CPU tests; the two paths share
the clamping convention of ``dynamic_slice``.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_ROWS = 48
PATCH_COLS = 64
CENTER = 22          # patch centre offset (both axes)
BLOCK = 8            # keypoints per pallas program


# aligned DMA window: row starts must be sublane-tile (8) aligned, column
# starts lane-tile (128) aligned, and the slice WIDTH itself a 128-multiple,
# so we fetch a [56, 256] superset from the snapped origin and recentre in
# VMEM with one-hot shift matmuls
_WIN_ROWS = PATCH_ROWS + 8
_WIN_COLS = PATCH_COLS + 192  # DMA slice width must be a 128-multiple: 256


def _kernel(centers_ref, canvas_ref, out_ref, scratch, sems):
    """One program copies BLOCK patches.  centers are scalar-prefetched so
    the DMA source addresses are known before the body runs."""
    i = pl.program_id(0)
    h, w = canvas_ref.shape

    def origin(b):
        idx = i * BLOCK + b
        # centres are prefetched as int16 (SMEM is within ~1 KB of its 1 MB
        # cap in the fused extraction program); upcast for address arithmetic
        y = jnp.clip(centers_ref[idx, 0].astype(jnp.int32) - CENTER, 0, h - _WIN_ROWS)
        x = jnp.clip(centers_ref[idx, 1].astype(jnp.int32) - CENTER, 0, w - _WIN_COLS)
        y0 = (y // 8) * 8
        x0 = (x // 128) * 128
        return y0, x0, y - y0, x - x0

    def issue(b):
        y0, x0, _, _ = origin(b)
        return pltpu.make_async_copy(
            canvas_ref.at[pl.ds(pl.multiple_of(y0, 8), _WIN_ROWS),
                          pl.ds(pl.multiple_of(x0, 128), _WIN_COLS)],
            scratch.at[b],
            sems.at[b],
        )

    for b in range(BLOCK):
        issue(b).start()
    for b in range(BLOCK):
        issue(b).wait()
        _, _, dy, dx = origin(b)
        # recentre both axes with one-hot shift matmuls on the MXU — cheap at
        # this size and bit-exact (compiled tpu.dynamic_rotate was observed
        # to disagree with interpret-mode semantics for traced shifts)
        win = scratch[b].astype(jnp.float32)
        r_dst = jax.lax.broadcasted_iota(jnp.int32, (PATCH_ROWS, _WIN_ROWS), 0)
        r_src = jax.lax.broadcasted_iota(jnp.int32, (PATCH_ROWS, _WIN_ROWS), 1)
        srow = (r_src == r_dst + dy).astype(jnp.float32)
        c_src = jax.lax.broadcasted_iota(jnp.int32, (_WIN_COLS, PATCH_COLS), 0)
        c_dst = jax.lax.broadcasted_iota(jnp.int32, (_WIN_COLS, PATCH_COLS), 1)
        scol = (c_src == c_dst + dx).astype(jnp.float32)
        rows = jnp.dot(srow, win, preferred_element_type=jnp.float32)
        out_ref[b] = jnp.dot(rows, scol, preferred_element_type=jnp.float32)


# scalar-prefetched centres live in SMEM, which caps at 1 MB per kernel and
# is nearly exhausted by program bookkeeping — ≤2048 int16 pairs (8 KB) fit,
# a stereo pair's 4096 do not; larger batches chunk into multiple calls
_MAX_CENTERS_PER_CALL = 2048


def extract_patches_pallas(canvas: jnp.ndarray, centers_yx: jnp.ndarray) -> jnp.ndarray:
    """[H, W] canvas + i32[N, 2] centres → f32[N, 48, 64] patches."""
    n = centers_yx.shape[0]
    if n > _MAX_CENTERS_PER_CALL:
        assert n % _MAX_CENTERS_PER_CALL == 0
        chunks = [
            extract_patches_pallas(canvas, centers_yx[i : i + _MAX_CENTERS_PER_CALL])
            for i in range(0, n, _MAX_CENTERS_PER_CALL)
        ]
        return jnp.concatenate(chunks, axis=0)
    assert n % BLOCK == 0, "keypoint capacity must be a multiple of BLOCK"
    centers_yx = centers_yx.astype(jnp.int16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // BLOCK,),
        # the canvas must stay in HBM: ANY lets Mosaic pull it into VMEM,
        # where dynamic slices must be tile-aligned (DMA from HBM is not)
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (BLOCK, PATCH_ROWS, PATCH_COLS),
            lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((BLOCK, _WIN_ROWS, _WIN_COLS), canvas.dtype),
            pltpu.SemaphoreType.DMA((BLOCK,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, PATCH_ROWS, PATCH_COLS), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(centers_yx, canvas)


def extract_patches_xla(canvas: jnp.ndarray, centers_yx: jnp.ndarray) -> jnp.ndarray:
    """Reference/CPU path, bit-identical to the kernel (same clamp bounds:
    the kernel clamps against its aligned superset window)."""
    h, w = canvas.shape

    def one(c):
        y = jnp.clip(c[0] - CENTER, 0, h - _WIN_ROWS)
        x = jnp.clip(c[1] - CENTER, 0, w - _WIN_COLS)
        return jax.lax.dynamic_slice(canvas, (y, x), (PATCH_ROWS, PATCH_COLS))

    return jax.vmap(one)(centers_yx).astype(jnp.float32)


def extract_patches_48x64(canvas: jnp.ndarray, centers_yx: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: Pallas DMA on TPU-class backends ('tpu' locally, 'axon' over
    the tunnel), XLA gather elsewhere (CPU and GPU — the DMA/SMEM layout is
    TPU-specific)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return extract_patches_xla(canvas, centers_yx)
    return extract_patches_pallas(canvas, centers_yx)
