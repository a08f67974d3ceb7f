"""Pallas TPU kernel: fused FAST-9/16 corner score map.

The XLA formulation (`fast.fast_score`) materializes 16 rolled copies of the
image plus four doubling-min stages — ~17 full-image HBM round-trips per
level.  This kernel reads each pixel tile once into VMEM, forms the 16 circle
differences as static shifted slices of a 3-row-block halo tile, and runs the
whole arc-min/arc-max reduction in registers: one image read + one score
write per level.

Halo strategy: the same input is passed three times with index maps i−1/i/i+1
(clamped at the image edges), so every program assembles a [3·BH, W] tile and
takes ±3-pixel shifts as STATIC slices — no DMA alignment games.  At image
borders the clamped halo differs from the XLA path's `jnp.roll` wraparound;
both are garbage there and the keypoint border crop (≥19 px,
reference ORBExtractor.cc:523) discards them.  Interior scores are bit-exact
vs the XLA path (same dtype, same min/max tree).

Reference behavior being replaced: per-cell cv::FAST calls
(src/ORBExtractor.cc:331-387).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fast import CIRCLE_OFFSETS

BH = 32        # rows per program (sublane-friendly for bf16 and f32)
_HPAD = 4      # horizontal zero-pad each side (≥ circle radius 3)


def _arc_scores(v):
    """max over the 16 arcs of the min over 9 consecutive ring entries —
    the same doubling tree as fast.fast_score.arc_min."""
    m1 = [jnp.minimum(v[k], v[(k + 1) % 16]) for k in range(16)]
    m2 = [jnp.minimum(m1[k], m1[(k + 2) % 16]) for k in range(16)]
    m4 = [jnp.minimum(m2[k], m2[(k + 4) % 16]) for k in range(16)]
    m9 = [jnp.minimum(m4[k], v[(k + 8) % 16]) for k in range(16)]
    out = m9[0]
    for k in range(1, 16):
        out = jnp.maximum(out, m9[k])
    return out


def _kernel(top_ref, mid_ref, bot_ref, out_ref, *, threshold: float, nms: bool):
    tile = jnp.concatenate([top_ref[0], mid_ref[0], bot_ref[0]], axis=0)  # [3BH, Wp]
    wp = tile.shape[1]
    wc = wp - 2 * _HPAD
    # with fused NMS the score is computed on a +1-pixel extended region so
    # the 3×3 suppression of the output rows sees true neighbour scores;
    # margins: circle ±3 + nms ±1 = 4 = _HPAD exactly
    ext = 1 if nms else 0
    rb, cb = BH + 2 * ext, wc + 2 * ext
    r0, c0 = BH - ext, _HPAD - ext
    center = tile[r0 : r0 + rb, c0 : c0 + cb]

    # circle differences d[s] = I(p + offset_s) − I(p), static shifted slices
    d = [
        tile[r0 + int(dy) : r0 + int(dy) + rb, c0 + int(dx) : c0 + int(dx) + cb]
        - center
        for dy, dx in CIRCLE_OFFSETS
    ]

    score = jnp.maximum(_arc_scores(d), _arc_scores([-x for x in d]))
    # threshold compare in f32: v5e Mosaic rejects bf16 vector comparisons
    sf = score.astype(jnp.float32)
    score = jnp.where(sf > jnp.float32(threshold), score, jnp.zeros_like(score))
    if nms:
        # 3×3 non-max suppression fused in-registers (replaces 8 XLA
        # reduce_window launches + their score-map HBM round-trips)
        sf = score.astype(jnp.float32)
        pooled = sf[1 : 1 + BH, 1 : 1 + wc]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                pooled = jnp.maximum(pooled, sf[1 + dy : 1 + dy + BH, 1 + dx : 1 + dx + wc])
        sc = score[1 : 1 + BH, 1 : 1 + wc]
        score = jnp.where(sf[1 : 1 + BH, 1 : 1 + wc] >= pooled, sc,
                          jnp.zeros_like(sc))
    # store at lane offset 0 (score column j IS image column j); the lanes
    # ≥ wc are never written and the caller crops them away.  A full-width
    # concatenate with zero pads here trips an unimplemented Mosaic relayout
    # (offset-mismatched tpu.concatenate) on v5e — the offset-0 slice store
    # only needs the standard value relayout.
    out_ref[0, :, :wc] = score


def fast_score_pallas(
    img: jnp.ndarray, threshold: float, *, interpret: bool = False,
    nms: bool = False,
) -> jnp.ndarray:
    """[B, H, W] → FAST score map [B, H, W], same dtype as the input.
    ``nms=True`` fuses the 3×3 non-max suppression into the same kernel
    (one image read, one suppressed-score write per level)."""
    B, H, W = img.shape
    Hp = -(-H // BH) * BH
    Wp = -(-(W + 2 * _HPAD) // 128) * 128
    x = jnp.pad(img, ((0, 0), (0, Hp - H), (_HPAD, Wp - W - _HPAD)))
    nh = Hp // BH

    spec = lambda di: pl.BlockSpec(  # noqa: E731
        (1, BH, Wp), lambda b, i, d=di: (b, jnp.clip(i + d, 0, nh - 1), 0)
    )
    out = pl.pallas_call(
        partial(_kernel, threshold=threshold, nms=nms),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp), img.dtype),
        grid=(B, nh),
        in_specs=[spec(-1), spec(0), spec(1)],
        out_specs=pl.BlockSpec((1, BH, Wp), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(x, x, x)
    return out[:, :H, :W]
