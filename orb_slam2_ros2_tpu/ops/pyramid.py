"""Image pyramid construction.

The reference builds an 8-level ×1.2 pyramid with a Gaussian-blurred copy of
every level for BRIEF sampling (reference: src/ORBExtractor.cc:278-320, blur
kernel 7×7 σ=2 at ORBExtractor.cc:311-318).  Here the pyramid is a tuple of
statically-shaped arrays produced by XLA resize + separable convolution —
one fused jit program, no per-level host loop at runtime.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(h: int, w: int, n_levels: int, scale_factor: float) -> List[Tuple[int, int]]:
    """Static per-level (H, W), mirroring cv::resize rounding (ORBExtractor.cc:287)."""
    out = []
    for l in range(n_levels):
        inv = 1.0 / (scale_factor ** l)
        out.append((int(round(h * inv)), int(round(w * inv))))
    return out


def _gaussian_kernel_1d(ksize: int = 7, sigma: float = 2.0) -> np.ndarray:
    x = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable 2-pass Gaussian blur with edge replication, [H, W] f32."""
    k = jnp.asarray(_gaussian_kernel_1d(ksize, sigma))
    pad = ksize // 2
    x = jnp.pad(img, ((pad, pad), (0, 0)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, :, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="edge")
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, None, :], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return x


@partial(jax.jit, static_argnames=("n_levels", "scale_factor"))
def build_pyramid(img: jnp.ndarray, n_levels: int = 8, scale_factor: float = 1.2):
    """[H, W] f32 → tuple of [Hl, Wl] f32 levels.

    Bilinear downsampling (cv::resize INTER_LINEAR equivalent,
    ORBExtractor.cc:287) from the previous level, matching the reference's
    successive-resize chain rather than resizing level 0 each time.

    Unlike the reference there is NO per-level Gaussian-blurred copy
    (ORBExtractor.cc:311-318): BRIEF blurs only its extracted patches
    (ops.brief.blur_patches) — whole-level blurs cost ~32 ms/image on TPU
    for values that are never read outside keypoint neighbourhoods.
    """
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale_factor)
    # bf16 image plane: halves HBM traffic of every image-space op (FAST's 16
    # rolled copies, canvas, patch gathers).  Intensities ≤255 carry ~0.5 grey
    # levels of rounding — far below FAST thresholds and BRIEF noise floors;
    # stages needing accumulation precision (SAD, moments) upcast locally.
    levels = [img.astype(jnp.bfloat16)]
    for l in range(1, n_levels):
        prev = levels[-1]
        levels.append(jax.image.resize(prev, shapes[l], method="linear"))
    return tuple(levels)
