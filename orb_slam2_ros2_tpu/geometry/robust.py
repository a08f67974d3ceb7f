"""Robust-loss utilities shared by all solvers.

The reference uses g2o Huber kernels with δ = √5.991 (mono), √7.815 (stereo),
√9.21 (Sim3) and per-edge information = 1/σ² from the keypoint octave
(reference: src/Optimizer.cc:1084-1086 and edge setup at Optimizer.cc:70-117).
Here the same gates are plain masked array ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def huber_weight(chi2: jnp.ndarray, delta2: float) -> jnp.ndarray:
    """IRLS weight for the Huber loss given squared error ``chi2``.

    For |e| <= δ the weight is 1; beyond, δ/|e| — the standard reweighting that
    makes one GN step on the weighted quadratic equal a step on the Huber cost.
    """
    chi2 = jnp.maximum(chi2, 1e-12)
    return jnp.minimum(1.0, jnp.sqrt(delta2 / chi2))


def octave_inv_sigma2(octave: jnp.ndarray, scale_factor: float, n_levels: int) -> jnp.ndarray:
    """Per-keypoint information scale 1/σ² = 1/scale^(2·octave)
    (reference: information set to invSigma2, Optimizer.cc:74-76)."""
    del n_levels
    sigma2 = jnp.power(jnp.float32(scale_factor * scale_factor), octave.astype(jnp.float32))
    return 1.0 / sigma2


def chi2_gate(err2_weighted: jnp.ndarray, chi2_th: float) -> jnp.ndarray:
    """Inlier mask: weighted squared error under the χ² threshold
    (reference gating rounds, Optimizer.cc:144-171)."""
    return err2_weighted < chi2_th
