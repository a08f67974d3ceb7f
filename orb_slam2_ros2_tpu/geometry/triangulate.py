"""Batched two-view triangulation.

The reference triangulates one candidate pair at a time with an OpenCV SVD on
the 4×4 DLT system, gated by the singular-value ratio σ₃/σ₂ > 1e-3
(reference: src/LocalMapping.cc:311-339 ``triangulate``).  Here the DLT is
built for *all* candidate matches at once and solved with a vmapped SVD —
one XLA batched kernel instead of a per-point loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3
from .camera import CameraParams


def dlt_rows(cam: CameraParams, Tcw: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Two DLT rows for one view: [..., 2, 4].

    Rows are ``x·P3 - P1`` and ``y·P3 - P2`` with P = K[R|t] and (x, y) the
    *normalized* coords, matching the reference's construction
    (LocalMapping.cc:316-325 uses unprojected unit-depth points).
    """
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    P = Tcw[..., :3, :]  # [R|t], 3×4
    r0 = x[..., None] * P[..., 2, :] - P[..., 0, :]
    r1 = y[..., None] * P[..., 2, :] - P[..., 1, :]
    return jnp.stack([r0, r1], axis=-2)


def triangulate_pairs(
    cam: CameraParams,
    Tcw1: jnp.ndarray,  # [..., 4, 4] world→cam1
    uv1: jnp.ndarray,   # [..., 2]
    Tcw2: jnp.ndarray,
    uv2: jnp.ndarray,
    rank_gate: float = 1e-3,
):
    """DLT-triangulate matched observations.

    Returns (points_w [..., 3], ok [...]).  The reference accepts a solution
    only when the smallest singular value is a clean 1-D null space:
    it *rejects* when σ₄/σ₃ > 1e-3 (LocalMapping.cc:329-331).  We add a
    second guard σ₃ > ε·σ₁ to also reject the doubly-degenerate case
    (e.g. zero baseline) where σ₃ ≈ σ₄ ≈ 0 and the ratio is meaningless.
    """
    A = jnp.concatenate([dlt_rows(cam, Tcw1, uv1), dlt_rows(cam, Tcw2, uv2)], axis=-2)
    _, s, vt = jnp.linalg.svd(A, full_matrices=True)
    X = vt[..., 3, :]
    w = X[..., 3]
    ok_rank = s[..., 3] <= rank_gate * jnp.maximum(s[..., 2], 1e-20)
    ok_nondegen = s[..., 2] > 1e-6 * s[..., 0]
    ok_w = jnp.abs(w) > 1e-12
    pw = X[..., :3] / jnp.where(ok_w, w, 1.0)[..., None]
    return pw, ok_rank & ok_nondegen & ok_w


def parallax_cos(
    Tcw1: jnp.ndarray, uv1_norm: jnp.ndarray, Tcw2: jnp.ndarray, uv2_norm: jnp.ndarray
) -> jnp.ndarray:
    """Cosine of the ray parallax angle between two views for normalized image
    coords [..., 2] (reference parallax choice, LocalMapping.cc:231-259).
    Rays are rotated into the world frame; smaller cos = larger parallax."""
    r1 = jnp.concatenate([uv1_norm, jnp.ones_like(uv1_norm[..., :1])], axis=-1)
    r2 = jnp.concatenate([uv2_norm, jnp.ones_like(uv2_norm[..., :1])], axis=-1)
    Rwc1 = jnp.swapaxes(se3.R_of(Tcw1), -1, -2)
    Rwc2 = jnp.swapaxes(se3.R_of(Tcw2), -1, -2)
    d1 = jnp.einsum("...ij,...j->...i", Rwc1, r1)
    d2 = jnp.einsum("...ij,...j->...i", Rwc2, r2)
    num = jnp.sum(d1 * d2, axis=-1)
    den = jnp.linalg.norm(d1, axis=-1) * jnp.linalg.norm(d2, axis=-1)
    return num / jnp.maximum(den, 1e-12)


def depth_in_view(Tcw: jnp.ndarray, pw: jnp.ndarray) -> jnp.ndarray:
    """z-coordinate of world points in a camera (positive-depth checks,
    LocalMapping.cc:265-271)."""
    return se3.apply(Tcw, pw)[..., 2]
