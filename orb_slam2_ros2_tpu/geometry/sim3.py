"""Sim(3) similarity transforms.

The reference's ``Sim3Ret`` struct carries (R, t, s) with ``inv()`` and
composition operators for Sim3∘Sim3 and Sim3∘point (reference:
include/ORB_SLAM2/Sim3Solver.h:15-48, src/Sim3Solver.cc:261-271).  Here a
Sim3 is a pytree of ``(R [...,3,3], t [...,3], s [...])`` with the same
algebra, plus exp/log on sim(3) for the essential-graph optimizer
(replacing g2o's VertexSim3Expmap, reference src/Optimizer.cc:746-920).

Action on points: ``S(p) = s * R @ p + t`` (matches Sim3Ret::operator*,
Sim3Solver.cc:268-271).  The exp/log maps use the standard closed-form W
matrix (as in Sophus/Eade) with Taylor fallbacks near the degenerate corners.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import se3

_EPS_SQ = 1e-10
_EPS = 1e-5


class Sim3(NamedTuple):
    R: jnp.ndarray  # [..., 3, 3]
    t: jnp.ndarray  # [..., 3]
    s: jnp.ndarray  # [...]


def identity(batch: tuple = ()) -> Sim3:
    return Sim3(
        R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (*batch, 3, 3)),
        t=jnp.zeros((*batch, 3), jnp.float32),
        s=jnp.ones(batch, jnp.float32),
    )


def from_se3(T: jnp.ndarray, s=None) -> Sim3:
    scale = jnp.ones(T.shape[:-2], T.dtype) if s is None else jnp.asarray(s, T.dtype)
    return Sim3(R=se3.R_of(T), t=se3.t_of(T), s=scale)


def to_se3(S: Sim3) -> jnp.ndarray:
    """Drop scale into translation: returns [R, t/s] as SE3 — the reference's
    convention when committing corrected Sim3 poses back to keyframes
    (src/Optimizer.cc:898-906 divides translation by scale)."""
    return se3.from_Rt(S.R, S.t / S.s[..., None])


def inverse(S: Sim3) -> Sim3:
    Rt = jnp.swapaxes(S.R, -1, -2)
    s_inv = 1.0 / S.s
    return Sim3(R=Rt, t=-s_inv[..., None] * jnp.einsum("...ij,...j->...i", Rt, S.t), s=s_inv)


def compose(A: Sim3, B: Sim3) -> Sim3:
    """A ∘ B: (A∘B)(p) = A(B(p))."""
    return Sim3(
        R=A.R @ B.R,
        t=A.s[..., None] * jnp.einsum("...ij,...j->...i", A.R, B.t) + A.t,
        s=A.s * B.s,
    )


def apply(S: Sim3, p: jnp.ndarray) -> jnp.ndarray:
    """Transform points p [..., 3]: s R p + t."""
    return S.s[..., None] * jnp.einsum("...ij,...j->...i", S.R, p) + S.t


def _calc_W(phi: jnp.ndarray, sigma: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """W such that exp([rho, phi, sigma]).t == W @ rho.

    W = A·K + B·K² + C·I  with K = hat(phi); branch-free select over the four
    (θ small / σ small) regimes.
    """
    K = se3.hat(phi)
    K2 = K @ K
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta_sq + _EPS_SQ)
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    sigma_sq = sigma * sigma
    small_sig = jnp.abs(sigma) < _EPS
    small_th = theta_sq < _EPS_SQ * 10

    one = jnp.ones_like(sigma)
    # Clamp-based guards (NOT where-guards): gradients flow through every
    # branch of a jnp.where, so an unselected 0/0 branch still yields NaN
    # Jacobians.  Clamping denominators keeps both value and derivative
    # finite everywhere; the select then picks the accurate branch.
    th_sq_c = jnp.maximum(theta_sq, 1e-10)
    sig_c = jnp.where(sigma >= 0, jnp.maximum(sigma, _EPS), jnp.minimum(sigma, -_EPS))

    # σ small:
    C_s = one
    A_ss = 0.5 * one                      # θ small too
    B_ss = one / 6.0
    A_sl = (1.0 - cos_t) / th_sq_c        # θ large
    B_sl = (theta - sin_t) / (th_sq_c * theta)

    # σ large:
    C_l = (scale - 1.0) / sig_c
    A_ls = ((sigma - 1.0) * scale + 1.0) / (sig_c * sig_c)                # θ small
    B_ls = (scale * (0.5 * sigma_sq - sigma + 1.0) - 1.0) / (sig_c * sig_c * sig_c)
    a = scale * sin_t
    b = scale * cos_t
    c = jnp.maximum(theta_sq + sigma_sq, 1e-12)
    A_ll = (a * sigma + (1.0 - b) * theta) / (theta * c)                  # θ large
    B_ll = (C_l - ((b - 1.0) * sigma + a * theta) / c) / th_sq_c

    A = jnp.where(small_sig, jnp.where(small_th, A_ss, A_sl), jnp.where(small_th, A_ls, A_ll))
    B = jnp.where(small_sig, jnp.where(small_th, B_ss, B_sl), jnp.where(small_th, B_ls, B_ll))
    C = jnp.where(small_sig, C_s, C_l)

    I = jnp.eye(3, dtype=phi.dtype)
    return A[..., None, None] * K + B[..., None, None] * K2 + C[..., None, None] * I


def exp(xi: jnp.ndarray) -> Sim3:
    """sim(3) exp.  xi = [rho(3), phi(3), sigma(1)] -> Sim3."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    scale = jnp.exp(sigma)
    R = se3.so3_exp(phi)
    W = _calc_W(phi, sigma, scale)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return Sim3(R=R, t=t, s=scale)


def log(S: Sim3) -> jnp.ndarray:
    """sim(3) log: solve W rho = t with W rebuilt from (phi, sigma)."""
    phi = se3.so3_log(S.R)
    sigma = jnp.log(S.s)
    W = _calc_W(phi, sigma, S.s)
    rho = jnp.linalg.solve(W, S.t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
