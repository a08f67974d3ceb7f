"""Global bundle adjustment: PCG on the Schur-reduced camera system.

The dense-S engine (solvers.schur_ba) is right for local windows, but a full
map has C ≈ 10³ keyframes and P ≈ 2.5·10⁵ landmarks — the camera-point
coupling matrix B is far too large to materialize.  This engine never forms
S: each Gauss-Newton step solves  S·dx = −b̃  by preconditioned conjugate
gradients where one matvec

    S x = (Hcc + λI) x − Σ_p G_p · Wp_p · G_pᵀ x          (per-point gather/scatter)

costs O(#obs) work in the **per-point edge layout**: ``obs_* [P, O]`` arrays
(exactly the map's bounded reverse observation index, mp_obs_kf/mp_obs_feat).

**Distribution** (replaces the reference's "no distributed backend",
SURVEY.md §5.8): shard the P dimension over a ``jax.sharding.Mesh`` with
shard_map — every per-point term is embarrassingly parallel, and the only
cross-device traffic is a ``psum`` of camera-space vectors ([C, 6] — a few
hundred KB) per matvec plus one psum of Hcc/b per GN step.  Collectives ride
ICI; the single-chip path pays zero collective cost (no mesh → plain jit).

Replaces Optimizer::globalOptimization (reference src/Optimizer.cc:934-1043,
g2o LM with 10 iterations over the whole map).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import se3
from ..geometry.camera import CameraParams
from ..geometry.robust import huber_weight


class PointBAProblem(NamedTuple):
    """Per-point edge layout: P point slots × O observations each."""

    cam_Tcw: jnp.ndarray      # f32[C, 4, 4]
    cam_free: jnp.ndarray     # bool[C]
    pt_pos: jnp.ndarray       # f32[P, 3]
    pt_valid: jnp.ndarray     # bool[P]
    obs_cam: jnp.ndarray      # i32[P, O] camera slot (−1 = none)
    obs_uv: jnp.ndarray       # f32[P, O, 2]
    obs_right_u: jnp.ndarray  # f32[P, O] (−1 = mono)
    obs_inv_sigma2: jnp.ndarray  # f32[P, O]
    obs_valid: jnp.ndarray    # bool[P, O]


def _point_edge_terms(cam: CameraParams, prob: PointBAProblem, Tcw: jnp.ndarray, pts: jnp.ndarray):
    C = Tcw.shape[0]
    ci = jnp.clip(prob.obs_cam, 0, C - 1)
    R = se3.R_of(Tcw)[ci]                     # [P, O, 3, 3]
    t = se3.t_of(Tcw)[ci]                     # [P, O, 3]
    pc = jnp.einsum("poij,pj->poi", R, pts) + t
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    z = jnp.where(z > 1e-6, z, 1e-6)
    inv_z = 1.0 / z
    inv_z2 = inv_z * inv_z
    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    ur = u - cam.bf * inv_z
    is_stereo = prob.obs_right_u > 0
    r = jnp.stack(
        [u - prob.obs_uv[..., 0], v - prob.obs_uv[..., 1],
         jnp.where(is_stereo, ur - prob.obs_right_u, 0.0)],
        axis=-1,
    )
    zero = jnp.zeros_like(z)
    du = jnp.stack([cam.fx * inv_z, zero, -cam.fx * x * inv_z2], axis=-1)
    dv = jnp.stack([zero, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
    dur = du + jnp.stack([zero, zero, cam.bf * inv_z2], axis=-1)
    dpix = jnp.stack([du, dv, dur], axis=-2)  # [P, O, 3, 3]
    I = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    dpc_dxi = jnp.concatenate([I, -se3.hat(pc)], axis=-1)  # [P, O, 3, 6]
    Jc = dpix @ dpc_dxi
    Jp = dpix @ R                             # ∂pc/∂pw = R
    dim = jnp.stack([jnp.ones_like(is_stereo), jnp.ones_like(is_stereo), is_stereo], -1).astype(jnp.float32)
    return r, Jc, Jp, dim


def _chi2_point(cam, prob, Tcw, pts):
    r, _, _, dim = _point_edge_terms(cam, prob, Tcw, pts)
    return jnp.sum(r * r * dim, axis=-1) * prob.obs_inv_sigma2


def _gn_step(cam, prob, Tcw, pts, gate, lam, pcg_iters, chi2_th, axis: Optional[str]):
    """One robust GN step with PCG-Schur solve.  If ``axis`` is given, the
    P-dimension arrays are device-local shards and camera-space reductions are
    psummed over that mesh axis."""
    C = Tcw.shape[0]
    O = prob.obs_cam.shape[1]

    def allsum(v):
        return jax.lax.psum(v, axis) if axis else v

    r, Jc, Jp, dim = _point_edge_terms(cam, prob, Tcw, pts)
    chi2 = jnp.sum(r * r * dim, axis=-1) * prob.obs_inv_sigma2
    w = gate.astype(jnp.float32) * prob.obs_inv_sigma2 * huber_weight(chi2, chi2_th)
    # truncated influence: degenerate edges (χ² ≥ 1e4×th) contribute nothing
    w = jnp.where(chi2 < 1e4 * chi2_th, w, 0.0)
    # fixed cameras contribute no camera gradient
    free_o = prob.cam_free[jnp.clip(prob.obs_cam, 0, C - 1)]
    Jc = jnp.where(free_o[..., None, None], Jc, 0.0)
    wm = w[..., None] * dim

    Hpp = jnp.einsum("poki,pok,pokj->pij", Jp, wm, Jp)
    b_p = jnp.einsum("poki,pok,pok->pi", Jp, wm, r)
    G = jnp.einsum("poki,pok,pokj->poij", Jc, wm, Jp)      # [P, O, 6, 3]

    from .linalg_small import inv3

    lamI = lam * jnp.eye(3)
    Wp = inv3(Hpp + lamI[None] + 1e-9 * jnp.eye(3)[None])
    Wp = jnp.where(prob.pt_valid[:, None, None], Wp, 0.0)

    # camera-space accumulators (psum across point shards)
    ci = jnp.where(prob.obs_valid, prob.obs_cam, C)
    Hcc_e = jnp.einsum("poki,pok,pokj->poij", Jc, wm, Jc).reshape(-1, 6, 6)
    b_c_e = jnp.einsum("poki,pok,pok->poi", Jc, wm, r).reshape(-1, 6)
    flat_ci = ci.reshape(-1)
    Hcc = allsum(jnp.zeros((C + 1, 6, 6)).at[flat_ci].add(Hcc_e)[:C])
    b_c = allsum(jnp.zeros((C + 1, 6)).at[flat_ci].add(b_c_e)[:C])

    # b̃ = b_c − Σ_p G Wp b_p
    Wb = jnp.einsum("pij,pj->pi", Wp, b_p)
    corr_e = jnp.einsum("poij,pj->poi", G, Wb).reshape(-1, 6)
    b_schur = b_c - allsum(jnp.zeros((C + 1, 6)).at[flat_ci].add(corr_e)[:C])

    anchor = jnp.where(prob.cam_free, 0.0, 1.0)

    def matvec(x):  # x [C, 6]
        y = jnp.einsum("cij,cj->ci", Hcc, x) + lam * x + anchor[:, None] * x
        xg = x[jnp.clip(prob.obs_cam, 0, C - 1)]           # [P, O, 6]
        tp = jnp.einsum("poij,poi->pj", G, xg)             # Σ_o Gᵀ x
        tp = jnp.einsum("pij,pj->pi", Wp, tp)
        back_e = jnp.einsum("poij,pj->poi", G, tp).reshape(-1, 6)
        y = y - allsum(jnp.zeros((C + 1, 6)).at[flat_ci].add(back_e)[:C])
        return y

    # Jacobi (block-diagonal) preconditioner from Hcc, applied via an
    # unrolled batched 6×6 Cholesky solve (generic batched inv is slow on TPU)
    from .linalg_small import cholesky_solve_spd

    Hcc_p = Hcc + (lam + 1.0) * jnp.eye(6)[None]

    def precond(v):
        return cholesky_solve_spd(Hcc_p, v)

    b = -b_schur

    def pcg_body(_, carry):
        x, rres, p, rz = carry
        Ap = matvec(p)
        denom = jnp.sum(p * Ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-12, rz / denom, 0.0)
        x = x + alpha * p
        rres = rres - alpha * Ap
        z = precond(rres)
        rz_new = jnp.sum(rres * z)
        beta = jnp.where(jnp.abs(rz) > 1e-12, rz_new / rz, 0.0)
        p = z + beta * p
        return x, rres, p, rz_new

    x0 = jnp.zeros_like(b)
    z0 = precond(b)
    carry = (x0, b, z0, jnp.sum(b * z0))
    dx_c, *_ = jax.lax.fori_loop(0, pcg_iters, pcg_body, carry)
    dx_c = jnp.where(jnp.isfinite(dx_c), dx_c, 0.0)
    dx_c = jnp.where(prob.cam_free[:, None], dx_c, 0.0)

    # landmark back-substitution (local per shard)
    xg = dx_c[jnp.clip(prob.obs_cam, 0, C - 1)]
    tp = jnp.einsum("poij,poi->pj", G, xg)
    dx_p = -jnp.einsum("pij,pj->pi", Wp, b_p + tp)
    dx_p = jnp.where(jnp.isfinite(dx_p) & prob.pt_valid[:, None], dx_p, 0.0)

    Tcw_new = se3.normalize(se3.exp(dx_c) @ Tcw)
    pts_new = pts + dx_p
    return Tcw_new, pts_new


def solve_global_ba(
    cam: CameraParams,
    prob: PointBAProblem,
    *,
    chi2_mono: float = 5.991,
    chi2_stereo: float = 7.815,
    phase_iters: Tuple[int, int] = (5, 5),
    pcg_iters: int = 40,
    lam: float = 1e-3,
    axis: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-phase robust global BA (gate between phases, mirroring the
    reference's 10-iteration global g2o run, Optimizer.cc:934-1043).
    Returns (cam_Tcw, pt_pos, obs_inlier)."""
    chi2_th = jnp.where(prob.obs_right_u > 0, chi2_stereo, chi2_mono)
    Tcw, pts = prob.cam_Tcw, prob.pt_pos
    gate = prob.obs_valid
    for n_iters in phase_iters:
        def body(_, carry):
            T, p = carry
            return _gn_step(cam, prob, T, p, gate, lam, pcg_iters, chi2_th, axis)

        Tcw, pts = jax.lax.fori_loop(0, n_iters, body, (Tcw, pts))
        chi2 = _chi2_point(cam, prob, Tcw, pts)
        gate = prob.obs_valid & (chi2 < chi2_th)
    return Tcw, pts, gate


def solve_global_ba_sharded(
    cam: CameraParams,
    prob: PointBAProblem,
    mesh: Mesh,
    axis: str = "ba",
    **kw,
):
    """Distributed global BA: points sharded over ``mesh[axis]``, cameras
    replicated, reductions via psum over ICI (SURVEY.md §5.8)."""
    from jax import shard_map

    pspec = P(axis)
    rep = P()
    in_specs = PointBAProblem(
        cam_Tcw=rep, cam_free=rep,
        pt_pos=pspec, pt_valid=pspec,
        obs_cam=pspec, obs_uv=pspec, obs_right_u=pspec,
        obs_inv_sigma2=pspec, obs_valid=pspec,
    )

    def run(p):
        return solve_global_ba(cam, p, axis=axis, **kw)

    fn = shard_map(
        run, mesh=mesh,
        in_specs=(in_specs,),
        out_specs=(rep, pspec, pspec),
    )
    return fn(prob)
