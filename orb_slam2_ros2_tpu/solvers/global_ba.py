"""Whole-map global bundle adjustment over the device-resident map.

Replaces Optimizer::globalOptimization + LoopClosing::runGlobalBA (reference
src/Optimizer.cc:934-1043, src/LoopClosing.cc:92-169).  The map's bounded
reverse observation index (mp_obs_kf / mp_obs_feat) IS the per-point edge
layout the PCG-Schur engine consumes, so extraction is pure gathering.  The
reference's async-safe scratch poses (mTcwGBA, committed after stopping the
mapper) are unnecessary: the update is one functional state transition.
"""

from __future__ import annotations


import jax.numpy as jnp

from ..geometry.camera import CameraParams
from ..mapstate.map_state import MapState
from .pcg_ba import PointBAProblem, solve_global_ba, solve_global_ba_sharded


def extract_global_problem(state: MapState, scale_factor: float = 1.2) -> PointBAProblem:
    K = state.kf_capacity
    M = state.mp_capacity
    N = state.kf_uv.shape[1]

    obs_kf = state.mp_obs_kf                  # [M, O]
    obs_feat = state.mp_obs_feat
    ok = (obs_kf >= 0) & state.mp_valid[:, None]
    kfc = jnp.clip(obs_kf, 0, K - 1)
    ftc = jnp.clip(obs_feat, 0, N - 1)
    # observation must still point back at this map point (fuse/cull may have
    # repointed the slot)
    backlink = state.kf_mp_idx[kfc, ftc] == jnp.arange(M)[:, None]
    ok = ok & backlink & state.kf_valid[kfc]

    inv_sigma2 = jnp.power(
        jnp.float32(1.0 / (scale_factor * scale_factor)),
        state.kf_octave[kfc, ftc].astype(jnp.float32),
    )
    # gauge: keyframe 0 fixed (Optimizer.cc:957-961); invalid slots anchored
    cam_free = state.kf_valid & (jnp.arange(K) != 0)
    return PointBAProblem(
        cam_Tcw=state.kf_Tcw,
        cam_free=cam_free,
        pt_pos=state.mp_pos,
        pt_valid=state.mp_valid & jnp.any(ok, axis=1),
        obs_cam=jnp.where(ok, obs_kf, -1),
        obs_uv=state.kf_uv[kfc, ftc],
        obs_right_u=jnp.where(ok, state.kf_right_u[kfc, ftc], -1.0),
        obs_inv_sigma2=inv_sigma2,
        obs_valid=ok,
    )


def global_ba(
    state: MapState,
    cam: CameraParams,
    *,
    scale_factor: float = 1.2,
    phase_iters=(5, 5),
    pcg_iters: int = 40,
    lam: float = 1e-3,
    mesh=None,
    axis: str = "ba",
) -> MapState:
    """Run global BA (optionally sharded over ``mesh``) and commit results."""
    prob = extract_global_problem(state, scale_factor)
    if mesh is not None:
        Tcw, pts, _ = solve_global_ba_sharded(
            cam, prob, mesh, axis=axis,
            phase_iters=phase_iters, pcg_iters=pcg_iters, lam=lam,
        )
    else:
        Tcw, pts, _ = solve_global_ba(
            cam, prob, phase_iters=phase_iters, pcg_iters=pcg_iters, lam=lam,
        )
    kf_Tcw = jnp.where(state.kf_valid[:, None, None], Tcw, state.kf_Tcw)
    mp_pos = jnp.where(prob.pt_valid[:, None], pts, state.mp_pos)
    return state._replace(kf_Tcw=kf_Tcw, mp_pos=mp_pos)
