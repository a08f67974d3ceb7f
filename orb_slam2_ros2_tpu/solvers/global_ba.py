"""Whole-map global bundle adjustment over the device-resident map.

Replaces Optimizer::globalOptimization + LoopClosing::runGlobalBA (reference
src/Optimizer.cc:934-1043, src/LoopClosing.cc:92-169).  The map's bounded
reverse observation index (mp_obs_kf / mp_obs_feat) IS the per-point edge
layout the PCG-Schur engine consumes, so extraction is pure gathering.  The
reference's async-safe scratch poses (mTcwGBA, committed after stopping the
mapper) are unnecessary: the update is one functional state transition.

Two execution modes:

- ``global_ba``: the synchronous whole-solve (CLI / tests / public API).
- ``start_global_ba`` / ``step_global_ba`` / ``commit_global_ba``: the
  amortized background mode the SLAM loop uses after a loop closure — the
  solve runs as per-idle-frame chunks on a snapshot problem, then commits
  with the reference's spanning-tree propagation for keyframes/map points
  created during the solve (LoopClosing.cc:109-166).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import se3
from ..geometry.camera import CameraParams
from ..mapstate.map_state import MapState
from .pcg_ba import (
    GlobalBAProblem,
    PointBAProblem,
    global_ba_phase,
    point_to_global,
    solve_global_ba,
    solve_global_ba_sharded,
)


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
    lam: float = 0.1,
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


# --------------------------------------------------------------------------
# amortized background GBA (chunked solve + scratch-commit)
# --------------------------------------------------------------------------

class PendingGBA(NamedTuple):
    """A global BA in flight: the snapshot problem, the evolving iterate, and
    the snapshot watermarks needed to commit onto a map that kept growing
    (the reference's mTcwGBA/mPGBA scratch protocol, Optimizer.cc:1030-1042 +
    the spanning-tree propagation in LoopClosing::runGlobalBA :109-166)."""

    prob: GlobalBAProblem
    Tcw: jnp.ndarray          # f32[K, 4, 4] evolving camera iterate
    ptsT: jnp.ndarray         # f32[3, M] evolving point iterate
    pt_in_ba: jnp.ndarray     # bool[M] points the solve optimizes
    snap_next_kf: int         # host ints: allocation watermarks at snapshot
    snap_next_mp: int
    chunks_done: int


def _compact_global(prob: GlobalBAProblem, n_kf: int, n_mp: int) -> GlobalBAProblem:
    """Slice the problem to the live allocation watermarks (bump allocation
    is contiguous, so ids < watermark cover every live slot).  The stores are
    capacity-padded (e.g. 262k point slots holding 5k live points); solving
    over the padding wasted >10× the chunk's FLOPs and bandwidth."""
    K = max(((n_kf + 63) // 64) * 64, 64)
    M = max(((n_mp + 1023) // 1024) * 1024, 1024)
    K = min(K, prob.cam_Tcw.shape[0])
    M = min(M, prob.pt_pos.shape[0])
    return GlobalBAProblem(
        cam_Tcw=prob.cam_Tcw[:K], cam_free=prob.cam_free[:K],
        pt_pos=prob.pt_pos[:M], pt_valid=prob.pt_valid[:M],
        pm_cam=prob.pm_cam[:, :M], pm_uv=prob.pm_uv[:, :, :M],
        pm_right_u=prob.pm_right_u[:, :M],
        pm_inv_sigma2=prob.pm_inv_sigma2[:, :M], pm_valid=prob.pm_valid[:, :M],
        cm_pt=prob.cm_pt[:, :K], cm_uv=prob.cm_uv[:, :, :K],
        cm_right_u=prob.cm_right_u[:, :K],
        cm_inv_sigma2=prob.cm_inv_sigma2[:, :K], cm_valid=prob.cm_valid[:, :K],
    )


def start_global_ba(state: MapState, scale_factor: float = 1.2) -> PendingGBA:
    """Snapshot the map into a chunked-GBA state (no solving yet)."""
    pprob = extract_global_problem(state, scale_factor)
    prob = point_to_global(pprob)
    n_kf, n_mp = int(state.next_kf), int(state.next_mp)
    prob = _compact_global(prob, n_kf, n_mp)
    # the snapshot must OWN its buffers: extract/convert pass some live map
    # arrays through unchanged (e.g. cam_Tcw = state.kf_Tcw), and the live
    # map is donated by later keyframe programs — a chunk run frames later
    # would then read deleted buffers
    prob = jax.tree.map(jnp.copy, prob)
    return PendingGBA(
        prob=prob,
        Tcw=prob.cam_Tcw,
        ptsT=prob.pt_pos.T,
        pt_in_ba=jnp.copy(pprob.pt_valid[: prob.pt_pos.shape[0]]),
        snap_next_kf=n_kf,
        snap_next_mp=n_mp,
        chunks_done=0,
    )


def step_global_ba(
    pending: PendingGBA,
    cam: CameraParams,
    *,
    n_iters: int = 1,
    pcg_iters: int = 40,
    lam: float = 0.1,
    chi2_mono: float = 5.991,
    chi2_stereo: float = 7.815,
    robust_after: int = 1,
    mesh=None,
    axis: str = "ba",
) -> PendingGBA:
    """Advance the solve by one chunk (``n_iters`` damped-GN steps).  Chunks
    before ``robust_after`` run ungated; later chunks gate observations by
    the χ² of the entry iterate — the phase structure of ``solve_global_ba``
    spread over chunks.  Dispatches asynchronously (no host sync)."""
    robust = pending.chunks_done >= robust_after
    if mesh is not None:
        from .pcg_ba import _pad_global

        n_dev = mesh.shape[axis]
        M0 = int(pending.ptsT.shape[1])
        prob = _pad_global(pending.prob, n_dev)
        Mp = int(prob.pt_pos.shape[0])
        ptsT = jnp.pad(pending.ptsT, ((0, 0), (0, Mp - M0)))
        # cached per (mesh, axis, solver params): constructing the
        # shard_map+jit fresh per chunk re-traced every background-GBA chunk
        # (ADVICE r3 medium)
        fn = _sharded_step_jit(
            mesh, axis, n_iters, pcg_iters, lam, chi2_mono, chi2_stereo, robust
        )
        Tcw, ptsT = fn(cam, prob, pending.Tcw, ptsT)
        return pending._replace(
            Tcw=Tcw, ptsT=ptsT[:, :M0], chunks_done=pending.chunks_done + 1
        )
    Tcw, ptsT = _step_jit(
        cam, pending.prob, pending.Tcw, pending.ptsT,
        n_iters=n_iters, pcg_iters=pcg_iters, lam=lam,
        chi2_mono=chi2_mono, chi2_stereo=chi2_stereo, robust_gate=robust,
    )
    return pending._replace(Tcw=Tcw, ptsT=ptsT, chunks_done=pending.chunks_done + 1)


def _step_impl(cam, prob, Tcw, ptsT, *, n_iters, pcg_iters, lam,
               chi2_mono, chi2_stereo, robust_gate):
    return global_ba_phase(
        cam, prob, Tcw, ptsT, chi2_mono=chi2_mono, chi2_stereo=chi2_stereo,
        n_iters=n_iters, pcg_iters=pcg_iters, lam=lam,
        robust_gate=robust_gate, axis=None,
    )


_step_jit = jax.jit(
    _step_impl,
    static_argnames=("n_iters", "pcg_iters", "lam", "chi2_mono",
                     "chi2_stereo", "robust_gate"),
)


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _sharded_step_jit(mesh, axis, n_iters, pcg_iters, lam,
                      chi2_mono, chi2_stereo, robust):
    """Module-level cache of the sharded GBA chunk program (keyed on mesh +
    solver statics): every chunk after the first reuses the traced
    executable — the unsharded path's ``_step_jit`` equivalent."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    in_specs = GlobalBAProblem(
        cam_Tcw=P(), cam_free=P(),
        pt_pos=P(axis, None), pt_valid=P(axis),
        pm_cam=P(None, axis), pm_uv=P(None, None, axis),
        pm_right_u=P(None, axis), pm_inv_sigma2=P(None, axis),
        pm_valid=P(None, axis),
        cm_pt=P(None, axis), cm_uv=P(None, None, axis),
        cm_right_u=P(None, axis), cm_inv_sigma2=P(None, axis),
        cm_valid=P(None, axis),
    )

    def run(cam, p, T, pts):
        return global_ba_phase(
            cam, p, T, pts, chi2_mono=chi2_mono, chi2_stereo=chi2_stereo,
            n_iters=n_iters, pcg_iters=pcg_iters, lam=lam,
            robust_gate=robust, axis=axis,
        )

    fn = shard_map(
        run, mesh=mesh,
        in_specs=(P(), in_specs, P(), P(None, axis)),
        out_specs=(P(), P(None, axis)),
        check_vma=False,
    )
    return jax.jit(fn)


def commit_global_ba(
    state: MapState,
    pending: PendingGBA,
    *,
    propagate_depth: int | None = None,
) -> MapState:
    """Commit a finished chunked GBA onto the LIVE map (which may hold
    keyframes/map points created after the snapshot) — the reference's
    post-GBA reconciliation (LoopClosing.cc:109-166):

    - snapshot keyframes take their optimized poses verbatim;
    - keyframes created during the solve are dragged along their
      spanning-tree parent's correction ``Tcw_child · Twc_parent_old ·
      Tcw_parent_new``; the propagation depth defaults to the number of
      post-snapshot keyframes (each typically parents the previous one, so
      chains can be that long — ADVICE r3), overridable for tests;
    - map points the solve optimized take their positions verbatim;
    - all other map points are corrected through their reference keyframe's
      delta ``p' = Twc_new · (Tcw_old · p)``.
    """
    # the live map may have auto-grown past the snapshot capacities — pad the
    # solve's iterate up to the live shapes (padded slots are never selected:
    # their ids are ≥ the snapshot watermarks)
    K, M = state.kf_capacity, state.mp_capacity
    Tcw_gba, pts_gba, in_ba = pending.Tcw, pending.ptsT.T, pending.pt_in_ba
    if Tcw_gba.shape[0] < K:
        pad = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                               (K - Tcw_gba.shape[0], 4, 4))
        Tcw_gba = jnp.concatenate([Tcw_gba, pad])
    if pts_gba.shape[0] < M:
        pts_gba = jnp.pad(pts_gba, ((0, M - pts_gba.shape[0]), (0, 0)))
        in_ba = jnp.pad(in_ba, (0, M - in_ba.shape[0]))
    if propagate_depth is None:
        # every post-snapshot KF typically parents the previous one, so the
        # chain can be as long as the number of KFs created during the solve
        propagate_depth = max(4, int(state.next_kf) - pending.snap_next_kf)
    return _commit_jit(
        state, Tcw_gba, pts_gba, in_ba,
        jnp.asarray(pending.snap_next_kf, jnp.int32),
        jnp.asarray(pending.snap_next_mp, jnp.int32),
        jnp.asarray(propagate_depth, jnp.int32),
    )


def _commit_impl(state: MapState, Tcw_gba, pts_gba, pt_in_ba,
                 snap_next_kf, snap_next_mp, propagate_depth):
    K = state.kf_capacity
    M = state.mp_capacity
    kf_ids = jnp.arange(K, dtype=jnp.int32)
    old_kf = (kf_ids < snap_next_kf) & state.kf_valid

    Tcw_cur = state.kf_Tcw
    Tcw_out = jnp.where(old_kf[:, None, None], Tcw_gba, Tcw_cur)
    corrected = old_kf

    # spanning-tree propagation for post-snapshot keyframes — depth is a
    # traced scalar (dynamic fori_loop trip count) so a long solve spanning
    # many new keyframes does not recompile and never under-propagates
    def _prop(_, carry):
        Tcw_out, corrected = carry
        parent = jnp.clip(state.kf_parent, 0, K - 1)
        can = (
            ~corrected & state.kf_valid & (state.kf_parent >= 0)
            & corrected[parent]
        )
        # child_new = child_cur · inv(parent_cur) · parent_new
        delta = jnp.einsum(
            "kij,kjl->kil", jax.vmap(se3.inverse)(Tcw_cur[parent]), Tcw_out[parent]
        )
        prop = jnp.einsum("kij,kjl->kil", Tcw_cur, delta)
        Tcw_out = jnp.where(can[:, None, None], prop, Tcw_out)
        return Tcw_out, corrected | can

    Tcw_out, corrected = jax.lax.fori_loop(
        0, propagate_depth, _prop, (Tcw_out, corrected)
    )

    # map points: optimized ones take the solve's positions
    mp_ids = jnp.arange(M, dtype=jnp.int32)
    in_ba = (mp_ids < snap_next_mp) & state.mp_valid & pt_in_ba
    mp_pos = jnp.where(in_ba[:, None], pts_gba, state.mp_pos)
    # the rest ride their reference keyframe's correction
    ref = jnp.clip(state.mp_ref_kf, 0, K - 1)
    ref_ok = state.mp_valid & ~in_ba & (state.mp_ref_kf >= 0) & corrected[ref]
    p_cam = jnp.einsum("mij,mj->mi", Tcw_cur[ref][:, :3, :3], state.mp_pos) + Tcw_cur[ref][:, :3, 3]
    Twc_new = jax.vmap(se3.inverse)(Tcw_out[ref])
    p_new = jnp.einsum("mij,mj->mi", Twc_new[:, :3, :3], p_cam) + Twc_new[:, :3, 3]
    mp_pos = jnp.where(ref_ok[:, None], p_new, mp_pos)
    return state._replace(kf_Tcw=Tcw_out, mp_pos=mp_pos)


_commit_jit = jax.jit(_commit_impl)
