"""Loop closing: detection, Sim3 verification, correction, optimization.

Replaces the reference's LoopClosing thread (src/LoopClosing.cc):
- ``detect``: keyframe-database retrieval + covisibility-consistency chains
  of ≥3 consecutive detections (:218-282) — chain bookkeeping on the host
  over device query results;
- ``compute_sim3``: dense descriptor matching of map-point-bearing features,
  batched Sim3-RANSAC, GN refinement, neighbourhood-projection verification
  (:300-415, Sim3Solver.cc, Optimizer.cc:464-619);
- ``correct``: propagate the corrected Sim3 through the current covisibility
  group, transform their map points, fuse duplicates, optimize the essential
  graph, then run global BA (:432-541, :92-169).

All numeric stages are jitted; the host only sequences them and keeps the
consistency-chain sets (tiny python state, mirroring mvConsistentGroups).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..bow.keyframe_db import KeyFrameDB, find_loop_candidates
from ..bow.vocabulary import Vocabulary, bow_vector, transform
from ..config import SLAMConfig
from ..geometry import se3, sim3
from ..geometry.camera import CameraParams, unproject
from ..mapstate.map_state import MapState, _covis_row_for_kf
from ..ops.hamming import hamming_matrix
from ..solvers.global_ba import global_ba
from ..solvers.pose_graph import (
    PoseGraphProblem,
    make_relative_measurements,
    optimize_pose_graph,
)
from ..solvers.sim3_solver import optimize_sim3, ransac_sim3


def match_mappoint_features(
    state: MapState, kf1, kf2, *, max_dist: int = 50, ratio: float = 0.75
):
    """Dense hamming matching between the map-point-bearing features of two
    keyframes.  Returns per-feature-of-kf1 match indices into kf2 and the
    matched map-point camera-frame positions (pc1, pc2).

    Replaces the BoW-bucketed searchByBow used at LoopClosing.cc:315-320 —
    dense N×N hamming on the MXU needs no buckets.
    """
    N = state.kf_uv.shape[1]
    M = state.mp_capacity
    has1 = state.kf_feat_valid[kf1] & (state.kf_mp_idx[kf1] >= 0)
    has2 = state.kf_feat_valid[kf2] & (state.kf_mp_idx[kf2] >= 0)
    dist = hamming_matrix(state.kf_desc[kf1], state.kf_desc[kf2])
    cand = has1[:, None] & has2[None, :]
    BIG = 1 << 20
    masked = jnp.where(cand, dist, BIG)
    best = jnp.min(masked, axis=1)
    bj = jnp.argmin(masked, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, masked.shape, 1)
    second = jnp.min(jnp.where(cols == bj[:, None], BIG, masked), axis=1)
    ok = (best <= max_dist) & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    # mutual best
    best_i = jnp.argmin(masked, axis=0)
    ok = ok & (best_i[bj] == jnp.arange(N))

    mp1 = state.kf_mp_idx[kf1]
    mp2 = state.kf_mp_idx[kf2][bj]
    p1w = state.mp_pos[jnp.clip(mp1, 0, M - 1)]
    p2w = state.mp_pos[jnp.clip(mp2, 0, M - 1)]
    pc1 = se3.apply(state.kf_Tcw[kf1], p1w)
    pc2 = se3.apply(state.kf_Tcw[kf2], p2w)
    ok = ok & (pc1[:, 2] > 0) & (pc2[:, 2] > 0)
    oct1 = state.kf_octave[kf1]
    oct2 = state.kf_octave[kf2][bj]
    return ok, bj, pc1, pc2, oct1, oct2, mp1, mp2


class LoopCloser:
    """Host orchestrator of the loop-closing stages."""

    def __init__(self, cfg: SLAMConfig, vocab: Vocabulary):
        self.cfg = cfg
        self.vocab = vocab
        self.db = KeyFrameDB.empty(cfg.map.max_keyframes, vocab.n_words)
        # consistency chains: list of (covis-group set, consecutive count)
        self.consistent_groups: List[Tuple[Set[int], int]] = []
        self.last_loop_kf = -1

        self._transform = jax.jit(partial(transform, vocab))
        self._bowvec = jax.jit(partial(bow_vector, vocab))
        self._query = jax.jit(partial(find_loop_candidates, n_candidates=5,
                                      min_covis_weight=cfg.mapping.min_covis_weight))
        self._match = jax.jit(partial(match_mappoint_features))
        self._pose_graph = jax.jit(partial(optimize_pose_graph, iters=20))
        o = cfg.orb
        self._inv_sigma2 = lambda oct: jnp.power(
            jnp.float32(1.0 / (o.scale_factor**2)), oct.astype(jnp.float32)
        )

    # ------------------------------------------------------------------
    def add_keyframe_to_db(self, state: MapState, kf_id: int) -> None:
        from ..bow.keyframe_db import add_keyframe

        self.db = add_keyframe(
            self.db, self.vocab, kf_id,
            state.kf_desc[kf_id], state.kf_feat_valid[kf_id],
        )

    # ------------------------------------------------------------------
    def detect(self, state: MapState, kf_id: int) -> Optional[int]:
        """Consistency-chained loop detection (LoopClosing.cc:218-282)."""
        if kf_id < 10 or kf_id - self.last_loop_kf < 10:
            # match the reference's early-out: no loops right after start or
            # a recent correction (LoopClosing.cc:222-231)
            return None
        words = self._transform(state.kf_desc[kf_id], state.kf_feat_valid[kf_id])
        qvec = self._bowvec(words)
        cand_ids, _ = self._query(self.db, state, qvec, kf_id)
        cand_ids = [int(c) for c in np.asarray(cand_ids) if c >= 0]
        if not cand_ids:
            self.consistent_groups = []
            return None

        covis = np.asarray(state.covis)
        th = self.cfg.loop.consistency_th
        new_groups: List[Tuple[Set[int], int]] = []
        enough: List[int] = []
        for c in cand_ids:
            group = set(np.nonzero(covis[c] >= self.cfg.mapping.min_covis_weight)[0].tolist())
            group.add(c)
            best = 0
            for prev_group, count in self.consistent_groups:
                if group & prev_group:
                    best = max(best, count + 1)
            new_groups.append((group, best))
            if best + 1 >= th:
                enough.append(c)
        self.consistent_groups = new_groups
        return enough[0] if enough else None

    # ------------------------------------------------------------------
    def compute_sim3(
        self, state: MapState, cam: CameraParams, kf_cur: int, kf_cand: int, key
    ) -> Optional[sim3.Sim3]:
        """BoW match → Sim3 RANSAC → GN → acceptance gates
        (LoopClosing.cc:300-415).  Returns S12 (cand-cam → cur-cam) or None."""
        lc = self.cfg.loop
        ok, bj, pc1, pc2, oct1, oct2, _, _ = self._match(state, kf_cur, kf_cand)
        n_matches = int(jnp.sum(ok.astype(jnp.int32)))
        if n_matches < lc.min_bow_matches:
            return None
        iv1 = self._inv_sigma2(oct1)
        iv2 = self._inv_sigma2(oct2)
        fix_scale = self.cfg.camera.camera_type in (0, 1)  # stereo/RGBD: scale fixed
        S12, inl, n_in = ransac_sim3(
            pc1, pc2, ok, cam, iv1, iv2, key, fix_scale=fix_scale,
            chi2_th=self.cfg.ba.chi2_sim3,
        )
        if int(n_in) < lc.min_sim3_inliers:
            return None
        S12, inl2, n_in2 = optimize_sim3(
            S12, pc1, pc2, ok, cam, iv1, iv2, fix_scale=fix_scale,
            chi2_th=self.cfg.ba.chi2_sim3,
        )
        if int(n_in2) < lc.min_sim3_opt_inliers:
            return None
        return S12

    # ------------------------------------------------------------------
    def correct(
        self,
        state: MapState,
        cam: CameraParams,
        kf_cur: int,
        kf_cand: int,
        S12: sim3.Sim3,
        *,
        run_gba: bool = True,
        mesh=None,
    ) -> MapState:
        """Loop correction + essential-graph optimization + global BA
        (LoopClosing.cc:432-541)."""
        state = correct_loop(
            state, cam, kf_cur, kf_cand, S12,
            min_covis_weight=self.cfg.mapping.min_covis_weight,
            essential_weight=self.cfg.loop.essential_graph_weight,
            pose_graph_fn=self._pose_graph,
        )
        if run_gba:
            state = global_ba(
                state, cam, scale_factor=self.cfg.orb.scale_factor,
                phase_iters=(3, 3), pcg_iters=self.cfg.ba.pcg_iters, mesh=mesh,
            )
        self.last_loop_kf = kf_cur
        self.consistent_groups = []
        return state


def correct_loop(
    state: MapState,
    cam: CameraParams,
    kf_cur: int,
    kf_cand: int,
    S12: sim3.Sim3,
    *,
    min_covis_weight: int,
    essential_weight: int,
    pose_graph_fn,
    max_edges: int = 8192,
) -> MapState:
    """Pose/point correction + essential graph (jit-friendly pieces).

    The corrected pose of the current keyframe is S_cw^corr = S12 ∘ T_cand_w
    composed with scale-aware algebra (LoopClosing.cc:458-513); the current
    covisibility group is dragged along via its relative poses, and every map
    point observed by the group is remapped via S_new_wc ∘ S_old_cw.
    """
    K = state.kf_capacity
    M = state.mp_capacity

    # --- corrected Sim3 pose of the current KF ---------------------------
    S_cand = sim3.from_se3(state.kf_Tcw[kf_cand])
    S_cw_corr = sim3.compose(S12, S_cand)          # world → cur (corrected)
    S_cw_old = sim3.from_se3(state.kf_Tcw[kf_cur])

    # --- current covisibility group --------------------------------------
    group_mask = (state.covis[kf_cur] >= min_covis_weight) & state.kf_valid
    group_mask = group_mask.at[kf_cur].set(True)

    # per-group-KF: S_iw_corr = (S_i_old ∘ S_cur_old⁻¹) ∘ S_cw_corr
    S_all = sim3.from_se3(state.kf_Tcw)            # [K]
    S_rel = sim3.compose(S_all, sim3.inverse(S_cw_old))  # S_i←cur (old chain)
    S_corr = sim3.compose(S_rel, S_cw_corr)        # corrected world→i
    kf_Tcw_new = jnp.where(
        group_mask[:, None, None], sim3.to_se3(S_corr), state.kf_Tcw
    )

    # --- correct map points observed by the group -------------------------
    # p_new = S_iw_corr⁻¹ ∘ S_iw_old ∘ p  for the group member that owns it
    obs0_kf = jnp.clip(state.mp_obs_kf[:, 0], 0, K - 1)   # reference observer
    owner_in_group = group_mask[obs0_kf] & state.mp_valid
    S_old_o = jax.tree.map(lambda a: a[obs0_kf], S_all)
    S_corr_o = jax.tree.map(lambda a: a[obs0_kf], S_corr)
    p_cam = sim3.apply(S_old_o, state.mp_pos)
    p_new = sim3.apply(sim3.inverse(S_corr_o), p_cam)
    mp_pos_new = jnp.where(owner_in_group[:, None], p_new, state.mp_pos)

    state = state._replace(kf_Tcw=kf_Tcw_new, mp_pos=mp_pos_new)

    # --- record the loop edge ---------------------------------------------
    free_slots = state.loop_edges[:, 0] < 0
    # guard full list: when no slot is free, drop the edge instead of
    # overwriting slot 0 (argmax of all-False is 0)
    slot = jnp.where(jnp.any(free_slots), jnp.argmax(free_slots), state.loop_edges.shape[0])
    loop_edges = state.loop_edges.at[slot].set(jnp.asarray([kf_cur, kf_cand]), mode="drop")
    state = state._replace(loop_edges=loop_edges)

    # --- essential graph ---------------------------------------------------
    # Edge measurements MUST come from the PRE-correction poses (`S_all`,
    # captured above before kf_Tcw_new was applied) — the reference's
    # NonCorrectedSim3 (Optimizer.cc OptimizeEssentialGraph).  Vertices start
    # at the corrected poses; measuring from the corrected poses instead
    # would make every residual identically zero and the optimization a no-op.
    S_now = sim3.from_se3(state.kf_Tcw)
    ei, ej, ew = collect_essential_edges(
        state, essential_weight, max_edges
    )
    S_meas = make_relative_measurements(S_all, jnp.maximum(ei, 0), jnp.maximum(ej, 0))
    # the loop edge gets its measured constraint S12: S_cur←cand
    # appended at a reserved slot (last): e = (cand → cur) with S12 relative
    ei = ei.at[-1].set(kf_cand)
    ej = ej.at[-1].set(kf_cur)
    S_meas = sim3.Sim3(
        R=S_meas.R.at[-1].set(S12.R),
        t=S_meas.t.at[-1].set(S12.t),
        s=S_meas.s.at[-1].set(S12.s),
    )
    ew = ew.at[-1].set(1.0)
    valid_e = (ei >= 0) & (ej >= 0)
    fixed = jnp.zeros((K,), bool).at[kf_cand].set(True) | ~state.kf_valid
    prob = PoseGraphProblem(
        S_cw=S_now, kf_valid=state.kf_valid, kf_fixed=fixed,
        edge_i=jnp.maximum(ei, 0), edge_j=jnp.maximum(ej, 0),
        edge_Sji=S_meas, edge_valid=valid_e, edge_weight=ew,
    )
    S_opt = pose_graph_fn(prob)

    # commit: poses back to SE3 (divide translation by scale), points corrected
    # via S_wc_new ∘ S_cw_old (Optimizer.cc:898-918)
    obs0_kf2 = jnp.clip(state.mp_obs_kf[:, 0], 0, K - 1)
    S_old_all = S_now
    S_old_o2 = jax.tree.map(lambda a: a[obs0_kf2], S_old_all)
    S_new_o2 = jax.tree.map(lambda a: a[obs0_kf2], S_opt)
    p_cam2 = sim3.apply(S_old_o2, state.mp_pos)
    p_new2 = sim3.apply(sim3.inverse(S_new_o2), p_cam2)
    mp_pos2 = jnp.where(state.mp_valid[:, None], p_new2, state.mp_pos)
    kf_Tcw2 = jnp.where(state.kf_valid[:, None, None], sim3.to_se3(S_opt), state.kf_Tcw)
    return state._replace(kf_Tcw=kf_Tcw2, mp_pos=mp_pos2)


def collect_essential_edges(state: MapState, essential_weight: int, max_edges: int):
    """Essential-graph edge set: spanning tree ∪ loop edges ∪ covis ≥ 100
    (reference Optimizer.cc:790-877).  Returns padded (ei, ej, weight); the
    LAST slot is reserved for the new loop constraint."""
    K = state.kf_capacity
    # spanning tree
    child = jnp.arange(K)
    parent = state.kf_parent
    tree_ok = (parent >= 0) & state.kf_valid

    # strong covisibility (upper triangle)
    iu = jnp.triu_indices(K, k=1)
    w = state.covis[iu]
    covis_ok = (w >= essential_weight) & state.kf_valid[iu[0]] & state.kf_valid[iu[1]]

    # bounded compaction: tree edges first, then strongest covis
    score = jnp.where(covis_ok, w, 0)
    n_covis = min(max_edges - K - state.loop_edges.shape[0] - 1, int(score.shape[0]))
    topw, topi = jax.lax.top_k(score, n_covis)
    cov_i = jnp.where(topw > 0, iu[0][topi], -1)
    cov_j = jnp.where(topw > 0, iu[1][topi], -1)

    le = state.loop_edges
    le_ok = le[:, 0] >= 0

    ei = jnp.concatenate([
        jnp.where(tree_ok, parent, -1),
        cov_i,
        jnp.where(le_ok, le[:, 0], -1),
        jnp.asarray([-1]),
    ])
    ej = jnp.concatenate([
        jnp.where(tree_ok, child, -1),
        cov_j,
        jnp.where(le_ok, le[:, 1], -1),
        jnp.asarray([-1]),
    ])
    ew = jnp.ones_like(ei, jnp.float32)
    return ei, ej, ew
