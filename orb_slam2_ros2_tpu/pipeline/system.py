"""The SLAM system: full tracking + local mapping over the device-resident map.

Replaces the reference's System + Tracking + LocalMapping thread trio
(reference: src/System.cc:81-135, src/Tracking.cc, src/LocalMapping.cc) with a
host orchestrator sequencing a handful of fused jitted programs:

- ``_track``: frontend → motion-model match+opt → local-map match+opt →
  per-feature map-point assignment, one XLA program per frame;
- ``insert_keyframe`` + ``triangulate_new_points`` + ``fuse_into_keyframe`` +
  ``cull_mappoints`` (+ local BA, solvers.local_ba) run on keyframe insertion
  — the reference's LocalMapping::runOnce pipeline, amortized exactly like
  the reference's mapping thread but without shared-mutable state.

The reference's thread/mutex machinery (SURVEY.md §5.2) has no counterpart:
every step is a pure function from state to state.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SLAMConfig
from ..features.extractor import make_stereo_frontend, make_rgbd_frontend
from ..features.frame import StereoFrame
from ..geometry import se3
from ..geometry.camera import CameraParams, unproject
from ..mapstate.local_map import LocalMap, bump_tracking_counters, local_map_snapshot
from ..mapstate.map_state import MapState, empty_map, insert_keyframe
from ..mapstate.mapping import (
    cull_keyframes,
    cull_mappoints,
    fuse_into_keyframe,
    triangulate_new_points,
)
from ..matching import matcher
from ..solvers.pose_opt import PoseObs, optimize_pose
from .tracking import TrackState


class SlamFrame(NamedTuple):
    """Per-frame tracking result kept as 'last frame' state."""

    frame: StereoFrame
    Tcw: jnp.ndarray
    mp_ids: jnp.ndarray   # i32[N] map point per feature (−1 = none)


def _octave_inv_sigma2(octave: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    return jnp.power(jnp.float32(1.0 / (scale_factor * scale_factor)), octave.astype(jnp.float32))


def slam_track_step(
    cam: CameraParams,
    cur: StereoFrame,
    last: SlamFrame,
    velocity: jnp.ndarray,
    local: LocalMap,
    mp_pos: jnp.ndarray,
    mp_valid: jnp.ndarray,
    *,
    radius: float,
    proj_th: float,
    scale_factor: float,
    n_levels: int,
    baseline: float,
    width: int,
    height: int,
    max_dist: int,
    ratio_track: float,
    chi2_mono: float,
    chi2_stereo: float,
    depth_threshold: float,
):
    """One full tracking step (motion model + local map).

    Mirrors Tracking::trackMotionModel + trackLocalMap
    (reference Tracking.cc:381-406, :641-675) as one program.  Returns the new
    frame state and scalar diagnostics, plus visible/found masks aligned with
    ``local`` for the map's tracking counters.
    """
    N = cur.feats.capacity
    Tcw_pred = velocity @ last.Tcw

    # ---------- stage 1: motion-model match against the last frame --------
    last_has_mp = last.mp_ids >= 0
    # temp 3D for last frame features without map points (processLastFrame,
    # Tracking.cc:685-694): stereo unprojection at the last pose
    last_depth_ok = last.frame.feats.valid & (last.frame.depth > 0)
    pc_last = unproject(cam, last.frame.feats.uv, jnp.where(last_depth_ok, last.frame.depth, 1.0))
    pw_temp = se3.apply(se3.inverse(last.Tcw), pc_last)
    pw_last = jnp.where(
        last_has_mp[:, None], mp_pos[jnp.clip(last.mp_ids, 0, mp_pos.shape[0] - 1)], pw_temp
    )
    prev_usable = last_has_mp | last_depth_ok

    twc_cur = se3.t_of(se3.inverse(Tcw_pred))
    z_forward = se3.apply(last.Tcw, twc_cur[None])[0, 2]
    m1 = matcher.search_by_area(
        last.frame.feats, prev_usable, cur.feats, jnp.zeros((N,), bool), z_forward,
        radius=radius, scale_factor=scale_factor, n_levels=n_levels,
        baseline=baseline, max_dist=max_dist, ratio=ratio_track,
    )
    c1 = jnp.maximum(m1.idx, 0)
    obs1 = PoseObs(
        pw=pw_last,
        uv=cur.feats.uv[c1],
        right_u=cur.right_u[c1],
        inv_sigma2=_octave_inv_sigma2(cur.feats.octave[c1], scale_factor),
        is_stereo=cur.right_u[c1] > 0,
        valid=m1.found,
    )
    Tcw1, inl1, n_in1 = optimize_pose(cam, Tcw_pred, obs1, chi2_mono=chi2_mono, chi2_stereo=chi2_stereo)
    n_m1 = jnp.sum(m1.found.astype(jnp.int32))

    # per-current-feature mp assignment inherited from the last frame
    cur_mp = jnp.full((N,), -1, jnp.int32)
    src_mp = jnp.where(m1.found & last_has_mp, last.mp_ids, -1)
    cur_mp = cur_mp.at[jnp.where(src_mp >= 0, c1, N)].set(
        jnp.where(src_mp >= 0, src_mp, -1), mode="drop"
    )

    # ---------- stage 2: local-map projection matching --------------------
    m2 = matcher.search_mappoints_projection(
        cam, Tcw1,
        local.pos, local.normal, local.min_dist, local.max_dist, local.desc,
        local.valid & mp_valid[jnp.clip(local.mp_ids, 0, mp_pos.shape[0] - 1)],
        cur.feats, cur_mp >= 0,
        th=proj_th, width=width, height=height, scale_factor=scale_factor,
        n_levels=n_levels, max_dist=max_dist, ratio=0.8,
    )
    c2 = jnp.clip(m2.idx, 0, N - 1)
    cur_mp = cur_mp.at[jnp.where(m2.found, c2, N)].set(
        jnp.where(m2.found, local.mp_ids, -1), mode="drop"
    )

    # visibility bookkeeping for culling counters
    from ..matching.matcher import mappoint_visibility

    _, visible, _, _ = mappoint_visibility(
        cam, Tcw1, local.pos, local.normal, local.min_dist, local.max_dist,
        width=width, height=height, scale_factor=scale_factor, n_levels=n_levels,
    )
    visible = visible & local.valid

    # ---------- stage 3: pose refinement on the full map-point set --------
    has_mp = cur_mp >= 0
    mp_c = jnp.clip(cur_mp, 0, mp_pos.shape[0] - 1)
    # keep temp-point motion matches in the refinement as mono/stereo anchors
    temp_obs_pw = jnp.zeros((N, 3), jnp.float32)
    temp_valid = jnp.zeros((N,), bool)
    temp_obs_pw = temp_obs_pw.at[jnp.where(m1.found & ~(src_mp >= 0), c1, N)].set(
        pw_last, mode="drop"
    )
    temp_valid = temp_valid.at[jnp.where(m1.found & ~(src_mp >= 0), c1, N)].set(True, mode="drop")
    pw_all = jnp.where(has_mp[:, None], mp_pos[mp_c], temp_obs_pw)
    obs_valid = (has_mp | temp_valid) & cur.feats.valid
    obs2 = PoseObs(
        pw=pw_all,
        uv=cur.feats.uv,
        right_u=cur.right_u,
        inv_sigma2=_octave_inv_sigma2(cur.feats.octave, scale_factor),
        is_stereo=cur.right_u > 0,
        valid=obs_valid,
    )
    Tcw2, inlier2, n_in2 = optimize_pose(cam, Tcw1, obs2, chi2_mono=chi2_mono, chi2_stereo=chi2_stereo)
    n_tracked = jnp.sum((inlier2 & has_mp).astype(jnp.int32))

    # drop outlier map-point assignments (reference post-filter, Optimizer.cc:188-200)
    cur_mp = jnp.where(inlier2 | ~has_mp, cur_mp, -1)

    # found mask aligned with `local`: local mp matched AND inlier
    found_local = m2.found & inlier2[c2]
    # plus: inherited matches — map via membership check (cheap: mark cur_mp)
    M = mp_pos.shape[0]
    matched_mask = jnp.zeros((M,), bool).at[
        jnp.where((cur_mp >= 0) & inlier2, cur_mp, M)
    ].set(True, mode="drop")
    found_local = found_local | matched_mask[jnp.clip(local.mp_ids, 0, M - 1)]

    # keyframe-decision scalars (Tracking.cc:721-804)
    close = cur.feats.valid & (cur.depth > 0) & (cur.depth < depth_threshold)
    n_close_tracked = jnp.sum((close & has_mp & inlier2).astype(jnp.int32))
    n_close_untracked = jnp.sum((close & ~has_mp).astype(jnp.int32))

    velocity_new = Tcw2 @ se3.inverse(last.Tcw)
    new_state = SlamFrame(frame=cur, Tcw=Tcw2, mp_ids=cur_mp)
    stats = dict(
        n_motion_matches=n_m1, n_motion_inliers=n_in1,
        n_tracked=n_tracked, n_inliers=n_in2,
        n_close_tracked=n_close_tracked, n_close_untracked=n_close_untracked,
    )
    return new_state, velocity_new, Tcw2, stats, visible, found_local


class SLAM:
    """Full SLAM pipeline (tracking + local mapping) — the reference's
    ``System`` API: construct, call ``track(left, right)`` per frame
    (reference System::EstimatePose, System.h:55-61)."""

    def __init__(self, cfg: SLAMConfig, rgbd: bool = False, enable_loop_closing: bool = True):
        self.cfg = cfg
        self.cam = CameraParams.from_config(cfg.camera)
        self.rgbd = rgbd
        self.enable_loop_closing = enable_loop_closing and not cfg.tracking.only_tracking
        self.loop_closer = None  # built lazily (vocabulary trains on first KF)
        o, c, m, t, b, mp = cfg.orb, cfg.camera, cfg.matcher, cfg.tracking, cfg.ba, cfg.mapping
        self._frontend = jax.jit(make_rgbd_frontend(cfg) if rgbd else make_stereo_frontend(cfg))
        self._track = jax.jit(
            partial(
                slam_track_step,
                radius=t.motion_search_radius, proj_th=3.0,
                scale_factor=o.scale_factor, n_levels=o.n_levels,
                baseline=c.baseline, width=c.width, height=c.height,
                max_dist=m.min_threshold, ratio_track=m.nn_ratio_track,
                chi2_mono=b.chi2_mono, chi2_stereo=b.chi2_stereo,
                depth_threshold=c.baseline * t.th_depth,
            )
        )
        self._insert_kf = jax.jit(
            partial(
                insert_keyframe,
                depth_threshold=c.baseline * t.th_depth,
                scale_factor=o.scale_factor, n_levels=o.n_levels,
                min_covis_weight=mp.min_covis_weight,
            ),
            donate_argnums=(0,),
        )
        self._triangulate = jax.jit(
            partial(
                triangulate_new_points,
                n_neighbors=mp.n_triangulate_kfs, scale_factor=o.scale_factor,
                n_levels=o.n_levels, baseline=c.baseline,
                rank_gate=mp.triangulation_rank_gate,
                chi2_mono=b.chi2_mono, chi2_stereo=b.chi2_stereo,
            ),
            donate_argnums=(0,),
        )
        self._fuse = jax.jit(
            partial(
                fuse_into_keyframe, width=c.width, height=c.height,
                scale_factor=o.scale_factor, n_levels=o.n_levels,
            ),
            donate_argnums=(0,),
        )
        self._cull = jax.jit(
            partial(cull_mappoints, cull_score=mp.mp_cull_score), donate_argnums=(0,)
        )
        self._cull_kfs = jax.jit(
            partial(cull_keyframes, redundancy=mp.kf_cull_ratio), donate_argnums=(0,)
        )
        self._snapshot = jax.jit(
            partial(
                local_map_snapshot, max_kfs=t.max_local_keyframes,
                max_mps=t.max_local_mappoints,
            )
        )
        self._bump = jax.jit(bump_tracking_counters, donate_argnums=(0,))
        from ..solvers.local_ba import local_ba

        self._local_ba = jax.jit(
            partial(
                local_ba,
                max_free=b.max_local_ba_kfs, max_fixed=b.max_local_ba_fixed,
                max_points=b.local_ba_points,
                chi2_mono=b.chi2_mono, chi2_stereo=b.chi2_stereo,
                lam=b.lm_lambda_init, scale_factor=o.scale_factor,
            ),
            donate_argnums=(0,),
        )

        self.map = empty_map(cfg)
        self.state = TrackState.NOT_IMAGE_YET
        self.last: Optional[SlamFrame] = None
        self.velocity = jnp.eye(4, dtype=jnp.float32)
        self.local: Optional[LocalMap] = None
        self.ref_kf = 0
        self.frames_since_kf = 0
        self.frame_id = 0
        self.ref_kf_tracked = 0
        self.trajectory: list = []
        # §5.1 tracing: set True to record per-stage wall times (adds a sync
        # per stage; replaces the reference's EstimatePose ms logging,
        # System.h:55-61)
        self.profile = False
        self.stage_times: dict = {}

    # ------------------------------------------------------------------
    def _timed(self, name, fn, *args):
        if not self.profile:
            return fn(*args)
        import time as _time

        t0 = _time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        self.stage_times.setdefault(name, []).append(_time.perf_counter() - t0)
        return out

    def track(self, img_left, img_right) -> Tuple[Optional[np.ndarray], dict]:
        """Feed one stereo pair (or RGB + depth map in rgbd mode)."""
        frame = self._timed("frontend", self._frontend, img_left, img_right, self.cam)
        fid = self.frame_id
        self.frame_id += 1

        if self.state in (TrackState.NOT_IMAGE_YET, TrackState.NOT_INITING):
            if self.n_keyframes > 0:
                # a map exists (loaded or surviving) — localize instead of
                # re-initializing (reference OnlyTracking/reuse mode)
                return self._relocalize(frame, fid)
            return self._initialize(frame, fid)

        if self.state == TrackState.LOST:
            return self._relocalize(frame, fid)

        new_state, velocity, Tcw, stats, visible, found = self._timed(
            "track", self._track,
            self.cam, frame, self.last, self.velocity, self.local,
            self.map.mp_pos, self.map.mp_valid,
        )
        stats = {k: int(v) for k, v in stats.items()}
        if stats["n_inliers"] < self.cfg.tracking.min_track_inliers:
            # fallback: track against the reference keyframe (the reference's
            # trackReference, Tracking.cc:360-371) before declaring LOST
            ok = self._track_reference(frame, stats)
            if not ok:
                self.state = TrackState.LOST
                return None, stats
            new_state, velocity, Tcw = self._ref_result
            stats["ref_fallback"] = 1

        self.map = self._bump(self.map, self.local, visible, found)
        self.last = new_state
        self.velocity = velocity
        self.frames_since_kf += 1

        if self._need_keyframe(stats):
            self._insert_and_map(new_state, fid, stats)

        pose = np.asarray(Tcw)
        self.trajectory.append((fid, pose))
        return pose, stats

    # ------------------------------------------------------------------
    def _initialize(self, frame: StereoFrame, fid: int):
        n_depth = int(jnp.sum((frame.depth > 0).astype(jnp.int32)))
        if n_depth < self.cfg.tracking.min_init_depth_kps:
            self.state = TrackState.NOT_INITING
            return None, {"init_depth_kps": n_depth}
        Tcw = jnp.eye(4, dtype=jnp.float32)
        no_mp = jnp.full((frame.feats.capacity,), -1, jnp.int32)
        self.map, kf_id = self._insert_kf(self.map, frame, Tcw, no_mp, fid, self.cam)
        self.ref_kf = int(kf_id)
        self.local = self._snapshot(self.map, kf_id)
        mp_ids = self.map.kf_mp_idx[kf_id]
        self.last = SlamFrame(frame=frame, Tcw=Tcw, mp_ids=mp_ids)
        self.state = TrackState.OK
        self.frames_since_kf = 0
        self.ref_kf_tracked = int(jnp.sum((mp_ids >= 0).astype(jnp.int32)))
        pose = np.asarray(Tcw)
        self.trajectory.append((fid, pose))
        return pose, {"initialized": True, "n_mappoints": int(self.map.next_mp)}

    def _track_reference(self, frame: StereoFrame, stats: dict) -> bool:
        """Reference-keyframe fallback tracking: dense descriptor match to the
        reference KF's map points + pose-only optimization from the LAST pose
        (no motion model) — reference trackReference, Tracking.cc:360-371."""
        from ..ops.hamming import hamming_matrix

        kf = self.ref_kf
        M = self.map.mp_capacity
        has_mp = self.map.kf_feat_valid[kf] & (self.map.kf_mp_idx[kf] >= 0)
        dist = hamming_matrix(frame.feats.desc, self.map.kf_desc[kf])
        cand = frame.feats.valid[:, None] & has_mp[None, :]
        import jax.numpy as jnp_

        masked = jnp_.where(cand, dist, 1 << 20)
        best = jnp_.min(masked, axis=1)
        bj = jnp_.argmin(masked, axis=1)
        second = jnp_.partition(masked, 1, axis=1)[:, 1]
        ok = (best <= self.cfg.matcher.min_threshold) & (
            best.astype(jnp_.float32) < self.cfg.matcher.nn_ratio_bow * second.astype(jnp_.float32)
        )
        if int(jnp_.sum(ok.astype(jnp_.int32))) < 10:
            return False
        mp = self.map.kf_mp_idx[kf][bj]
        pw = self.map.mp_pos[jnp_.clip(mp, 0, M - 1)]
        inv_s2 = jnp_.power(
            jnp_.float32(1.0 / (self.cfg.orb.scale_factor**2)),
            frame.feats.octave.astype(jnp_.float32),
        )
        obs = PoseObs(pw=pw, uv=frame.feats.uv, right_u=frame.right_u,
                      inv_sigma2=inv_s2, is_stereo=frame.right_u > 0, valid=ok)
        Tcw, inlier, n_in = optimize_pose(
            self.cam, self.last.Tcw, obs,
            chi2_mono=self.cfg.ba.chi2_mono, chi2_stereo=self.cfg.ba.chi2_stereo,
        )
        if int(n_in) < self.cfg.tracking.min_track_inliers:
            return False
        mp_ids = jnp_.where(ok & inlier, mp, -1)
        new_state = SlamFrame(frame=frame, Tcw=Tcw, mp_ids=mp_ids)
        velocity = Tcw @ se3.inverse(self.last.Tcw)
        stats["n_inliers"] = int(n_in)
        stats["n_tracked"] = int(jnp_.sum((mp_ids >= 0).astype(jnp_.int32)))
        self._ref_result = (new_state, velocity, Tcw)
        return True

    def _relocalize(self, frame: StereoFrame, fid: int):
        """Relocalization against the keyframe database (reference
        Tracking::trackReLocalize, src/Tracking.cc:531-629): BoW candidates →
        dense descriptor match to candidate keyframes' map points →
        EPnP-RANSAC → pose-only optimization, accept at ≥50 inliers."""
        from ..bow.keyframe_db import find_reloc_candidates
        from ..bow.vocabulary import bow_vector, transform
        from ..ops.hamming import hamming_matrix
        from ..solvers.epnp import ransac_pnp

        if self.loop_closer is None:
            return None, {"reloc": "no_vocab"}
        vocab = self.loop_closer.vocab
        words = transform(vocab, frame.feats.desc, frame.feats.valid)
        qvec = bow_vector(vocab, words)
        cand_ids, _ = find_reloc_candidates(self.loop_closer.db, self.map, qvec)
        cand_ids = [int(c) for c in np.asarray(cand_ids) if c >= 0]
        info = {"reloc_candidates": len(cand_ids)}
        M = self.map.mp_capacity
        for cand in cand_ids:
            has_mp = self.map.kf_feat_valid[cand] & (self.map.kf_mp_idx[cand] >= 0)
            dist = hamming_matrix(frame.feats.desc, self.map.kf_desc[cand])
            cand_mask = frame.feats.valid[:, None] & has_mp[None, :]
            masked = jnp.where(cand_mask, dist, 1 << 20)
            best = jnp.min(masked, axis=1)
            bj = jnp.argmin(masked, axis=1)
            ok = best <= self.cfg.matcher.min_threshold
            n_matches = int(jnp.sum(ok.astype(jnp.int32)))
            if n_matches < 15:
                continue
            mp = self.map.kf_mp_idx[cand][bj]
            pw = self.map.mp_pos[jnp.clip(mp, 0, M - 1)]
            inv_s2 = jnp.power(
                jnp.float32(1.0 / (self.cfg.orb.scale_factor**2)),
                frame.feats.octave.astype(jnp.float32),
            )
            Tcw0, inl0, n0 = ransac_pnp(
                self.cam, pw, frame.feats.uv, inv_s2, ok,
                jax.random.PRNGKey(fid + cand),
            )
            if int(n0) < 10:
                continue
            obs = PoseObs(
                pw=pw, uv=frame.feats.uv, right_u=frame.right_u,
                inv_sigma2=inv_s2, is_stereo=frame.right_u > 0, valid=ok,
            )
            Tcw, inlier, n_in = optimize_pose(
                self.cam, Tcw0, obs,
                chi2_mono=self.cfg.ba.chi2_mono, chi2_stereo=self.cfg.ba.chi2_stereo,
            )
            if int(n_in) < self.cfg.tracking.min_localmap_inliers_reloc // 2:
                continue
            # accepted: rebuild tracking state around the matched keyframe
            mp_ids = jnp.where(ok & inlier, mp, -1)
            self.last = SlamFrame(frame=frame, Tcw=Tcw, mp_ids=mp_ids)
            self.velocity = jnp.eye(4, dtype=jnp.float32)
            self.ref_kf = cand
            self.local = self._snapshot(self.map, jnp.asarray(cand))
            self.ref_kf_tracked = int(jnp.sum((self.map.kf_mp_idx[cand] >= 0).astype(jnp.int32)))
            self.state = TrackState.OK
            pose = np.asarray(Tcw)
            self.trajectory.append((fid, pose))
            info.update(relocalized=True, reloc_kf=cand, n_inliers=int(n_in))
            return pose, info
        return None, info

    def _need_keyframe(self, stats: dict) -> bool:
        """Keyframe decision (reference needNewKeyFrame, Tracking.cc:721-804):
        c1a cadence, c1c tracking weakness vs reference KF, c2 close-point
        replenishment."""
        if self.cfg.tracking.only_tracking:
            return False
        if int(self.map.next_kf) >= self.map.kf_capacity - 1:
            return False
        need_close = (stats["n_close_tracked"] < 100) and (stats["n_close_untracked"] > 70)
        c1a = self.frames_since_kf >= self.cfg.tracking.max_frames
        c1c = stats["n_tracked"] < 0.75 * max(self.ref_kf_tracked, 1)
        c2 = stats["n_tracked"] > 15 and (c1a or c1c or need_close)
        return c2

    def _insert_and_map(self, cur: SlamFrame, fid: int, stats: dict):
        """The reference's LocalMapping::runOnce pipeline for one KF."""
        self.map, kf_id = self._insert_kf(
            self.map, cur.frame, cur.Tcw, cur.mp_ids, fid, self.cam
        )
        kf_id_i = int(kf_id)
        self.map = self._cull(self.map, kf_id)
        self.map = self._triangulate(self.map, kf_id, self.cam)
        self.map = self._fuse(self.map, kf_id, self.cam)
        if self._local_ba is not None:
            self.map = self._local_ba(self.map, kf_id, self.cam)
        self.map = self._cull_kfs(self.map, kf_id)
        closed = False
        if self.enable_loop_closing:
            closed = self._loop_close(kf_id_i)
        self.ref_kf = kf_id_i
        self.local = self._snapshot(self.map, kf_id)
        # the inserted KF *is* the current frame: adopt its (possibly BA- or
        # loop-corrected) pose as the tracker's reference, else the next
        # motion-model step predicts from a stale pre-correction pose
        self.last = cur._replace(
            mp_ids=self.map.kf_mp_idx[kf_id], Tcw=self.map.kf_Tcw[kf_id]
        )
        if closed:
            self.velocity = jnp.eye(4, dtype=jnp.float32)
        self.frames_since_kf = 0
        self.ref_kf_tracked = int(jnp.sum((self.map.kf_mp_idx[kf_id] >= 0).astype(jnp.int32)))

    # ------------------------------------------------------------------
    def _loop_close(self, kf_id: int):
        """Loop-closing stage run synchronously per keyframe (the reference's
        LoopClosing thread, src/LoopClosing.cc:53-90)."""
        from .loop_closing import LoopCloser

        if self.loop_closer is None:
            # train the vocabulary on the first keyframe's descriptors —
            # self-consistent replacement for shipping ORBvoc (SURVEY.md §2 #11)
            from ..bow.vocabulary import train_vocabulary

            desc = np.asarray(self.map.kf_desc[kf_id])
            valid = np.asarray(self.map.kf_feat_valid[kf_id])
            vocab = train_vocabulary(
                desc[valid], branching=self.cfg.bow.branching,
                depth=self.cfg.bow.depth,
            )
            self.loop_closer = LoopCloser(self.cfg, vocab)

        self.loop_closer.add_keyframe_to_db(self.map, kf_id)
        cand = self.loop_closer.detect(self.map, kf_id)
        if cand is None:
            return False
        key = jax.random.PRNGKey(kf_id)
        S12 = self.loop_closer.compute_sim3(self.map, self.cam, kf_id, cand, key)
        if S12 is None:
            return False
        self.map = self.loop_closer.correct(self.map, self.cam, kf_id, cand, S12)
        self.loops_closed = getattr(self, "loops_closed", 0) + 1
        return True

    # ------------------------------------------------------------------
    def run_global_ba(self, mesh=None):
        """Full-map bundle adjustment (reference globalOptimization)."""
        from ..solvers.global_ba import global_ba

        self.map = global_ba(
            self.map, self.cam, scale_factor=self.cfg.orb.scale_factor,
            pcg_iters=self.cfg.ba.pcg_iters, mesh=mesh,
        )
        if self.local is not None:
            self.local = self._snapshot(self.map, jnp.asarray(self.ref_kf))

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        """Persist map + vocabulary (reference map save at shutdown,
        System.cc:194-198)."""
        from ..io.persistence import save_map
        from ..bow.vocabulary import save_vocabulary

        save_map(path + ".map.npz", self.map, self.cfg)
        if self.loop_closer is not None:
            save_vocabulary(self.loop_closer.vocab, path + ".vocab.npz")

    def load(self, path: str) -> None:
        """Load a map for continued SLAM or localization-only reuse
        (reference System.cc:98-110 + OnlyTracking mode)."""
        from ..io.persistence import load_map
        from ..bow.vocabulary import load_vocabulary
        from ..bow.keyframe_db import rebuild
        from .loop_closing import LoopCloser

        self.map, _ = load_map(path + ".map.npz")
        import os

        if os.path.exists(path + ".vocab.npz"):
            vocab = load_vocabulary(path + ".vocab.npz")
            self.loop_closer = LoopCloser(self.cfg, vocab)
            self.loop_closer.db = rebuild(vocab, self.map)
        self.state = TrackState.NOT_INITING

    # ------------------------------------------------------------------
    @property
    def n_keyframes(self) -> int:
        return int(jnp.sum(self.map.kf_valid.astype(jnp.int32)))

    @property
    def n_mappoints(self) -> int:
        return int(jnp.sum(self.map.mp_valid.astype(jnp.int32)))
