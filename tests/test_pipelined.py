"""Pipelined tracking (tracking.pipelined=True): the dispatch-ahead /
resolve-one-late loop must preserve the synchronous path's accuracy and
bookkeeping (trajectory completeness, keyframe cadence).  The pipelined mode
is the deployment configuration — it hides the per-frame device→host fetch
behind the next frame's device execution (reference analogue: the
tracking→mapping thread handoff lag, LocalMapping.cc:721-726)."""

import dataclasses as dc

import numpy as np
import pytest

from orb_slam2_ros2_tpu.config import (
    BAConfig,
    BoWConfig,
    CameraConfig,
    MapConfig,
    MappingConfig,
    ORBConfig,
    SLAMConfig,
    TrackingConfig,
)
from orb_slam2_ros2_tpu.io.synthetic import SyntheticStereoDataset
from orb_slam2_ros2_tpu.io.trajectory import ate_rmse
from orb_slam2_ros2_tpu.pipeline.system import SLAM


def _cfg(pipelined: bool) -> SLAMConfig:
    return SLAMConfig(
        camera=CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=96.0, baseline=0.5,
                            width=320, height=192),
        orb=ORBConfig(n_features=500, max_keypoints=512),
        tracking=TrackingConfig(min_init_depth_kps=120, max_local_mappoints=4096,
                                max_local_keyframes=16,
                                min_localmap_matches=20, min_localmap_inliers=20,
                                pipelined=pipelined),
        mapping=MappingConfig(synchronous=False),
        map=MapConfig(max_keyframes=32, max_mappoints=8192, max_obs_per_mp=12),
        bow=BoWConfig(branching=4, depth=2),
        ba=BAConfig(pcg_iters=15),
    )


def _run(pipelined: bool, n_frames: int = 30):
    cfg = _cfg(pipelined)
    ds = SyntheticStereoDataset(cfg.camera, n_frames=n_frames, speed=0.55)
    slam = SLAM(cfg, enable_loop_closing=False)
    returned = 0
    for i in range(n_frames):
        imgL, imgR, _ = ds.frame(i)
        Tcw, stats = slam.track(imgL, imgR)
        returned += Tcw is not None
    slam.flush()
    # evaluate on the recorded trajectory (pipelined returns poses one frame
    # late; the trajectory list carries every frame in order either way)
    gt = {i: ds.frame(i)[2] for i in range(n_frames)}
    est_l, gt_l = [], []
    for fid, Tcw in slam.trajectory:
        est_l.append(np.linalg.inv(Tcw))
        gt_l.append(np.asarray(gt[fid]))
    return ate_rmse(est_l, gt_l), slam, returned


@pytest.mark.slow
def test_pipelined_matches_sync_accuracy():
    n = 30
    ate_sync, slam_s, ret_s = _run(False, n)
    ate_pipe, slam_p, ret_p = _run(True, n)
    # every frame must land in the trajectory (resolve-one-late + flush)
    assert len(slam_p.trajectory) == n, len(slam_p.trajectory)
    fids = [f for f, _ in slam_p.trajectory]
    assert fids == sorted(fids)
    # one-frame return latency: first OK call returns the fill marker, every
    # later call a pose — at most 2 fewer non-None returns than sync
    assert ret_p >= ret_s - 2, (ret_p, ret_s)
    # same accuracy class as the synchronous contract (the pipelined tracker
    # sees one-frame-stale local-map snapshots around keyframes)
    assert ate_pipe <= ate_sync * 1.5 + 0.03, (
        f"pipelined ATE {ate_pipe:.4f} vs sync {ate_sync:.4f}"
    )
    # keyframe cadence stays in family
    assert abs(slam_p.n_keyframes - slam_s.n_keyframes) <= 3, (
        slam_p.n_keyframes, slam_s.n_keyframes)


@pytest.mark.slow
def test_pipelined_final_trajectory_and_save(tmp_path):
    _, slam, _ = _run(True, 24)
    fin = slam.final_trajectory()
    assert len(fin) == 24
    slam.save(str(tmp_path / "m"))
    assert (tmp_path / "m.map.npz").exists()


@pytest.mark.slow
def test_pipelined_survives_blackout_relocalization():
    """Weak/LOST handling one frame late: blank out a stretch of frames
    mid-sequence; the pipeline must detect the loss via the late resolve,
    relocalize from the speculative frame's extraction, and continue."""
    cfg = _cfg(True)
    # the 320×192 / 500-feature world can't reach the reference's 50-inlier
    # reloc bar (sync mode fails it identically) — lower the bar so the test
    # exercises the pipelined reloc-carry path rather than the bar itself
    cfg = cfg.replace(tracking=dc.replace(
        cfg.tracking, min_localmap_inliers_reloc=20))
    n = 36
    ds = SyntheticStereoDataset(cfg.camera, n_frames=n, speed=0.4)
    slam = SLAM(cfg, enable_loop_closing=True)
    blank = np.zeros((cfg.camera.height, cfg.camera.width), np.uint8)
    lost_seen = False
    for i in range(n):
        if 18 <= i < 22:      # the blackout
            imgL = blank
            imgR = blank.copy()
        elif i >= 22:         # return to MAPPED viewpoints (reloc scenario)
            imgL, imgR, _ = ds.frame(10 + (i - 22) % 6)
        else:
            imgL, imgR, _ = ds.frame(i)
        Tcw, stats = slam.track(imgL, imgR)
        if Tcw is None and i > 2:
            lost_seen = True
    slam.flush()
    assert lost_seen  # the blackout must actually have dropped tracking
    # back on mapped viewpoints the system relocalized and kept tracking:
    # the last frames produced poses
    late = [fid for fid, _ in slam.trajectory if fid >= n - 6]
    assert len(late) >= 3, f"no recovery after blackout: {late}"
