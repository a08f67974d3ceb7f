"""Two-chip tracker/mapper role split (dist.tracker_mapper_split): the
reference's tracking/mapping THREAD split (System.cc:119-129) as a DEVICE
split — device 0 tracks against a published (mp_pos, mp_valid, local-map
snapshot) view, device 1 owns the map and runs insertion / BA / culling.

On the 8-virtual-CPU-device mesh the split must produce the SAME trajectory
as the single-device path: the published view is refreshed after exactly the
events that mutate the tables, so the tracked numerics are identical.
"""

import dataclasses

import numpy as np
import pytest

from orb_slam2_ros2_tpu.config import (
    BAConfig,
    BoWConfig,
    CameraConfig,
    DistConfig,
    MapConfig,
    MappingConfig,
    ORBConfig,
    SLAMConfig,
    TrackingConfig,
)
from orb_slam2_ros2_tpu.io.synthetic import SyntheticStereoDataset
from orb_slam2_ros2_tpu.io.trajectory import ate_rmse
from orb_slam2_ros2_tpu.pipeline.system import SLAM


def _cfg(split: bool) -> SLAMConfig:
    return SLAMConfig(
        camera=CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=96.0, baseline=0.5,
                            width=320, height=192),
        orb=ORBConfig(n_features=500, max_keypoints=512),
        tracking=TrackingConfig(min_init_depth_kps=120, max_local_mappoints=4096,
                                max_local_keyframes=16,
                                min_localmap_matches=20, min_localmap_inliers=20),
        mapping=MappingConfig(synchronous=False, force_ba_every=2),
        map=MapConfig(max_keyframes=32, max_mappoints=8192, max_obs_per_mp=12),
        bow=BoWConfig(branching=4, depth=2),
        ba=BAConfig(pcg_iters=15),
        dist=DistConfig(tracker_mapper_split=split),
    )


def _run(split: bool, n_frames: int = 26):
    cfg = _cfg(split)
    ds = SyntheticStereoDataset(cfg.camera, n_frames=n_frames, speed=0.55)
    slam = SLAM(cfg, enable_loop_closing=False)
    est, gt = [], []
    for i in range(n_frames):
        imgL, imgR, Twc_gt = ds.frame(i)
        Tcw, stats = slam.track(imgL, imgR)
        assert Tcw is not None, f"lost at {i} (split={split}): {stats}"
        est.append(Tcw)
        gt.append(Twc_gt)
    slam.flush()
    return est, gt, slam


@pytest.mark.slow
def test_split_matches_single_device_trajectory():
    est_s, gt, slam_s = _run(False)
    est_p, _, slam_p = _run(True)
    assert slam_p._split
    # the published-view refresh schedule makes the numerics identical:
    # every pose must agree to float tolerance, not just ATE-class
    for i, (a, b) in enumerate(zip(est_s, est_p)):
        np.testing.assert_allclose(a, b, atol=5e-4, err_msg=f"frame {i}")
    assert slam_p.n_keyframes == slam_s.n_keyframes
    # and the trajectory is sane in absolute terms
    ate = ate_rmse([np.linalg.inv(t) for t in est_p], gt)
    assert ate < 0.2, ate


@pytest.mark.slow
def test_split_final_trajectory_and_devices():
    est_p, gt, slam = _run(True, n_frames=20)
    # the map lives on device 1, tracking state on device 0
    d_map = next(iter(slam.map.kf_Tcw.devices()))
    d_trk = next(iter(slam.last.Tcw.devices()))
    assert d_map != d_trk, (d_map, d_trk)
    # the final-trajectory export covers every tracked frame
    fin = slam.final_trajectory()
    assert len(fin) == len(est_p)
