"""Tracking ∥ mapping overlap: the deferred-BA path must not degrade the
trajectory vs the synchronous path (reference thread split System.cc:119-129
+ abort-BA handshake LocalMapping.h:103-166)."""

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


def _cfg(synchronous: bool, force_ba_every: int = 1) -> SLAMConfig:
    return SLAMConfig(
        camera=CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=96.0, baseline=0.5,
                            width=320, height=192),
        orb=ORBConfig(n_features=500, max_keypoints=512),
        tracking=TrackingConfig(min_init_depth_kps=120, max_local_mappoints=4096,
                                max_local_keyframes=16,
                                min_localmap_matches=20, min_localmap_inliers=20),
        mapping=MappingConfig(synchronous=synchronous, force_ba_every=force_ba_every),
        map=MapConfig(max_keyframes=32, max_mappoints=8192, max_obs_per_mp=12),
        bow=BoWConfig(branching=4, depth=2),
        ba=BAConfig(pcg_iters=15),
    )


def _run(synchronous: bool, n_frames: int = 30, force_ba_every: int = 1):
    cfg = _cfg(synchronous, force_ba_every)
    ds = SyntheticStereoDataset(cfg.camera, n_frames=n_frames, speed=0.55)
    slam = SLAM(cfg, enable_loop_closing=False)
    est, gt = [], []
    for i in range(n_frames):
        imgL, imgR, Twc_gt = ds.frame(i)
        Tcw, stats = slam.track(imgL, imgR)
        assert Tcw is not None, f"lost at {i} (sync={synchronous}): {stats}"
        est.append(np.linalg.inv(Tcw))
        gt.append(Twc_gt)
    slam.flush()
    return ate_rmse(est, gt), slam


@pytest.mark.slow
def test_async_matches_synchronous_accuracy():
    ate_sync, slam_s = _run(True)
    ate_async, slam_a = _run(False)
    # deferred (never-skipped) BA must stay in the same accuracy class as
    # the synchronous path (measured equal-or-better)
    assert ate_async <= ate_sync * 1.3 + 0.02, (
        f"async ATE {ate_async:.4f} vs sync {ate_sync:.4f}"
    )
    # both paths build a comparable map
    assert slam_a.n_keyframes >= 0.5 * slam_s.n_keyframes
    assert slam_a.n_mappoints >= 0.5 * slam_s.n_mappoints

    # opting into BA skipping under load (force_ba_every=2, the reference's
    # queue<3 abort trade) costs accuracy but must stay bounded
    ate_skip, _ = _run(False, force_ba_every=2)
    assert ate_skip <= ate_sync * 3.0 + 0.02, (
        f"skip-BA ATE {ate_skip:.4f} vs sync {ate_sync:.4f}"
    )
