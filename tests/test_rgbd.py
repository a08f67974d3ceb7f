"""RGB-D pipeline test: depth-aided tracking on synthetic data (the
reference's TUM fr2 configuration path, Frame::createRGBD)."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_ros2_tpu.config import (
    CameraConfig,
    MapConfig,
    ORBConfig,
    SLAMConfig,
    TrackingConfig,
)
from orb_slam2_ros2_tpu.io.synthetic import SyntheticStereoDataset, render
from orb_slam2_ros2_tpu.io.trajectory import ate_rmse
from orb_slam2_ros2_tpu.pipeline.system import SLAM

# multi-frame full-SLAM integration: excluded from the default fast run
pytestmark = pytest.mark.slow


def test_rgbd_slam_tracks(tmp_path):
    cfg = SLAMConfig(
        camera=CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=96.0, baseline=0.5,
                            width=320, height=192, camera_type=1, depth_scale=1000.0),
        orb=ORBConfig(n_features=600, max_keypoints=768),
        tracking=TrackingConfig(min_init_depth_kps=120, max_local_mappoints=4096,
                                max_local_keyframes=16),
        map=MapConfig(max_keyframes=64, max_mappoints=16384, max_obs_per_mp=16),
    )
    n = 25
    ds = SyntheticStereoDataset(cfg.camera, n_frames=n, speed=0.35)
    slam = SLAM(cfg, rgbd=True, enable_loop_closing=False)

    est, gt = [], []
    for i in range(n):
        img, depth, Twc_gt = ds.frame_with_depth(i)
        depth_raw = depth * cfg.camera.depth_scale  # sensor units
        Tcw, stats = slam.track(img, jnp.asarray(depth_raw))
        assert Tcw is not None, f"lost at {i}: {stats}"
        est.append(np.linalg.inv(Tcw))
        gt.append(Twc_gt)

    ate = ate_rmse(est, gt)
    dist = n * 0.35
    assert ate < 0.04 * dist, f"RGB-D ATE {ate:.3f} m over {dist:.1f} m"
    assert slam.n_mappoints > 300
