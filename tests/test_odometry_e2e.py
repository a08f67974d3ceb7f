"""End-to-end stereo odometry on the synthetic sequence: the minimum slice
(SURVEY.md §7.4) — stereo init → motion-model tracking → pose-only opt —
must produce a trajectory with bounded ATE."""

import numpy as np
import pytest

from orb_slam2_ros2_tpu.config import CameraConfig, ORBConfig, SLAMConfig, TrackingConfig
from orb_slam2_ros2_tpu.features.extractor import make_stereo_frontend
from orb_slam2_ros2_tpu.geometry.camera import CameraParams
from orb_slam2_ros2_tpu.io.synthetic import SyntheticStereoDataset
from orb_slam2_ros2_tpu.io.trajectory import ate_rmse
from orb_slam2_ros2_tpu.pipeline.tracking import OdometryTracker, TrackState

# multi-frame full-SLAM integration: excluded from the default fast run
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cfg():
    return SLAMConfig(
        camera=CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=96.0, baseline=0.5,
                            width=320, height=192),
        orb=ORBConfig(n_features=600, max_keypoints=768),
        tracking=TrackingConfig(min_init_depth_kps=150),
    )


def test_odometry_tracks_synthetic_sequence(cfg):
    n_frames = 30
    ds = SyntheticStereoDataset(cfg.camera, n_frames=n_frames, speed=0.35)
    frontend = make_stereo_frontend(cfg)
    cam = CameraParams.from_config(cfg.camera)
    tracker = OdometryTracker(cfg, cam)

    est, gt = [], []
    for i in range(n_frames):
        imgL, imgR, Twc_gt = ds.frame(i)
        sf = frontend(imgL, imgR, cam)
        Tcw, info = tracker.track(sf)
        assert Tcw is not None, f"lost at frame {i}: {info}"
        est.append(np.linalg.inv(Tcw))
        gt.append(Twc_gt)

    ate = ate_rmse(est, gt)
    total_dist = n_frames * 0.35
    assert ate < 0.05 * total_dist, f"ATE {ate:.3f} m over {total_dist:.1f} m"
    # sanity: trajectory actually moved forward
    assert np.linalg.norm(est[-1][:3, 3] - est[0][:3, 3]) > 0.5 * total_dist
