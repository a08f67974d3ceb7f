"""Error-taxonomy wiring (reference Error.h:13-100): each exception class is
actually raised at its guard site — a wrong-sized image fails fast instead of
silently retracing every jitted program, bad paths raise FileNotOpenError
instead of a raw FileNotFoundError mid-pipeline, and a starved stereo
initialization raises FeatureLessError instead of spinning forever."""

import dataclasses

import numpy as np
import pytest

from orb_slam2_ros2_tpu.config import SLAMConfig, CameraConfig, ORBConfig, TrackingConfig, MapConfig, BAConfig
from orb_slam2_ros2_tpu.errors import (
    FeatureLessError,
    FileNotOpenError,
    ImageSizeError,
)


def _tiny_cfg(**track_kw):
    return SLAMConfig(
        camera=CameraConfig(width=128, height=96, fx=80, fy=80, cx=64, cy=48,
                            baseline=0.2),
        orb=ORBConfig(n_features=128, n_init_features=128, max_keypoints=128,
                      n_levels=3),
        tracking=TrackingConfig(min_init_depth_kps=40, **track_kw),
        map=MapConfig(max_keyframes=16, max_mappoints=2048, auto_grow=False),
        ba=BAConfig(pose_rounds=2, pose_iters_per_round=3),
    )


@pytest.mark.smoke
def test_wrong_image_size_raises():
    from orb_slam2_ros2_tpu.pipeline.system import SLAM

    slam = SLAM(_tiny_cfg(), enable_loop_closing=False)
    bad = np.zeros((100, 100), np.float32)
    with pytest.raises(ImageSizeError):
        slam.track(bad, bad)


@pytest.mark.smoke
def test_color_image_without_color_mode_raises():
    from orb_slam2_ros2_tpu.pipeline.system import SLAM

    slam = SLAM(_tiny_cfg(), enable_loop_closing=False)  # camera.color == 0
    rgb = np.zeros((96, 128, 3), np.float32)
    with pytest.raises(ImageSizeError):
        slam.track(rgb, rgb)


@pytest.mark.smoke
def test_missing_config_raises():
    with pytest.raises(FileNotOpenError):
        SLAMConfig.from_yaml("/nonexistent/config.yaml")


@pytest.mark.smoke
def test_missing_vocab_path_raises():
    from orb_slam2_ros2_tpu.pipeline.system import SLAM

    cfg = _tiny_cfg()
    cfg = cfg.replace(bow=dataclasses.replace(cfg.bow, vocab_path="/no/such/vocab.npz"))
    slam = SLAM(cfg)
    with pytest.raises(FileNotOpenError):
        slam._resolve_vocab(0)


@pytest.mark.smoke
def test_missing_map_raises():
    from orb_slam2_ros2_tpu.pipeline.system import SLAM

    slam = SLAM(_tiny_cfg(), enable_loop_closing=False)
    with pytest.raises(FileNotOpenError):
        slam.load("/no/such/map")


@pytest.mark.smoke
def test_missing_brief_template_raises():
    from orb_slam2_ros2_tpu.ops.brief import load_template_file

    with pytest.raises(FileNotOpenError):
        load_template_file("/no/such/template.txt")


def test_init_starvation_raises():
    from orb_slam2_ros2_tpu.pipeline.system import SLAM

    slam = SLAM(_tiny_cfg(max_init_failures=3), enable_loop_closing=False)
    flat = np.zeros((96, 128), np.float32)  # featureless: no FAST corners
    with pytest.raises(FeatureLessError):
        for _ in range(5):
            slam.track(flat, flat)
