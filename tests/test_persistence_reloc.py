"""Map save/load + localization-only reuse (relocalization) tests."""

import numpy as np
import pytest

from orb_slam2_ros2_tpu.config import (
    BoWConfig,
    CameraConfig,
    MapConfig,
    ORBConfig,
    SLAMConfig,
    TrackingConfig,
)
from orb_slam2_ros2_tpu.io.persistence import load_map, save_map
from orb_slam2_ros2_tpu.io.synthetic import SyntheticStereoDataset
from orb_slam2_ros2_tpu.pipeline.system import SLAM
from orb_slam2_ros2_tpu.pipeline.tracking import TrackState

# multi-frame full-SLAM integration: excluded from the default fast run
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cfg():
    return SLAMConfig(
        camera=CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=96.0, baseline=0.5,
                            width=320, height=192),
        orb=ORBConfig(n_features=600, max_keypoints=768),
        tracking=TrackingConfig(min_init_depth_kps=120, max_local_mappoints=4096,
                                max_local_keyframes=16),
        map=MapConfig(max_keyframes=64, max_mappoints=16384, max_obs_per_mp=16),
        bow=BoWConfig(branching=6, depth=3),
    )


@pytest.fixture(scope="module")
def built(cfg, tmp_path_factory):
    """Run SLAM over a short sequence, save the map."""
    ds = SyntheticStereoDataset(cfg.camera, n_frames=25, speed=0.35)
    slam = SLAM(cfg)
    gts = []
    for i in range(25):
        imgL, imgR, Twc_gt = ds.frame(i)
        Tcw, stats = slam.track(imgL, imgR)
        assert Tcw is not None
        gts.append((Tcw, Twc_gt))
    path = str(tmp_path_factory.mktemp("maps") / "m")
    # force vocabulary/loop-closer existence for the save
    if slam.loop_closer is None:
        slam._ensure_loop_closer(slam.ref_kf)
    slam.save(path)
    return path, slam, ds, gts


def test_save_load_roundtrip(built, cfg):
    path, slam, ds, gts = built
    st2, cfg_dict = load_map(path + ".map.npz")
    assert int(st2.next_kf) == int(slam.map.next_kf)
    np.testing.assert_array_equal(np.asarray(st2.kf_valid), np.asarray(slam.map.kf_valid))
    np.testing.assert_allclose(np.asarray(st2.mp_pos), np.asarray(slam.map.mp_pos))
    np.testing.assert_array_equal(np.asarray(st2.kf_mp_idx), np.asarray(slam.map.kf_mp_idx))
    assert cfg_dict["camera"]["fx"] == cfg.camera.fx


def test_localization_only_reuse(built, cfg):
    """Fresh SLAM instance loads the map and relocalizes mid-trajectory
    without mapping (the reference's OnlyTracking=1 + Map.LoadMap=1 mode)."""
    path, _, ds, gts = built
    cfg2 = cfg.replace(tracking=cfg.tracking.__class__(
        min_init_depth_kps=120, max_local_mappoints=4096, max_local_keyframes=16,
        only_tracking=True,
    ))
    slam2 = SLAM(cfg2)
    slam2.load(path)
    assert slam2.n_keyframes > 0

    # feed a frame from the middle of the mapped trajectory
    relocalized = False
    for i in [10, 12, 14, 16]:
        imgL, imgR, Twc_gt = ds.frame(i)
        Tcw, info = slam2.track(imgL, imgR)
        if Tcw is not None:
            relocalized = True
            # pose must agree with the original run's estimate for that frame
            Tcw_orig = gts[i][0]
            err = np.linalg.norm(Tcw[:3, 3] - Tcw_orig[:3, 3])
            assert err < 0.5, f"reloc pose error {err:.2f} m at frame {i}"
            break
    assert relocalized, "relocalization never succeeded"
    # keyframe count unchanged (only-tracking inserts no keyframes)
    assert slam2.n_keyframes == SLAM(cfg2).n_keyframes or True  # no growth check below
    n_kf_before = slam2.n_keyframes
    imgL, imgR, _ = ds.frame(i + 1)
    slam2.track(imgL, imgR)
    assert slam2.n_keyframes == n_kf_before


def test_proto_localization_reuse(built, cfg, tmp_path):
    """The reference-format protobuf map supports the same localization-only
    reuse (OnlyTracking + Map.LoadMap on a .pb map, reference
    config/kitti_config_00.yaml:44-49 + Map.cc:252-319)."""
    path, slam, ds, gts = built
    pb_path = str(tmp_path / "map.pb")
    slam.save(pb_path)

    cfg2 = cfg.replace(tracking=cfg.tracking.__class__(
        min_init_depth_kps=120, max_local_mappoints=4096, max_local_keyframes=16,
        only_tracking=True,
    ))
    slam2 = SLAM(cfg2)
    slam2.load(pb_path)
    assert slam2.n_keyframes == slam.n_keyframes
    assert slam2.loop_closer is not None  # KFDB rebuilt from resolved vocab

    relocalized = False
    for i in [10, 12, 14, 16]:
        imgL, imgR, _ = ds.frame(i)
        Tcw, info = slam2.track(imgL, imgR)
        if Tcw is not None:
            relocalized = True
            err = np.linalg.norm(Tcw[:3, 3] - gts[i][0][:3, 3])
            assert err < 0.5, f"reloc pose error {err:.2f} m at frame {i}"
            break
    assert relocalized, "relocalization never succeeded on the protobuf map"


def test_only_tracking_ref_slides(built, cfg):
    """Only-tracking over the WHOLE mapped trajectory: with no keyframe
    insertion the tracking reference must slide along the prebuilt map
    (reference Map::getTrackingRef, Map.cc:176-197) — a stale local map
    would lose tracking as the camera leaves the reloc neighbourhood."""
    path, _, ds, gts = built
    cfg2 = cfg.replace(tracking=cfg.tracking.__class__(
        min_init_depth_kps=120, max_local_mappoints=4096, max_local_keyframes=16,
        only_tracking=True,
    ))
    slam2 = SLAM(cfg2)
    slam2.load(path)

    tracked = 0
    refs = set()
    last_err = None
    for i in range(2, 25):
        imgL, imgR, Twc_gt = ds.frame(i)
        Tcw, info = slam2.track(imgL, imgR)
        if Tcw is not None:
            tracked += 1
            refs.add(slam2.ref_kf)
            last_err = np.linalg.norm(Tcw[:3, 3] - gts[i][0][:3, 3])
    assert tracked >= 18, f"tracked only {tracked}/23 frames in only-tracking"
    assert len(refs) >= 2, f"reference KF never slid (refs={refs})"
    assert last_err is not None and last_err < 0.5, f"end-of-map pose error {last_err}"
