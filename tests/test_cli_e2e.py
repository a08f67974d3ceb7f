"""CLI dress rehearsal on DISK-LAYOUT datasets (r4 VERDICT next#5): render a
short synthetic sequence, write it to disk in the real KITTI odometry layout
(image_0/ image_1/ times.txt + poses.txt) and the real TUM RGB-D layout
(rgb/ depth/ associate.txt groundtruth.txt), then drive ``cli.main()``
end-to-end through ``io/datasets.py`` and the native PNG decoder, asserting
trajectory export and ATE.  Mirrors the reference example binaries' contract
(example/Stereo/KittiStereo.cc:28-37, example/RGB-D/TUMRGBD.cc:28-34)."""

import json
import os

import numpy as np
import pytest

from orb_slam2_ros2_tpu.config import CameraConfig
from orb_slam2_ros2_tpu.io.synthetic import SyntheticStereoDataset

CAM = CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=96.0, baseline=0.5,
                   width=320, height=192)

CFG_YAML = """
camera:
  fx: 200.0
  fy: 200.0
  cx: 160.0
  cy: 96.0
  baseline: 0.5
  width: 320
  height: 192
  camera_type: {cam_type}
  depth_scale: 5000.0
orb:
  n_features: 500
  max_keypoints: 512
tracking:
  min_init_depth_kps: 120
  max_local_mappoints: 4096
  max_local_keyframes: 16
  min_localmap_matches: 20
  min_localmap_inliers: 20
map:
  max_keyframes: 32
  max_mappoints: 8192
  max_obs_per_mp: 12
bow:
  branching: 4
  depth: 2
ba:
  pcg_iters: 15
"""


def _save_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


def _quat_from_R(R):
    """Unit quaternion (qx, qy, qz, qw) of a rotation matrix."""
    tr = np.trace(R)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        qw = 0.25 * s
        qx = (R[2, 1] - R[1, 2]) / s
        qy = (R[0, 2] - R[2, 0]) / s
        qz = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[3] = (R[k, j] - R[j, k]) / s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        qx, qy, qz, qw = q
    return qx, qy, qz, qw


def _write_kitti_layout(root, n_frames):
    """Real KITTI odometry sequence layout from the synthetic renderer."""
    os.makedirs(os.path.join(root, "image_0"))
    os.makedirs(os.path.join(root, "image_1"))
    ds = SyntheticStereoDataset(CAM, n_frames=n_frames, speed=0.55)
    times, pose_rows = [], []
    for i in range(n_frames):
        imgL, imgR, Twc = ds.frame(i)
        l8 = np.clip(np.asarray(imgL), 0, 255).astype(np.uint8)
        r8 = np.clip(np.asarray(imgR), 0, 255).astype(np.uint8)
        _save_png(os.path.join(root, "image_0", f"{i:06d}.png"), l8)
        _save_png(os.path.join(root, "image_1", f"{i:06d}.png"), r8)
        times.append(i * 0.1)
        pose_rows.append(np.asarray(Twc)[:3, :4].reshape(-1))
    np.savetxt(os.path.join(root, "times.txt"), np.asarray(times), fmt="%.6f")
    np.savetxt(os.path.join(root, "poses.txt"), np.stack(pose_rows), fmt="%.9f")


def _write_tum_layout(root, n_frames):
    """Real TUM RGB-D sequence layout (rgb/ depth/ associate.txt
    groundtruth.txt, uint16 depth at scale 5000)."""
    os.makedirs(os.path.join(root, "rgb"))
    os.makedirs(os.path.join(root, "depth"))
    ds = SyntheticStereoDataset(CAM, n_frames=n_frames, speed=0.4)
    assoc, gt_lines = [], ["# ground truth"]
    for i in range(n_frames):
        img, depth, Twc = ds.frame_with_depth(i)
        t = 1000.0 + i * 0.05
        g8 = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
        d = np.asarray(depth)
        d16 = np.where(np.isfinite(d) & (d > 0) & (d < 13.0), d * 5000.0, 0.0)
        _save_png(os.path.join(root, "rgb", f"{t:.6f}.png"), g8)
        _save_png(os.path.join(root, "depth", f"{t:.6f}.png"),
                  d16.astype(np.uint16))
        assoc.append(f"{t:.6f} rgb/{t:.6f}.png {t:.6f} depth/{t:.6f}.png")
        Twc = np.asarray(Twc)
        qx, qy, qz, qw = _quat_from_R(Twc[:3, :3])
        tx, ty, tz = Twc[:3, 3]
        gt_lines.append(
            f"{t:.6f} {tx:.6f} {ty:.6f} {tz:.6f} {qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}")
    with open(os.path.join(root, "associate.txt"), "w") as f:
        f.write("\n".join(assoc) + "\n")
    with open(os.path.join(root, "groundtruth.txt"), "w") as f:
        f.write("\n".join(gt_lines) + "\n")


def _run_cli(argv, capsys):
    from orb_slam2_ros2_tpu import cli

    cli.main(argv)
    captured = capsys.readouterr()
    last = captured.out.strip().splitlines()[-1]
    return json.loads(last)


@pytest.mark.slow
def test_cli_kitti_layout_e2e(tmp_path, capsys):
    seq = tmp_path / "00"
    n = 26
    _write_kitti_layout(str(seq), n)
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(CFG_YAML.format(cam_type=0))
    out = str(tmp_path / "traj")
    res = _run_cli(["kitti", "--seq", str(seq), "--config", str(cfg),
                    "--out", out], capsys)
    assert res["frames"] == n
    assert res["tracked"] >= n - 2, res
    assert res["keyframes"] >= 2
    # ground truth auto-detected from poses.txt → ATE evaluated and bounded
    assert "ate_rmse" in res, res
    # path length ≈ n·speed; ATE under 5% of it (the CI accuracy class)
    assert res["ate_rmse"] < 0.05 * (n * 0.55), res
    assert os.path.exists(out + ".kitti.txt")
    assert os.path.exists(out + ".tum.txt")
    rows = np.loadtxt(out + ".kitti.txt")
    assert rows.shape == (n, 12)


@pytest.mark.slow
def test_cli_tum_layout_e2e(tmp_path, capsys):
    seq = tmp_path / "fr_synth"
    n = 22
    _write_tum_layout(str(seq), n)
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(CFG_YAML.format(cam_type=1))
    out = str(tmp_path / "traj")
    res = _run_cli(["tum", "--seq", str(seq), "--config", str(cfg),
                    "--out", out], capsys)
    assert res["frames"] == n
    assert res["tracked"] >= n - 2, res
    assert "ate_rmse" in res, res
    assert res["ate_rmse"] < 0.05 * (n * 0.4), res
    assert os.path.exists(out + ".kitti.txt")


@pytest.mark.slow
def test_cli_kitti_pipelined_alignment(tmp_path, capsys):
    """--pipelined returns poses one frame late; the exported trajectory
    must still be frame-aligned (rebuilt from resolve-time records)."""
    seq = tmp_path / "00"
    n = 24
    _write_kitti_layout(str(seq), n)
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(CFG_YAML.format(cam_type=0))
    out = str(tmp_path / "traj")
    res = _run_cli(["kitti", "--seq", str(seq), "--config", str(cfg),
                    "--out", out, "--pipelined"], capsys)
    assert res["frames"] == n
    assert res["tracked"] >= n - 2, res
    # ATE evaluated on the ALIGNED export: misalignment by one frame at
    # speed 0.55 m/frame would blow past this bound immediately
    assert "ate_rmse" in res, res
    assert res["ate_rmse"] < 0.05 * (n * 0.55), res


@pytest.mark.slow
def test_cli_kitti_save_and_reuse_map(tmp_path, capsys):
    """Map save at shutdown + localization-only reuse through the CLI
    (reference System.cc:98-110 + OnlyTracking)."""
    seq = tmp_path / "00"
    _write_kitti_layout(str(seq), 20)
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(CFG_YAML.format(cam_type=0))
    mp = str(tmp_path / "saved_map")
    res = _run_cli(["kitti", "--seq", str(seq), "--config", str(cfg),
                    "--out", str(tmp_path / "t1"), "--save-map", mp], capsys)
    assert res["tracked"] >= 18
    assert os.path.exists(mp + ".map.npz")
    res2 = _run_cli(["kitti", "--seq", str(seq), "--config", str(cfg),
                     "--out", str(tmp_path / "t2"), "--load-map", mp], capsys)
    assert res2["tracked"] >= 16, res2


@pytest.mark.slow
def test_cli_live_viewer_film_strip(tmp_path, capsys):
    """--viewer renders the reference Viewer's content (trajectory, map
    points, graph, HUD counters) as a headless film strip (Viewer.cc:27-156
    re-homed; SURVEY #19)."""
    seq = tmp_path / "00"
    _write_kitti_layout(str(seq), 16)
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(CFG_YAML.format(cam_type=0))
    vdir = tmp_path / "film"
    res = _run_cli(["kitti", "--seq", str(seq), "--config", str(cfg),
                    "--out", str(tmp_path / "t"), "--viewer", str(vdir),
                    "--viewer-every", "5"], capsys)
    assert res["tracked"] >= 14
    frames = sorted(vdir.glob("viewer_*.png"))
    assert len(frames) >= 2, list(vdir.iterdir())
    assert frames[0].stat().st_size > 5000  # a real rendered plot
