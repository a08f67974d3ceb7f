"""Ground-truth loading + ATE association (reference evaluates externally;
see io/datasets.load_kitti_gt / load_tum_gt and io/trajectory.ate_rmse)."""

import numpy as np

from orb_slam2_ros2_tpu.io.datasets import associate_gt, load_kitti_gt, load_tum_gt
from orb_slam2_ros2_tpu.io.trajectory import ate_rmse, rotation_to_quat
import pytest

# multi-frame full-SLAM integration: excluded from the default fast run
pytestmark = pytest.mark.slow


def _rand_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    x, y, z, w = q
    R = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = rng.normal(size=3)
    return T


def test_kitti_gt_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    poses = [_rand_pose(rng) for _ in range(7)]
    seq = tmp_path / "00"
    seq.mkdir()
    with open(seq / "poses.txt", "w") as f:
        for T in poses:
            f.write(" ".join(f"{v:.9e}" for v in T[:3, :4].reshape(-1)) + "\n")
    loaded = load_kitti_gt(str(seq))
    assert loaded is not None and len(loaded) == 7
    np.testing.assert_allclose(loaded, np.stack(poses), atol=1e-7)
    # official layout: dataset/poses/00.txt two levels up
    root = tmp_path / "ds" / "sequences" / "01"
    root.mkdir(parents=True)
    (tmp_path / "ds" / "poses").mkdir()
    with open(tmp_path / "ds" / "poses" / "01.txt", "w") as f:
        f.write(" ".join(f"{v:.9e}" for v in poses[0][:3, :4].reshape(-1)) + "\n")
    assert load_kitti_gt(str(root)) is not None
    assert load_kitti_gt(str(tmp_path / "nowhere")) is None


def test_tum_gt_association(tmp_path):
    rng = np.random.default_rng(1)
    poses = [_rand_pose(rng) for _ in range(5)]
    gt_path = tmp_path / "groundtruth.txt"
    with open(gt_path, "w") as f:
        f.write("# ground truth\n")
        for i, T in enumerate(poses):
            q = rotation_to_quat(T[:3, :3])
            t = T[:3, 3]
            f.write(
                f"{i * 0.5:.4f} {t[0]} {t[1]} {t[2]} {q[0]} {q[1]} {q[2]} {q[3]}\n"
            )
    stamps, loaded = load_tum_gt(str(tmp_path))
    assert len(stamps) == 5
    np.testing.assert_allclose(loaded, np.stack(poses), atol=1e-6)
    # within-tolerance stamps associate; far stamps do not
    assoc = associate_gt([0.0, 0.505, 1.3], stamps, loaded, max_dt=0.02)
    assert assoc[0] is not None and assoc[1] is not None and assoc[2] is None
    np.testing.assert_allclose(assoc[1], poses[1], atol=1e-6)


def test_ate_rmse_invariance():
    rng = np.random.default_rng(2)
    gt = [_rand_pose(rng) for _ in range(20)]
    # estimated = gt under a rigid transform → ATE ~ 0 after alignment
    W = _rand_pose(rng)
    est = [W @ T for T in gt]
    assert ate_rmse(est, gt) < 1e-8
    # a 10 cm corruption on one pose of 20 → RMSE ≈ 0.1/sqrt(20)
    est[5] = est[5].copy()
    est[5][:3, 3] += np.array([0.1, 0.0, 0.0])
    err = ate_rmse(est, gt)
    assert 0.1 / np.sqrt(20) * 0.5 < err < 0.1
