"""Regression: a single catastrophic outlier must not capture the optimizer.

Found on TPU frame-level testing: one wrong match whose point lands at the
z-clamp produces χ² ~1e17; Huber's linear tail still gives it more influence
than hundreds of good observations, the pose walks off and the χ² gates then
reject everything (0 inliers).  The truncated loss keeps such edges at zero
influence.
"""

import jax.numpy as jnp
import numpy as np

from orb_slam2_ros2_tpu.config import CameraConfig
from orb_slam2_ros2_tpu.geometry import se3
from orb_slam2_ros2_tpu.geometry.camera import CameraParams, project
from orb_slam2_ros2_tpu.solvers.pose_opt import PoseObs, optimize_pose
import pytest

# multi-frame full-SLAM integration: excluded from the default fast run
pytestmark = pytest.mark.slow


def test_monster_outlier_does_not_capture_pose():
    r = np.random.default_rng(0)
    cam = CameraParams.from_config(CameraConfig())
    n = 200
    Tcw_gt = se3.exp(jnp.asarray([0.1, -0.05, 0.3, 0.02, -0.03, 0.01], jnp.float32))
    pw = np.stack([r.uniform(-10, 10, n), r.uniform(-3, 3, n), r.uniform(5, 40, n)], 1).astype(np.float32)
    pc = se3.apply(Tcw_gt, jnp.asarray(pw))
    uv, _ = project(cam, pc)
    uv = np.array(uv) + r.normal(0, 0.3, (n, 2)).astype(np.float32)

    # monster: a "matched" point essentially AT the camera plane — projects
    # through the z-clamp to coordinates ~1e8 px
    pw[0] = np.asarray(se3.apply(se3.inverse(Tcw_gt), jnp.asarray([[0.5, 0.2, 1e-5]]))[0])

    z = np.asarray(pc[:, 2])
    right_u = uv[:, 0] - float(cam.bf) / np.maximum(z, 0.1)
    obs = PoseObs(
        pw=jnp.asarray(pw), uv=jnp.asarray(uv), right_u=jnp.asarray(right_u.astype(np.float32)),
        inv_sigma2=jnp.ones(n), is_stereo=jnp.ones(n, bool), valid=jnp.ones(n, bool),
    )
    T0 = se3.exp(jnp.asarray([0.05, 0.02, -0.03, 0.01, 0.0, -0.01], jnp.float32)) @ Tcw_gt
    Topt, inlier, n_in = optimize_pose(cam, T0, obs)
    err = np.asarray(se3.log(Topt @ se3.inverse(Tcw_gt)))
    assert np.linalg.norm(err[:3]) < 0.02, err
    assert int(n_in) > 0.9 * n
    assert not bool(inlier[0])  # the monster itself is rejected
