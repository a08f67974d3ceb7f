"""Unit tests for the Schur-complement bundle adjuster."""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_ros2_tpu.config import CameraConfig
from orb_slam2_ros2_tpu.geometry import se3
from orb_slam2_ros2_tpu.geometry.camera import CameraParams, project
from orb_slam2_ros2_tpu.solvers.schur_ba import BAProblem, solve_ba, _chi2


def build_problem(seed=0, n_cams=6, n_feats=64, n_pts=128, pose_noise=0.05,
                  pt_noise=0.1, px_noise=0.3, outlier_frac=0.0, stereo=True):
    r = np.random.default_rng(seed)
    cfg = CameraConfig(fx=400.0, fy=400.0, cx=320.0, cy=240.0, baseline=0.5,
                       width=640, height=480)
    cam = CameraParams.from_config(cfg)

    pts_gt = np.stack(
        [r.uniform(-8, 8, n_pts), r.uniform(-3, 3, n_pts), r.uniform(8, 30, n_pts)], 1
    ).astype(np.float32)
    # cameras along a line with small rotations
    Tcw_gt = []
    for i in range(n_cams):
        xi = np.concatenate([[0.4 * i, 0.02 * i, 0.1 * i], r.normal(0, 0.01, 3)])
        Tcw_gt.append(np.asarray(se3.exp(jnp.asarray(xi, jnp.float32))))
    Tcw_gt = np.stack(Tcw_gt)

    # observations: each camera sees a random subset of points
    pt_slot = np.full((n_cams, n_feats), -1, np.int32)
    uv = np.zeros((n_cams, n_feats, 2), np.float32)
    right_u = np.full((n_cams, n_feats), -1.0, np.float32)
    valid = np.zeros((n_cams, n_feats), bool)
    for c in range(n_cams):
        sel = r.choice(n_pts, size=n_feats, replace=False)
        pc = (Tcw_gt[c, :3, :3] @ pts_gt[sel].T).T + Tcw_gt[c, :3, 3]
        uvc, okc = project(cam, jnp.asarray(pc))
        uvc = np.asarray(uvc) + r.normal(0, px_noise, (n_feats, 2))
        ok = np.asarray(okc) & (uvc[:, 0] > 0) & (uvc[:, 0] < 640) & (uvc[:, 1] > 0) & (uvc[:, 1] < 480)
        pt_slot[c] = np.where(ok, sel, -1)
        uv[c] = uvc
        if stereo:
            right_u[c] = np.where(ok, uvc[:, 0] - float(cam.bf) / np.maximum(pc[:, 2], 0.1), -1.0)
        valid[c] = ok
    n_out = int(n_feats * outlier_frac)
    if n_out:
        uv[:, :n_out] += r.uniform(15, 40, (n_cams, n_out, 2))

    # perturb
    cam_free = np.ones(n_cams, bool)
    cam_free[0] = False  # gauge
    Tcw_init = Tcw_gt.copy()
    for c in range(1, n_cams):
        d = np.concatenate([r.normal(0, pose_noise, 3), r.normal(0, pose_noise * 0.2, 3)])
        Tcw_init[c] = np.asarray(se3.exp(jnp.asarray(d, jnp.float32))) @ Tcw_init[c]
    pts_init = pts_gt + r.normal(0, pt_noise, pts_gt.shape).astype(np.float32)

    prob = BAProblem(
        cam_Tcw=jnp.asarray(Tcw_init),
        cam_free=jnp.asarray(cam_free),
        pt_pos=jnp.asarray(pts_init),
        pt_valid=jnp.ones(n_pts, bool),
        pt_slot=jnp.asarray(pt_slot),
        uv=jnp.asarray(uv),
        right_u=jnp.asarray(right_u),
        inv_sigma2=jnp.ones((n_cams, n_feats), jnp.float32),
        edge_valid=jnp.asarray(valid),
    )
    return cam, prob, Tcw_gt, pts_gt


class TestSchurBA:
    def test_reduces_reprojection_error(self):
        cam, prob, Tcw_gt, pts_gt = build_problem()
        chi0 = np.asarray(_chi2(cam, prob, prob.cam_Tcw, prob.pt_pos))
        Tcw, pts, inlier = solve_ba(cam, prob)
        chi1 = np.asarray(_chi2(cam, prob, Tcw, pts))
        v = np.asarray(prob.edge_valid)
        assert chi1[v].mean() < 0.1 * chi0[v].mean()

    def test_recovers_poses(self):
        """Pose error after BA is limited by the 0.3 px observation noise
        (≈1.5 cm at this geometry), far below the 5-17 cm init perturbation."""
        cam, prob, Tcw_gt, pts_gt = build_problem(pose_noise=0.08)
        Tcw, pts, _ = solve_ba(cam, prob)
        for c in range(1, Tcw.shape[0]):
            err = np.asarray(se3.log(jnp.asarray(Tcw[c]) @ jnp.linalg.inv(jnp.asarray(Tcw_gt[c], jnp.float32))))
            assert np.linalg.norm(err[:3]) < 0.03, f"cam {c}: {err[:3]}"
            assert np.linalg.norm(err[3:]) < 0.005

    def test_fixed_camera_untouched(self):
        cam, prob, Tcw_gt, _ = build_problem()
        Tcw, _, _ = solve_ba(cam, prob)
        np.testing.assert_allclose(np.asarray(Tcw[0]), np.asarray(prob.cam_Tcw[0]), atol=1e-6)

    def test_outliers_gated(self):
        cam, prob, Tcw_gt, pts_gt = build_problem(outlier_frac=0.15, pose_noise=0.03)
        Tcw, pts, inlier = solve_ba(cam, prob)
        # poses still recovered despite outliers
        for c in range(1, Tcw.shape[0]):
            err = np.asarray(se3.log(jnp.asarray(Tcw[c]) @ jnp.linalg.inv(jnp.asarray(Tcw_gt[c], jnp.float32))))
            assert np.linalg.norm(err[:3]) < 0.035, f"cam {c}: {err[:3]}"
        inlier = np.asarray(inlier)
        v = np.asarray(prob.edge_valid)
        # outlier edges (first 15% of slots) mostly rejected
        n_out = int(prob.uv.shape[1] * 0.15)
        assert inlier[:, :n_out][v[:, :n_out]].mean() < 0.4

    def test_mono_only_problem(self):
        cam, prob, Tcw_gt, _ = build_problem(stereo=False, pose_noise=0.03)
        chi0 = np.asarray(_chi2(cam, prob, prob.cam_Tcw, prob.pt_pos))
        Tcw, pts, _ = solve_ba(cam, prob)
        chi1 = np.asarray(_chi2(cam, prob, Tcw, pts))
        v = np.asarray(prob.edge_valid)
        assert chi1[v].mean() < 0.2 * chi0[v].mean()

    def test_empty_problem_no_nan(self):
        cam, prob, *_ = build_problem()
        prob = prob._replace(edge_valid=jnp.zeros_like(prob.edge_valid))
        Tcw, pts, _ = solve_ba(cam, prob)
        assert np.isfinite(np.asarray(Tcw)).all()
        assert np.isfinite(np.asarray(pts)).all()
