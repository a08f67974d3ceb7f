"""Tests for the PCG-Schur global BA, single-device and sharded (8 CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from orb_slam2_ros2_tpu.geometry import se3
from orb_slam2_ros2_tpu.solvers.pcg_ba import (
    PointBAProblem,
    _chi2_point,
    solve_global_ba,
    solve_global_ba_sharded,
)

from test_schur_ba import build_problem


def grid_to_point_layout(prob, n_pts, max_obs=16):
    """Convert the grid-layout test problem to the per-point layout."""
    C, N = np.asarray(prob.pt_slot).shape
    slot = np.asarray(prob.pt_slot)
    valid = np.asarray(prob.edge_valid)
    uv = np.asarray(prob.uv)
    ru = np.asarray(prob.right_u)
    iv = np.asarray(prob.inv_sigma2)

    obs_cam = np.full((n_pts, max_obs), -1, np.int32)
    obs_uv = np.zeros((n_pts, max_obs, 2), np.float32)
    obs_ru = np.full((n_pts, max_obs), -1.0, np.float32)
    obs_iv = np.ones((n_pts, max_obs), np.float32)
    obs_ok = np.zeros((n_pts, max_obs), bool)
    counts = np.zeros(n_pts, np.int32)
    for c in range(C):
        for n in range(N):
            if not valid[c, n] or slot[c, n] < 0:
                continue
            p = slot[c, n]
            if counts[p] >= max_obs:
                continue
            o = counts[p]
            obs_cam[p, o] = c
            obs_uv[p, o] = uv[c, n]
            obs_ru[p, o] = ru[c, n]
            obs_iv[p, o] = iv[c, n]
            obs_ok[p, o] = True
            counts[p] += 1
    return PointBAProblem(
        cam_Tcw=prob.cam_Tcw, cam_free=prob.cam_free,
        pt_pos=prob.pt_pos, pt_valid=prob.pt_valid,
        obs_cam=jnp.asarray(obs_cam), obs_uv=jnp.asarray(obs_uv),
        obs_right_u=jnp.asarray(obs_ru), obs_inv_sigma2=jnp.asarray(obs_iv),
        obs_valid=jnp.asarray(obs_ok),
    )


class TestPCGBA:
    def test_reduces_error_and_recovers_poses(self):
        cam, gprob, Tcw_gt, pts_gt = build_problem(n_pts=128, pose_noise=0.08)
        prob = grid_to_point_layout(gprob, 128)
        chi0 = np.asarray(_chi2_point(cam, prob, prob.cam_Tcw, prob.pt_pos))
        Tcw, pts, _ = solve_global_ba(cam, prob)
        chi1 = np.asarray(_chi2_point(cam, prob, Tcw, pts))
        v = np.asarray(prob.obs_valid)
        assert chi1[v].mean() < 0.1 * chi0[v].mean()
        for c in range(1, Tcw.shape[0]):
            err = np.asarray(se3.log(jnp.asarray(Tcw[c]) @ jnp.linalg.inv(jnp.asarray(Tcw_gt[c], jnp.float32))))
            assert np.linalg.norm(err[:3]) < 0.035, f"cam {c}: {err[:3]}"

    def test_sharded_matches_unsharded(self):
        devs = jax.devices()
        assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
        cam, gprob, Tcw_gt, pts_gt = build_problem(n_pts=128, pose_noise=0.05)
        prob = grid_to_point_layout(gprob, 128)
        Tcw_a, pts_a, _ = solve_global_ba(cam, prob, phase_iters=(3, 3))
        mesh = Mesh(np.array(devs[:8]), ("ba",))
        Tcw_b, pts_b, _ = solve_global_ba_sharded(cam, prob, mesh, phase_iters=(3, 3))
        np.testing.assert_allclose(np.asarray(Tcw_a), np.asarray(Tcw_b), atol=5e-4)
        np.testing.assert_allclose(np.asarray(pts_a), np.asarray(pts_b), atol=5e-3)

    def test_fixed_anchor(self):
        cam, gprob, *_ = build_problem(n_pts=128)
        prob = grid_to_point_layout(gprob, 128)
        Tcw, _, _ = solve_global_ba(cam, prob)
        np.testing.assert_allclose(np.asarray(Tcw[0]), np.asarray(prob.cam_Tcw[0]), atol=1e-6)
