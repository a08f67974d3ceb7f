"""Tests: Sim3 RANSAC/GN and essential-graph pose optimization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_ros2_tpu.config import CameraConfig
from orb_slam2_ros2_tpu.geometry import se3, sim3
from orb_slam2_ros2_tpu.geometry.camera import CameraParams
from orb_slam2_ros2_tpu.solvers.sim3_solver import optimize_sim3, ransac_sim3
from orb_slam2_ros2_tpu.solvers.pose_graph import (
    PoseGraphProblem,
    make_relative_measurements,
    optimize_pose_graph,
)


def cam():
    return CameraParams.from_config(
        CameraConfig(fx=400.0, fy=400.0, cx=320.0, cy=240.0, baseline=0.5, width=640, height=480)
    )


def make_pairs(seed=0, n=80, outlier_frac=0.2, scale=1.0):
    r = np.random.default_rng(seed)
    S_gt = sim3.Sim3(
        R=se3.so3_exp(jnp.asarray([0.1, -0.2, 0.3], jnp.float32)),
        t=jnp.asarray([0.5, -0.3, 0.8], jnp.float32),
        s=jnp.asarray(scale, jnp.float32),
    )
    pc2 = np.stack([r.uniform(-4, 4, n), r.uniform(-3, 3, n), r.uniform(5, 20, n)], 1).astype(np.float32)
    pc1 = np.array(sim3.apply(S_gt, jnp.asarray(pc2)))
    n_out = int(n * outlier_frac)
    pc1[:n_out] += r.uniform(1.0, 3.0, (n_out, 3))
    return S_gt, jnp.asarray(pc1), jnp.asarray(pc2), n_out


class TestSim3:
    def test_ransac_fixed_scale(self):
        S_gt, pc1, pc2, n_out = make_pairs(scale=1.0)
        n = pc1.shape[0]
        S, inl, n_in = ransac_sim3(
            pc1, pc2, jnp.ones(n, bool), cam(), jnp.ones(n), jnp.ones(n),
            jax.random.PRNGKey(0), fix_scale=True,
        )
        assert int(n_in) > 0.6 * (n - n_out)
        np.testing.assert_allclose(np.asarray(S.R), np.asarray(S_gt.R), atol=0.02)
        np.testing.assert_allclose(np.asarray(S.t), np.asarray(S_gt.t), atol=0.05)

    def test_ransac_with_scale(self):
        S_gt, pc1, pc2, n_out = make_pairs(seed=1, scale=1.6)
        n = pc1.shape[0]
        S, inl, n_in = ransac_sim3(
            pc1, pc2, jnp.ones(n, bool), cam(), jnp.ones(n), jnp.ones(n),
            jax.random.PRNGKey(1), fix_scale=False,
        )
        assert abs(float(S.s) - 1.6) < 0.1, float(S.s)

    def test_optimize_refines(self):
        S_gt, pc1, pc2, n_out = make_pairs(seed=2, outlier_frac=0.0)
        n = pc1.shape[0]
        # perturb init
        S0 = sim3.compose(sim3.exp(jnp.asarray([0.05, -0.05, 0.08, 0.02, 0.01, -0.02, 0.0], jnp.float32)), S_gt)
        S_opt, inl, n_in = optimize_sim3(
            S0, pc1, pc2, jnp.ones(n, bool), cam(), jnp.ones(n), jnp.ones(n), fix_scale=True,
        )
        err = np.asarray(sim3.log(sim3.compose(S_opt, sim3.inverse(S_gt))))
        assert np.abs(err).max() < 1e-2, err
        assert int(n_in) == n


def _drift_chain_problem(K=24, seed=3):
    """Chain of K poses with accumulated drift + a loop edge from the last
    back to the first carrying the TRUE relative pose."""
    r = np.random.default_rng(seed)
    gt = [np.eye(4, dtype=np.float32)]
    step = np.asarray(se3.exp(jnp.asarray([0.5, 0, 0.05, 0, 0.26, 0], jnp.float32)))
    for i in range(1, K):
        gt.append((step @ gt[-1]).astype(np.float32))
    gt = np.stack(gt)
    est = [gt[0]]
    for i in range(1, K):
        noise = se3.exp(jnp.asarray(np.concatenate([r.normal(0, 0.02, 3), r.normal(0, 0.005, 3)]), jnp.float32))
        rel = step @ np.asarray(noise)
        est.append((rel @ est[-1]).astype(np.float32))
    est = np.stack(est)

    S_est = sim3.from_se3(jnp.asarray(est))
    ei = jnp.asarray(list(range(K - 1)) + [0], jnp.int32)
    ej = jnp.asarray(list(range(1, K)) + [K - 1], jnp.int32)
    S_meas = make_relative_measurements(S_est, ei, ej)
    S_gt_all = sim3.from_se3(jnp.asarray(gt))
    true_rel = make_relative_measurements(S_gt_all, jnp.asarray([0]), jnp.asarray([K - 1]))
    S_meas = sim3.Sim3(
        R=S_meas.R.at[-1].set(true_rel.R[0]),
        t=S_meas.t.at[-1].set(true_rel.t[0]),
        s=S_meas.s.at[-1].set(true_rel.s[0]),
    )
    fixed = jnp.zeros(K, bool).at[0].set(True)
    prob = PoseGraphProblem(
        S_cw=S_est, kf_valid=jnp.ones(K, bool), kf_fixed=fixed,
        edge_i=ei, edge_j=ej, edge_Sji=S_meas,
        edge_valid=jnp.ones(K, bool), edge_weight=jnp.ones(K),
    )
    return prob, gt, est


class TestPoseGraph:
    def test_loop_correction_distributes_drift(self):
        """Chain of K poses with accumulated drift; a loop edge from the last
        back to the first (with the TRUE relative pose) should spread the
        error over the chain — the essential-graph behaviour."""
        K = 24
        r = np.random.default_rng(3)
        # ground truth: circle-ish trajectory
        gt = [np.eye(4, dtype=np.float32)]
        step = np.asarray(se3.exp(jnp.asarray([0.5, 0, 0.05, 0, 0.26, 0], jnp.float32)))
        for i in range(1, K):
            gt.append((step @ gt[-1]).astype(np.float32))
        gt = np.stack(gt)
        # estimated: each step has small noise → accumulated drift
        est = [gt[0]]
        for i in range(1, K):
            noise = se3.exp(jnp.asarray(np.concatenate([r.normal(0, 0.02, 3), r.normal(0, 0.005, 3)]), jnp.float32))
            rel = step @ np.asarray(noise)
            est.append((rel @ est[-1]).astype(np.float32))
        est = np.stack(est)

        drift_before = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
        assert drift_before > 0.05

        S_est = sim3.from_se3(jnp.asarray(est))
        # edges: odometry chain seeded from estimates + loop edge with TRUE rel
        ei = list(range(K - 1)) + [0]
        ej = list(range(1, K)) + [K - 1]
        ei = jnp.asarray(ei, jnp.int32)
        ej = jnp.asarray(ej, jnp.int32)
        S_meas = make_relative_measurements(S_est, ei, ej)
        S_gt_all = sim3.from_se3(jnp.asarray(gt))
        true_rel = make_relative_measurements(S_gt_all, jnp.asarray([0]), jnp.asarray([K - 1]))
        S_meas = sim3.Sim3(
            R=S_meas.R.at[-1].set(true_rel.R[0]),
            t=S_meas.t.at[-1].set(true_rel.t[0]),
            s=S_meas.s.at[-1].set(true_rel.s[0]),
        )
        fixed = jnp.zeros(K, bool).at[0].set(True)
        prob = PoseGraphProblem(
            S_cw=S_est, kf_valid=jnp.ones(K, bool), kf_fixed=fixed,
            edge_i=ei, edge_j=ej, edge_Sji=S_meas,
            edge_valid=jnp.ones(K, bool), edge_weight=jnp.ones(K),
        )
        S_opt = optimize_pose_graph(prob, iters=20)
        T_opt = np.asarray(sim3.to_se3(S_opt))
        drift_after = np.linalg.norm(T_opt[-1][:3, 3] - gt[-1][:3, 3])
        assert drift_after < 0.35 * drift_before, (drift_before, drift_after)
        # fixed vertex untouched
        np.testing.assert_allclose(T_opt[0], est[0], atol=1e-5)

    def test_pcg_matches_dense(self):
        """The matrix-free PCG solver must converge to the same optimum as
        the dense-Cholesky path on an identical problem."""
        prob, gt, est = _drift_chain_problem(K=24)
        S_dense = optimize_pose_graph(prob, iters=20)
        S_pcg = optimize_pose_graph(prob, iters=20, dense_max_k=0, cg_iters=200)
        T_dense = np.asarray(sim3.to_se3(S_dense))
        T_pcg = np.asarray(sim3.to_se3(S_pcg))
        np.testing.assert_allclose(T_pcg, T_dense, atol=2e-3)

    def test_pcg_large_graph(self):
        """PCG path at a vertex count where the dense Hessian (7K)² would be
        ~1 GB — verifies the scalable path corrects drift without building H."""
        prob, gt, est = _drift_chain_problem(K=600, seed=5)
        drift_before = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
        S_opt = optimize_pose_graph(prob, iters=10, cg_iters=400)
        T_opt = np.asarray(sim3.to_se3(S_opt))
        drift_after = np.linalg.norm(T_opt[-1][:3, 3] - gt[-1][:3, 3])
        assert drift_after < 0.35 * drift_before, (drift_before, drift_after)
        np.testing.assert_allclose(T_opt[0], est[0], atol=1e-4)

    def test_sharded_matches_unsharded(self):
        """Edge-sharded PCG over the 8-virtual-device mesh == single-device
        PCG (SURVEY §5.8: a whole loop closure rides the mesh).  Also
        exercises the non-divisible edge-count padding path (K edges = 24,
        mesh 8 → pad 0; K=27 edges → pad 5)."""
        from jax.sharding import Mesh

        prob, gt, est = _drift_chain_problem(K=26)
        devs = np.array(jax.devices()[:8])
        mesh = Mesh(devs, ("ba",))
        S_ref = optimize_pose_graph(prob, iters=15, dense_max_k=0, cg_iters=200)
        S_sh = optimize_pose_graph(prob, iters=15, cg_iters=200,
                                   mesh=mesh, mesh_axis="ba")
        T_ref = np.asarray(sim3.to_se3(S_ref))
        T_sh = np.asarray(sim3.to_se3(S_sh))
        np.testing.assert_allclose(T_sh, T_ref, atol=2e-3)
