"""Tests for the matching suite and pose-only optimizer."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_ros2_tpu.config import CameraConfig
from orb_slam2_ros2_tpu.features.frame import FrameFeatures
from orb_slam2_ros2_tpu.geometry import se3
from orb_slam2_ros2_tpu.geometry.camera import CameraParams, project
from orb_slam2_ros2_tpu.matching import matcher
from orb_slam2_ros2_tpu.solvers.pose_opt import PoseObs, optimize_pose


def make_feats(uv, octave=None, desc=None, angle=None, valid=None, n=None):
    k = uv.shape[0]
    n = n or k
    pad = n - k
    r = np.random.default_rng(42)
    if desc is None:
        desc = r.integers(0, 2**32, (k, 8), dtype=np.uint32)
    if octave is None:
        octave = np.zeros(k, np.int32)
    if angle is None:
        angle = np.zeros(k, np.float32)
    if valid is None:
        valid = np.ones(k, bool)

    def p(x, fill=0):
        return jnp.asarray(np.concatenate([x, np.full((pad, *x.shape[1:]), fill, x.dtype)]))

    return FrameFeatures(
        uv=p(uv.astype(np.float32)), uv_raw=p(uv.astype(np.float32)),
        octave=p(octave.astype(np.int32)), response=p(np.ones(k, np.float32)),
        angle=p(angle.astype(np.float32)), desc=p(desc),
        valid=p(valid.astype(bool)),
    )


class TestBestMatch:
    def test_best_and_ratio(self):
        # query 0: one close candidate → match; query 1: two equal → ratio fails
        dist = jnp.asarray([[10, 200, 200], [50, 52, 200]], jnp.int32)
        cand = jnp.ones((2, 3), bool)
        m = matcher.best_match(dist, cand, max_dist=100, ratio=0.8)
        assert int(m.idx[0]) == 0
        assert int(m.idx[1]) == -1  # 50/52 > 0.8

    def test_no_candidates(self):
        dist = jnp.asarray([[10, 20]], jnp.int32)
        cand = jnp.zeros((1, 2), bool)
        m = matcher.best_match(dist, cand, max_dist=100, ratio=0.9)
        assert int(m.idx[0]) == -1

    def test_mutual_filter_dedup(self):
        # two queries claim target 0; better one (dist 5) wins
        m = matcher.MatchResult(idx=jnp.asarray([0, 0]), dist=jnp.asarray([5, 9]))
        f = matcher.mutual_filter(m, 4)
        assert int(f.idx[0]) == 0 and int(f.idx[1]) == -1


class TestRotationConsistency:
    def test_keeps_dominant_rotation(self):
        r = np.random.default_rng(0)
        n = 100
        angle_q = r.uniform(0, 360, n).astype(np.float32)
        # 90 matches rotated by ~30°, 10 outliers scattered
        angle_t = (angle_q - 30.0) % 360.0
        angle_t[:10] = r.uniform(0, 360, 10)
        found = np.ones(n, bool)
        keep = np.asarray(
            matcher.rotation_consistency(
                jnp.asarray(angle_q), jnp.asarray(angle_t), jnp.asarray(found)
            )
        )
        assert keep[10:].sum() >= 85
        assert keep[:10].sum() <= 5


class TestAreaSearch:
    def test_search_by_area_matches_shifted(self):
        r = np.random.default_rng(1)
        n = 64
        uv_prev = np.stack([r.uniform(50, 500, n), r.uniform(50, 300, n)], 1)
        desc = r.integers(0, 2**32, (n, 8), dtype=np.uint32)
        shift = np.array([3.0, -2.0])
        perm = r.permutation(n)
        prev = make_feats(uv_prev, desc=desc)
        cur = make_feats(uv_prev[perm] + shift, desc=desc[perm])
        m = matcher.search_by_area(
            prev, jnp.ones(n, bool), cur, jnp.zeros(n, bool), jnp.asarray(0.0),
            radius=15.0, scale_factor=1.2, n_levels=8, baseline=0.5,
            max_dist=50, ratio=0.9, check_rotation=False,
        )
        idx = np.asarray(m.idx)
        inv = np.empty(n, int)
        inv[perm] = np.arange(n)
        assert (idx == inv).mean() > 0.95


class TestPoseOpt:
    def setup_scene(self, n=200, noise=0.3, outlier_frac=0.1, seed=3):
        r = np.random.default_rng(seed)
        cfg = CameraConfig()
        cam = CameraParams.from_config(cfg)
        pw = np.stack(
            [r.uniform(-10, 10, n), r.uniform(-3, 3, n), r.uniform(5, 40, n)], 1
        ).astype(np.float32)
        Tcw_gt = se3.exp(jnp.asarray([0.1, -0.05, 0.3, 0.02, -0.03, 0.01], jnp.float32))
        pc = se3.apply(Tcw_gt, jnp.asarray(pw))
        uv, _ = project(cam, pc)
        uv = np.asarray(uv) + r.normal(0, noise, (n, 2))
        n_out = int(n * outlier_frac)
        uv[:n_out] += r.uniform(20, 80, (n_out, 2))
        z = np.asarray(pc[:, 2])
        right_u = uv[:, 0] - float(cam.bf) / z
        obs = PoseObs(
            pw=jnp.asarray(pw), uv=jnp.asarray(uv.astype(np.float32)),
            right_u=jnp.asarray(right_u.astype(np.float32)),
            inv_sigma2=jnp.ones(n), is_stereo=jnp.ones(n, bool),
            valid=jnp.ones(n, bool),
        )
        return cam, Tcw_gt, obs, n_out

    def test_converges_from_perturbed_init(self):
        cam, Tcw_gt, obs, n_out = self.setup_scene()
        T0 = se3.exp(jnp.asarray([0.3, 0.2, -0.2, 0.05, 0.04, -0.06], jnp.float32)) @ Tcw_gt
        T_opt, inlier, n_in = optimize_pose(cam, T0, obs)
        err = np.asarray(se3.log(se3.inverse(T_opt) @ Tcw_gt))
        assert np.abs(err[:3]).max() < 0.01, f"translation err {err[:3]}"
        assert np.abs(err[3:]).max() < 0.002, f"rotation err {err[3:]}"
        # outliers rejected
        inlier = np.asarray(inlier)
        assert inlier[:n_out].sum() <= n_out * 0.2
        assert inlier[n_out:].sum() >= (len(inlier) - n_out) * 0.9

    def test_empty_observations_no_nan(self):
        cam, Tcw_gt, obs, _ = self.setup_scene(n=8)
        obs = obs._replace(valid=jnp.zeros(8, bool))
        T_opt, _, n_in = optimize_pose(cam, Tcw_gt, obs)
        assert int(n_in) == 0
        assert np.isfinite(np.asarray(T_opt)).all()

    def test_mono_only(self):
        cam, Tcw_gt, obs, _ = self.setup_scene(noise=0.2, outlier_frac=0.0)
        obs = obs._replace(is_stereo=jnp.zeros_like(obs.is_stereo))
        T0 = se3.exp(jnp.asarray([0.2, -0.1, 0.1, 0.03, 0.02, -0.02], jnp.float32)) @ Tcw_gt
        T_opt, _, n_in = optimize_pose(cam, T0, obs)
        err = np.asarray(se3.log(se3.inverse(T_opt) @ Tcw_gt))
        assert np.abs(err[:3]).max() < 0.02
