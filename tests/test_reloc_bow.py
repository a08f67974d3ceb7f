"""Tests: Horn alignment, EPnP RANSAC, BoW vocabulary + retrieval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_ros2_tpu.config import CameraConfig
from orb_slam2_ros2_tpu.geometry import se3
from orb_slam2_ros2_tpu.geometry.align import horn_align
from orb_slam2_ros2_tpu.geometry.camera import CameraParams, project
from orb_slam2_ros2_tpu.solvers.epnp import epnp_solve, ransac_pnp
from orb_slam2_ros2_tpu.bow.vocabulary import (
    Vocabulary,
    bow_vector,
    train_vocabulary,
    transform,
)


def rot(r):
    q, _ = np.linalg.qr(r.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


class TestHorn:
    def test_exact_rigid(self):
        r = np.random.default_rng(0)
        R_gt, t_gt = rot(r), r.normal(size=3).astype(np.float32)
        src = r.normal(size=(20, 3)).astype(np.float32)
        dst = (R_gt @ src.T).T + t_gt
        R, t, s = horn_align(jnp.asarray(src)[None], jnp.asarray(dst)[None], jnp.ones((1, 20)))
        np.testing.assert_allclose(np.asarray(R[0]), R_gt, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t[0]), t_gt, atol=1e-4)

    def test_with_scale(self):
        r = np.random.default_rng(1)
        R_gt, t_gt, s_gt = rot(r), r.normal(size=3).astype(np.float32), np.float32(2.3)
        src = r.normal(size=(30, 3)).astype(np.float32)
        dst = s_gt * (R_gt @ src.T).T + t_gt
        R, t, s = horn_align(jnp.asarray(src)[None], jnp.asarray(dst)[None], jnp.ones((1, 30)), with_scale=True)
        np.testing.assert_allclose(float(s[0]), s_gt, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(R[0]), R_gt, atol=1e-4)

    def test_weights_mask_outliers(self):
        r = np.random.default_rng(2)
        R_gt, t_gt = rot(r), r.normal(size=3).astype(np.float32)
        src = r.normal(size=(20, 3)).astype(np.float32)
        dst = (R_gt @ src.T).T + t_gt
        dst[:5] += 10.0  # corrupted
        w = np.ones(20, np.float32)
        w[:5] = 0.0
        R, t, _ = horn_align(jnp.asarray(src)[None], jnp.asarray(dst)[None], jnp.asarray(w)[None])
        np.testing.assert_allclose(np.asarray(R[0]), R_gt, atol=1e-4)


class TestEPnP:
    def setup(self, seed=3, n=100, outlier_frac=0.0, px_noise=0.3):
        r = np.random.default_rng(seed)
        cfg = CameraConfig(fx=400.0, fy=400.0, cx=320.0, cy=240.0, baseline=0.5, width=640, height=480)
        cam = CameraParams.from_config(cfg)
        Tcw_gt = se3.exp(jnp.asarray([0.3, -0.2, 0.5, 0.1, -0.05, 0.2], jnp.float32))
        pw = np.stack([r.uniform(-5, 5, n), r.uniform(-3, 3, n), r.uniform(4, 20, n)], 1).astype(np.float32)
        pc = se3.apply(Tcw_gt, jnp.asarray(pw))
        uv, _ = project(cam, pc)
        uv = np.asarray(uv) + r.normal(0, px_noise, (n, 2)).astype(np.float32)
        n_out = int(n * outlier_frac)
        uv[:n_out] += r.uniform(30, 100, (n_out, 2))
        return cam, Tcw_gt, jnp.asarray(pw), jnp.asarray(uv.astype(np.float32)), n_out

    def test_epnp_minimal_exact(self):
        cam, Tcw_gt, pw, uv, _ = self.setup(n=6, px_noise=0.0)
        Tcw, ok = epnp_solve(cam, pw, uv)
        assert bool(ok)
        err = np.asarray(se3.log(Tcw @ se3.inverse(Tcw_gt)))
        assert np.linalg.norm(err[:3]) < 0.05, err

    def test_epnp_planar_scene(self):
        """Near-planar world points leave a >1-dimensional M null space —
        the β-case search (N=2/3 combinations, reference PnPSolver.cc:280-355)
        must still recover the pose where the β₁-only solution degrades."""
        r = np.random.default_rng(11)
        cfg = CameraConfig(fx=400.0, fy=400.0, cx=320.0, cy=240.0, baseline=0.5,
                           width=640, height=480)
        cam = CameraParams.from_config(cfg)
        Tcw_gt = se3.exp(jnp.asarray([0.2, -0.1, 0.4, 0.08, -0.03, 0.15], jnp.float32))
        n = 8
        pw = np.stack([
            r.uniform(-4, 4, n), r.uniform(-2.5, 2.5, n),
            np.full(n, 9.0),  # an exact plane (covariance eigval[0] = 0)
        ], 1).astype(np.float32)
        pc = se3.apply(Tcw_gt, jnp.asarray(pw))
        uv, _ = project(cam, pc)
        Tcw, ok = epnp_solve(cam, jnp.asarray(pw), jnp.asarray(np.asarray(uv)))
        assert bool(ok)
        err = np.asarray(se3.log(Tcw @ se3.inverse(Tcw_gt)))
        assert np.linalg.norm(err[:3]) < 0.08, err

    def test_ransac_with_outliers(self):
        cam, Tcw_gt, pw, uv, n_out = self.setup(n=120, outlier_frac=0.3)
        key = jax.random.PRNGKey(0)
        Tcw, inl, n_in = ransac_pnp(cam, pw, uv, jnp.ones(120), jnp.ones(120, bool), key)
        assert int(n_in) > 60
        err = np.asarray(se3.log(Tcw @ se3.inverse(Tcw_gt)))
        assert np.linalg.norm(err[:3]) < 0.1, err
        inl = np.asarray(inl)
        assert inl[:n_out].mean() < 0.2  # outliers rejected


class TestBoW:
    @pytest.fixture(scope="class")
    def vocab(self):
        r = np.random.default_rng(4)
        descs = r.integers(0, 2**32, (2000, 8), dtype=np.uint32)
        return train_vocabulary(descs, branching=4, depth=3, seed=0)

    def test_transform_deterministic_and_valid(self, vocab):
        r = np.random.default_rng(5)
        d = jnp.asarray(r.integers(0, 2**32, (64, 8), dtype=np.uint32))
        valid = jnp.ones(64, bool)
        w1 = transform(vocab, d, valid)
        w2 = transform(vocab, d, valid)
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        assert (np.asarray(w1) >= 0).all() and (np.asarray(w1) < vocab.n_words).all()

    def test_similar_frames_score_higher(self, vocab):
        r = np.random.default_rng(6)
        base = r.integers(0, 2**32, (128, 8), dtype=np.uint32)
        # frame B = frame A with a few bit flips; frame C = unrelated
        noisy = base.copy()
        flips = r.integers(0, 2**32, (128, 8), dtype=np.uint32) & r.integers(0, 2, (128, 8), dtype=np.uint32).astype(np.uint32)
        noisy = noisy ^ flips
        other = r.integers(0, 2**32, (128, 8), dtype=np.uint32)
        valid = jnp.ones(128, bool)
        va = bow_vector(vocab, transform(vocab, jnp.asarray(base), valid))
        vb = bow_vector(vocab, transform(vocab, jnp.asarray(noisy), valid))
        vc = bow_vector(vocab, transform(vocab, jnp.asarray(other), valid))
        s_ab = float(va @ vb)
        s_ac = float(va @ vc)
        assert s_ab > s_ac, (s_ab, s_ac)
