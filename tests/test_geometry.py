"""Unit tests for the geometry core (SE3/Sim3/camera/triangulation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_ros2_tpu.config import CameraConfig
from orb_slam2_ros2_tpu.geometry import camera, se3, sim3, triangulate



import pytest

pytestmark = pytest.mark.smoke  # fast subset: `pytest -m smoke` < 60 s

def rng(seed=0):
    return np.random.default_rng(seed)


def random_rotation(r):
    """Uniform-ish random rotation via QR of a Gaussian matrix."""
    q, _ = np.linalg.qr(r.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


class TestSE3:
    def test_exp_log_roundtrip(self):
        r = rng(1)
        xi = jnp.asarray(r.normal(scale=0.5, size=(64, 6)), jnp.float32)
        T = se3.exp(xi)
        xi2 = se3.log(T)
        np.testing.assert_allclose(xi, xi2, atol=2e-4)

    def test_exp_small_angle(self):
        xi = jnp.asarray([[1e-9, 2e-9, -1e-9, 1e-10, 0.0, -1e-10]], jnp.float32)
        T = se3.exp(xi)
        np.testing.assert_allclose(np.asarray(T[0]), np.eye(4), atol=1e-6)

    def test_inverse_compose(self):
        r = rng(2)
        xi = jnp.asarray(r.normal(scale=0.7, size=(16, 6)), jnp.float32)
        T = se3.exp(xi)
        I = se3.compose(T, se3.inverse(T))
        np.testing.assert_allclose(np.asarray(I), np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5)

    def test_apply_matches_matmul(self):
        r = rng(3)
        T = se3.exp(jnp.asarray(r.normal(scale=0.5, size=(6,)), jnp.float32))
        p = jnp.asarray(r.normal(size=(10, 3)), jnp.float32)
        ph = np.concatenate([np.asarray(p), np.ones((10, 1), np.float32)], axis=1)
        expect = (np.asarray(T) @ ph.T).T[:, :3]
        np.testing.assert_allclose(np.asarray(se3.apply(T, p)), expect, atol=1e-5)

    def test_rotation_orthonormal(self):
        r = rng(4)
        T = se3.exp(jnp.asarray(r.normal(scale=1.0, size=(8, 6)), jnp.float32))
        R = np.asarray(se3.R_of(T))
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(8), atol=1e-5)


class TestSim3:
    def test_exp_log_roundtrip(self):
        r = rng(5)
        xi = np.concatenate(
            [r.normal(scale=0.5, size=(32, 6)), r.normal(scale=0.3, size=(32, 1))], axis=1
        ).astype(np.float32)
        S = sim3.exp(jnp.asarray(xi))
        xi2 = np.asarray(sim3.log(S))
        np.testing.assert_allclose(xi, xi2, atol=5e-4)

    def test_identity_exp(self):
        S = sim3.exp(jnp.zeros((7,), jnp.float32))
        np.testing.assert_allclose(np.asarray(S.R), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(S.t), np.zeros(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(S.s), 1.0, atol=1e-6)

    def test_compose_inverse(self):
        r = rng(6)
        xi = jnp.asarray(r.normal(scale=0.4, size=(8, 7)), jnp.float32)
        S = sim3.exp(xi)
        I = sim3.compose(S, sim3.inverse(S))
        np.testing.assert_allclose(np.asarray(I.R), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.t), np.zeros((8, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(I.s), np.ones(8), atol=1e-5)

    def test_apply_scale(self):
        """S(p) = s R p + t — the Sim3Ret::operator* convention."""
        r = rng(7)
        R = random_rotation(r)
        t = r.normal(size=3).astype(np.float32)
        s = np.float32(1.7)
        S = sim3.Sim3(R=jnp.asarray(R), t=jnp.asarray(t), s=jnp.asarray(s))
        p = r.normal(size=(5, 3)).astype(np.float32)
        expect = (s * (R @ p.T)).T + t
        np.testing.assert_allclose(np.asarray(sim3.apply(S, jnp.asarray(p))), expect, atol=1e-5)


class TestCamera:
    def cam(self, **kw):
        return camera.CameraParams.from_config(CameraConfig(**kw))

    def test_project_unproject_roundtrip(self):
        cam = self.cam()
        r = rng(8)
        pc = np.stack(
            [r.uniform(-5, 5, 100), r.uniform(-2, 2, 100), r.uniform(1, 50, 100)], axis=1
        ).astype(np.float32)
        uv, valid = camera.project(cam, jnp.asarray(pc))
        assert bool(jnp.all(valid))
        pc2 = camera.unproject(cam, uv, jnp.asarray(pc[:, 2]))
        np.testing.assert_allclose(np.asarray(pc2), pc, rtol=1e-4, atol=1e-3)

    def test_project_behind_invalid(self):
        cam = self.cam()
        _, valid = camera.project(cam, jnp.asarray([[0.0, 0.0, -1.0]]))
        assert not bool(valid[0])

    def test_stereo_right_u(self):
        cam = self.cam()
        pc = jnp.asarray([[1.0, 0.5, 10.0]])
        uv, ur, valid = camera.project_stereo(cam, pc)
        disparity = float(uv[0, 0] - ur[0])
        np.testing.assert_allclose(disparity, float(cam.bf) / 10.0, rtol=1e-5)

    def test_undistort_roundtrip(self):
        cam = self.cam(k1=-0.28, k2=0.07, p1=2e-4, p2=-2e-5, width=640, height=480,
                       fx=517.3, fy=516.5, cx=318.6, cy=255.3)
        r = rng(9)
        uv_ideal = np.stack(
            [r.uniform(100, 540, 200), r.uniform(100, 380, 200)], axis=1
        ).astype(np.float32)
        uv_dist = camera.distort_points(cam, jnp.asarray(uv_ideal))
        uv_back = camera.undistort_points(cam, uv_dist)
        np.testing.assert_allclose(np.asarray(uv_back), uv_ideal, atol=0.05)

    def test_undistort_noop_without_distortion(self):
        cam = self.cam()
        uv = jnp.asarray([[100.0, 200.0], [640.0, 100.0]])
        np.testing.assert_allclose(np.asarray(camera.undistort_points(cam, uv)), np.asarray(uv), atol=1e-3)


class TestTriangulate:
    def test_triangulate_exact(self):
        cam = camera.CameraParams.from_config(CameraConfig())
        r = rng(10)
        pw = np.stack(
            [r.uniform(-10, 10, 64), r.uniform(-3, 3, 64), r.uniform(8, 40, 64)], axis=1
        ).astype(np.float32)
        T1 = se3.identity()
        T2 = se3.exp(jnp.asarray([0.54, 0.0, 0.0, 0.0, 0.02, 0.0], jnp.float32))
        uv1, _ = camera.project(cam, se3.apply(T1, jnp.asarray(pw)))
        uv2, _ = camera.project(cam, se3.apply(T2, jnp.asarray(pw)))
        T1b = jnp.broadcast_to(T1, (64, 4, 4))
        T2b = jnp.broadcast_to(T2, (64, 4, 4))
        pw_hat, ok = triangulate.triangulate_pairs(cam, T1b, uv1, T2b, uv2)
        assert bool(jnp.all(ok))
        np.testing.assert_allclose(np.asarray(pw_hat), pw, rtol=1e-2, atol=5e-2)

    def test_degenerate_zero_baseline(self):
        """Same camera twice → rank-deficient DLT → gate rejects."""
        cam = camera.CameraParams.from_config(CameraConfig())
        T = jnp.broadcast_to(se3.identity(), (4, 4, 4))
        uv = jnp.asarray([[300.0, 200.0]] * 4)
        _, ok = triangulate.triangulate_pairs(cam, T, uv, T, uv)
        assert not bool(jnp.any(ok))

    def test_parallax_cos(self):
        T1 = jnp.broadcast_to(se3.identity(), (1, 4, 4))
        T2 = se3.exp(jnp.asarray([[1.0, 0.0, 0.0, 0.0, 0.0, 0.0]], jnp.float32))
        straight = triangulate.parallax_cos(T1, jnp.zeros((1, 2)), T1, jnp.zeros((1, 2)))
        np.testing.assert_allclose(np.asarray(straight), 1.0, atol=1e-6)
        off = triangulate.parallax_cos(
            T1, jnp.zeros((1, 2)), T2, jnp.asarray([[0.3, 0.0]])
        )
        assert float(off[0]) < 1.0
