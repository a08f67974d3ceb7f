"""Batched pinhole camera model.

The reference keeps process-global static intrinsics and wraps OpenCV for
projection and undistortion (reference: include/ORB_SLAM2/Camera.h:23-32,
src/Camera.cc:15-43).  Here intrinsics travel as a small pytree and every
operation is batched over point arrays:

- ``project``:    camera-frame 3D → pixel (u, v)            (Camera.cc:15-24)
- ``unproject``:  pixel + depth → camera-frame 3D           (Frame.cc:262-275)
- ``distort`` / ``undistort``: 5-param radial-tangential model; undistortion
  is a fixed-iteration Newton/fixed-point solve replacing
  ``cv::undistortPoints`` (Camera.cc:31-43).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import CameraConfig


class CameraParams(NamedTuple):
    """Device-resident intrinsics pytree."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # [5] = (k1, k2, p1, p2, k3)
    bf: jnp.ndarray    # baseline * fx

    @staticmethod
    def from_config(cfg: CameraConfig) -> "CameraParams":
        f32 = jnp.float32
        return CameraParams(
            fx=jnp.asarray(cfg.fx, f32), fy=jnp.asarray(cfg.fy, f32),
            cx=jnp.asarray(cfg.cx, f32), cy=jnp.asarray(cfg.cy, f32),
            dist=jnp.asarray([cfg.k1, cfg.k2, cfg.p1, cfg.p2, cfg.k3], f32),
            bf=jnp.asarray(cfg.bf, f32),
        )

    @property
    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack([
            jnp.stack([self.fx, z, self.cx]),
            jnp.stack([z, self.fy, self.cy]),
            jnp.stack([z, z, o]),
        ])


def project(cam: CameraParams, pc: jnp.ndarray, eps: float = 1e-6):
    """Camera-frame points [..., 3] → pixels [..., 2] and validity mask.

    Points at or behind the camera plane are masked invalid (the reference
    checks z>0 at each call site, e.g. MapPoint::isInVision, MapPoint.cc:141-171).
    """
    z = pc[..., 2]
    valid = z > eps
    zs = jnp.where(valid, z, 1.0)
    u = cam.fx * pc[..., 0] / zs + cam.cx
    v = cam.fy * pc[..., 1] / zs + cam.cy
    return jnp.stack([u, v], axis=-1), valid


def project_stereo(cam: CameraParams, pc: jnp.ndarray, eps: float = 1e-6):
    """Like project, additionally returns the right-image u coordinate
    ``uR = u - bf/z`` (reference Frame::project2UV + rightU convention,
    Frame.cc:125-159)."""
    uv, valid = project(cam, pc, eps)
    zs = jnp.where(valid, pc[..., 2], 1.0)
    ur = uv[..., 0] - cam.bf / zs
    return uv, ur, valid


def unproject(cam: CameraParams, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels [..., 2] + depth [...] → camera-frame points [..., 3]
    (reference VirtualFrame::unProject, Frame.cc:262-275)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def _distort_normalized(cam: CameraParams, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply the 5-param radial-tangential model to normalized coords."""
    k1, k2, p1, p2, k3 = (cam.dist[i] for i in range(5))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: CameraParams, uv: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Undistort pixel keypoints [..., 2] → ideal pixel coords.

    Fixed-point iteration (the same scheme cv::undistortPoints uses
    internally), fixed ``iters`` so it jits to a static unrolled loop.
    Replaces Camera::undistortPoints (reference Camera.cc:31-43).
    """
    x0 = (uv[..., 0] - cam.cx) / cam.fx
    y0 = (uv[..., 1] - cam.cy) / cam.fy
    xy0 = jnp.stack([x0, y0], axis=-1)
    xy = xy0
    for _ in range(iters):
        d = _distort_normalized(cam, xy) - xy
        xy = xy0 - d
    u = xy[..., 0] * cam.fx + cam.cx
    v = xy[..., 1] * cam.fy + cam.cy
    return jnp.stack([u, v], axis=-1)


def distort_points(cam: CameraParams, uv: jnp.ndarray) -> jnp.ndarray:
    """Forward distortion of ideal pixel coords (testing / synthetic data)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    xy = _distort_normalized(cam, jnp.stack([x, y], axis=-1))
    return jnp.stack([xy[..., 0] * cam.fx + cam.cx, xy[..., 1] * cam.fy + cam.cy], axis=-1)
