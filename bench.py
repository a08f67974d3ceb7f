#!/usr/bin/env python
"""Benchmark: stereo tracking throughput on real TPU hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Workload: KITTI-sized (1241×376) synthetic stereo sequence, full per-frame
pipeline — dual ORB extraction (pyramid, FAST, oriented BRIEF), stereo SAD
depth, motion-model matching, pose-only LM — with the WHOLE frame loop as one
``lax.scan`` on device, so the measurement is pure per-frame compute with no
host/tunnel round-trips inside the loop.

Baseline: the reference publishes no absolute fps (BASELINE.md).  ORB-SLAM2
class stereo trackers at 2000 features run ≈30 fps on desktop CPU and the
reference self-reports +20% overhead vs original ORB-SLAM2
(/root/reference/README.md:20) → baseline 25 fps.  The driver target is ≥3×.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_ros2_tpu.config import SLAMConfig
from orb_slam2_ros2_tpu.features.extractor import make_stereo_frontend
from orb_slam2_ros2_tpu.geometry.camera import CameraParams
from orb_slam2_ros2_tpu.io.synthetic import SyntheticStereoDataset
from orb_slam2_ros2_tpu.pipeline.tracking import (
    TrackedFrame,
    make_fused_odometry_step,
    unproject_frame,
)

BASELINE_FPS = 25.0
N_FRAMES = 40
T0 = time.time()


def log(msg):
    print(f"[bench {time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _bench_local_ba(cam) -> float:
    """Time one local-BA window solve (16 free cams, 32 fixed, 8192 points —
    the production window size) on a synthetic problem."""
    from orb_slam2_ros2_tpu.geometry import se3
    from orb_slam2_ros2_tpu.geometry.camera import project
    from orb_slam2_ros2_tpu.solvers.schur_ba import BAProblem, solve_ba

    r = np.random.default_rng(0)
    C, N, P = 48, 2048, 8192
    pts = np.stack([r.uniform(-20, 20, P), r.uniform(-5, 5, P), r.uniform(5, 60, P)], 1).astype(np.float32)
    Tcw = np.stack([
        np.asarray(se3.exp(jnp.asarray([0.5 * i, 0, 0.1 * i, 0, 0.005 * i, 0], jnp.float32)))
        for i in range(C)
    ])
    pt_slot = r.integers(0, P, (C, N)).astype(np.int32)
    pw = pts[pt_slot]
    pc = np.einsum("cij,cnj->cni", Tcw[:, :3, :3], pw) + Tcw[:, :3, None, 3].transpose(0, 2, 1)
    uv, _ = project(CameraParams.from_config(SLAMConfig().camera), jnp.asarray(pc))
    uv = np.asarray(uv)
    valid = (pc[..., 2] > 1) & (uv[..., 0] > 0) & (uv[..., 0] < 1241) & (uv[..., 1] > 0) & (uv[..., 1] < 376)
    cam_free = np.ones(C, bool)
    cam_free[16:] = False  # 16 free + 32 fixed anchors
    cam_free[0] = False
    prob = BAProblem(
        cam_Tcw=jnp.asarray(Tcw), cam_free=jnp.asarray(cam_free),
        pt_pos=jnp.asarray(pts + r.normal(0, 0.05, pts.shape).astype(np.float32)),
        pt_valid=jnp.ones(P, bool),
        pt_slot=jnp.asarray(np.where(valid, pt_slot, -1)),
        uv=jnp.asarray(uv.astype(np.float32)),
        right_u=jnp.full((C, N), -1.0, jnp.float32),
        inv_sigma2=jnp.ones((C, N), jnp.float32),
        edge_valid=jnp.asarray(valid),
    )
    fn = jax.jit(lambda p: solve_ba(CameraParams.from_config(SLAMConfig().camera), p, phase_iters=(3, 5))[0])
    np.asarray(fn(prob))  # compile
    t = time.perf_counter()
    np.asarray(fn(prob))
    return round((time.perf_counter() - t) * 1000.0, 2)


def main():
    cfg = SLAMConfig()
    cam = CameraParams.from_config(cfg.camera)
    ds = SyntheticStereoDataset(cfg.camera, n_frames=N_FRAMES + 2, speed=0.8)

    frames_l, frames_r = [], []
    for i in range(N_FRAMES + 1):
        imgL, imgR, _ = ds.frame(i)
        frames_l.append(imgL)
        frames_r.append(imgR)
    stack_l = jnp.stack(frames_l[1:])  # [T, H, W]
    stack_r = jnp.stack(frames_r[1:])
    jax.block_until_ready(stack_l)
    log("rendered")

    frontend = jax.jit(make_stereo_frontend(cfg))
    sf0 = frontend(frames_l[0], frames_r[0], cam)
    Tcw0 = jnp.eye(4, dtype=jnp.float32)
    pw, has = jax.jit(unproject_frame)(cam, sf0, Tcw0)
    state0 = TrackedFrame(frame=sf0, Tcw=Tcw0, pw=pw, has_pw=has)
    velocity0 = jnp.eye(4, dtype=jnp.float32)
    log("bootstrap done")

    step = make_fused_odometry_step(cfg)
    # unwrap: we re-jit the scan as a whole
    step_fn = step.__wrapped__ if hasattr(step, "__wrapped__") else step

    @jax.jit
    def run_sequence(stack_l, stack_r, state, velocity):
        def body(carry, imgs):
            state, velocity = carry
            il, ir = imgs
            state, velocity, Tcw, n_m, n_in = step_fn(cam, il, ir, state, velocity)
            return (state, velocity), (Tcw, n_in)

        (state, velocity), (tcws, n_ins) = jax.lax.scan(body, (state, velocity), (stack_l, stack_r))
        return tcws, n_ins

    tcws, n_ins = run_sequence(stack_l, stack_r, state0, velocity0)
    np.asarray(tcws)  # device→host fetch = true synchronization on all backends
    log("compiled + first run done")

    t0 = time.perf_counter()
    tcws, n_ins = run_sequence(stack_l, stack_r, state0, velocity0)
    np.asarray(tcws)
    dt = time.perf_counter() - t0

    fps = N_FRAMES / dt
    n_ins = np.asarray(n_ins)

    # secondary metric: local-BA wall time per keyframe-sized window
    # (driver metric "local-BA ms/keyframe"; reported in the stderr detail)
    ba_ms = _bench_local_ba(cam)
    result = {
        "metric": "kitti_size_stereo_tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }
    print(json.dumps(result))
    print(
        json.dumps(
            {
                "detail": {
                    "ms_per_frame": round(1000.0 * dt / N_FRAMES, 3),
                    "median_inliers": int(np.median(n_ins)),
                    "min_inliers": int(n_ins.min()),
                    "local_ba_ms_per_kf": ba_ms,
                    "device": str(jax.devices()[0]),
                    "n_frames": N_FRAMES,
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
