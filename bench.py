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
    jax.block_until_ready(tcws)
    log("compiled + first run done")

    t0 = time.perf_counter()
    tcws, n_ins = run_sequence(stack_l, stack_r, state0, velocity0)
    jax.block_until_ready(tcws)
    dt = time.perf_counter() - t0

    fps = N_FRAMES / dt
    n_ins = np.asarray(n_ins)
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
                    "device": str(jax.devices()[0]),
                    "n_frames": N_FRAMES,
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
