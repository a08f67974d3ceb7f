#!/usr/bin/env python
"""Benchmark: stereo tracking throughput on real TPU hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Workload: KITTI-sized (1241×376) synthetic stereo sequence, full per-frame
pipeline — dual ORB extraction (pyramid, FAST, oriented BRIEF), stereo SAD
depth, motion-model matching, pose-only GN — as one fused jitted step with no
host round-trips in the loop.

Baseline: the reference publishes no absolute fps (BASELINE.md).  ORB-SLAM2
class stereo trackers at 2000 features run ≈30 fps on desktop CPU and the
reference self-reports +20% overhead vs original ORB-SLAM2
(/root/reference/README.md:20) → baseline 25 fps.  The driver target is ≥3×.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from orb_slam2_ros2_tpu.config import SLAMConfig
from orb_slam2_ros2_tpu.geometry.camera import CameraParams
from orb_slam2_ros2_tpu.io.synthetic import SyntheticStereoDataset, render
from orb_slam2_ros2_tpu.pipeline.tracking import (
    TrackedFrame,
    make_fused_odometry_step,
    unproject_frame,
)

BASELINE_FPS = 25.0
N_WARMUP = 3
N_FRAMES = 40


T0 = time.time()


def main():
    import time as _t

    def log(msg):
        print(f"[bench {_t.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)

    cfg = SLAMConfig()
    cam = CameraParams.from_config(cfg.camera)
    ds = SyntheticStereoDataset(cfg.camera, n_frames=N_FRAMES + N_WARMUP + 1, speed=0.8)
    step = make_fused_odometry_step(cfg)

    # Pre-render all frames on device (renderer is jitted; not timed).
    frames = []
    for i in range(N_WARMUP + N_FRAMES + 1):
        imgL, imgR, _ = ds.frame(i)
        frames.append((imgL, imgR))
        if i % 10 == 0:
            jax.block_until_ready(imgL)
            log(f"rendered {i}")
    jax.block_until_ready(frames[-1])
    log("render done")

    # Bootstrap state from frame 0.
    from orb_slam2_ros2_tpu.features.extractor import make_stereo_frontend

    frontend = jax.jit(make_stereo_frontend(cfg))
    sf0 = frontend(frames[0][0], frames[0][1], cam)
    Tcw0 = jnp.eye(4, dtype=jnp.float32)
    pw, has = jax.jit(unproject_frame)(cam, sf0, Tcw0)
    state = TrackedFrame(frame=sf0, Tcw=Tcw0, pw=pw, has_pw=has)
    velocity = jnp.eye(4, dtype=jnp.float32)

    log("frontend/bootstrap done")
    # Warmup (compile) then timed loop.
    for i in range(1, N_WARMUP + 1):
        state, velocity, Tcw, n_m, n_in = step(cam, frames[i][0], frames[i][1], state, velocity)
        jax.block_until_ready(Tcw)
        log(f"warmup {i} done")

    t0 = time.perf_counter()
    for i in range(N_WARMUP + 1, N_WARMUP + 1 + N_FRAMES):
        state, velocity, Tcw, n_m, n_in = step(cam, frames[i][0], frames[i][1], state, velocity)
    jax.block_until_ready(Tcw)
    dt = time.perf_counter() - t0

    fps = N_FRAMES / dt
    # sanity: tracking must actually work, not just run
    n_inliers = int(n_in)
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
                    "ms_per_frame": round(1000.0 * dt / N_FRAMES, 2),
                    "final_inliers": n_inliers,
                    "device": str(jax.devices()[0]),
                    "n_frames": N_FRAMES,
                }
            }
        ),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
