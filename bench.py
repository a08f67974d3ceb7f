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
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: the tracking program costs minutes to compile
# cold; warm runs (and the driver's capture, which shares this directory)
# skip straight to execution
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
# 80 frames amortize the ~33 ms tunnel dispatch+fetch round-trip to
# <0.5 ms/frame of measurement bias (the scan itself is device-resident)
N_FRAMES = 80
T0 = time.time()


def log(msg):
    print(f"[bench {time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _wait_for_backend(max_wait_s: float = 1800.0) -> bool:
    """The tunnelled TPU backend occasionally drops for minutes-to-hours; a
    capture that lands inside an outage must wait for it, not hang or record
    garbage.  Probe in a SUBPROCESS (an in-process ``jax.devices()`` on a dead
    tunnel can block indefinitely) and return once it answers."""
    import subprocess

    max_wait_s = float(os.environ.get("BENCH_MAX_WAIT_S", max_wait_s))
    t_start = time.time()
    while True:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=90,
            )
            if r.returncode == 0:
                return True
            reason = f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            reason = "probe timeout"
        if time.time() - t_start > max_wait_s:
            log(f"backend still unavailable after {max_wait_s:.0f}s — proceeding anyway")
            return False
        log(f"backend probe failed ({reason}); waiting for the tunnel to return…")
        time.sleep(60)


def _bench_local_ba(cam) -> float:
    """Time one local-BA window solve (16 free cams + 32 fixed, 8192 points,
    O=24 observation fan-out — the production window in the production
    per-point layout) on a synthetic problem."""
    from orb_slam2_ros2_tpu.geometry import se3
    from orb_slam2_ros2_tpu.geometry.camera import project
    from orb_slam2_ros2_tpu.solvers.pcg_ba import PointBAProblem
    from orb_slam2_ros2_tpu.solvers.schur_ba import solve_ba_points

    r = np.random.default_rng(0)
    C, P, O = 48, 8192, 24
    pts = np.stack([r.uniform(-20, 20, P), r.uniform(-5, 5, P), r.uniform(5, 60, P)], 1).astype(np.float32)
    Tcw = np.stack([
        np.asarray(se3.exp(jnp.asarray([0.5 * i, 0, 0.1 * i, 0, 0.005 * i, 0], jnp.float32)))
        for i in range(C)
    ])
    obs_cam = r.integers(0, C, (P, O)).astype(np.int32)
    pc = np.einsum("poij,pj->poi", Tcw[obs_cam][..., :3, :3], pts) + Tcw[obs_cam][..., :3, 3]
    uv, _ = project(CameraParams.from_config(SLAMConfig().camera), jnp.asarray(pc))
    uv = np.asarray(uv)
    valid = (pc[..., 2] > 1) & (uv[..., 0] > 0) & (uv[..., 0] < 1241) & (uv[..., 1] > 0) & (uv[..., 1] < 376)
    cam_free = np.ones(C, bool)
    cam_free[16:] = False  # 16 free + 32 fixed anchors
    cam_free[0] = False
    prob = PointBAProblem(
        cam_Tcw=jnp.asarray(Tcw), cam_free=jnp.asarray(cam_free),
        pt_pos=jnp.asarray(pts + r.normal(0, 0.05, pts.shape).astype(np.float32)),
        pt_valid=jnp.ones(P, bool),
        obs_cam=jnp.asarray(np.where(valid, obs_cam, -1)),
        obs_uv=jnp.asarray(uv.astype(np.float32)),
        obs_right_u=jnp.full((P, O), -1.0, jnp.float32),
        obs_inv_sigma2=jnp.ones((P, O), jnp.float32),
        obs_valid=jnp.asarray(valid),
    )
    fn = jax.jit(lambda p: solve_ba_points(
        CameraParams.from_config(SLAMConfig().camera), p, phase_iters=(3, 5))[0])
    np.asarray(fn(prob))  # compile
    best = 1e9
    for _ in range(3):
        t = time.perf_counter()
        np.asarray(fn(prob))
        best = min(best, time.perf_counter() - t)
    return round(best * 1000.0, 2)


def main():
    _wait_for_backend()
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
    try:
        sf0 = frontend(frames_l[0], frames_r[0], cam)
    except Exception as e:  # noqa: BLE001 — a Pallas/Mosaic compile regression
        # must degrade to the XLA formulation, not void the capture
        log(f"frontend compile failed ({type(e).__name__}); retrying with Pallas kernels disabled")
        os.environ["SLAM_DISABLE_PALLAS_FAST"] = "1"
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

    # best-of-K timed repetitions: the TPU behind the tunnel is occasionally
    # time-shared; a transiently-contended repetition must not become the
    # recorded number (round-1 driver capture read 19× slow this way)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        tcws, n_ins = run_sequence(stack_l, stack_r, state0, velocity0)
        np.asarray(tcws)
        reps.append(time.perf_counter() - t0)
    dt = min(reps)

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
    print(json.dumps(result), flush=True)  # flush: the secondary bench below
    # may be killed by an outer timeout — the headline must already be out
    print(
        json.dumps(
            {
                "detail": {
                    "ms_per_frame": round(1000.0 * dt / N_FRAMES, 3),
                    "rep_ms_per_frame": [round(1000.0 * r / N_FRAMES, 3) for r in reps],
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

    # secondary: full-SLAM steady-state fps (tracking + KF insertion + mapping
    # + deferred BA + loop detection) — run in a SUBPROCESS so any failure or
    # timeout cannot void the headline metric already printed above
    import subprocess

    try:
        log("running full-SLAM secondary bench…")
        r = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.py")],
            capture_output=True, timeout=1800, text=True,
        )
        out_line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        print(json.dumps({"full_slam": json.loads(out_line)}), file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — best-effort secondary metric
        log(f"full-SLAM secondary bench unavailable: {e!r}")


if __name__ == "__main__":
    main()
