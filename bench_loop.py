#!/usr/bin/env python
"""Post-loop-closure frame-time spike (r2 VERDICT next#3 acceptance).

Drives full SLAM around a closed circle on the live backend, forces a loop
closure, and reports the frame-time distribution AFTER the closure: with the
background (chunked) global BA the max frame time must stay within ~3× the
median — round 2 ran the whole GBA synchronously inside one tracked frame.

Prints one JSON line with the spike statistics.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from orb_slam2_ros2_tpu.config import SLAMConfig
from orb_slam2_ros2_tpu.io.synthetic import SyntheticStereoDataset
from orb_slam2_ros2_tpu.pipeline.system import SLAM

T0 = time.time()


def log(msg):
    print(f"[bench_loop {time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    cfg = SLAMConfig()
    N = 100  # circle period 96: the loop closes near frame ~92
    ds = SyntheticStereoDataset(cfg.camera, n_frames=N, circle=True, box_scale=2.5)
    frames = [ds.frame(i)[:2] for i in range(N)]
    jax.block_until_ready(frames[-1][0])
    log("rendered")

    slam = SLAM(cfg)
    closures = []
    prev_loops = 0
    period = N - 4  # circle_trajectory revisits after N-4 frames
    # TWO laps: the first closure pays the one-off executable-load of the
    # correction/GBA programs over the tunnel (tens of seconds, a process
    # artifact — a local host mmaps the persistent cache); the SECOND
    # closure measures the steady-state spike the design actually has
    for i in range(2 * period):
        j = i if i < N else ((i - 4) % period) + 4
        Tcw, stats = slam.track(*frames[j])
        loops = getattr(slam, "loops_closed", 0)
        if loops > prev_loops:
            closures.append(i)
            prev_loops = loops
    # drain any remaining background-GBA chunks through timed extra frames
    k = 4
    while slam._pending_gba is not None and k < 40:
        slam.track(*frames[k])
        k += 1
    log(f"{slam.n_keyframes} kfs, closures at {closures}, "
        f"{k - 4} extra frames drained the GBA")

    ft = np.asarray(slam.frame_times_ms)
    if not closures:
        print(json.dumps({"metric": "post_loop_frame_spike", "value": None,
                          "detail": "no loop closed"}))
        return
    med = float(np.median(ft[10:]))
    last = closures[-1]
    post = ft[last:]
    first_post = ft[closures[0]:closures[0] + 20]
    out = {
        "metric": "post_loop_frame_spike_ratio",
        "value": round(float(post.max()) / med, 2),
        "unit": "max_after_last_closure / median_frame_time",
        "detail": {
            "median_frame_ms": round(med, 1),
            "max_after_last_closure_ms": round(float(post.max()), 1),
            "p99_after_last_closure_ms": round(float(np.percentile(post, 99)), 1),
            "first_closure_max_ms": round(float(first_post.max()), 1),
            "closures": closures,
            "frames": int(len(ft)),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
