"""Device-mesh utilities for distributed bundle adjustment.

The reference is a single shared-memory process (SURVEY.md §5.8 — "no
distributed backend").  Here multi-chip scaling is one axis: landmark blocks
of the global BA are sharded over a 1-D mesh (solvers.pcg_ba); everything
else (tracking, local mapping) is latency-critical single-chip work.  On a
multi-host pod, initialize with ``jax.distributed.initialize()`` before
calling :func:`ba_mesh` — the mesh then spans all hosts' devices and the
same psum path rides ICI/DCN.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def ba_mesh(n_devices: Optional[int] = None, axis: str = "ba") -> Optional[Mesh]:
    """1-D mesh over the first ``n_devices`` devices; None for a single chip
    (the single-chip path must pay zero collective cost)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    if n <= 1:
        return None
    return Mesh(np.array(devs[:n]), (axis,))


def pad_points_for_mesh(n_points: int, n_devices: int) -> int:
    """Landmark-dimension padding so shards divide evenly."""
    per = -(-n_points // n_devices)
    return per * n_devices
