"""Device-mesh utilities (SURVEY §5.8)."""

import pytest

pytestmark = pytest.mark.smoke  # fast subset: `pytest -m smoke` < 60 s

from orb_slam2_ros2_tpu.parallel.mesh import (  # noqa: E402
    ba_mesh,
    init_distributed,
    pad_points_for_mesh,
)


def test_init_distributed_noop_without_config(monkeypatch):
    """Single-host runs must not touch jax.distributed (no env, no args)."""
    for var in ("SLAM_COORDINATOR", "SLAM_NUM_PROCESSES", "SLAM_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert init_distributed() == 0


def test_ba_mesh_shapes():
    assert ba_mesh(1) is None  # single chip: no mesh, no collective cost
    m = ba_mesh(8)
    assert m is not None and m.shape["ba"] == 8
    assert pad_points_for_mesh(1000, 8) == 1000
    assert pad_points_for_mesh(1001, 8) == 1008
