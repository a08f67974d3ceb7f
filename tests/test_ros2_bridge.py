"""ROS2 bridge (reference System.cc:132-168 surface): the environment ships
no rclpy, so coverage is the import contract and the pure pairing policy."""

import pytest

from orb_slam2_ros2_tpu.ros2_bridge import _pair_frames, main


def test_pair_frames_approximate_time():
    left = [(0.00, "L0"), (0.10, "L1"), (0.20, "L2"), (0.30, "L3")]
    right = [(0.005, "R0"), (0.11, "R1"), (0.31, "R3")]
    pairs, lrest, rrest = _pair_frames(left, right, max_dt=0.02)
    assert pairs == [("L0", "R0"), ("L1", "R1"), ("L3", "R3")]
    assert lrest == [] and rrest == []


def test_pair_frames_keeps_unmatched_tail():
    left = [(0.0, "L0"), (1.0, "L1")]
    right = [(0.0, "R0")]
    pairs, lrest, rrest = _pair_frames(left, right)
    assert pairs == [("L0", "R0")]
    assert lrest == [(1.0, "L1")] and rrest == []


def test_main_without_rclpy_raises_clear_error():
    with pytest.raises(ImportError, match="rclpy"):
        main(["--left", "x", "--right", "y"])
