"""Txt-stream map interop round-trip (reference KeyFrames.txt/MapPoints.txt
format: Map.cc:82-162, KeyFrame.cc:231-535, MapPoint.cc:538-600)."""

import numpy as np
import pytest

import jax.numpy as jnp

from orb_slam2_ros2_tpu.config import (
    CameraConfig,
    MapConfig,
    ORBConfig,
    SLAMConfig,
)
from orb_slam2_ros2_tpu.io.txt_map import load_txt_map, save_txt_map

from test_proto_map import _small_state

pytestmark = pytest.mark.smoke


def _cfg():
    return SLAMConfig(
        camera=CameraConfig(width=320, height=192),
        orb=ORBConfig(max_keypoints=64),
        map=MapConfig(max_keyframes=8, max_mappoints=128, max_obs_per_mp=6),
    )


def test_txt_roundtrip(tmp_path):
    cfg = _cfg()
    st = _small_state(cfg)
    d = str(tmp_path / "txtmap")
    save_txt_map(d, st, cfg)
    st2 = load_txt_map(d, cfg)

    K, P = 3, 40
    np.testing.assert_allclose(
        np.asarray(st2.kf_Tcw[:K]), np.asarray(st.kf_Tcw[:K]), atol=1e-5
    )
    assert np.array_equal(np.asarray(st2.kf_valid), np.asarray(st.kf_valid))
    # %g float text costs ~6 significant digits on positions/uv
    np.testing.assert_allclose(
        np.asarray(st2.mp_pos[:P]), np.asarray(st.mp_pos[:P]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(st2.kf_uv[:K, :P]), np.asarray(st.kf_uv[:K, :P]),
        rtol=1e-4, atol=1e-3,
    )
    # descriptors are bytes — exact
    assert np.array_equal(np.asarray(st2.mp_desc[:P]), np.asarray(st.mp_desc[:P]))
    assert np.array_equal(np.asarray(st2.kf_desc[:K, :P]), np.asarray(st.kf_desc[:K, :P]))
    assert np.array_equal(
        np.asarray(st2.kf_mp_idx[:K, :P]), np.asarray(st.kf_mp_idx[:K, :P])
    )
    assert np.array_equal(np.asarray(st2.covis[:K, :K]), np.asarray(st.covis[:K, :K]))
    assert int(st2.kf_parent[1]) == 0 and int(st2.kf_parent[2]) == 1
    le = {tuple(sorted(e)) for e in np.asarray(st2.loop_edges).tolist() if e[0] >= 0}
    assert (0, 2) in le
    assert int(jnp.sum(st2.mp_n_obs)) == K * P
    assert int(st2.next_kf) == K


def test_txt_reference_line_layout(tmp_path):
    """The emitted text matches the reference reader's line discipline:
    header line (next_id + scale factors), then exactly 10 lines per KF
    (KeyFrame::readFromStream, KeyFrame.cc:231-391) and 3 per map point
    (MapPoint::readFromStream, MapPoint.cc:567-600)."""
    cfg = _cfg()
    st = _small_state(cfg)
    d = tmp_path / "txtmap"
    save_txt_map(str(d), st, cfg)

    kf_lines = (d / "KeyFrames.txt").read_text().splitlines()
    assert len(kf_lines) == 1 + 10 * 3
    header = kf_lines[0].split()
    assert int(header[0]) == 3  # next_id
    assert len(header) == 1 + cfg.orb.n_levels
    np.testing.assert_allclose(
        [float(s) for s in header[1:3]], [1.0, cfg.orb.scale_factor], rtol=1e-5
    )
    # keypoint line: 6 tokens per keypoint; descriptor line: 32 ints per kp
    assert len(kf_lines[2].split()) == 6 * 40
    desc_tok = kf_lines[3].split()
    assert len(desc_tok) == 32 * 40
    assert all(0 <= int(t) <= 255 for t in desc_tok[:64])
    # pose line: 9 rotation + 3 translation floats
    assert len(kf_lines[6].split()) == 12

    mp_lines = (d / "MapPoints.txt").read_text().splitlines()
    assert len(mp_lines) == 3 * 40
    assert len(mp_lines[0].split()) == 7
    assert len(mp_lines[1].split()) == 6
    assert len(mp_lines[2].split()) == 32


def test_slam_save_load_txt(tmp_path):
    """SLAM.save to a directory path writes txt streams; SLAM.load on the
    directory restores the map (localization-only reuse, System.cc:98-110)."""
    from orb_slam2_ros2_tpu.pipeline.system import SLAM

    cfg = _cfg()
    slam = SLAM(cfg)
    slam.map = _small_state(cfg)
    d = str(tmp_path / "mapdir")
    slam.save(d + "/")

    slam2 = SLAM(_cfg())
    slam2.load(d)
    assert int(jnp.sum(slam2.map.kf_valid)) == 3
    assert int(jnp.sum(slam2.map.mp_valid)) == 40
    np.testing.assert_allclose(
        np.asarray(slam2.map.kf_Tcw[2]), np.asarray(slam.map.kf_Tcw[2]), atol=1e-5
    )
