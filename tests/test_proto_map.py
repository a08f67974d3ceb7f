"""Protobuf map interop round-trip (reference MapData schema,
proto/Keyframe.proto:43-69, Map.cc:200-381)."""

import jax.numpy as jnp
import numpy as np

from orb_slam2_ros2_tpu.config import (
    CameraConfig,
    MapConfig,
    ORBConfig,
    SLAMConfig,
)
from orb_slam2_ros2_tpu.io.proto_map import load_proto_map, save_proto_map
from orb_slam2_ros2_tpu.mapstate.map_state import empty_map



import pytest

pytestmark = pytest.mark.smoke  # fast subset: `pytest -m smoke` < 60 s

def _small_state(cfg, K=3, P=40, seed=0):
    rng = np.random.default_rng(seed)
    st = empty_map(cfg)
    N = cfg.orb.max_keypoints
    O = st.mp_obs_kf.shape[1]

    kf_valid = np.zeros(cfg.map.max_keyframes, bool)
    kf_valid[:K] = True
    Tcw = np.tile(np.eye(4, dtype=np.float32), (cfg.map.max_keyframes, 1, 1))
    for k in range(K):
        Tcw[k, 0, 3] = 0.3 * k
    uv = np.zeros((cfg.map.max_keyframes, N, 2), np.float32)
    uv[:K, :P] = rng.uniform(10, 300, (K, P, 2)).astype(np.float32)
    desc = np.zeros((cfg.map.max_keyframes, N, 8), np.uint32)
    desc[:K, :P] = rng.integers(0, 2**32, (K, P, 8), dtype=np.uint32)
    fv = np.zeros((cfg.map.max_keyframes, N), bool)
    fv[:K, :P] = True
    ru = np.full((cfg.map.max_keyframes, N), -1.0, np.float32)
    ru[:K, :P] = uv[:K, :P, 0] - 8.0
    depth = np.full((cfg.map.max_keyframes, N), -1.0, np.float32)
    depth[:K, :P] = rng.uniform(4, 20, (K, P)).astype(np.float32)
    mp_idx = np.full((cfg.map.max_keyframes, N), -1, np.int32)
    # every KF observes the same P map points at aligned features
    for k in range(K):
        mp_idx[k, :P] = np.arange(P)

    mp_valid = np.zeros(cfg.map.max_mappoints, bool)
    mp_valid[:P] = True
    pos = np.zeros((cfg.map.max_mappoints, 3), np.float32)
    pos[:P] = rng.uniform([-5, -2, 4], [5, 2, 20], (P, 3)).astype(np.float32)
    normal = np.zeros((cfg.map.max_mappoints, 3), np.float32)
    normal[:P, 2] = -1.0
    mdesc = np.zeros((cfg.map.max_mappoints, 8), np.uint32)
    mdesc[:P] = desc[0, :P]
    obs_kf = np.full((cfg.map.max_mappoints, O), -1, np.int32)
    obs_feat = np.full((cfg.map.max_mappoints, O), -1, np.int32)
    for p in range(P):
        for k in range(K):
            obs_kf[p, k] = k
            obs_feat[p, k] = p
    n_obs = np.zeros(cfg.map.max_mappoints, np.int32)
    n_obs[:P] = K
    covis = np.zeros((cfg.map.max_keyframes,) * 2, np.int32)
    covis[:K, :K] = P
    np.fill_diagonal(covis, 0)
    parent = np.full(cfg.map.max_keyframes, -1, np.int32)
    parent[1], parent[2] = 0, 1
    loops = np.full((64, 2), -1, np.int32)
    loops[0] = (0, 2)

    return st._replace(
        kf_Tcw=jnp.asarray(Tcw), kf_valid=jnp.asarray(kf_valid),
        kf_uv=jnp.asarray(uv), kf_desc=jnp.asarray(desc),
        kf_feat_valid=jnp.asarray(fv), kf_right_u=jnp.asarray(ru),
        kf_depth=jnp.asarray(depth), kf_mp_idx=jnp.asarray(mp_idx),
        mp_pos=jnp.asarray(pos), mp_normal=jnp.asarray(normal),
        mp_desc=jnp.asarray(mdesc), mp_valid=jnp.asarray(mp_valid),
        mp_min_dist=jnp.asarray(np.where(mp_valid, 2.0, 0.0).astype(np.float32)),
        mp_max_dist=jnp.asarray(np.where(mp_valid, 40.0, 1e9).astype(np.float32)),
        mp_ref_kf=jnp.asarray(np.where(mp_valid, 0, -1).astype(np.int32)),
        mp_obs_kf=jnp.asarray(obs_kf), mp_obs_feat=jnp.asarray(obs_feat),
        mp_n_obs=jnp.asarray(n_obs), covis=jnp.asarray(covis),
        kf_parent=jnp.asarray(parent), loop_edges=jnp.asarray(loops),
        next_kf=jnp.asarray(K, jnp.int32), next_mp=jnp.asarray(P, jnp.int32),
    )


def test_proto_roundtrip(tmp_path):
    cfg = SLAMConfig(
        camera=CameraConfig(width=320, height=192),
        orb=ORBConfig(max_keypoints=64),
        map=MapConfig(max_keyframes=8, max_mappoints=128, max_obs_per_mp=6),
    )
    st = _small_state(cfg)
    path = str(tmp_path / "map.pb")
    save_proto_map(path, st, cfg)
    st2 = load_proto_map(path, cfg)

    K, P = 3, 40
    np.testing.assert_allclose(
        np.asarray(st2.kf_Tcw[:K]), np.asarray(st.kf_Tcw[:K]), atol=1e-6
    )
    assert np.array_equal(np.asarray(st2.kf_valid), np.asarray(st.kf_valid))
    np.testing.assert_allclose(
        np.asarray(st2.mp_pos[:P]), np.asarray(st.mp_pos[:P]), atol=1e-6
    )
    assert np.array_equal(np.asarray(st2.mp_desc[:P]), np.asarray(st.mp_desc[:P]))
    assert np.array_equal(
        np.asarray(st2.kf_mp_idx[:K, :P]), np.asarray(st.kf_mp_idx[:K, :P])
    )
    assert np.array_equal(np.asarray(st2.covis[:K, :K]), np.asarray(st.covis[:K, :K]))
    assert int(st2.kf_parent[1]) == 0 and int(st2.kf_parent[2]) == 1
    # loop edge survives (either orientation)
    le = {tuple(sorted(e)) for e in np.asarray(st2.loop_edges).tolist() if e[0] >= 0}
    assert (0, 2) in le
    # observation index rebuilt
    assert int(jnp.sum(st2.mp_n_obs)) == K * P


def test_proto_reference_wire_format(tmp_path):
    """The emitted bytes parse as the reference's own schema semantics:
    field numbers carry keypoints/pose/map_points where the reference
    expects them (cross-checked by decoding with raw protobuf)."""
    from orb_slam2_ros2_tpu.proto import MapData

    cfg = SLAMConfig(
        camera=CameraConfig(width=320, height=192),
        orb=ORBConfig(max_keypoints=64),
        map=MapConfig(max_keyframes=8, max_mappoints=128, max_obs_per_mp=6),
    )
    st = _small_state(cfg)
    path = str(tmp_path / "map.pb")
    save_proto_map(path, st, cfg)
    msg = MapData()
    with open(path, "rb") as f:
        msg.ParseFromString(f.read())
    assert len(msg.keyframes.keyframes) == 3
    kf0 = msg.keyframes.keyframes[0]
    assert len(kf0.keypoints) == 40 and len(kf0.map_points) == 40
    assert len(kf0.pose.rotation) == 9 and len(kf0.pose.translation) == 3
    assert len(msg.mappoints.mappoints) == 128 - 88  # 40 valid points
    assert len(msg.keyframes.scale_factors) == cfg.orb.n_levels
