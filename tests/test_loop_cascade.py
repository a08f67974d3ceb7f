"""Loop-closing verification cascade: Sim3-guided expansion, group
projection gate, duplicate fusion (reference LoopClosing.cc:300-415,
:432-541, ORBMatcher.cc:370-549)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_ros2_tpu.config import (
    BoWConfig,
    CameraConfig,
    MapConfig,
    ORBConfig,
    SLAMConfig,
)
from orb_slam2_ros2_tpu.geometry import se3, sim3
from orb_slam2_ros2_tpu.geometry.camera import CameraParams
from orb_slam2_ros2_tpu.mapstate.map_state import empty_map
from orb_slam2_ros2_tpu.pipeline.loop_closing import (
    LoopCloser,
    attach_matched_mps,
    loop_group_snapshot,
    search_by_sim3_pair,
    search_loop_group_projection,
)

W, H = 320, 192


@pytest.fixture(scope="module")
def cfg():
    return SLAMConfig(
        camera=CameraConfig(fx=200.0, fy=200.0, cx=160.0, cy=96.0, baseline=0.5,
                            width=W, height=H),
        orb=ORBConfig(n_features=200, max_keypoints=256),
        map=MapConfig(max_keyframes=8, max_mappoints=1024, max_obs_per_mp=8),
        bow=BoWConfig(branching=4, depth=2),
    )


@pytest.fixture(scope="module")
def cam(cfg):
    return CameraParams.from_config(cfg.camera)


def _pose(rz, tx, tz):
    c, s = np.cos(rz), np.sin(rz)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    T[0, 3], T[2, 3] = tx, tz
    return jnp.asarray(T)


def _project(cam, Tcw, pw):
    pc = se3.apply(Tcw, pw)
    u = cam.fx * pc[:, 0] / pc[:, 2] + cam.cx
    v = cam.fy * pc[:, 1] / pc[:, 2] + cam.cy
    return jnp.stack([u, v], -1), pc


def two_kf_state(cfg, cam, P=120, share_mps=True, scramble=False, seed=0):
    """Two keyframes observing ``P`` points with identical descriptors.

    ``share_mps=False`` gives each KF its own duplicate map-point set (the
    loop situation before fusion).  ``scramble=True`` permutes the second
    set's 3D positions — descriptor overlap without consistent geometry.
    """
    rng = np.random.default_rng(seed)
    st = empty_map(cfg)
    N = cfg.orb.max_keypoints

    pw = rng.uniform([-4, -2.5, 6], [4, 2.5, 14], (P, 3)).astype(np.float32)
    desc = rng.integers(0, 2**32, (P, 8), dtype=np.uint32)
    T0 = _pose(0.0, 0.0, 0.0)
    T1 = _pose(0.12, 0.6, -0.4)

    uv0, pc0 = _project(cam, T0, jnp.asarray(pw))
    uv1, pc1 = _project(cam, T1, jnp.asarray(pw))
    ok = np.asarray(
        (uv0[:, 0] > 5) & (uv0[:, 0] < W - 5) & (uv0[:, 1] > 5) & (uv0[:, 1] < H - 5)
        & (uv1[:, 0] > 5) & (uv1[:, 0] < W - 5) & (uv1[:, 1] > 5) & (uv1[:, 1] < H - 5)
    )
    idx = np.nonzero(ok)[0]
    P = len(idx)
    pw, desc = pw[idx], desc[idx]
    uv0, uv1 = np.asarray(uv0)[idx], np.asarray(uv1)[idx]

    feat = np.arange(P, dtype=np.int32)
    pos2 = pw.copy()
    if scramble:
        pos2 = pw[rng.permutation(P)]
    if share_mps:
        mp0 = mp1 = np.arange(P, dtype=np.int32)
        n_mps = P
    else:
        mp0 = np.arange(P, dtype=np.int32)
        mp1 = np.arange(P, 2 * P, dtype=np.int32)
        n_mps = 2 * P

    def fill_kf(st, k, T, uv, mp_ids):
        pad = lambda a, fill: np.concatenate([a, np.full((N - P, *a.shape[1:]), fill, a.dtype)])
        return st._replace(
            kf_Tcw=st.kf_Tcw.at[k].set(T),
            kf_valid=st.kf_valid.at[k].set(True),
            kf_uv=st.kf_uv.at[k].set(jnp.asarray(pad(uv.astype(np.float32), 0.0))),
            kf_octave=st.kf_octave.at[k].set(0),
            kf_desc=st.kf_desc.at[k].set(jnp.asarray(pad(desc, 0))),
            kf_feat_valid=st.kf_feat_valid.at[k].set(
                jnp.asarray(np.arange(N) < P)
            ),
            kf_mp_idx=st.kf_mp_idx.at[k].set(jnp.asarray(pad(mp_ids, -1))),
        )

    st = fill_kf(st, 0, T0, uv0, mp0)
    st = fill_kf(st, 1, T1, uv1, mp1)

    centre0 = np.zeros(3, np.float32)
    all_pos = np.concatenate([pw, pos2])[:n_mps]
    all_desc = np.concatenate([desc, desc])[:n_mps]
    normal = all_pos - centre0
    normal /= np.maximum(np.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)
    dist = np.linalg.norm(all_pos - centre0, axis=-1)
    sl = slice(0, n_mps)
    st = st._replace(
        mp_pos=st.mp_pos.at[sl].set(jnp.asarray(all_pos)),
        mp_desc=st.mp_desc.at[sl].set(jnp.asarray(all_desc)),
        mp_normal=st.mp_normal.at[sl].set(jnp.asarray(normal)),
        # octave-0 observation from KF0: max_dist ≈ dist (predictLevel → 0)
        mp_min_dist=st.mp_min_dist.at[sl].set(jnp.asarray(dist / 3)),
        mp_max_dist=st.mp_max_dist.at[sl].set(jnp.asarray(dist * 1.05)),
        mp_valid=st.mp_valid.at[sl].set(True),
        mp_n_obs=st.mp_n_obs.at[sl].set(1),
        next_kf=jnp.asarray(2, jnp.int32),
        next_mp=jnp.asarray(n_mps, jnp.int32),
    )
    # observation lists: owner KF 0 for the first set, KF 1 for the second
    st = st._replace(
        mp_obs_kf=st.mp_obs_kf.at[:P, 0].set(0).at[P:n_mps, 0].set(1),
        mp_obs_feat=st.mp_obs_feat.at[:P, 0].set(jnp.asarray(feat)).at[P:n_mps, 0].set(
            jnp.asarray(feat[: n_mps - P])
        ),
        covis=st.covis.at[0, 1].set(P if share_mps else 0).at[1, 0].set(
            P if share_mps else 0
        ),
    )
    S12_true = sim3.from_se3(T1 @ jnp.asarray(np.linalg.inv(np.asarray(T0))))
    return st, S12_true, P


def test_search_by_sim3_expands(cfg, cam):
    """With the true Sim3 and no seed matches, the bidirectional projection
    search recovers nearly every correspondence."""
    st, S12, P = two_kf_state(cfg, cam, share_mps=True)
    N = cfg.orb.max_keypoints
    ok0 = jnp.zeros((N,), bool)
    bj0 = jnp.full((N,), -1, jnp.int32)
    ok, bj, n = search_by_sim3_pair(
        st, cam, 1, 0, S12, ok0, bj0,
        width=W, height=H, scale_factor=1.2, n_levels=8,
    )
    assert int(n) >= 0.9 * P
    got = np.asarray(bj[np.asarray(ok)])
    want = np.nonzero(np.asarray(ok))[0]
    assert (got == want).mean() > 0.95  # identity correspondence


def test_group_projection_counts(cfg, cam):
    st, S12, P = two_kf_state(cfg, cam, share_mps=True)
    group = loop_group_snapshot(st, 0, min_covis_weight=1, max_mps=512)
    S_cw = sim3.compose(S12, sim3.from_se3(st.kf_Tcw[0]))
    matched0 = jnp.full((cfg.orb.max_keypoints,), -1, jnp.int32)
    matched, n = search_loop_group_projection(
        st, cam, 1, S_cw, group, matched0,
        width=W, height=H, scale_factor=1.2, n_levels=8,
    )
    assert int(n) >= 0.8 * P


def test_wrong_geometry_candidate_rejected(cfg, cam):
    """A candidate with strong descriptor overlap but scrambled geometry must
    not survive the Sim3 cascade (the gates at LoopClosing.cc:367-369/410-412)."""
    from orb_slam2_ros2_tpu.bow.vocabulary import train_vocabulary

    st, _, P = two_kf_state(cfg, cam, share_mps=False, scramble=True)
    rng = np.random.default_rng(3)
    vocab = train_vocabulary(
        rng.integers(0, 2**32, (256, 8), dtype=np.uint32), branching=4, depth=2
    )
    closer = LoopCloser(cfg, vocab)
    res = closer.compute_sim3(st, cam, 1, 0, jax.random.PRNGKey(0))
    assert res is None


def test_correct_candidate_passes_cascade(cfg, cam):
    from orb_slam2_ros2_tpu.bow.vocabulary import train_vocabulary

    st, S12_true, P = two_kf_state(cfg, cam, share_mps=False, scramble=False)
    rng = np.random.default_rng(3)
    vocab = train_vocabulary(
        rng.integers(0, 2**32, (256, 8), dtype=np.uint32), branching=4, depth=2
    )
    closer = LoopCloser(cfg, vocab)
    res = closer.compute_sim3(st, cam, 1, 0, jax.random.PRNGKey(0))
    assert res is not None
    S12, matched_mp, group = res
    # the estimated Sim3 matches the true relative pose
    np.testing.assert_allclose(np.asarray(S12.R), np.asarray(S12_true.R), atol=1e-2)
    np.testing.assert_allclose(np.asarray(S12.t), np.asarray(S12_true.t), atol=5e-2)
    assert int(jnp.sum((matched_mp >= 0).astype(jnp.int32))) >= 0.8 * P


def test_attach_matched_merges_duplicates(cfg, cam):
    """Fusing the matched loop points into the current KF kills the duplicate
    map points (reference LoopClosing.cc:497-513 → mp count drops)."""
    st, S12, P = two_kf_state(cfg, cam, share_mps=False, scramble=False)
    N = cfg.orb.max_keypoints
    # matched table: current KF feature i ↔ loop point i (the duplicate)
    matched = jnp.where(jnp.arange(N) < P, jnp.arange(N), -1)
    n_before = int(jnp.sum(st.mp_valid.astype(jnp.int32)))
    st2 = attach_matched_mps(st, 1, matched)
    n_after = int(jnp.sum(st2.mp_valid.astype(jnp.int32)))
    assert n_before == 2 * P
    assert n_after == P  # every duplicate merged away
    # the loop points' observation slots now hold the surviving points
    # (KF0's features were repointed to the winners = KF1's own points)
    kf0_mps = np.asarray(st2.kf_mp_idx[0][:P])
    assert (kf0_mps >= P).all()
    # covisibility between the two KFs reflects the merge
    assert int(st2.covis[1, 0]) >= int(0.9 * P)


def test_warmup_compiles_correction_without_mutating_state(cfg, cam):
    """warmup() pre-runs detection, verification AND correction (pose graph +
    global BA) on dummy inputs — the live map must come out untouched (none
    of those programs donate their inputs)."""
    from orb_slam2_ros2_tpu.bow.vocabulary import train_vocabulary

    st, S12_true, P = two_kf_state(cfg, cam, share_mps=False, scramble=False)
    rng = np.random.default_rng(7)
    vocab = train_vocabulary(
        rng.integers(0, 2**32, (256, 8), dtype=np.uint32), branching=4, depth=2
    )
    closer = LoopCloser(cfg, vocab)
    before_T = np.asarray(st.kf_Tcw).copy()
    before_p = np.asarray(st.mp_pos).copy()
    before_loop_kf = closer.last_loop_kf
    closer.warmup(st, cam)
    np.testing.assert_array_equal(np.asarray(st.kf_Tcw), before_T)
    np.testing.assert_array_equal(np.asarray(st.mp_pos), before_p)
    assert closer.last_loop_kf == before_loop_kf


def _redundant_state(cfg, cam, n_kfs=5, P=60, loop_edge=None):
    """n_kfs keyframes all observing the SAME P map points (full fan-out) —
    every non-root KF is redundant by the 90%/3-observer rule."""
    rng = np.random.default_rng(11)
    st = empty_map(cfg)
    N = cfg.orb.max_keypoints
    pw = rng.uniform([-4, -2.5, 6], [4, 2.5, 14], (P, 3)).astype(np.float32)
    feat = np.arange(P, dtype=np.int32)
    pad_i = np.concatenate([feat, np.full(N - P, -1, np.int32)])
    for k in range(n_kfs):
        st = st._replace(
            kf_Tcw=st.kf_Tcw.at[k].set(jnp.eye(4)),
            kf_valid=st.kf_valid.at[k].set(True),
            kf_feat_valid=st.kf_feat_valid.at[k].set(jnp.asarray(np.arange(N) < P)),
            kf_octave=st.kf_octave.at[k].set(0),
            kf_mp_idx=st.kf_mp_idx.at[k].set(jnp.asarray(pad_i)),
        )
    obs_kf = np.full((st.mp_capacity, st.mp_obs_kf.shape[1]), -1, np.int32)
    obs_ft = obs_kf.copy()
    obs_kf[:P, :n_kfs] = np.arange(n_kfs)[None, :]
    obs_ft[:P, :n_kfs] = feat[:, None]
    covis = np.zeros((st.kf_capacity,) * 2, np.int32)
    covis[:n_kfs, :n_kfs] = P
    np.fill_diagonal(covis, 0)
    st = st._replace(
        mp_pos=st.mp_pos.at[:P].set(jnp.asarray(pw)),
        mp_valid=st.mp_valid.at[:P].set(True),
        mp_n_obs=st.mp_n_obs.at[:P].set(n_kfs),
        mp_obs_kf=jnp.asarray(obs_kf), mp_obs_feat=jnp.asarray(obs_ft),
        covis=jnp.asarray(covis),
        next_kf=jnp.asarray(n_kfs, jnp.int32), next_mp=jnp.asarray(P, jnp.int32),
    )
    if loop_edge is not None:
        st = st._replace(loop_edges=st.loop_edges.at[0].set(jnp.asarray(loop_edge)))
    return st


def test_redundant_kfs_culled_but_loop_edges_protected(cfg, cam):
    """cullingKeyFrames: ≥90% of a neighbour's points seen by ≥3 other KFs →
    culled (LocalMapping.cc:421-614); but keyframes holding a loop edge are
    never erased (original ORB-SLAM2's permanent mbNotErase — future
    essential graphs reuse the stored edge)."""
    from orb_slam2_ros2_tpu.mapstate.mapping import cull_keyframes

    # 6 KFs all seeing the same points: culling proceeds in covis order and
    # each erase removes that KF's observations, so 1,2,3 fall and 4 retains
    # only 2 other observers (< min_obs) and survives — like the reference's
    # sequential erase
    st = _redundant_state(cfg, cam, n_kfs=6)
    out = cull_keyframes(st, jnp.asarray(5))
    valid = np.asarray(out.kf_valid)
    assert not valid[1] and not valid[2] and not valid[3], valid[:6]
    assert valid[0] and valid[4] and valid[5], valid[:6]

    st2 = _redundant_state(cfg, cam, n_kfs=6, loop_edge=(1, 3))
    out2 = cull_keyframes(st2, jnp.asarray(5))
    valid2 = np.asarray(out2.kf_valid)
    assert valid2[1] and valid2[3], "loop-edge keyframes must survive culling"
    assert not valid2[2], "non-loop redundant keyframe still culled"


def test_cull_reparents_by_max_covis_weight(cfg, cam):
    """findParent (reference LocalMapping.cc:512-560): children of a culled
    keyframe get the max-covisibility-weight parent from the greedy candidate
    set — NOT blindly the grandparent.  Here child B is strongly covisible
    with its sibling A (w=80) and not at all with the grandparent, so after
    culling, A→grandparent and B→A; the old simplification set B→grandparent."""
    from orb_slam2_ros2_tpu.mapstate.mapping import cull_keyframes

    st = empty_map(cfg)
    N = cfg.orb.max_keypoints
    P = 30
    g, c, A, B, tracker = 1, 2, 3, 4, 5
    feat = np.arange(P, dtype=np.int32)
    pad_i = np.concatenate([feat, np.full(N - P, -1, np.int32)])
    for k in range(6):
        st = st._replace(
            kf_valid=st.kf_valid.at[k].set(True),
            kf_octave=st.kf_octave.at[k].set(0),
        )
    # only the culled KF c carries map points (others fail the n_mp>20 gate)
    st = st._replace(
        kf_feat_valid=st.kf_feat_valid.at[c].set(jnp.asarray(np.arange(N) < P)),
        kf_mp_idx=st.kf_mp_idx.at[c].set(jnp.asarray(pad_i)),
    )
    obs_kf = np.full((st.mp_capacity, st.mp_obs_kf.shape[1]), -1, np.int32)
    obs_ft = obs_kf.copy()
    obs_kf[:P, :4] = np.asarray([c, 0, g, tracker])[None, :]
    obs_ft[:P, :4] = feat[:, None]
    covis = np.zeros((st.kf_capacity,) * 2, np.int32)
    covis[tracker, c] = covis[c, tracker] = 30   # c is a cull candidate of `tracker`
    covis[A, g] = covis[g, A] = 50               # A ↔ grandparent
    covis[A, B] = covis[B, A] = 80               # B ↔ sibling A (the right parent)
    parents = np.full(st.kf_capacity, -1, np.int32)
    parents[c], parents[A], parents[B] = g, c, c
    st = st._replace(
        mp_valid=st.mp_valid.at[:P].set(True),
        mp_n_obs=st.mp_n_obs.at[:P].set(4),
        mp_obs_kf=jnp.asarray(obs_kf), mp_obs_feat=jnp.asarray(obs_ft),
        covis=jnp.asarray(covis), kf_parent=jnp.asarray(parents),
        next_kf=jnp.asarray(6, jnp.int32), next_mp=jnp.asarray(P, jnp.int32),
    )
    out = cull_keyframes(st, jnp.asarray(tracker))
    assert not bool(out.kf_valid[c]), "redundant keyframe must be culled"
    new_parents = np.asarray(out.kf_parent)
    assert new_parents[A] == g, f"A should reparent to grandparent, got {new_parents[A]}"
    assert new_parents[B] == A, f"B should reparent to sibling A, got {new_parents[B]}"
