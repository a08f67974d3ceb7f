"""Protobuf map interop with the reference (component #21).

The reference persists its map as an ``orbslam2.MapData`` protobuf
(reference: src/Map.cc:200-319, proto/Keyframe.proto:43-69,
proto/MapPoint.proto:15-32) and relinks pointers after load
(``processConnection``, Map.cc:322-381).  Here loading fills the fixed-
capacity SoA ``MapState`` directly and the "relink" is an array rebuild:
keyframe/map-point ids are remapped to dense slots, the reverse observation
index is reconstructed from the per-feature map-point table, the covisibility
matrix from the stored edges, and the spanning tree from children lists.

Enables the reference's "localization-only reuse of a prebuilt map" config
(OnlyTracking + Map.LoadMap, config/kitti_config_00.yaml:44-49) against maps
built by EITHER system.  Note descriptor-level caveat: maps built by the
reference use its BRIEF template + ORBvoc words; ours re-derives BoW rows
from loaded descriptors with our vocabulary, so place recognition works, but
descriptor matching across systems inherits the documented template
difference (ops/brief.py).
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from ..config import SLAMConfig
from ..mapstate.map_state import MapState, empty_map


def _desc_to_u32(data: bytes) -> np.ndarray:
    buf = np.frombuffer(data, np.uint8)
    if buf.size < 32:
        buf = np.pad(buf, (0, 32 - buf.size))
    return buf[:32].view(np.uint32)


def state_to_msg(state: MapState, cfg: SLAMConfig, vocab=None):
    """Build the reference's MapData message from a MapState (Map.cc:200-249).

    Shared by the protobuf writer and the txt-stream writer (txt_map.py): the
    message carries exactly the fields both reference formats persist."""
    from ..proto import MapData

    kf_valid = np.asarray(state.kf_valid)
    mp_valid = np.asarray(state.mp_valid)
    kf_ids = np.nonzero(kf_valid)[0]
    mp_ids = np.nonzero(mp_valid)[0]

    kf_uv = np.asarray(state.kf_uv)
    kf_oct = np.asarray(state.kf_octave)
    kf_ang = np.asarray(state.kf_angle)
    kf_ru = np.asarray(state.kf_right_u)
    kf_depth = np.asarray(state.kf_depth)
    kf_desc = np.asarray(state.kf_desc)
    kf_fv = np.asarray(state.kf_feat_valid)
    kf_mp = np.asarray(state.kf_mp_idx)
    kf_Tcw = np.asarray(state.kf_Tcw)
    covis = np.asarray(state.covis)
    parent = np.asarray(state.kf_parent)
    loops = np.asarray(state.loop_edges)

    words_per_kf = {}
    if vocab is not None:
        from ..bow.vocabulary import transform

        for k in kf_ids:
            w = np.asarray(transform(vocab, state.kf_desc[int(k)], state.kf_feat_valid[int(k)]))
            words_per_kf[int(k)] = w

    msg = MapData()
    msg.keyframes.next_id = int(np.asarray(state.next_kf))
    sf = cfg.orb.scale_factor
    msg.keyframes.scale_factors.extend([sf**i for i in range(cfg.orb.n_levels)])

    children: dict = {}
    for k in kf_ids:
        p = int(parent[k])
        if p >= 0:
            children.setdefault(p, []).append(int(k))

    for k in kf_ids:
        k = int(k)
        kf = msg.keyframes.keyframes.add()
        kf.id = k
        kf.min_u, kf.min_v = 0.0, 0.0
        kf.max_u, kf.max_v = float(cfg.camera.width), float(cfg.camera.height)
        sel = np.nonzero(kf_fv[k])[0]
        for j in sel:
            kp = kf.keypoints.add()
            kp.x, kp.y = float(kf_uv[k, j, 0]), float(kf_uv[k, j, 1])
            kp.octave, kp.angle = int(kf_oct[k, j]), float(kf_ang[k, j])
            kf.right_u.append(float(kf_ru[k, j]))
            kf.depths.append(float(kf_depth[k, j]))
            kf.descriptors.add().data = kf_desc[k, j].tobytes()
            kf.map_points.append(int(kf_mp[k, j]))
        R = kf_Tcw[k, :3, :3].reshape(-1)
        t = kf_Tcw[k, :3, 3]
        kf.pose.rotation.extend([float(x) for x in R])
        kf.pose.translation.extend([float(x) for x in t])
        nz = np.nonzero(covis[k] > 0)[0]
        for nb in nz:
            e = kf.connected_kfs.add()
            e.id, e.weight = int(nb), int(covis[k, nb])
        kf.children_ids.extend(children.get(k, []))
        for a, b in loops:
            if a == k and b >= 0:
                kf.loop_edges.append(int(b))
            elif b == k and a >= 0:
                kf.loop_edges.append(int(a))
        if k in words_per_kf:
            w = words_per_kf[k]
            uniq, counts = np.unique(w[w >= 0], return_counts=True)
            idf = np.asarray(vocab.idf)
            vals = counts * idf[uniq]
            norm = max(float(np.linalg.norm(vals)), 1e-9)
            for u, v in zip(uniq, vals):
                kf.bow_vector.words[int(u)] = float(v / norm)
            # DBoW3 feature-vector: group this keyframe's saved features by
            # vocabulary word (leaf node ids), so the reference's
            # searchByBow/relocalization over an exported map finds feature
            # groups (KeyFrame.cc:483-496 readers).  Interop caveat: node ids
            # are only meaningful when both sides load the SAME vocabulary;
            # leaf-level grouping is stricter than ORBvoc's levelsUp=4 nodes.
            fv_groups: dict = {}
            for local_j, j in enumerate(sel):
                wid = int(w[j])
                if wid >= 0:
                    fv_groups.setdefault(wid, []).append(local_j)
            for wid in sorted(fv_groups):
                node = kf.feature_vector.nodes.add()
                node.node_id = wid
                node.feature_ids.extend(fv_groups[wid])

    mp_pos = np.asarray(state.mp_pos)
    mp_norm = np.asarray(state.mp_normal)
    mp_desc = np.asarray(state.mp_desc)
    mp_mind = np.asarray(state.mp_min_dist)
    mp_maxd = np.asarray(state.mp_max_dist)
    mp_ref = np.asarray(state.mp_ref_kf)
    mp_vis = np.asarray(state.mp_visible)
    mp_fnd = np.asarray(state.mp_found)
    obs_kf = np.asarray(state.mp_obs_kf)
    obs_feat = np.asarray(state.mp_obs_feat)

    for m in mp_ids:
        m = int(m)
        mp = msg.mappoints.mappoints.add()
        mp.id = m
        mp.max_distance = float(mp_maxd[m])
        mp.min_distance = float(mp_mind[m])
        ref = int(mp_ref[m])
        mp.ref_kf_id = max(ref, 0)
        # reference feature id within the ref KF (first matching obs entry)
        feat = 0
        for o in range(obs_kf.shape[1]):
            if obs_kf[m, o] == ref:
                feat = int(obs_feat[m, o])
                break
        mp.ref_feat_id = feat
        mp.matches_in_track = int(mp_fnd[m])
        mp.inliers_in_track = int(mp_vis[m])
        mp.position.x, mp.position.y, mp.position.z = (
            float(mp_pos[m, 0]), float(mp_pos[m, 1]), float(mp_pos[m, 2]))
        mp.view_direction.x, mp.view_direction.y, mp.view_direction.z = (
            float(mp_norm[m, 0]), float(mp_norm[m, 1]), float(mp_norm[m, 2]))
        mp.desc.data = mp_desc[m].tobytes()

    return msg


def save_proto_map(path: str, state: MapState, cfg: SLAMConfig, vocab=None) -> None:
    """Serialize a MapState as the reference's MapData (Map.cc:200-249)."""
    with open(path, "wb") as f:
        f.write(state_to_msg(state, cfg, vocab).SerializeToString())


def msg_to_state(msg, cfg: SLAMConfig) -> MapState:
    """Assemble a MapState from a MapData message (Map.cc:252-319 + the
    processConnection relink at :322-381, as array rebuilds).  Shared by the
    protobuf and txt-stream loaders."""
    state = empty_map(cfg)
    K, N = cfg.map.max_keyframes, cfg.orb.max_keypoints
    M, O = cfg.map.max_mappoints, cfg.map.max_obs_per_mp

    kfs = list(msg.keyframes.keyframes)
    mps = list(msg.mappoints.mappoints)
    if len(kfs) > K or len(mps) > M:
        raise ValueError(
            f"map exceeds configured capacity: {len(kfs)} KFs (cap {K}), "
            f"{len(mps)} MPs (cap {M})"
        )
    kfs.sort(key=lambda k: k.id)
    mps.sort(key=lambda m: m.id)
    kf_slot = {k.id: i for i, k in enumerate(kfs)}
    mp_slot = {m.id: i for i, m in enumerate(mps)}

    kf_Tcw = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    kf_uv = np.zeros((K, N, 2), np.float32)
    kf_ru = np.full((K, N), -1.0, np.float32)
    kf_depth = np.full((K, N), -1.0, np.float32)
    kf_oct = np.zeros((K, N), np.int32)
    kf_ang = np.zeros((K, N), np.float32)
    kf_desc = np.zeros((K, N, 8), np.uint32)
    kf_fv = np.zeros((K, N), bool)
    kf_mp = np.full((K, N), -1, np.int32)
    kf_valid = np.zeros((K,), bool)
    kf_frame_id = np.full((K,), -1, np.int32)
    covis = np.zeros((K, K), np.int32)
    parent = np.full((K,), -1, np.int32)
    loop_edges: list = []

    for i, kf in enumerate(kfs):
        kf_valid[i] = True
        kf_frame_id[i] = i
        n = min(len(kf.keypoints), N)
        for j in range(n):
            kp = kf.keypoints[j]
            kf_uv[i, j] = (kp.x, kp.y)
            kf_oct[i, j] = kp.octave
            kf_ang[i, j] = kp.angle
            kf_fv[i, j] = True
        kf_ru[i, : len(kf.right_u[:N])] = list(kf.right_u[:N])
        kf_depth[i, : len(kf.depths[:N])] = list(kf.depths[:N])
        for j, d in enumerate(kf.descriptors[:N]):
            kf_desc[i, j] = _desc_to_u32(d.data)
        for j, m_id in enumerate(kf.map_points[:N]):
            if m_id >= 0 and m_id in mp_slot:
                kf_mp[i, j] = mp_slot[m_id]
        if len(kf.pose.rotation) == 9 and len(kf.pose.translation) == 3:
            kf_Tcw[i, :3, :3] = np.array(kf.pose.rotation, np.float32).reshape(3, 3)
            kf_Tcw[i, :3, 3] = np.array(kf.pose.translation, np.float32)
        for e in kf.connected_kfs:
            if e.id in kf_slot:
                covis[i, kf_slot[e.id]] = e.weight
        for c in kf.children_ids:
            if c in kf_slot:
                parent[kf_slot[c]] = i
        for le in kf.loop_edges:
            if le in kf_slot:
                a, b = i, kf_slot[le]
                if a < b and (a, b) not in loop_edges:
                    loop_edges.append((a, b))

    covis = np.maximum(covis, covis.T)  # symmetric by construction upstream

    mp_pos = np.zeros((M, 3), np.float32)
    mp_norm = np.zeros((M, 3), np.float32)
    mp_desc = np.zeros((M, 8), np.uint32)
    mp_mind = np.zeros((M,), np.float32)
    mp_maxd = np.full((M,), 1e9, np.float32)
    mp_valid = np.zeros((M,), bool)
    mp_ref = np.full((M,), -1, np.int32)
    mp_vis = np.ones((M,), np.int32)
    mp_fnd = np.ones((M,), np.int32)

    for i, mp in enumerate(mps):
        mp_valid[i] = True
        mp_pos[i] = (mp.position.x, mp.position.y, mp.position.z)
        mp_norm[i] = (mp.view_direction.x, mp.view_direction.y, mp.view_direction.z)
        mp_desc[i] = _desc_to_u32(mp.desc.data)
        mp_mind[i], mp_maxd[i] = mp.min_distance, mp.max_distance
        mp_ref[i] = kf_slot.get(mp.ref_kf_id, -1)
        mp_fnd[i] = mp.matches_in_track
        mp_vis[i] = max(mp.inliers_in_track, 1)

    # rebuild the bounded reverse observation index from the feature tables
    # (the relink pass, Map.cc:322-381)
    mp_obs_kf = np.full((M, O), -1, np.int32)
    mp_obs_feat = np.full((M, O), -1, np.int32)
    mp_n_obs = np.zeros((M,), np.int32)
    mp_first = np.full((M,), -1, np.int32)
    ks, js = np.nonzero(kf_mp >= 0)
    for k, j in zip(ks, js):
        m = kf_mp[k, j]
        if mp_first[m] < 0:
            mp_first[m] = k
        o = mp_n_obs[m]
        if o < O:
            mp_obs_kf[m, o] = k
            mp_obs_feat[m, o] = j
            mp_n_obs[m] = o + 1

    return state._replace(
        kf_Tcw=jnp.asarray(kf_Tcw), kf_valid=jnp.asarray(kf_valid),
        kf_frame_id=jnp.asarray(kf_frame_id),
        kf_uv=jnp.asarray(kf_uv), kf_right_u=jnp.asarray(kf_ru),
        kf_depth=jnp.asarray(kf_depth), kf_octave=jnp.asarray(kf_oct),
        kf_angle=jnp.asarray(kf_ang), kf_desc=jnp.asarray(kf_desc),
        kf_feat_valid=jnp.asarray(kf_fv), kf_mp_idx=jnp.asarray(kf_mp),
        mp_pos=jnp.asarray(mp_pos), mp_normal=jnp.asarray(mp_norm),
        mp_desc=jnp.asarray(mp_desc), mp_min_dist=jnp.asarray(mp_mind),
        mp_max_dist=jnp.asarray(mp_maxd), mp_valid=jnp.asarray(mp_valid),
        mp_ref_kf=jnp.asarray(mp_ref), mp_n_obs=jnp.asarray(mp_n_obs),
        mp_visible=jnp.asarray(mp_vis), mp_found=jnp.asarray(mp_fnd),
        mp_first_kf=jnp.asarray(mp_first),
        mp_obs_kf=jnp.asarray(mp_obs_kf), mp_obs_feat=jnp.asarray(mp_obs_feat),
        covis=jnp.asarray(covis), kf_parent=jnp.asarray(parent),
        loop_edges=jnp.asarray(
            np.array(loop_edges + [(-1, -1)] * (64 - len(loop_edges)), np.int32)[:64]
        ),
        next_kf=jnp.asarray(len(kfs), jnp.int32),
        next_mp=jnp.asarray(len(mps), jnp.int32),
    )


def load_proto_map(path: str, cfg: SLAMConfig) -> MapState:
    """Parse a reference MapData file into a MapState."""
    from ..proto import MapData

    msg = MapData()
    with open(path, "rb") as f:
        msg.ParseFromString(f.read())
    return msg_to_state(msg, cfg)
