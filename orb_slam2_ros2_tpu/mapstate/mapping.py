"""Local-mapping ops: new-point triangulation, fuse, culling — all batched.

The reference's LocalMapping thread walks candidate keyframe pairs and
features one at a time (reference: src/LocalMapping.cc — createNewMapPoints
:165-339, fuseMapPoints :352-405, cullingMapPoints :674-714).  Here each
operation is one jitted program over padded arrays:

- triangulation candidates = dense hamming match between the new KF's
  unmatched features and each of the top-k covisible KFs' unmatched features,
  epipolar-gated, all pairs at once;
- the parallax-vs-stereo-depth choice, DLT solve, positive-depth /
  reprojection / scale-consistency checks run vectorized over every candidate;
- fuse = batched projection matching of neighbour map points into the new
  keyframe with observation-count-based merge.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..geometry import se3, triangulate as tri
from ..geometry.camera import CameraParams, project
from ..ops.hamming import hamming_matrix
from ..utils import topk_bounded
from .map_state import (
    MapState,
    _append_observations,
    _covis_row_for_kf,
    _distill_descriptors,
    _update_normals_and_depth,
    merge_mappoints,
)


def _fundamental_from_poses(cam: CameraParams, Tcw1: jnp.ndarray, Tcw2: jnp.ndarray) -> jnp.ndarray:
    """F21 such that x2ᵀ F21 x1 = 0 for pixel homogeneous coords."""
    T21 = Tcw2 @ se3.inverse(Tcw1)
    R, t = se3.R_of(T21), se3.t_of(T21)
    E = se3.hat(t) @ R
    K = cam.K
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ E @ Kinv


def triangulate_new_points(
    state: MapState,
    kf_id,
    cam: CameraParams,
    *,
    n_neighbors: int = 10,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    baseline: float,
    max_dist: int = 50,
    ratio: float = 0.6,
    rank_gate: float = 1e-3,
    chi2_mono: float = 5.991,
    chi2_stereo: float = 7.815,
) -> MapState:
    """Create new map points by triangulating the new KF against its top
    covisible neighbours (reference createNewMapPoints, LocalMapping.cc:165-339).

    All ``n_neighbors`` neighbours are processed in ONE batched pass (r3
    perf work — the former per-neighbour unrolled loop serialized ten
    scatter-chains and ten [N,N] hamming launches): baseline gate → dense
    hamming match of *unmatched* features with epipolar gate over the stacked
    candidate tensor → per-feature neighbour selection in covisibility
    order → parallax choice (triangulate vs stereo unproject) → quality
    gates → single allocation pass with direct 2-entry observation writes.
    Per-feature semantics match the loop: each new-KF feature creates at
    most one point, against the first (best-covisibility) neighbour that
    matches it.

    Both sides are COMPACTED to the unmatched features only (≤ N/2 slots,
    r4: the r3 tensor ranged over all N feature slots, 4× the candidate
    volume — LocalMapping.cc:219 walks only `!pKF->getMapPoint(i)` features
    too).  When more than N/2 features are unmatched, the lowest feature
    indices win (pyramid-level-0-first, the densest levels).
    """
    N = state.kf_uv.shape[1]
    Nc = max(N // 2, 1)   # compact row/column budget (unmatched features)
    K = state.kf_capacity
    J = n_neighbors
    BIG = 1 << 20
    w = state.covis[kf_id] * state.kf_valid.astype(jnp.int32)
    # padded slots carry weight 0 → every per-neighbour gate below skips them
    nb_w, nb_ids = topk_bounded(w, J)

    Tcw1 = state.kf_Tcw[kf_id]
    Twc1 = se3.inverse(Tcw1)
    c1 = se3.t_of(Twc1)
    free1_full = state.kf_feat_valid[kf_id] & (state.kf_mp_idx[kf_id] < 0)
    # ---- compact the new-KF side to its unmatched features [Nc] ----------
    arangeN = jnp.arange(N, dtype=jnp.int32)
    sel_v, ids1 = topk_bounded(jnp.where(free1_full, N - arangeN, 0), Nc)
    free1 = sel_v > 0                                          # [Nc]
    uv1 = state.kf_uv[kf_id][ids1]
    oct1 = state.kf_octave[kf_id][ids1]
    desc1 = state.kf_desc[kf_id][ids1]
    depth1 = state.kf_depth[kf_id][ids1]

    # ---- per-neighbour gathers, compacted to unmatched [J, Nc, ...] ------
    Tcw2 = state.kf_Tcw[nb_ids]                               # [J,4,4]
    Twc2 = jax.vmap(se3.inverse)(Tcw2)
    c2 = Twc2[:, :3, 3]
    free2_full = state.kf_feat_valid[nb_ids] & (state.kf_mp_idx[nb_ids] < 0)
    sel2_v, ids2 = jax.vmap(lambda f: topk_bounded(jnp.where(f, N - arangeN, 0), Nc))(free2_full)
    free2 = sel2_v > 0                                        # [J,Nc]
    jrows = jnp.arange(J, dtype=jnp.int32)[:, None]
    uv2 = state.kf_uv[nb_ids][jrows, ids2]                    # [J,Nc,2]
    oct2 = state.kf_octave[nb_ids][jrows, ids2]
    desc2 = state.kf_desc[nb_ids][jrows, ids2]
    depth2 = state.kf_depth[nb_ids][jrows, ids2]
    base_ok = jnp.linalg.norm(c2 - c1[None], axis=1) > baseline  # LocalMapping.cc:190-199
    ok_nb = (nb_w > 0) & (nb_ids != kf_id) & base_ok          # [J]

    # ---- dense epipolar-gated matching, all neighbours at once -----------
    # (replaces BoW-accelerated searchForTriangulation, ORBMatcher.cc:736-778)
    dist = jax.vmap(lambda d2: hamming_matrix(desc1, d2))(desc2)   # [J,Nc,Nc]
    F21 = jax.vmap(lambda T2: _fundamental_from_poses(cam, Tcw1, T2))(Tcw2)
    x1h = jnp.concatenate([uv1, jnp.ones((Nc, 1))], axis=1)        # [Nc,3]
    lines = jnp.einsum("na,jba->jnb", x1h, F21)                    # [J,Nc,3]
    x2h = jnp.concatenate([uv2, jnp.ones((J, Nc, 1))], axis=2)     # [J,Nc,3]
    num = jnp.abs(jnp.einsum("jna,jma->jnm", lines, x2h))          # [J,Nc,Nc]
    den = jnp.sqrt(lines[..., 0] ** 2 + lines[..., 1] ** 2)[..., None]
    d_epi2 = (num / jnp.maximum(den, 1e-9)) ** 2
    sigma2_2 = jnp.power(jnp.float32(scale_factor * scale_factor), oct2.astype(jnp.float32))
    epi_ok = d_epi2 < 3.84 * sigma2_2[:, None, :]

    cand = free1[None, :, None] & free2[:, None, :] & epi_ok & ok_nb[:, None, None]
    masked = jnp.where(cand, dist, BIG)                            # [J,Nc,Nc]
    best = jnp.min(masked, axis=2)                                 # [J,Nc]
    bj = jnp.argmin(masked, axis=2).astype(jnp.int32)              # [J,Nc]
    cols = jax.lax.broadcasted_iota(jnp.int32, masked.shape, 2)
    second = jnp.min(jnp.where(cols == bj[:, :, None], BIG, masked), axis=2)
    m_ok = (best <= max_dist) & (
        best.astype(jnp.float32) < ratio * second.astype(jnp.float32)
    )
    # per-column uniqueness within each neighbour: without it several new-KF
    # features could claim the same neighbour feature, allocating duplicate
    # map points whose neighbour-side slot writes collide (last-write-wins)
    # and leave dangling observation backlinks
    best_i = jnp.argmin(masked, axis=1).astype(jnp.int32)          # [J,Nc]
    col_best = jnp.take_along_axis(best_i, bj, axis=1)             # [J,Nc]
    m_ok = m_ok & (col_best == jnp.arange(Nc, dtype=jnp.int32)[None, :])

    # ---- per-feature neighbour selection (first in covisibility order) ---
    any_ok = jnp.any(m_ok, axis=0)                                 # [Nc]
    jstar = jnp.argmax(m_ok, axis=0)                               # first True
    rows = jnp.arange(Nc, dtype=jnp.int32)
    bj_sel_c = bj[jstar, rows]                                     # [Nc] compact col
    bj_sel = ids2[jstar, bj_sel_c]                                 # [Nc] ORIGINAL col
    kn_sel = nb_ids[jstar]                                         # [Nc]
    Tcw2_sel = Tcw2[jstar]                                         # [Nc,4,4]
    Twc2_sel = Twc2[jstar]
    c2_sel = c2[jstar]
    uv2m = uv2[jstar, bj_sel_c]
    oct2m = oct2[jstar, bj_sel_c]
    depth2m = depth2[jstar, bj_sel_c]
    m_ok1 = any_ok

    # ---- parallax choice & triangulation ---------------------------------
    n1 = jnp.stack([(uv1[:, 0] - cam.cx) / cam.fx, (uv1[:, 1] - cam.cy) / cam.fy], axis=1)
    n2 = jnp.stack([(uv2m[:, 0] - cam.cx) / cam.fx, (uv2m[:, 1] - cam.cy) / cam.fy], axis=1)
    T1b = jnp.broadcast_to(Tcw1, (Nc, 4, 4))
    cos_par = tri.parallax_cos(T1b, n1, Tcw2_sel, n2)
    # stereo-parallax references (LocalMapping.cc:231-259): prefer
    # triangulation when the two-view parallax beats the stereo one
    cos_stereo1 = jnp.where(depth1 > 0, jnp.cos(2.0 * jnp.arctan2(baseline / 2.0, jnp.maximum(depth1, 1e-6))), 2.0)
    cos_stereo2 = jnp.where(depth2m > 0, jnp.cos(2.0 * jnp.arctan2(baseline / 2.0, jnp.maximum(depth2m, 1e-6))), 2.0)
    cos_stereo = jnp.minimum(cos_stereo1, cos_stereo2)
    use_tri = (cos_par < cos_stereo) & (cos_par > 0) & (cos_par < 0.9998)

    pw_tri, tri_ok = tri.triangulate_pairs(cam, T1b, uv1, Tcw2_sel, uv2m, rank_gate)
    # stereo fallback: unproject from whichever KF has depth
    from ..geometry.camera import unproject as cam_unproject

    pw_s1 = se3.apply(Twc1, cam_unproject(cam, uv1, jnp.maximum(depth1, 1e-6)))
    pc2_s = cam_unproject(cam, uv2m, jnp.maximum(depth2m, 1e-6))
    pw_s2 = jnp.einsum("nij,nj->ni", Twc2_sel[:, :3, :3], pc2_s) + Twc2_sel[:, :3, 3]
    use_s1 = (~use_tri) & (cos_stereo1 <= cos_stereo2) & (depth1 > 0)
    use_s2 = (~use_tri) & (~use_s1) & (depth2m > 0)
    pw = jnp.where(use_tri[:, None], pw_tri, jnp.where(use_s1[:, None], pw_s1, pw_s2))
    has_pw = jnp.where(use_tri, tri_ok, use_s1 | use_s2)

    # ---- quality gates (checkMapPoint, MapPoint.cc:384-420) --------------
    pc1 = se3.apply(Tcw1, pw)
    pc2 = jnp.einsum("nij,nj->ni", Tcw2_sel[:, :3, :3], pw) + Tcw2_sel[:, :3, 3]
    z_ok = (pc1[:, 2] > 0) & (pc2[:, 2] > 0)
    uvp1, _ = project(cam, pc1)
    uvp2, _ = project(cam, pc2)
    sigma2_1 = jnp.power(jnp.float32(scale_factor * scale_factor), oct1.astype(jnp.float32))
    e1 = jnp.sum((uvp1 - uv1) ** 2, axis=1) / sigma2_1
    e2 = jnp.sum((uvp2 - uv2m) ** 2, axis=1) / jnp.power(
        jnp.float32(scale_factor * scale_factor), oct2m.astype(jnp.float32)
    )
    reproj_ok = (e1 < chi2_mono) & (e2 < chi2_mono)
    d1 = jnp.linalg.norm(pw - c1, axis=1)
    d2 = jnp.linalg.norm(pw - c2_sel, axis=1)
    ratio_dist = d2 / jnp.maximum(d1, 1e-9)
    ratio_octave = jnp.power(jnp.float32(scale_factor), (oct2m - oct1).astype(jnp.float32))
    ratio_factor = 1.5 * scale_factor
    scale_ok = (ratio_dist < ratio_octave * ratio_factor) & (ratio_dist * ratio_factor > ratio_octave)

    create = m_ok1 & has_pw & z_ok & reproj_ok & scale_ok & (d1 > 1e-6) & (d2 > 1e-6)

    # ---- single allocation pass ------------------------------------------
    st = state
    next_mp0 = state.next_mp
    n_new = jnp.cumsum(create.astype(jnp.int32)) - 1
    new_ids = jnp.where(create, next_mp0 + n_new, -1)
    create = create & (new_ids < st.mp_capacity)
    new_ids = jnp.where(create, new_ids, -1)
    tgt = jnp.where(create, new_ids, st.mp_capacity)
    feat_ids = ids1  # ORIGINAL feature slot of each compact row
    # fresh points carry exactly two observations — (kf_id, feat) and
    # (neighbour, matched feat) — written directly into list slots 0/1
    obs_kf_row = jnp.stack([
        jnp.where(create, kf_id, -1), jnp.where(create, kn_sel, -1)
    ], axis=1)                                                     # [Nc,2]
    obs_feat_row = jnp.stack([
        jnp.where(create, feat_ids, -1), jnp.where(create, bj_sel, -1)
    ], axis=1)
    O = st.mp_obs_kf.shape[1]
    pad = jnp.full((Nc, O - 2), -1, jnp.int32)
    st = st._replace(
        mp_pos=st.mp_pos.at[tgt].set(pw, mode="drop"),
        mp_desc=st.mp_desc.at[tgt].set(desc1, mode="drop"),
        mp_valid=st.mp_valid.at[tgt].set(True, mode="drop"),
        mp_ref_kf=st.mp_ref_kf.at[tgt].set(kf_id, mode="drop"),
        mp_first_kf=st.mp_first_kf.at[tgt].set(kf_id, mode="drop"),
        mp_n_obs=st.mp_n_obs.at[tgt].set(2, mode="drop"),
        mp_visible=st.mp_visible.at[tgt].set(1, mode="drop"),
        mp_found=st.mp_found.at[tgt].set(1, mode="drop"),
        mp_obs_kf=st.mp_obs_kf.at[tgt].set(
            jnp.concatenate([obs_kf_row, pad], axis=1), mode="drop"),
        mp_obs_feat=st.mp_obs_feat.at[tgt].set(
            jnp.concatenate([obs_feat_row, pad], axis=1), mode="drop"),
        next_mp=jnp.minimum(next_mp0 + jnp.sum(create.astype(jnp.int32)), st.mp_capacity),
    )
    st = st._replace(
        kf_mp_idx=st.kf_mp_idx.at[kf_id, jnp.where(create, feat_ids, N)].set(
            jnp.where(create, new_ids, -1), mode="drop")
    )
    # neighbour-side slots: scatter (feature bj_sel of kn_sel) ← new mp
    kn_tgt = jnp.where(create, kn_sel, K)
    st = st._replace(
        kf_mp_idx=st.kf_mp_idx.at[kn_tgt, jnp.clip(bj_sel, 0, N - 1)].set(
            jnp.where(create, new_ids, -1), mode="drop")
    )

    # descriptor distillation + normal/depth update ONCE over every point
    # allocated above (bump allocation → contiguous ids, ≤ Nc in total)
    all_new = next_mp0 + jnp.arange(Nc, dtype=jnp.int32)
    all_new = jnp.where(all_new < st.next_mp, all_new, -1)
    st = _distill_descriptors(st, all_new)
    st = _update_normals_and_depth(st, all_new, scale_factor, n_levels)

    # refresh covisibility of the new KF after creation
    row = _covis_row_for_kf(st, kf_id)
    covis = st.covis.at[kf_id, :].set(row).at[:, kf_id].set(row)
    return st._replace(covis=covis)


def cull_mappoints(
    state: MapState,
    current_kf,
    *,
    cull_score: float = 0.25,
    settle_kfs: int = 3,
    window: int | None = None,
) -> MapState:
    """Remove low-quality map points (reference cullingMapPoints,
    LocalMapping.cc:674-714): found/visible < ``cull_score``, or still <2
    observations 2 keyframes after creation.  Both tests apply only to
    RECENTLY created points (the reference's mlpRecentAddedMapPoints window —
    points settle after ``settle_kfs`` keyframes and are then never ratio-
    culled, so mature landmarks that leave view survive).  Culled slots are
    invalidated and their keyframe feature slots cleared.

    Bump allocation is contiguous, so every cullable (recent) point lives in
    the id suffix ``[next_mp − window, next_mp)`` — the check runs on that
    dynamic slice instead of all M capacity slots (r3 perf: the full-capacity
    scan was the single biggest piece of the keyframe-insertion program)."""
    M = state.mp_capacity
    N = state.kf_mp_idx.shape[1]
    K = state.kf_capacity
    O = state.mp_obs_kf.shape[1]
    # one KF allocates ≤ 2N points (stereo seeds + triangulation); recency
    # spans settle_kfs+1 keyframes → 8N covers it with margin
    W = min(window if window is not None else 8 * N, M)
    start = jnp.clip(state.next_mp - W, 0, M - W)
    ids = start + jnp.arange(W, dtype=jnp.int32)

    found = jax.lax.dynamic_slice(state.mp_found, (start,), (W,))
    visible = jax.lax.dynamic_slice(state.mp_visible, (start,), (W,))
    first_kf = jax.lax.dynamic_slice(state.mp_first_kf, (start,), (W,))
    n_obs = jax.lax.dynamic_slice(state.mp_n_obs, (start,), (W,))
    valid = jax.lax.dynamic_slice(state.mp_valid, (start,), (W,))

    score = found.astype(jnp.float32) / jnp.maximum(visible.astype(jnp.float32), 1.0)
    recent = (first_kf >= 0) & (current_kf <= first_kf + settle_kfs)
    bad_score = score < cull_score
    bad_obs = (current_kf >= first_kf + 2) & (n_obs < 2)
    cull = valid & recent & (bad_score | bad_obs)

    # clear kf_mp_idx entries of culled points via their observation lists
    obs_kf = jax.lax.dynamic_slice(state.mp_obs_kf, (start, 0), (W, O))
    obs_feat = jax.lax.dynamic_slice(state.mp_obs_feat, (start, 0), (W, O))
    okc = cull[:, None] & (obs_kf >= 0)
    flat_kf = jnp.where(okc, obs_kf, K).reshape(-1)
    flat_feat = jnp.clip(obs_feat, 0, N - 1).reshape(-1)
    kf_mp_idx = state.kf_mp_idx.at[flat_kf, flat_feat].set(-1, mode="drop")
    mp_valid = state.mp_valid.at[jnp.where(cull, ids, M)].set(False, mode="drop")
    return state._replace(mp_valid=mp_valid, kf_mp_idx=kf_mp_idx)


def cull_keyframes(
    state: MapState,
    kf_id,
    *,
    n_candidates: int = 10,
    redundancy: float = 0.9,
    min_obs: int = 3,
    n_reparent_iters: int = 6,
) -> MapState:
    """Remove redundant keyframes (reference cullingKeyFrames,
    LocalMapping.cc:421-614): a covisible neighbour of the new KF is culled
    when ≥90% of its map points are observed by ≥3 other keyframes at the
    same or a finer pyramid octave.  Children are reparented with the
    reference's greedy max-weight search (findParent, LocalMapping.cc:
    512-560): candidates start at the culled KF's parent, the best
    (child, candidate) covisibility pair wins each round and the reparented
    child joins the candidate set; leftover children (no candidate
    covisibility, or past the fixed ``n_reparent_iters`` budget) fall back
    to the culled KF's parent — the reference's own no-weight fallback.

    The expensive gather work of the redundancy check (observation fan-out +
    observer octaves) is ONE batched [J,N,O] pass (r4: ten sequential
    per-candidate gather rounds serialized ~9 ms of device time per
    keyframe); the per-candidate application re-masks the precomputed
    observer set by LIVE ``kf_valid``, so same-pass culls stop counting as
    observers exactly as in the sequential reference walk.
    """
    K = state.kf_capacity
    N = state.kf_mp_idx.shape[1]
    M = state.mp_capacity
    w = state.covis[kf_id] * state.kf_valid.astype(jnp.int32)
    wv, cand_ids = topk_bounded(w, n_candidates)

    # ---- batched redundancy check over all candidates [J, N, O] ----------
    mp_b = state.kf_mp_idx[cand_ids]                        # [J, N]
    has_b = (mp_b >= 0) & state.kf_feat_valid[cand_ids]
    mc_b = jnp.clip(mp_b, 0, M - 1)
    my_oct_b = state.kf_octave[cand_ids]                    # [J, N]
    obs_kf_b = state.mp_obs_kf[mc_b]                        # [J, N, O]
    obs_feat_b = state.mp_obs_feat[mc_b]
    ok_b = (obs_kf_b >= 0) & (obs_kf_b != cand_ids[:, None, None]) & has_b[..., None]
    octs_b = state.kf_octave[
        jnp.clip(obs_kf_b, 0, K - 1), jnp.clip(obs_feat_b, 0, N - 1)
    ]
    finer_b = ok_b & (octs_b <= my_oct_b[..., None] + 1)
    n_mp_b = jnp.maximum(jnp.sum(has_b.astype(jnp.int32), axis=1), 1)   # [J]

    # keyframes carrying a loop edge are never culled: future essential-graph
    # optimizations reuse those edges, so erasing an endpoint would anchor a
    # stale vertex (original ORB-SLAM2 sets mbNotErase permanently in
    # AddLoopEdge; this reference releases it at LoopClosing.cc:539 — we keep
    # the stronger guarantee)
    le = state.loop_edges
    has_loop_edge = (
        jnp.zeros((K + 1,), bool)
        .at[jnp.where(le[:, 0] >= 0, le[:, 0], K)].set(True, mode="drop")
        .at[jnp.where(le[:, 1] >= 0, le[:, 1], K)].set(True, mode="drop")
    )[:K]

    st = state
    for j in range(n_candidates):
        kj = cand_ids[j]
        cand_ok = (
            (wv[j] > 0) & (kj != kf_id) & (kj != 0)
            & st.kf_valid[kj] & ~has_loop_edge[kj]
        )

        mp = mp_b[j]                               # [N]
        has = has_b[j]
        mc = mc_b[j]
        # LIVE observer-validity mask on the precomputed [N, O] finer set:
        # earlier culls in this pass must stop counting as observers (the
        # sequential reference reads the cleared observation lists; masking
        # by live kf_valid is equivalent — the first batched version skipped
        # this and OVER-culled keyframes whose redundancy relied on
        # same-pass-culled observers)
        obs_live = finer_b[j] & st.kf_valid[jnp.clip(obs_kf_b[j], 0, K - 1)]
        n_finer = jnp.sum(obs_live.astype(jnp.int32), axis=1)
        redundant = has & (n_finer >= min_obs)
        cull = (
            cand_ok
            & (jnp.sum(redundant.astype(jnp.int32)) >= redundancy * n_mp_b[j])
            & (n_mp_b[j] > 20)
        )

        # --- apply the cull functionally (masked no-op when cull is False) --
        kf_valid = st.kf_valid.at[kj].set(jnp.where(cull, False, st.kf_valid[kj]))
        # remove the KF's observations from its map points' fan-out lists
        obs_match = obs_kf_b[j] == kj
        clear = cull & has[:, None] & obs_match
        new_obs_kf = jnp.where(clear, -1, st.mp_obs_kf[mc])
        tgt = jnp.where(has & cull, mc, M)
        mp_obs_kf = st.mp_obs_kf.at[tgt].set(new_obs_kf, mode="drop")
        dec = jnp.sum(clear.astype(jnp.int32), axis=1)
        mp_n_obs = st.mp_n_obs.at[tgt].add(-dec, mode="drop")
        # clear the KF's slots and graph presence
        kf_mp_idx = st.kf_mp_idx.at[kj].set(
            jnp.where(cull, jnp.full((N,), -1, jnp.int32), st.kf_mp_idx[kj])
        )
        covis = st.covis.at[kj, :].set(jnp.where(cull, 0, st.covis[kj, :]))
        covis = covis.at[:, kj].set(jnp.where(cull, 0, covis[:, kj]))
        # greedy max-weight reparenting (reference findParent).  Children are
        # bounded to the top-``n_reparent_iters`` slots (a culled KF rarely
        # has more than a couple) so each greedy round scans a [C, K] block
        # instead of the full [K, K] matrix — the K×K argmax loops were the
        # piece of this pass that walled trajectory-length scaling
        # (SURVEY §5.7 / r4 VERDICT weak#8)
        parent = st.kf_parent[kj]
        children = (st.kf_parent == kj) & st.kf_valid & cull        # [K]
        C = max(n_reparent_iters, 2)
        cw, cids = topk_bounded(children.astype(jnp.int32), C)      # [C]
        cvalid = cw > 0
        cand_mask = jnp.zeros((K,), bool).at[jnp.clip(parent, 0, K - 1)].set(parent >= 0)
        kf_parent = st.kf_parent
        for _ in range(n_reparent_iters):
            Wc = jnp.where(cvalid[:, None] & cand_mask[None, :], covis[cids], 0)
            flat = jnp.argmax(Wc)
            wbest = jnp.max(Wc)
            ci_local = (flat // K).astype(jnp.int32)
            ci = cids[ci_local]
            pi = (flat % K).astype(jnp.int32)
            do = cull & (wbest > 0)
            kf_parent = kf_parent.at[jnp.where(do, ci, K)].set(pi, mode="drop")
            cvalid = jnp.where(do, cvalid.at[ci_local].set(False), cvalid)
            children = jnp.where(do, children.at[ci].set(False), children)
            cand_mask = jnp.where(do, cand_mask.at[ci].set(True), cand_mask)
        # leftovers (children beyond the bound, no candidate covisibility, or
        # everything when the cull didn't fire — children is all-False then)
        # → the culled KF's parent, the reference's own no-weight fallback
        kf_parent = jnp.where(children, parent, kf_parent)
        # the culled KF KEEPS its parent pointer, and its pose relative to
        # that parent is frozen as kf_Tcp (reference KeyFrame::SetBadFlag
        # sets mTcp = Tcw·Twc_parent) — the final-trajectory export composes
        # through culled references with it (System::SaveTrajectoryKITTI)
        Tcp = st.kf_Tcw[kj] @ se3.inverse(st.kf_Tcw[jnp.clip(parent, 0, K - 1)])
        Tcp = jnp.where(cull & (parent >= 0), Tcp, st.kf_Tcp[kj])
        kf_Tcp = st.kf_Tcp.at[kj].set(Tcp)
        st = st._replace(
            kf_valid=kf_valid, mp_obs_kf=mp_obs_kf, mp_n_obs=mp_n_obs,
            kf_mp_idx=kf_mp_idx, covis=covis, kf_parent=kf_parent,
            kf_Tcp=kf_Tcp,
        )
    return st


def fuse_into_keyframe(
    state: MapState,
    kf_id,
    cam: CameraParams,
    *,
    width: int,
    height: int,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    th: float = 3.0,
    max_dist: int = 50,
    max_fuse: int = 2048,
) -> MapState:
    """Project neighbouring keyframes' map points into ``kf_id`` and either
    attach them to unmatched features or merge duplicates — the reference's
    two fuse passes collapsed into one batched op (reference fuseMapPoints,
    LocalMapping.cc:352-405 + ORBMatcher::fuse :623-724).

    Merge rule: when a projected point matches a feature that already holds a
    different map point, the one with more observations absorbs the other
    (reference MapPoint::replace semantics, MapPoint.cc:213-233) — here the
    loser is invalidated and its slots are repointed.
    """
    # candidate set: map points of the 2-ring neighbourhood, bounded to the
    # 2048 most relevant (ring-1 first) — covers the overlap region of the
    # new KF at half the projection-match cost of the old 4096 cap
    from .local_map import local_map_snapshot

    local = local_map_snapshot(state, kf_id, n_first=10, n_second=5, max_kfs=32, max_mps=max_fuse)
    return fuse_candidates_into_keyframe(
        state, kf_id, cam, local,
        width=width, height=height, scale_factor=scale_factor,
        n_levels=n_levels, th=th, max_dist=max_dist, ratio=0.6,
    )


def fuse_keyframe_into_neighbors(
    state: MapState,
    kf_id,
    cam: CameraParams,
    *,
    n_neighbors: int = 5,
    width: int,
    height: int,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    th: float = 3.0,
    max_dist: int = 50,
    ratio: float = 0.6,
    allow_merge: bool = True,
) -> MapState:
    """Backward fuse — the second direction of the reference's two-way fuse
    (fuseMapPoints, LocalMapping.cc:352-405): project the NEW keyframe's map
    points into its top covisible neighbours, attaching to unmatched
    neighbour features or merging duplicates.  This is what matures fresh
    stereo-seed points past one observation immediately; without it the
    needNewKeyFrame ratio (nRefMatches counts ≥2-observation points,
    Tracking.cc:735-746) reads a near-empty reference set and the cadence
    logic starves.

    r4: the ``n_neighbors`` projection searches run as ONE vmapped pass
    (they all project the same candidate set, just into different
    keyframes — the old per-neighbour rounds serialized 5 hamming
    matrices); only the attach/merge applications stay sequential, each
    re-checking LIVE candidate validity so a point merged away by an
    earlier neighbour never re-attaches."""
    from ..features.frame import FrameFeatures
    from ..matching.matcher import MatchResult, search_mappoints_projection

    M = state.mp_capacity
    K = state.kf_capacity
    N = state.kf_uv.shape[1]
    w = state.covis[kf_id] * state.kf_valid.astype(jnp.int32)
    nb_w, nb_ids = topk_bounded(w, n_neighbors)

    mp = state.kf_mp_idx[kf_id]
    mpc = jnp.clip(mp, 0, M - 1)
    base_valid = state.kf_feat_valid[kf_id] & (mp >= 0)
    cand_ids = jnp.where(base_valid, mp, -1)
    cand_pos = state.mp_pos[mpc]
    cand_normal = state.mp_normal[mpc]
    cand_desc = state.mp_desc[mpc]
    cand_min = state.mp_min_dist[mpc]
    cand_max = state.mp_max_dist[mpc]

    def search_one(kn, okj):
        feats = FrameFeatures(
            uv=state.kf_uv[kn], uv_raw=state.kf_uv[kn],
            octave=state.kf_octave[kn],
            response=jnp.ones((N,), jnp.float32),
            angle=state.kf_angle[kn], desc=state.kf_desc[kn],
            valid=state.kf_feat_valid[kn],
        )
        own = jnp.zeros((M + 1,), bool).at[
            jnp.where(state.kf_mp_idx[kn] >= 0, state.kf_mp_idx[kn], M)
        ].set(True, mode="drop")
        valid = base_valid & state.mp_valid[mpc] & okj & ~own[mpc]
        m = search_mappoints_projection(
            cam, state.kf_Tcw[kn],
            cand_pos, cand_normal, cand_min, cand_max, cand_desc,
            valid, feats, jnp.zeros((N,), bool),
            th=th, width=width, height=height, scale_factor=scale_factor,
            n_levels=n_levels, max_dist=max_dist, ratio=ratio,
            exclude_taken=False,
        )
        return m.idx, m.dist

    ok_nb = (nb_w > 0) & (nb_ids != kf_id) & state.kf_valid[nb_ids]
    idx_b, dist_b = jax.vmap(search_one)(nb_ids, ok_nb)        # [J, N]

    st = state
    for j in range(n_neighbors):
        m = MatchResult(idx=jnp.where(ok_nb[j], idx_b[j], -1), dist=dist_b[j])
        st = _apply_fuse_matches(st, nb_ids[j], m, cand_ids,
                                 allow_merge=allow_merge)
    # distillation/normals ONCE over the whole candidate set (each per-pass
    # refresh repeated the [N, O, O] hamming work ~n_neighbors times), then
    # refresh covisibility rows of every touched keyframe
    touched = jnp.where(base_valid & st.mp_valid[mpc], mp, -1)
    st = _distill_descriptors(st, touched)
    st = _update_normals_and_depth(st, touched, scale_factor, n_levels)
    # covisibility refresh of all touched keyframes in ONE batched pass:
    # the rows depend only on the post-apply observation index, so the old
    # per-neighbour sequential at[].set chain (2·J scatters) collapses to a
    # vmapped row computation + one masked scatter each way
    covis = st.covis
    rows = jax.vmap(lambda kn: _covis_row_for_kf(st, kn))(nb_ids)  # [J, K]
    keep = ok_nb & (nb_w > 0)
    rows = jnp.where(keep[:, None], rows, covis[nb_ids])
    safe_ids = jnp.where(keep, nb_ids, K)  # drop invalid rows
    covis = covis.at[safe_ids, :].set(rows, mode="drop")
    # column update as a transposed row-scatter (axis-0 only — the mixed
    # slice+array .at[:, ids] form scatters with numpy-incompatible axis
    # placement), then an order-independent symmetric combine: two updated
    # neighbours' counts of each other can differ by a few when fuse left
    # stale backlinks (the count runs over each side's OWN kf_mp_idx), and
    # the old sequential loop resolved the conflict by write order
    covis = covis.T.at[safe_ids, :].set(rows, mode="drop").T
    covis = jnp.maximum(covis, covis.T)
    st = st._replace(covis=covis)
    row = _covis_row_for_kf(st, kf_id)
    covis = st.covis.at[kf_id, :].set(row).at[:, kf_id].set(row)
    return st._replace(covis=covis)


def _apply_fuse_matches(
    state: MapState,
    kf_id,
    m,
    cand_mp: jnp.ndarray,   # i32[L] candidate map-point id per match row
    *,
    allow_merge: bool = True,
    loop_priority: bool = False,
) -> MapState:
    """Apply precomputed fuse matches into ``kf_id``: attach to empty slots,
    merge with occupants (the post-search half of the fuse — ORBMatcher::fuse
    LocalMapping.cc:352-405).  Candidate validity is re-checked LIVE so a
    batched search whose candidates were merged away by an earlier apply
    round stays safe."""
    M = state.mp_capacity
    N = state.kf_mp_idx.shape[1]
    cand_c = jnp.clip(cand_mp, 0, M - 1)
    found = m.found & (cand_mp >= 0) & state.mp_valid[cand_c]
    fj = jnp.clip(m.idx, 0, N - 1)
    cur_mp = state.kf_mp_idx[kf_id]
    mp_new = cand_mp
    mp_old = cur_mp[fj]

    # case A: slot empty → attach observation
    attach = found & (mp_old < 0)
    st = state._replace(
        kf_mp_idx=state.kf_mp_idx.at[kf_id, jnp.where(attach, fj, N)].set(
            jnp.where(attach, mp_new, -1), mode="drop"
        )
    )
    st = _append_observations(st, kf_id, mp_new, fj, attach)

    # case B: slot occupied by another point → merge; the loop variant keeps
    # the projected loop-group point, local mapping keeps the better-observed.
    # ``allow_merge`` is a PYTHON bool: attach-only callers (the default
    # backward fuse) skip the whole merge scatter-chain statically instead
    # of running it fully masked (r5: ~3 dead merge_mappoints chains per
    # keyframe were ~1/3 of the backward-fuse device time)
    if not allow_merge:
        return st
    merge = found & (mp_old >= 0) & (mp_old != mp_new)
    if loop_priority:
        win_new = jnp.ones_like(merge)
    else:
        n_new = st.mp_n_obs[jnp.clip(mp_new, 0, M - 1)]
        n_old = st.mp_n_obs[jnp.clip(mp_old, 0, M - 1)]
        win_new = n_new >= n_old
    winner = jnp.where(win_new, mp_new, mp_old)
    loser = jnp.where(win_new, mp_old, mp_new)
    return merge_mappoints(st, winner, loser, merge)


def fuse_candidates_into_keyframe(
    state: MapState,
    kf_id,
    cam: CameraParams,
    local,
    *,
    width: int,
    height: int,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    th: float = 3.0,
    max_dist: int = 50,
    ratio: float = 0.6,
    loop_priority: bool = False,
    allow_merge: bool = True,
    update_stats: bool = True,
) -> MapState:
    """Fuse an explicit candidate set (a ``LocalMap`` snapshot) into ``kf_id``.

    ``update_stats=False`` skips the descriptor-distillation / normal /
    covisibility refresh tail — for callers that fuse the SAME candidate set
    into several keyframes and refresh once at the end.

    ``loop_priority=True`` reproduces the loop-closing fuse variant
    (ORBMatcher::fuse called with bLoop=true at LoopClosing.cc:515-517,
    processFuseMps :640-648): the projected loop-group point always wins the
    merge; otherwise the better-observed point wins (local-mapping fuse).
    """
    from ..matching.matcher import search_mappoints_projection
    from ..features.frame import FrameFeatures

    K = state.kf_capacity
    N = state.kf_uv.shape[1]
    M = state.mp_capacity

    feats = FrameFeatures(
        uv=state.kf_uv[kf_id],
        uv_raw=state.kf_uv[kf_id],
        octave=state.kf_octave[kf_id],
        response=jnp.ones((N,), jnp.float32),
        angle=state.kf_angle[kf_id],
        desc=state.kf_desc[kf_id],
        valid=state.kf_feat_valid[kf_id],
    )
    cur_mp = state.kf_mp_idx[kf_id]
    # exclude the KF's own points from the candidate set
    own = jnp.zeros((M,), bool).at[jnp.where(cur_mp >= 0, cur_mp, M)].set(True, mode="drop")
    cand_valid = local.valid & ~own[jnp.clip(local.mp_ids, 0, M - 1)]

    m = search_mappoints_projection(
        cam, state.kf_Tcw[kf_id],
        local.pos, local.normal, local.min_dist, local.max_dist, local.desc,
        cand_valid, feats, jnp.zeros((N,), bool),
        th=th, width=width, height=height, scale_factor=scale_factor,
        n_levels=n_levels, max_dist=max_dist, ratio=ratio, exclude_taken=False,
    )
    st = _apply_fuse_matches(
        state, kf_id, m, jnp.where(cand_valid, local.mp_ids, -1),
        allow_merge=allow_merge, loop_priority=loop_priority,
    )

    if not update_stats:
        return st
    touched = jnp.where(m.found, local.mp_ids, -1)
    st = _distill_descriptors(st, touched)
    st = _update_normals_and_depth(st, touched, scale_factor, n_levels)
    row = _covis_row_for_kf(st, kf_id)
    covis = st.covis.at[kf_id, :].set(row).at[:, kf_id].set(row)
    return st._replace(covis=covis)
