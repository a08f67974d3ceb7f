"""Local-map extraction and local-map tracking support.

The reference builds the local map as the 1st+2nd-ring covisible keyframes of
the current frame and collects their map points into a vector for projection
matching (reference: Tracking::buildLocalMap, src/Tracking.cc:277-326).  Here
the local map is a fixed-capacity device-side snapshot: gather the covisible
KF rows of ``kf_mp_idx``, scatter into an M-sized mask, compact the set to
``L_mp`` slots with top_k — one jitted program, no host involvement.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from ..utils import topk_bounded
from .map_state import MapState


class LocalMap(NamedTuple):
    """Fixed-size snapshot of the current local map."""

    mp_ids: jnp.ndarray     # i32[L_mp] (−1 = padding)
    pos: jnp.ndarray        # f32[L_mp, 3]
    normal: jnp.ndarray     # f32[L_mp, 3]
    desc: jnp.ndarray       # u32[L_mp, 8]
    min_dist: jnp.ndarray   # f32[L_mp]
    max_dist: jnp.ndarray   # f32[L_mp]
    valid: jnp.ndarray      # bool[L_mp]
    kf_ids: jnp.ndarray     # i32[L_kf] local keyframes (−1 = padding)
    kf_mask: jnp.ndarray    # bool[K] membership mask of local KFs


def _rings_from_weights(
    state: MapState, w: jnp.ndarray, n_first: int, n_second: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ring-1 = top-``n_first`` keyframes by weight ``w [K]``; ring-2 = the
    top-``n_second`` covisibility neighbours of each ring-1 KF.  Returns the
    ring-1 id list and the combined K-mask."""
    K = state.kf_capacity
    w1, ids1 = topk_bounded(w, n_first)
    ring1 = jnp.where(w1 > 0, ids1, -1)

    rows = state.covis[jnp.clip(ring1, 0, K - 1)] * state.kf_valid.astype(jnp.int32)[None, :]
    w2, ids2 = topk_bounded(rows, n_second)
    ring2 = jnp.where((w2 > 0) & (ring1[:, None] >= 0), ids2, -1)

    mask = jnp.zeros((K,), bool)
    mask = mask.at[jnp.where(ring1 >= 0, ring1, K)].set(True, mode="drop")
    mask = mask.at[jnp.where(ring2 >= 0, ring2, K).reshape(-1)].set(True, mode="drop")
    mask = mask & state.kf_valid
    return ring1, mask


def covisible_kfs(state: MapState, kf_id, n_first: int, n_second: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1st + 2nd ring covisible keyframes of ``kf_id`` as a bounded id list
    and a K-mask (reference Tracking.cc:277-314).  The first ring is the
    top-``n_first`` covisibility neighbours; the second ring adds the best
    neighbours of each first-ring KF."""
    w = state.covis[kf_id] * state.kf_valid.astype(jnp.int32)
    ring1, mask = _rings_from_weights(state, w, n_first, n_second)
    mask = mask.at[kf_id].set(True) & state.kf_valid
    return ring1, mask


def frame_observer_weights(state: MapState, mp_ids: jnp.ndarray) -> jnp.ndarray:
    """Per-keyframe count of the frame's tracked map points each KF observes
    (the reference's K1 vote, Tracking::buildLocalMap Tracking.cc:277-300).
    ``mp_ids [N]`` is the frame's per-feature map-point table (−1 = none)."""
    K = state.kf_capacity
    M = state.mp_capacity
    tracked = mp_ids >= 0
    obs_kf = state.mp_obs_kf[jnp.clip(mp_ids, 0, M - 1)]      # [N, O]
    src = jnp.where(tracked[:, None] & (obs_kf >= 0), obs_kf, K)
    counts = jnp.zeros((K + 1,), jnp.int32).at[src.reshape(-1)].add(1, mode="drop")[:K]
    return counts * state.kf_valid.astype(jnp.int32)


def local_map_snapshot(
    state: MapState, kf_id, *, n_first: int = 10, n_second: int = 5,
    max_kfs: int = 64, max_mps: int = 16384,
) -> LocalMap:
    """Collect the local map around ``kf_id`` into fixed-size arrays."""
    ring1, kf_mask = covisible_kfs(state, kf_id, n_first, n_second)
    return _snapshot_from_mask(state, ring1, kf_mask, max_kfs=max_kfs, max_mps=max_mps)


def local_map_snapshot_frame(
    state: MapState, mp_ids: jnp.ndarray, *, n_first: int = 10,
    n_second: int = 5, max_kfs: int = 64, max_mps: int = 16384,
) -> LocalMap:
    """Frame-centered local map: ring-1 = the keyframes observing the most of
    the frame's tracked points, ring-2 = their best covisibility neighbours —
    the reference's per-frame buildLocalMap (Tracking.cc:277-326).  A
    snapshot centered on a single keyframe goes stale between sparse
    keyframes under rotation; this one follows the frame."""
    w = frame_observer_weights(state, mp_ids)
    ring1, kf_mask = _rings_from_weights(state, w, n_first, n_second)
    return _snapshot_from_mask(state, ring1, kf_mask, max_kfs=max_kfs, max_mps=max_mps)


def _snapshot_from_mask(
    state: MapState, ring1: jnp.ndarray, kf_mask: jnp.ndarray,
    *, max_kfs: int, max_mps: int
) -> LocalMap:
    K = state.kf_capacity
    # bounded local KF id list
    kf_score = jnp.where(kf_mask, 1, 0)
    kfv, kf_ids_all = topk_bounded(kf_score * (K - jnp.arange(K)), max_kfs)
    kf_ids = jnp.where((kfv > 0) & kf_mask[kf_ids_all], kf_ids_all, -1)

    # mask of map points observed by local KFs
    rows = state.kf_mp_idx[jnp.clip(kf_ids, 0, K - 1)]  # [max_kfs, N]
    rows = jnp.where((kf_ids >= 0)[:, None], rows, -1)
    M = state.mp_capacity
    mp_mask = jnp.zeros((M,), bool)
    mp_mask = mp_mask.at[jnp.where(rows >= 0, rows, M).reshape(-1)].set(True, mode="drop")
    mp_mask = mp_mask & state.mp_valid
    # ring-1 points (directly observed by the frame's/KF's best covisible
    # keyframes) must survive the capacity cap: when the camera revisits the
    # START of the map, the visible points carry the OLDEST ids — a pure
    # recency preference evicted exactly them and tracking collapsed
    r1_rows = state.kf_mp_idx[jnp.clip(ring1, 0, K - 1)]
    r1_rows = jnp.where((ring1 >= 0)[:, None], r1_rows, -1)
    r1_mask = jnp.zeros((M,), bool)
    r1_mask = r1_mask.at[jnp.where(r1_rows >= 0, r1_rows, M).reshape(-1)].set(True, mode="drop")

    # compact to max_mps slots: ring-1 membership first, then recency
    score = jnp.where(mp_mask, 1 + jnp.arange(M, dtype=jnp.int32), 0)
    score = jnp.where(mp_mask & r1_mask, score + M, score)
    top, mp_ids = topk_bounded(score, max_mps)
    ok = top > 0
    mp_ids = jnp.where(ok, mp_ids, -1)
    idc = jnp.clip(mp_ids, 0, M - 1)
    return LocalMap(
        mp_ids=mp_ids,
        pos=state.mp_pos[idc],
        normal=state.mp_normal[idc],
        desc=state.mp_desc[idc],
        min_dist=state.mp_min_dist[idc],
        max_dist=state.mp_max_dist[idc],
        valid=ok,
        kf_ids=kf_ids,
        kf_mask=kf_mask,
    )


def bump_tracking_counters(
    state: MapState, local: LocalMap, visible: jnp.ndarray, found: jnp.ndarray
) -> MapState:
    """Update per-MP visible/found counters used by culling (reference
    MapPoint::addMatchInTrack/addInViewInTrack, MapPoint.h:210-253)."""
    M = state.mp_capacity
    tgt_v = jnp.where(local.valid & visible, local.mp_ids, M)
    tgt_f = jnp.where(local.valid & found, local.mp_ids, M)
    return state._replace(
        mp_visible=state.mp_visible.at[tgt_v].add(1, mode="drop"),
        mp_found=state.mp_found.at[tgt_f].add(1, mode="drop"),
    )
