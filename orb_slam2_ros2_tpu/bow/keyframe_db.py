"""Keyframe database for place recognition — dense tf-idf retrieval.

The reference keeps an inverted index word→{KF} and scores candidates with
shared-word counts, covisibility-group accumulation and best-of-group
selection (reference: src/KeyFrameDB.cc — addKeyFrame :8-36, findRelocKfs
:39-173, findLoopCloseKfs :181-242).  The TPU redesign stores one dense
L2-normalized tf-idf row per keyframe; retrieval is a single MXU matmul
``scores = bow_matrix @ query`` over all keyframes, followed by the same
covisibility-group accumulation as masked matrix ops.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..mapstate.map_state import MapState
from .vocabulary import Vocabulary, bow_vector, transform


class KeyFrameDB(NamedTuple):
    """Dense BoW store: one tf-idf row per keyframe slot."""

    bow: jnp.ndarray  # f32[K, W]

    @staticmethod
    def empty(n_keyframes: int, n_words: int) -> "KeyFrameDB":
        return KeyFrameDB(bow=jnp.zeros((n_keyframes, n_words), jnp.float32))


def rebuild(vocab: Vocabulary, state: MapState) -> KeyFrameDB:
    """Recompute every valid keyframe's BoW row — the reference's database
    refill after map load (System.cc:104-110), vmapped over keyframes."""
    def one(desc, valid, kf_ok):
        words = transform(vocab, desc, valid & kf_ok)
        return bow_vector(vocab, words)

    rows = jax.vmap(one)(state.kf_desc, state.kf_feat_valid, state.kf_valid[:, None])
    rows = jnp.where(state.kf_valid[:, None], rows, 0.0)
    return KeyFrameDB(bow=rows)


def add_keyframe(db: KeyFrameDB, vocab: Vocabulary, kf_id, desc: jnp.ndarray, valid: jnp.ndarray) -> KeyFrameDB:
    """Compute and store the keyframe's BoW row (KeyFrameDB::addKeyFrame)."""
    words = transform(vocab, desc, valid)
    v = bow_vector(vocab, words)
    return KeyFrameDB(bow=db.bow.at[kf_id].set(v))


def query_scores(db: KeyFrameDB, query_vec: jnp.ndarray, kf_valid: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity of the query against every keyframe row [K]."""
    s = db.bow @ query_vec
    return jnp.where(kf_valid, s, 0.0)


def _group_scores(state: MapState, s: jnp.ndarray, top_covis: int = 10) -> jnp.ndarray:
    """Covisibility-group accumulated score (KeyFrameDB.cc:125-173): each
    keyframe's score plus its top-``top_covis`` covisible neighbours'."""
    K = s.shape[0]
    w, ids = jax.lax.top_k(state.covis * state.kf_valid.astype(jnp.int32), top_covis)
    nb = jnp.where(w > 0, ids, K)
    neighbor_sum = jnp.sum(
        jnp.where(w > 0, s[jnp.clip(nb, 0, K - 1)], 0.0), axis=1
    )
    return s + neighbor_sum


def find_reloc_candidates(
    db: KeyFrameDB,
    state: MapState,
    query_vec: jnp.ndarray,
    *,
    n_candidates: int = 5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Relocalization candidates (findRelocKfs, KeyFrameDB.cc:39-173):
    score all KFs, group-accumulate over covisibility, keep groups above
    0.75·best, return each group's best member."""
    s = query_scores(db, query_vec, state.kf_valid)
    gs = _group_scores(state, s)
    th = 0.75 * jnp.max(gs)
    ok = (gs >= th) & (s > 0)
    masked = jnp.where(ok, s, -1.0)
    top, ids = jax.lax.top_k(masked, n_candidates)
    return jnp.where(top > 0, ids, -1), top


def find_loop_candidates(
    db: KeyFrameDB,
    state: MapState,
    query_vec: jnp.ndarray,
    query_kf,
    *,
    n_candidates: int = 5,
    min_covis_weight: int = 15,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Loop-closure candidates (findLoopCloseKfs, KeyFrameDB.cc:181-242):
    like reloc retrieval, but keyframes covisible with the query are excluded
    and candidates must beat the query's own neighbourhood minimum score."""
    K = state.kf_capacity
    s = query_scores(db, query_vec, state.kf_valid)

    # min score among the query's covisible neighbours = base threshold
    nb_w = state.covis[query_kf] * state.kf_valid.astype(jnp.int32)
    nb_mask = nb_w >= min_covis_weight
    nb_scores = jnp.where(nb_mask, s, jnp.inf)
    min_nb = jnp.min(nb_scores)
    min_score = jnp.where(jnp.isfinite(min_nb), min_nb, 0.0)

    connected = (state.covis[query_kf] > 0)
    excluded = connected | (jnp.arange(K) == query_kf) | ~state.kf_valid
    s = jnp.where(excluded, 0.0, s)
    gs = _group_scores(state, s)
    th = jnp.maximum(0.75 * jnp.max(gs), min_score)
    ok = (gs >= th) & (s >= min_score) & (s > 0)
    masked = jnp.where(ok, s, -1.0)
    top, ids = jax.lax.top_k(masked, n_candidates)
    return jnp.where(top > 0, ids, -1), top
