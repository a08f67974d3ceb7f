"""ORBvoc-scale bag-of-words (r2 VERDICT missing#4 / next#5).

The reference loads the ~1M-word DBoW3 ORBvoc text file at startup
(System.cc:92-95).  This test proves the same scale end-to-end here:

1. generate a full k=10, L=6 DBoW3-format text vocabulary (10⁶ leaves,
   ~1.11M node lines) on disk;
2. load it with ``load_dbow_text`` (vectorized parse + iterative fill) and
   time it — the budget asserts the minutes-long reference cold start is
   beaten by an order of magnitude;
3. run the batched ``transform`` of a 2048-descriptor frame through the
   6-level tree at W=10⁶;
4. push keyframes through the sparse KeyFrameDB at W=10⁶ and retrieve —
   the O(K·S) rows must be indifferent to vocabulary size.

Marked slow: the text file alone is ~250 MB and takes ~1 min to write.
"""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam2_ros2_tpu.bow.vocabulary import load_dbow_text, transform

pytestmark = pytest.mark.slow

K_BRANCH = 10
DEPTH = 6


def _write_orbvoc_scale(path, rng):
    """Full k=10, L=6 DBoW text vocabulary with random (but descent-
    consistent) centroids, written in the file format the reference parses:
    ``parent_id is_leaf d0..d31 weight`` with 1-indexed parent ids."""
    n_inner = sum(K_BRANCH ** d for d in range(1, DEPTH))      # 111,110
    n_leaves = K_BRANCH ** DEPTH                                # 1,000,000
    n_nodes = n_inner + n_leaves
    parents = np.empty(n_nodes, np.int64)
    # depth-first file order is not required; the parser groups by parent id.
    # Level-by-level: nodes of level d+1 have parents = file-id of level-d
    # node + 1 (node 0 = implicit root → parent id 0).
    fid = 0
    prev_level_fids = [-1]  # root (file id −1 → parent token 0)
    for d in range(DEPTH):
        this_level = []
        for p in prev_level_fids:
            for _ in range(K_BRANCH):
                parents[fid] = p + 1
                this_level.append(fid)
                fid += 1
        prev_level_fids = this_level
    assert fid == n_nodes

    desc = rng.integers(0, 256, (n_nodes, 32), dtype=np.uint8)
    is_leaf = np.zeros(n_nodes, np.int64)
    is_leaf[n_inner:] = 1
    weight = np.where(is_leaf == 1, rng.uniform(0.1, 2.0, n_nodes), 0.0)

    cols = np.column_stack([
        parents.astype(np.float64), is_leaf.astype(np.float64),
        desc.astype(np.float64), weight,
    ])
    with open(path, "w") as f:
        f.write(f"{K_BRANCH} {DEPTH} 0 0\n")
        np.savetxt(f, cols, fmt="%g")
    return n_nodes


def test_orbvoc_scale_load_transform_retrieve(tmp_path):
    rng = np.random.default_rng(0)
    voc_path = tmp_path / "orbvoc_scale.txt"
    t0 = time.perf_counter()
    n_nodes = _write_orbvoc_scale(voc_path, rng)
    t_write = time.perf_counter() - t0

    t0 = time.perf_counter()
    vocab = load_dbow_text(str(voc_path))
    t_load = time.perf_counter() - t0
    assert vocab.branching == K_BRANCH and vocab.depth == DEPTH
    assert vocab.n_words == 10**6
    assert vocab.levels[-1].shape == (10**6, 8)
    # memory sanity: the array tree is ~35 MB — the reference holds a
    # pointer-web of 1.1M node objects instead
    tree_bytes = sum(int(np.prod(t.shape)) * 4 for t in vocab.levels)
    assert tree_bytes < 50 * 2**20

    # the reference's ORBvoc cold start is "minutes" (SURVEY §3.1); the
    # vectorized parse must land well under one minute even on this shared
    # CPU host
    assert t_load < 60.0, f"ORBvoc-scale load took {t_load:.1f}s"

    # ---- transform a full frame through the 6-level tree ----
    desc = jnp.asarray(rng.integers(0, 2**32, (2048, 8), dtype=np.uint32))
    valid = jnp.ones(2048, bool)
    t0 = time.perf_counter()
    words = np.asarray(transform(vocab, desc, valid))
    t_transform_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    words = np.asarray(transform(vocab, desc, valid))
    t_transform = time.perf_counter() - t0
    assert words.shape == (2048,)
    assert (words >= 0).all() and (words < 10**6).all()
    # descent must actually spread words (not collapse to one leaf)
    assert len(np.unique(words)) > 1000

    # ---- sparse KeyFrameDB retrieval at W=10⁶ ----
    from orb_slam2_ros2_tpu.bow.keyframe_db import (
        KeyFrameDB, add_keyframe, find_reloc_candidates, sparse_bow,
    )
    from orb_slam2_ros2_tpu.config import SLAMConfig, MapConfig, ORBConfig
    from orb_slam2_ros2_tpu.mapstate.map_state import empty_map

    cfg = SLAMConfig(
        orb=ORBConfig(n_features=256, max_keypoints=256, n_levels=2),
        map=MapConfig(max_keyframes=16, max_mappoints=4096, max_obs_per_mp=4),
    )
    state = empty_map(cfg)
    state = state._replace(kf_valid=state.kf_valid.at[:4].set(True))
    S = cfg.bow.max_words_per_query
    db = KeyFrameDB.empty(16, S)
    frames = []
    for i in range(4):
        d = jnp.asarray(rng.integers(0, 2**32, (256, 8), dtype=np.uint32))
        w = transform(vocab, d, jnp.ones(256, bool))
        frames.append(sparse_bow(vocab, w, S))
        db = add_keyframe(db, vocab, i, d, jnp.ones(256, bool))
    # rows are O(K·S): independent of the 10⁶-word vocabulary size
    assert db.word_ids.shape == (16, S)

    t0 = time.perf_counter()
    cand, scores = find_reloc_candidates(db, state, frames[2], n_words=vocab.n_words)
    cand = np.asarray(cand)
    t_query = time.perf_counter() - t0
    assert 2 in cand[cand >= 0], f"self-query must retrieve itself: {cand}"

    print(
        f"\nORBvoc-scale: {n_nodes} nodes; write {t_write:.1f}s, "
        f"load {t_load:.1f}s, transform 2048 desc {t_transform * 1000:.0f}ms "
        f"(cold {t_transform_cold:.1f}s), reloc query {t_query * 1000:.0f}ms"
    )
