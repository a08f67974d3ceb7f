"""Sparse keyframe database: DBoW3-scale memory and dense-score parity
(reference KeyFrameDB.cc:8-242; round-1 dense [K, W] rows were impossible at
the 10⁵-10⁶ words of a real ORBvoc)."""

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_ros2_tpu.bow.keyframe_db import (
    KeyFrameDB,
    add_keyframe,
    find_reloc_candidates,
    query_scores,
    sparse_bow,
)
from orb_slam2_ros2_tpu.bow.vocabulary import Vocabulary, bow_vector, transform
from orb_slam2_ros2_tpu.config import MapConfig, SLAMConfig
from orb_slam2_ros2_tpu.mapstate.map_state import empty_map



import pytest

pytestmark = pytest.mark.smoke  # fast subset: `pytest -m smoke` < 60 s

def _random_vocab(branching: int, depth: int, seed: int = 0) -> Vocabulary:
    """Synthetic vocabulary with random centroids (structure-only test double;
    a trained tree only changes WHICH word a descriptor lands on)."""
    rng = np.random.default_rng(seed)
    levels = tuple(
        jnp.asarray(rng.integers(0, 2**32, (branching ** (d + 1), 8), dtype=np.uint32))
        for d in range(depth)
    )
    idf = jnp.asarray(rng.uniform(0.5, 2.0, branching**depth).astype(np.float32))
    return Vocabulary(levels=levels, idf=idf, branching=branching, depth=depth)


def test_sparse_matches_dense_scores():
    """Sparse top-S rows reproduce the dense cosine scores exactly when S
    covers every distinct word of each frame."""
    vocab = _random_vocab(6, 3)  # 216 words
    rng = np.random.default_rng(1)
    N, S = 128, 256
    db = KeyFrameDB.empty(4, S)
    descs = [rng.integers(0, 2**32, (N, 8), dtype=np.uint32) for _ in range(4)]
    valid = jnp.ones((N,), bool)
    dense_rows = []
    for k, d in enumerate(descs):
        words = transform(vocab, jnp.asarray(d), valid)
        db = add_keyframe(db, vocab, k, jnp.asarray(d), valid)
        dense_rows.append(np.asarray(bow_vector(vocab, words)))

    qd = descs[2].copy()
    qd[: N // 2] = rng.integers(0, 2**32, (N // 2, 8), dtype=np.uint32)
    q_words = transform(vocab, jnp.asarray(qd), valid)
    q_sparse = sparse_bow(vocab, q_words, S)
    q_dense = np.asarray(bow_vector(vocab, q_words))

    s_sparse = np.asarray(
        query_scores(db, q_sparse, jnp.ones((4,), bool), n_words=vocab.n_words)
    )
    s_dense = np.stack(dense_rows) @ q_dense
    np.testing.assert_allclose(s_sparse, s_dense, rtol=1e-5, atol=1e-6)
    assert s_sparse.argmax() == 2


def test_orbvoc_scale_memory_and_retrieval():
    """A 10⁵-word vocabulary (ORBvoc order of magnitude) runs within memory:
    the database is O(K·S), not O(K·W), and retrieval still finds the
    matching keyframe."""
    vocab = _random_vocab(10, 5)  # 100 000 words
    cfg = SLAMConfig(map=MapConfig(max_keyframes=8, max_mappoints=256, max_obs_per_mp=4))
    state = empty_map(cfg)
    state = state._replace(kf_valid=state.kf_valid.at[:4].set(True))

    rng = np.random.default_rng(2)
    N, S = 512, 1024
    db = KeyFrameDB.empty(cfg.map.max_keyframes, S)
    assert db.word_ids.size * 4 + db.weights.size * 4 < 1 << 20  # « dense 3 GB
    valid = jnp.ones((N,), bool)
    descs = [rng.integers(0, 2**32, (N, 8), dtype=np.uint32) for _ in range(4)]
    for k, d in enumerate(descs):
        db = add_keyframe(db, vocab, k, jnp.asarray(d), valid)

    # query = keyframe 1 with 25% of descriptors perturbed
    qd = descs[1].copy()
    idx = rng.choice(N, N // 4, replace=False)
    qd[idx] ^= rng.integers(0, 2**32, (N // 4, 8), dtype=np.uint32).astype(np.uint32)
    q = sparse_bow(vocab, transform(vocab, jnp.asarray(qd), valid), S)
    ids, scores = find_reloc_candidates(db, state, q, n_words=vocab.n_words)
    assert int(ids[0]) == 1
    assert float(scores[0]) > 0.5


def test_sparse_bow_pads_tiny_vocab():
    """Vocabularies smaller than the row width pad instead of shape-erroring."""
    vocab = _random_vocab(4, 2)  # 16 words < S
    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.integers(0, 2**32, (32, 8), dtype=np.uint32))
    v = sparse_bow(vocab, transform(vocab, d, jnp.ones((32,), bool)), 64)
    assert v.ids.shape == (64,) and v.weights.shape == (64,)
    assert float(jnp.linalg.norm(v.weights)) > 0.99
