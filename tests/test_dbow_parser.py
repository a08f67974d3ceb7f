"""DBoW text-vocabulary parser test: write a tiny k=2, L=2 vocab in the
DBoW2/DBoW3 text format and check tree layout + transform behaviour."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_ros2_tpu.bow.vocabulary import load_dbow_text, transform



import pytest

pytestmark = pytest.mark.smoke  # fast subset: `pytest -m smoke` < 60 s

def _desc_line(byte_val):
    return " ".join(str(byte_val) for _ in range(32))


def test_parse_and_transform(tmp_path):
    # k=2, L=2: root children are nodes 1, 2 (parent 0); each has 2 leaf
    # children.  Node file-lines: parent_id is_leaf d0..d31 weight.
    # Descriptors chosen so tree descent is unambiguous: byte patterns
    # 0x00 / 0xFF split at level 1; leaves refine.
    lines = ["2 2 0 0"]
    # level-1 nodes (parents = 0)
    lines.append(f"0 0 {_desc_line(0)} 0.0")      # file node 0 → slot path "low"
    lines.append(f"0 0 {_desc_line(255)} 0.0")    # file node 1 → "high"
    # level-2 leaves: children of file nodes 1, 2 (1-indexed parents in file)
    lines.append(f"1 1 {_desc_line(0)} 0.5")      # leaf under low: all zeros
    lines.append(f"1 1 {_desc_line(15)} 0.7")     # leaf under low: 0x0F
    lines.append(f"2 1 {_desc_line(248)} 0.9")    # leaf under high: 0xF8
    lines.append(f"2 1 {_desc_line(255)} 1.1")    # leaf under high: 0xFF
    p = tmp_path / "voc.txt"
    p.write_text("\n".join(lines) + "\n")

    vocab = load_dbow_text(str(p))
    assert vocab.branching == 2 and vocab.depth == 2
    assert vocab.n_words == 4

    def packed(byte_val):
        return np.frombuffer(bytes([byte_val] * 32), dtype=np.uint32).copy()

    descs = jnp.asarray(np.stack([packed(0), packed(255), packed(15), packed(248)]))
    words = np.asarray(transform(vocab, descs, jnp.ones(4, bool)))
    # all-zero desc → leaf 0; all-ones → leaf 3; 0x0F → leaf 1; 0xF8 → leaf 2
    assert words[0] == 0
    assert words[1] == 3
    assert words[2] == 1
    assert words[3] == 2
