"""Real-dataset loaders: KITTI odometry (stereo) and TUM RGB-D.

Mirrors the reference example drivers (reference:
example/Stereo/KittiStereo.cc:28-37 — times.txt + image_0/image_1 pngs;
example/RGB-D/TUMRGBD.cc:28-34 — association file of rgb/depth pairs).
Images are decoded with PIL on the host and handed to the device as f32
grayscale arrays.  Gated on path existence — the benchmark environment ships
no datasets, so tests and bench fall back to io.synthetic.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np


def _load_gray(path: str) -> np.ndarray:
    # native multithread-capable decoder first (native/dataloader.cpp)
    try:
        from .native_loader import decode_png

        out = decode_png(path)
        if out is not None:
            return out
    except Exception:
        pass
    from PIL import Image

    img = Image.open(path)
    if img.mode != "L":
        img = img.convert("L")
    return np.asarray(img, dtype=np.float32)


class KittiStereoDataset:
    """KITTI odometry sequence: image_0/ (left), image_1/ (right), times.txt."""

    def __init__(self, seq_dir: str):
        self.dir = seq_dir
        times_path = os.path.join(seq_dir, "times.txt")
        with open(times_path) as f:
            self.times: List[float] = [float(x) for x in f.read().split()]
        self.left_dir = os.path.join(seq_dir, "image_0")
        self.right_dir = os.path.join(seq_dir, "image_1")
        self.n_frames = len(self.times)

    @staticmethod
    def available(seq_dir: str) -> bool:
        return os.path.isdir(os.path.join(seq_dir, "image_0")) and os.path.exists(
            os.path.join(seq_dir, "times.txt")
        )

    def __len__(self) -> int:
        return self.n_frames

    def frame(self, i: int) -> Tuple[np.ndarray, np.ndarray, float]:
        name = f"{i:06d}.png"
        left = _load_gray(os.path.join(self.left_dir, name))
        right = _load_gray(os.path.join(self.right_dir, name))
        return left, right, self.times[i]


class TumRGBDDataset:
    """TUM RGB-D sequence via an association file: ``t_rgb rgb t_d depth``."""

    def __init__(self, seq_dir: str, association_file: Optional[str] = None):
        self.dir = seq_dir
        assoc = association_file or os.path.join(seq_dir, "associate.txt")
        self.entries: List[Tuple[float, str, str]] = []
        with open(assoc) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 4 and not line.startswith("#"):
                    self.entries.append((float(parts[0]), parts[1], parts[3]))
        self.n_frames = len(self.entries)

    @staticmethod
    def available(seq_dir: str) -> bool:
        return os.path.exists(os.path.join(seq_dir, "associate.txt"))

    def __len__(self) -> int:
        return self.n_frames

    def frame(self, i: int) -> Tuple[np.ndarray, np.ndarray, float]:
        """Returns (gray f32 [H,W], depth_raw f32 [H,W], stamp).  Depth stays
        in raw sensor units; the frontend divides by Camera.DepthScale
        (reference Frame.cc:125-159)."""
        t, rgb_rel, depth_rel = self.entries[i]
        gray = _load_gray(os.path.join(self.dir, rgb_rel))
        from PIL import Image

        d = np.asarray(Image.open(os.path.join(self.dir, depth_rel)), dtype=np.float32)
        return gray, d, t
