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
from typing import Iterator, List, Optional, Sequence, Tuple

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


def load_kitti_gt(seq_dir: str, explicit: str = "") -> Optional[np.ndarray]:
    """KITTI odometry ground-truth poses for a sequence: [N, 4, 4] Twc.

    The official layout keeps them OUTSIDE the sequence dir
    (``dataset/poses/{seq}.txt``, one row-major 3×4 [R|t] per line — the same
    file format the reference's examples assume users evaluate against,
    example/Stereo/KittiStereo.cc:28-37).  Searched, in order:
    ``explicit``, ``{seq_dir}/poses.txt``, ``{seq_dir}/{seq}.txt``,
    ``{seq_dir}/../../poses/{seq}.txt``.
    """
    seq = os.path.basename(os.path.normpath(seq_dir))
    candidates = [
        explicit,
        os.path.join(seq_dir, "poses.txt"),
        os.path.join(seq_dir, f"{seq}.txt"),
        os.path.join(seq_dir, "..", "..", "poses", f"{seq}.txt"),
    ]
    for path in candidates:
        if path and os.path.exists(path):
            # gt is optional evaluation input; a malformed file must not lose
            # the run's trajectory (loading happens after tracking finishes)
            try:
                rows = np.loadtxt(path, dtype=np.float64).reshape(-1, 3, 4)
            except ValueError as e:
                import sys

                print(f"warning: bad gt file {path}: {e}", file=sys.stderr)
                return None
            T = np.tile(np.eye(4), (len(rows), 1, 1))
            T[:, :3, :4] = rows
            return T
    return None


def load_tum_gt(
    seq_dir: str, explicit: str = ""
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """TUM ground truth: (stamps [N], Twc [N, 4, 4]) from groundtruth.txt
    (``t tx ty tz qx qy qz qw`` lines)."""
    path = explicit or os.path.join(seq_dir, "groundtruth.txt")
    if not os.path.exists(path):
        return None
    stamps, poses = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 8:
                continue
            t = float(parts[0])
            tx, ty, tz, qx, qy, qz, qw = (float(x) for x in parts[1:8])
            n = max(qx * qx + qy * qy + qz * qz + qw * qw, 1e-12) ** 0.5
            qx, qy, qz, qw = qx / n, qy / n, qz / n, qw / n
            R = np.array([
                [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
                [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
                [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)],
            ])
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = (tx, ty, tz)
            stamps.append(t)
            poses.append(T)
    if not stamps:
        return None
    return np.asarray(stamps), np.stack(poses)


def associate_gt(
    stamps: Sequence[float],
    gt_stamps: np.ndarray,
    gt_poses: np.ndarray,
    max_dt: float = 0.02,
) -> List[Optional[np.ndarray]]:
    """Nearest-stamp association of estimated-frame stamps to ground truth
    (evo/TUM `associate.py` convention: closest match within ``max_dt``)."""
    out: List[Optional[np.ndarray]] = []
    for s in stamps:
        i = int(np.argmin(np.abs(gt_stamps - s)))
        out.append(gt_poses[i] if abs(float(gt_stamps[i]) - s) <= max_dt else None)
    return out


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
