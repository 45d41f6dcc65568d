"""KITTI odometry dataset I/O.

Mirrors the reference's loaders:

- image layout `<seq>/image_0/%06d.png` (left) and `image_1` (right),
  grayscale (reference loadImageLeft/Right, src/utils.cpp:172-190);
- ground-truth pose files: rows of 12 floats forming the top 3x4 of a 4x4
  pose (reference loadPoses, src/evaluate/evaluate_odometry.cpp:17-33);
- result poses written in the same 12-float row format so the devkit scorer
  consumes them directly.

Unlike the reference (which hard-codes a 9000-frame loop and crashes on the
first missing image, src/main.cpp:123), sequences detect their own length.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np


def _imread_gray(path: str) -> np.ndarray:
    """Grayscale image load matching cv::imread + BGR2GRAY rounding.

    Prefers the native C++ decoder (native/png_decode.cpp, same BT.601
    fixed-point weights); falls back to cv2, then PIL."""
    if path.endswith(".png"):
        from visual_odom_tpu.io import native

        if native.available():
            try:
                return native.decode_png_gray(path)
            except OSError:
                pass  # unsupported PNG flavor -> Python fallbacks
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        return img
    except ImportError:
        from PIL import Image

        return np.asarray(Image.open(path).convert("L"))


class KittiSequence:
    """Iterates (left, right) grayscale uint8 frames of one KITTI sequence."""

    def __init__(self, path: str):
        self.path = path
        self.left_dir = os.path.join(path, "image_0")
        self.right_dir = os.path.join(path, "image_1")
        n = 0
        while os.path.exists(os.path.join(self.left_dir, f"{n:06d}.png")):
            n += 1
        self.num_frames = n
        if n == 0:
            raise FileNotFoundError(f"no frames under {self.left_dir}")

    def frame(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        left = _imread_gray(os.path.join(self.left_dir, f"{i:06d}.png"))
        right = _imread_gray(os.path.join(self.right_dir, f"{i:06d}.png"))
        return left, right

    def __len__(self) -> int:
        return self.num_frames

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Clean end-of-sequence on a missing or undecodable frame: the
        reference crashes on the first bad image (empty imread -> cvtColor
        throws, src/utils.cpp:178); here the sequence simply ends at the
        last good frame, so partial runs stay scorable (SURVEY.md section 5
        failure detection; fidelity ledger: deliberately fixed)."""
        import sys

        for i in range(self.num_frames):
            try:
                yield self.frame(i)
            except (OSError, ValueError) as e:  # missing file, bad PNG, ...
                print(f"warning: frame {i} unreadable ({e!r}); "
                      f"ending sequence at {i} frames", file=sys.stderr)
                return

    def iter_prefetched(self, n_threads: int = 4, capacity: int = 16,
                        max_frames: int = 0,
                        ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Stream frames through the native multithreaded prefetcher
        (native/prefetch.cpp) so PNG decode overlaps device compute.
        Falls back to synchronous iteration without the native runtime.
        One ring over L0,R0,L1,R1,... keeps stereo pairs in lockstep."""
        n = self.num_frames if not max_frames else min(self.num_frames,
                                                       max_frames)
        from visual_odom_tpu.io import native

        if not native.available():
            for i in range(n):
                yield self.frame(i)
            return
        paths = []
        for i in range(n):
            paths.append(os.path.join(self.left_dir, f"{i:06d}.png"))
            paths.append(os.path.join(self.right_dir, f"{i:06d}.png"))
        import sys

        loader = native.PrefetchingLoader(paths, n_threads=n_threads,
                                          capacity=capacity)
        try:
            while True:
                try:
                    a = loader.next_frame()
                    if a is None:
                        return
                    b = loader.next_frame()
                    if b is None:
                        return
                except (OSError, ValueError) as e:  # truncated/corrupt PNG
                    print(f"warning: unreadable frame in prefetch stream "
                          f"({e!r}); ending sequence early", file=sys.stderr)
                    return
                yield a[1], b[1]
        finally:
            loader.close()


def load_poses(path: str) -> np.ndarray:
    """(N, 4, 4) float64 poses from a KITTI 12-float-per-row file
    (reference loadPoses, src/evaluate/evaluate_odometry.cpp:17-33)."""
    rows = np.loadtxt(path, dtype=np.float64)
    if rows.ndim == 1:
        rows = rows[None]
    if rows.shape[1] != 12:
        raise ValueError(f"expected 12 values per row in {path}, got {rows.shape[1]}")
    n = rows.shape[0]
    poses = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    poses[:, :3, :] = rows.reshape(n, 3, 4)
    return poses


def save_poses_kitti(path: str, poses: np.ndarray) -> None:
    """Write (N, 4, 4) poses as KITTI 12-float rows (devkit input format)."""
    rows = np.asarray(poses)[:, :3, :].reshape(len(poses), 12)
    np.savetxt(path, rows, fmt="%.9e")


class PoseWriter:
    """Streaming KITTI-format pose writer: poses land on disk incrementally
    so partially-completed runs remain scorable (SURVEY.md section 5,
    checkpoint/resume)."""

    def __init__(self, path: str):
        self._f = open(path, "w")

    def append(self, pose: np.ndarray) -> None:
        row = np.asarray(pose, dtype=np.float64)[:3, :].reshape(12)
        self._f.write(" ".join(f"{v:.9e}" for v in row) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()
