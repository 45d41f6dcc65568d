"""Camera source protocol + implementations.

Generalizes the reference's CameraBase HAL (src/camera_object.h:7-41: abstract
getLRFrames + env-gated frame dumping) into a host-side iterator protocol that
feeds the device pipeline. The reference's concrete Intel_V4L2 RGB-D capture
(src/rgbd_standalone.cpp) maps to `V4L2StereoCamera` below — on non-Linux or
deviceless hosts it raises at open; `FakeCamera` (SURVEY.md section 4 "fake
backends") replays in-memory or on-disk frame pairs for tests.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Protocol, Sequence

import numpy as np


class CameraSource(Protocol):
    """Protocol version of reference CameraBase (src/camera_object.h:7-41)."""

    def get_lr_frames(self) -> tuple[np.ndarray, np.ndarray]:
        """Next (left, right) grayscale uint8 pair."""
        ...


class _SaveFramesMixin:
    """SAVE_FRAMES env-gated frame dumping (reference src/camera_object.h:9-37)."""

    _save_count = 0

    def _maybe_save(self, left: np.ndarray, right: np.ndarray) -> None:
        if not os.environ.get("SAVE_FRAMES"):
            return
        outdir = os.environ.get("SAVE_FRAMES_DIR", "images")
        os.makedirs(outdir, exist_ok=True)
        idx = self._save_count
        self._save_count += 1
        try:
            import cv2

            cv2.imwrite(os.path.join(outdir, f"left{idx:06d}.png"), left)
            cv2.imwrite(os.path.join(outdir, f"right{idx:06d}.png"), right)
        except ImportError:
            from PIL import Image

            Image.fromarray(left).save(os.path.join(outdir, f"left{idx:06d}.png"))
            Image.fromarray(right).save(os.path.join(outdir, f"right{idx:06d}.png"))


class FakeCamera(_SaveFramesMixin):
    """Replays a pre-built list of (left, right) pairs; loops if requested."""

    def __init__(self, frames: Sequence[tuple[np.ndarray, np.ndarray]], loop=False):
        self._frames = list(frames)
        self._i = 0
        self._loop = loop

    def get_lr_frames(self) -> tuple[np.ndarray, np.ndarray]:
        if self._i >= len(self._frames):
            if not self._loop:
                raise StopIteration
            self._i = 0
        left, right = self._frames[self._i]
        self._i += 1
        self._maybe_save(left, right)
        return left, right


class ImageDirCamera(_SaveFramesMixin):
    """Replays a KITTI-layout directory through the camera protocol."""

    def __init__(self, path: str):
        from visual_odom_tpu.io.kitti import KittiSequence

        self._seq = KittiSequence(path)
        self._i = 0

    def get_lr_frames(self) -> tuple[np.ndarray, np.ndarray]:
        if self._i >= len(self._seq):
            raise StopIteration
        pair = self._seq.frame(self._i)
        self._i += 1
        self._maybe_save(*pair)
        return pair


class V4L2StereoCamera(_SaveFramesMixin):
    """Live interleaved-stereo capture equivalent of the reference's
    Intel_V4L2 (src/rgbd_standalone.cpp:57-228): a Y8I-packed /dev/video
    stream deinterleaved into left (low byte) / right (high byte) planes.

    Capture goes through the native C++ V4L2 unit (native/v4l2_capture.cpp,
    MMAP streaming + poll) via ctypes. On hosts without the device node it
    fails fast at construction with a clear error rather than at first
    capture. The deinterleave (`split_y8i`) is pure and unit-tested; its
    native twin (`cvo_deinterlace_y8i`) is cross-checked in
    tests/test_native.py.
    """

    def __init__(self, device: str = "/dev/video1", width: int = 640,
                 height: int = 480, warmup_frames: int = 10):
        if not os.path.exists(device):
            raise FileNotFoundError(
                f"V4L2 device {device} not present on this host"
            )
        from visual_odom_tpu.io.native import NativeV4L2Camera

        self._cam = NativeV4L2Camera(device, width, height,
                                     discard=warmup_frames)

    def get_lr_frames(self) -> tuple[np.ndarray, np.ndarray]:
        pair = self._cam.get_lr_frames()
        self._maybe_save(*pair)
        return pair

    def close(self) -> None:
        self._cam.close()

    @staticmethod
    def split_y8i(packed: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Deinterleave a (H, W) uint16 Y8I frame into (left, right) uint8
        planes (reference src/rgbd_standalone.cpp:186-193: left = low byte,
        right = high byte)."""
        packed = np.asarray(packed, dtype=np.uint16)
        left = (packed & 0xFF).astype(np.uint8)
        right = (packed >> 8).astype(np.uint8)
        return left, right
