"""ctypes bindings for the native host runtime (native/libcvo_native.so).

Gives the Python pipeline the C++ components the reference gets from
OpenCV/V4L2: PNG grayscale decode (reference src/utils.cpp:172-190), a
multithreaded lookahead prefetcher for dataset streaming (SURVEY.md
section 7, "host-side image streaming"), and Y8I stereo deinterlace /
capture (reference src/rgbd_standalone.cpp). The library is built on demand
with `make -C native` the first time it's needed; every entry point here
degrades gracefully (returns None / raises ImportError) when no C++
toolchain is available, and callers fall back to the PIL/cv2 path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_NAME = "libcvo_native.so"

_lib = None
_lib_lock = threading.Lock()
_load_failed = False


def _candidate_paths():
    env = os.environ.get("CVO_NATIVE_LIB")
    if env:
        yield env
    yield os.path.join(_NATIVE_DIR, _LIB_NAME)
    yield os.path.join(os.path.dirname(os.path.abspath(__file__)), _LIB_NAME)


def _try_build() -> Optional[str]:
    """Build the library with make if a toolchain and the sources exist."""
    makefile = os.path.join(_NATIVE_DIR, "Makefile")
    if not os.path.exists(makefile):
        return None
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"],
                       check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    path = os.path.join(_NATIVE_DIR, _LIB_NAME)
    return path if os.path.exists(path) else None


def _declare(lib) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.cvo_png_info.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int32),
                                 ctypes.POINTER(ctypes.c_int32)]
    lib.cvo_png_info.restype = ctypes.c_int
    lib.cvo_decode_png_gray.argtypes = [ctypes.c_char_p, u8p, ctypes.c_size_t]
    lib.cvo_decode_png_gray.restype = ctypes.c_int
    lib.cvo_decode_png_gray_mem.argtypes = [
        u8p, ctypes.c_size_t, u8p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.cvo_decode_png_gray_mem.restype = ctypes.c_int
    lib.cvo_prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32]
    lib.cvo_prefetcher_create.restype = ctypes.c_void_p
    lib.cvo_prefetcher_height.argtypes = [ctypes.c_void_p]
    lib.cvo_prefetcher_height.restype = ctypes.c_int32
    lib.cvo_prefetcher_width.argtypes = [ctypes.c_void_p]
    lib.cvo_prefetcher_width.restype = ctypes.c_int32
    lib.cvo_prefetcher_next.argtypes = [ctypes.c_void_p, u8p, ctypes.c_size_t]
    lib.cvo_prefetcher_next.restype = ctypes.c_int64
    lib.cvo_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    lib.cvo_prefetcher_destroy.restype = None
    lib.cvo_deinterlace_y8i.argtypes = [u8p, ctypes.c_int32, ctypes.c_int32,
                                        u8p, u8p]
    lib.cvo_deinterlace_y8i.restype = None
    lib.cvo_v4l2_open.argtypes = [ctypes.c_char_p, ctypes.c_int32,
                                  ctypes.c_int32, ctypes.c_int32]
    lib.cvo_v4l2_open.restype = ctypes.c_void_p
    lib.cvo_v4l2_grab.argtypes = [ctypes.c_void_p, u8p, u8p]
    lib.cvo_v4l2_grab.restype = ctypes.c_int
    lib.cvo_v4l2_close.argtypes = [ctypes.c_void_p]
    lib.cvo_v4l2_close.restype = None


def load_library(build: bool = True):
    """The loaded CDLL, or None when unavailable. Thread-safe, memoized."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed and not build:
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        for path in _candidate_paths():
            if os.path.exists(path):
                try:
                    lib = ctypes.CDLL(path)
                    _declare(lib)
                    _lib = lib
                    return _lib
                except OSError:
                    continue
        if build:
            path = _try_build()
            if path:
                try:
                    lib = ctypes.CDLL(path)
                    _declare(lib)
                    _lib = lib
                    return _lib
                except OSError:
                    pass
        _load_failed = True
        return None


def available(build: bool = True) -> bool:
    return load_library(build=build) is not None


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_png_gray(path: str) -> np.ndarray:
    """Decode one PNG to (H, W) uint8 grayscale via the native decoder."""
    lib = load_library()
    if lib is None:
        raise ImportError("native runtime unavailable")
    h, w = ctypes.c_int32(), ctypes.c_int32()
    rc = lib.cvo_png_info(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise OSError(-rc, f"cvo_png_info failed on {path}")
    out = np.empty((h.value, w.value), np.uint8)
    rc = lib.cvo_decode_png_gray(path.encode(), _u8ptr(out), out.size)
    if rc != 0:
        raise OSError(-rc, f"cvo_decode_png_gray failed on {path}")
    return out


def deinterlace_y8i(interleaved: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(H, W) pairs from an (H, W, 2) or flat Y8I uint8 buffer."""
    lib = load_library()
    if lib is None:
        raise ImportError("native runtime unavailable")
    buf = np.ascontiguousarray(interleaved, np.uint8)
    if buf.ndim == 3 and buf.shape[-1] == 2:
        h, w = buf.shape[:2]
    else:
        raise ValueError("expected (H, W, 2) interleaved Y8I")
    left = np.empty((h, w), np.uint8)
    right = np.empty((h, w), np.uint8)
    lib.cvo_deinterlace_y8i(_u8ptr(buf), h, w, _u8ptr(left), _u8ptr(right))
    return left, right


class PrefetchingLoader:
    """In-order multithreaded PNG stream (native lookahead ring).

    Feeds KITTI-style sequences to the device pipeline without synchronous
    decode on the critical path. Iterating yields (frame_index, image).
    """

    def __init__(self, paths: Sequence[str], n_threads: int = 4,
                 capacity: int = 8):
        lib = load_library()
        if lib is None:
            raise ImportError("native runtime unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.cvo_prefetcher_create(
            arr, len(self._paths), n_threads, capacity)
        if not self._handle:
            raise OSError(f"prefetcher failed to open {paths[0]!r}")
        self.height = lib.cvo_prefetcher_height(self._handle)
        self.width = lib.cvo_prefetcher_width(self._handle)

    def next_frame(self) -> Optional[tuple[int, np.ndarray]]:
        out = np.empty((self.height, self.width), np.uint8)
        idx = self._lib.cvo_prefetcher_next(self._handle, _u8ptr(out),
                                            out.size)
        if idx == -1:
            return None
        if idx < 0:
            raise OSError(int(-idx), "native decode failed mid-sequence")
        return int(idx), out

    def __iter__(self):
        while True:
            item = self.next_frame()
            if item is None:
                return
            yield item

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.cvo_prefetcher_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeV4L2Camera:
    """Y8I stereo capture through the native V4L2 unit (reference
    src/rgbd_standalone.cpp semantics: /dev/video1, 640x480, 10 discards)."""

    def __init__(self, device: str = "/dev/video1", width: int = 640,
                 height: int = 480, discard: int = 10):
        lib = load_library()
        if lib is None:
            raise ImportError("native runtime unavailable")
        self._lib = lib
        self.width, self.height = width, height
        self._handle = lib.cvo_v4l2_open(device.encode(), width, height,
                                         discard)
        if not self._handle:
            raise OSError(f"cannot open V4L2 device {device}")

    def get_lr_frames(self) -> tuple[np.ndarray, np.ndarray]:
        left = np.empty((self.height, self.width), np.uint8)
        right = np.empty((self.height, self.width), np.uint8)
        rc = self._lib.cvo_v4l2_grab(self._handle, _u8ptr(left), _u8ptr(right))
        if rc != 0:
            raise OSError(-rc, "V4L2 grab failed")
        return left, right

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.cvo_v4l2_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
