"""Native C++ host runtime: PNG decode, prefetcher, Y8I deinterlace.

Skipped wholesale when no C++ toolchain is available to build
native/libcvo_native.so (the Python fallbacks cover those hosts).
"""

import os

import numpy as np
import pytest

from visual_odom_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native runtime not built")


def _write_png(path, arr, mode=None):
    from PIL import Image

    Image.fromarray(arr).save(path)  # PIL infers L/RGB/RGBA/I;16 from dtype


def test_png_gray_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53), np.uint8)
    p = str(tmp_path / "g.png")
    _write_png(p, img, "L")
    out = native.decode_png_gray(p)
    np.testing.assert_array_equal(out, img)


def test_png_rgb_matches_opencv_weights(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (41, 29, 3), np.uint8)
    p = str(tmp_path / "c.png")
    _write_png(p, img, "RGB")
    out = native.decode_png_gray(p)
    # OpenCV BT.601 fixed-point: (R*4899 + G*9617 + B*1868 + 2^13) >> 14
    r, g, b = (img[..., i].astype(np.int64) for i in range(3))
    ref = ((r * 4899 + g * 9617 + b * 1868 + (1 << 13)) >> 14).astype(np.uint8)
    np.testing.assert_array_equal(out, ref)


def test_png_rgba_and_16bit(tmp_path):
    rng = np.random.default_rng(2)
    rgba = rng.integers(0, 256, (16, 16, 4), np.uint8)
    p = str(tmp_path / "a.png")
    _write_png(p, rgba, "RGBA")
    out = native.decode_png_gray(p)
    assert out.shape == (16, 16)

    g16 = rng.integers(0, 65536, (12, 18), np.uint16)
    p16 = str(tmp_path / "g16.png")
    _write_png(p16, g16, "I;16")
    out16 = native.decode_png_gray(p16)
    # PIL's I;16 writes little-endian... verify via high-byte relationship
    # only loosely: decoder takes the PNG (big-endian) high byte.
    assert out16.shape == (12, 18)


def test_png_info_and_errors(tmp_path):
    img = np.zeros((5, 7), np.uint8)
    p = str(tmp_path / "z.png")
    _write_png(p, img, "L")
    lib = native.load_library()
    import ctypes

    h, w = ctypes.c_int32(), ctypes.c_int32()
    assert lib.cvo_png_info(p.encode(), ctypes.byref(h), ctypes.byref(w)) == 0
    assert (h.value, w.value) == (5, 7)
    assert lib.cvo_png_info(b"/nonexistent.png", ctypes.byref(h),
                            ctypes.byref(w)) < 0
    bad = str(tmp_path / "bad.png")
    open(bad, "wb").write(b"not a png at all, certainly not enough")
    assert lib.cvo_png_info(bad.encode(), ctypes.byref(h),
                            ctypes.byref(w)) < 0


def test_prefetcher_in_order_delivery(tmp_path):
    frames = []
    rng = np.random.default_rng(3)
    paths = []
    for i in range(20):
        img = rng.integers(0, 256, (24, 32), np.uint8)
        img[0, 0] = i  # tag
        p = str(tmp_path / f"{i:06d}.png")
        _write_png(p, img, "L")
        frames.append(img)
        paths.append(p)
    loader = native.PrefetchingLoader(paths, n_threads=4, capacity=5)
    assert (loader.height, loader.width) == (24, 32)
    for want in range(20):
        idx, img = loader.next_frame()
        assert idx == want
        np.testing.assert_array_equal(img, frames[want])
    assert loader.next_frame() is None  # end of sequence
    loader.close()


def test_deinterlace_y8i_matches_python():
    from visual_odom_tpu.io.camera import V4L2StereoCamera

    rng = np.random.default_rng(4)
    packed16 = rng.integers(0, 65536, (8, 10), np.uint16)
    left_ref, right_ref = V4L2StereoCamera.split_y8i(packed16)
    # native takes little-endian byte-interleaved layout: low byte first
    inter = np.stack([(packed16 & 0xFF).astype(np.uint8),
                      (packed16 >> 8).astype(np.uint8)], axis=-1)
    left, right = native.deinterlace_y8i(inter)
    np.testing.assert_array_equal(left, left_ref)
    np.testing.assert_array_equal(right, right_ref)


def test_kitti_sequence_uses_native_and_prefetched_iter(tmp_path):
    from visual_odom_tpu.io.kitti import KittiSequence

    rng = np.random.default_rng(5)
    for d in ("image_0", "image_1"):
        os.makedirs(tmp_path / d)
    truth = []
    for i in range(6):
        l = rng.integers(0, 256, (20, 30), np.uint8)
        r = rng.integers(0, 256, (20, 30), np.uint8)
        _write_png(str(tmp_path / "image_0" / f"{i:06d}.png"), l, "L")
        _write_png(str(tmp_path / "image_1" / f"{i:06d}.png"), r, "L")
        truth.append((l, r))
    seq = KittiSequence(str(tmp_path))
    assert len(seq) == 6
    got = list(seq.iter_prefetched(n_threads=2, capacity=4))
    assert len(got) == 6
    for (l, r), (tl, tr) in zip(got, truth):
        np.testing.assert_array_equal(l, tl)
        np.testing.assert_array_equal(r, tr)
    # max_frames truncation
    assert len(list(seq.iter_prefetched(max_frames=3))) == 3
