import numpy as np
import jax.numpy as jnp
import pytest

from visual_odom_tpu.ops.lk import LKParams, prepare_lk_image, lk_track_pyramid
from visual_odom_tpu.ops.pyramid import pyr_down

from conftest import make_textured_image, warp_translate

cv2 = pytest.importorskip("cv2")


def test_pyr_down_matches_opencv():
    img = make_textured_image(96, 128, seed=7)
    ours = np.asarray(pyr_down(jnp.asarray(img)))
    theirs = cv2.pyrDown(img)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-3)


def _good_points(img_u8, n=40):
    pts = cv2.goodFeaturesToTrack(img_u8, n, 0.01, 10)
    return pts.reshape(-1, 2).astype(np.float32)


def test_lk_recovers_known_translation():
    img0 = make_textured_image(240, 320, seed=8)
    dx, dy = 3.7, -2.3
    img1 = warp_translate(img0, dx, dy)

    pts0 = _good_points(img0.astype(np.uint8))
    # Keep clear of the border where the warp clamps.
    keep = (
        (pts0[:, 0] > 40) & (pts0[:, 0] < 280) & (pts0[:, 1] > 40) & (pts0[:, 1] < 200)
    )
    pts0 = pts0[keep]
    assert len(pts0) >= 10

    p = LKParams()
    li = prepare_lk_image(jnp.asarray(img0), p)
    lj = prepare_lk_image(jnp.asarray(img1), p)
    pts1, status = lk_track_pyramid(
        li, lj, jnp.asarray(pts0), jnp.ones(len(pts0), bool), p
    )
    pts1, status = np.asarray(pts1), np.asarray(status)

    assert status.mean() > 0.8
    flow = pts1[status] - pts0[status]
    err = np.abs(flow - np.array([dx, dy]))
    assert np.median(err[:, 0]) < 0.1, np.median(err, axis=0)
    assert np.median(err[:, 1]) < 0.1, np.median(err, axis=0)


def test_lk_matches_opencv_positions():
    img0 = make_textured_image(240, 320, seed=9)
    img1 = warp_translate(img0, 2.4, 1.6)
    img0_u8 = img0.astype(np.uint8)
    img1_u8 = img1.astype(np.uint8)

    pts0 = _good_points(img0_u8)
    cv_pts1, cv_status, _ = cv2.calcOpticalFlowPyrLK(
        img0_u8,
        img1_u8,
        pts0.reshape(-1, 1, 2),
        None,
        winSize=(21, 21),
        maxLevel=3,
        criteria=(cv2.TERM_CRITERIA_COUNT + cv2.TERM_CRITERIA_EPS, 30, 0.01),
        minEigThreshold=0.001,
    )
    cv_pts1 = cv_pts1.reshape(-1, 2)
    cv_status = cv_status.reshape(-1).astype(bool)

    p = LKParams()
    li = prepare_lk_image(jnp.asarray(img0_u8.astype(np.float32)), p)
    lj = prepare_lk_image(jnp.asarray(img1_u8.astype(np.float32)), p)
    pts1, status = lk_track_pyramid(
        li, lj, jnp.asarray(pts0), jnp.ones(len(pts0), bool), p
    )
    pts1, status = np.asarray(pts1), np.asarray(status)

    both = status & cv_status
    assert both.sum() >= 10
    d = np.linalg.norm(pts1[both] - cv_pts1[both], axis=1)
    # Agreement with OpenCV to a fraction of a pixel for most points.
    assert np.median(d) < 0.15, np.median(d)
    assert (d < 1.0).mean() > 0.85, (d < 1.0).mean()


def test_lk_fails_on_flat_patch():
    img0 = np.full((100, 100), 100.0, np.float32)
    img0[40:60, 40:60] += make_textured_image(20, 20, seed=10) * 0.3
    img1 = img0.copy()
    p = LKParams()
    li = prepare_lk_image(jnp.asarray(img0), p)
    lj = prepare_lk_image(jnp.asarray(img1), p)
    # Point in the totally flat region: spectral gate must reject it.
    pts = jnp.asarray(np.array([[15.0, 15.0], [50.0, 50.0]], np.float32))
    _, status = lk_track_pyramid(li, lj, pts, jnp.ones(2, bool), p)
    status = np.asarray(status)
    assert not status[0]


def test_lk_masked_slots_passthrough():
    img = make_textured_image(120, 160, seed=11)
    p = LKParams()
    li = prepare_lk_image(jnp.asarray(img), p)
    pts = jnp.asarray(np.array([[30.0, 30.0], [999.0, 999.0]], np.float32))
    valid = jnp.asarray(np.array([True, False]))
    pts1, status = lk_track_pyramid(li, li, pts, valid, p)
    assert not bool(status[1])
    np.testing.assert_allclose(np.asarray(pts1)[1], [999.0, 999.0])


def test_padded_pyr_down_matches_unpadded_path():
    """The banded-matmul pyramid (padded_pyr_down) must reproduce
    _pad_reflect(pyr_down(level)) — blur, decimation, reflect band and
    alignment tail — to f32 matmul accuracy, for sizes exercising both
    odd/even extents and the alignment rules."""
    from visual_odom_tpu.ops.lk import _pad_reflect
    from visual_odom_tpu.ops.pyramid import padded_pyr_down

    rng = np.random.default_rng(3)
    pad = 24
    for h, w in [(96, 131), (37, 53), (376, 311)]:
        img = rng.uniform(0, 255, (h, w)).astype(np.float32)
        p = _pad_reflect(jnp.asarray(img), pad)
        ref = _pad_reflect(pyr_down(jnp.asarray(img)), pad)
        got = padded_pyr_down(p, h, w, pad)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-3)
