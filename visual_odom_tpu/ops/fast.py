"""FAST-9/16 corner detection + Shi-Tomasi alternative, as dense score maps.

TPU-native equivalent of cv::FAST(threshold=20, nonmaxSuppression=true)
(reference src/feature.cpp:39-47) and cv::goodFeaturesToTrack
(reference src/feature.cpp:49-62, unused in the reference's main path but part
of its API surface).

Design note: the reference materializes a sparse keypoint vector and then
buckets it (src/feature.cpp:206-253). On TPU we keep the detector DENSE — a
(H, W) score map with zeros at non-corners — because the downstream consumer
(per-bucket best-feature selection, frontend/bucketing.py) is a per-cell
reduction over this map. No sparse top-k, no dynamic shapes, pure VPU work.

The segment test: a pixel is FAST-9/16 corner iff >= 9 contiguous pixels of
its 16-pixel Bresenham circle are all brighter than p + t or all darker than
p - t. The score is OpenCV's cornerScore: (max over circular 9-windows of the
min absolute margin) - 1, i.e. the largest threshold at which the pixel is
still a corner.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3, OpenCV pixel order (clockwise from top).
_CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3),
        (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)
_ARC = 9  # contiguous run length for FAST-9/16
_BORDER = 3


def _shifted(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """img shifted so out[y, x] = img[y + dy, x + dx], edge-replicated.

    Border pixels are masked out of the result anyway, so the replication
    mode is irrelevant to correctness.
    """
    H, W = img.shape
    padded = jnp.pad(img, ((_BORDER, _BORDER), (_BORDER, _BORDER)), mode="edge")
    return jax.lax.dynamic_slice(padded, (_BORDER + dy, _BORDER + dx), (H, W))


@partial(jax.jit, static_argnames=("threshold", "nonmax"))
def fast_score_map(
    img: jnp.ndarray, threshold: int = 20, nonmax: bool = True
) -> jnp.ndarray:
    """Dense FAST-9/16 corner score map.

    Args:
      img: (H, W) grayscale, any float/int dtype, 0..255 range.
      threshold: FAST threshold t (reference uses 20, src/feature.cpp:43).
      nonmax: 3x3 non-maximum suppression (reference uses true).

    Returns:
      (H, W) float32 map; score > 0 exactly at detected corners, 0 elsewhere.
    """
    x = img.astype(jnp.float32)
    H, W = x.shape

    # d[i] = circle_pixel_i - center, for the 16 circle offsets.
    d = jnp.stack([_shifted(x, int(dy), int(dx)) for dy, dx in _CIRCLE]) - x[None]

    t = jnp.float32(threshold)
    # Circular windows of length 9: concatenate first 8 entries.
    d_wrap = jnp.concatenate([d, d[: _ARC - 1]], axis=0)  # (24, H, W)

    # For each of 16 window starts, min over the 9-window of d (bright margin)
    # and of -d (dark margin). A windowed-min over a static axis of 24 is a
    # small unrolled reduction — XLA fuses it entirely.
    bright_min = []
    dark_min = []
    for s in range(16):
        seg = jax.lax.dynamic_slice_in_dim(d_wrap, s, _ARC, axis=0)
        bright_min.append(jnp.min(seg, axis=0))
        dark_min.append(jnp.min(-seg, axis=0))
    v_bright = jnp.max(jnp.stack(bright_min), axis=0)  # max over starts
    v_dark = jnp.max(jnp.stack(dark_min), axis=0)

    is_corner = (v_bright > t) | (v_dark > t)
    # OpenCV cornerScore: largest threshold keeping the pixel a corner, -1.
    score = jnp.maximum(v_bright, v_dark) - 1.0
    score = jnp.where(is_corner, score, 0.0)

    # Mask the 3-pixel border (OpenCV processes rows/cols [3, n-3)).
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    in_bounds = (
        (row >= _BORDER) & (row < H - _BORDER) & (col >= _BORDER) & (col < W - _BORDER)
    )
    score = jnp.where(in_bounds, score, 0.0)

    if nonmax:
        # Keep pixels strictly greater than all 8 neighbors (OpenCV semantics).
        neighborhood = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                neighborhood.append(_shifted(score, dy, dx))
        nbr_max = jnp.max(jnp.stack(neighborhood), axis=0)
        score = jnp.where(score > nbr_max, score, 0.0)

    return score


def fast_corners(
    img: jnp.ndarray, threshold: int = 20, nonmax: bool = True, max_corners: int = 4096
):
    """Sparse corner list (x, y, score), fixed capacity, score-descending.

    Convenience wrapper over fast_score_map for tests and the standalone
    detector API (reference featureDetectionFast, src/feature.cpp:39-47).
    Returns (points (K, 2) float32 xy, scores (K,), valid (K,) bool).
    """
    score = fast_score_map(img, threshold=threshold, nonmax=nonmax)
    H, W = score.shape
    flat = score.reshape(-1)
    k = min(max_corners, flat.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat, k)
    ys = (top_idx // W).astype(jnp.float32)
    xs = (top_idx % W).astype(jnp.float32)
    valid = top_scores > 0
    pts = jnp.stack([xs, ys], axis=-1)
    return pts, top_scores, valid


# ---------------------------------------------------------------------------
# Shi-Tomasi (goodFeaturesToTrack) alternative detector
# ---------------------------------------------------------------------------

_SOBEL_SMOOTH = np.array([1.0, 2.0, 1.0], dtype=np.float32)
_SOBEL_DIFF = np.array([-1.0, 0.0, 1.0], dtype=np.float32)


@jax.jit
def shi_tomasi_score_map(img: jnp.ndarray, block_size: int = 3) -> jnp.ndarray:
    """Min-eigenvalue (Shi-Tomasi) response, as in cv::goodFeaturesToTrack
    (reference src/feature.cpp:53-61: blockSize=3, Sobel aperture 3)."""
    from visual_odom_tpu.ops.pyramid import _sep_filter2

    x = img.astype(jnp.float32)
    # OpenCV cornerMinEigenVal uses Sobel with scale factor for aperture 3.
    ix = _sep_filter2(x, _SOBEL_SMOOTH, _SOBEL_DIFF)
    iy = _sep_filter2(x, _SOBEL_DIFF, _SOBEL_SMOOTH)
    box = np.ones(block_size, dtype=np.float32)
    jxx = _sep_filter2(ix * ix, box, box)
    jyy = _sep_filter2(iy * iy, box, box)
    jxy = _sep_filter2(ix * iy, box, box)
    # min eig of [[jxx, jxy], [jxy, jyy]] / 2 semantics (OpenCV divides by 2).
    tr = 0.5 * (jxx + jyy)
    det_root = jnp.sqrt(jnp.maximum(0.25 * (jxx - jyy) ** 2 + jxy * jxy, 0.0))
    return tr - det_root


@partial(jax.jit, static_argnames=("quality_level", "min_distance"))
def shi_tomasi_corner_map(
    img: jnp.ndarray,
    quality_level: float = 0.01,
    min_distance: float = 5.0,
) -> jnp.ndarray:
    """Dense corner map with goodFeaturesToTrack semantics: (H, W) float32,
    score > 0 exactly at accepted corners, 0 elsewhere — the same contract
    as fast_score_map, so frontend/bucketing.detect_and_bucket can consume
    either detector unchanged (reference featureDetectionGoodFeaturesToTrack,
    src/feature.cpp:49-62: maxCorners=5000, qualityLevel=0.01,
    minDistance=5; the per-cell bucketing downstream enforces a stronger
    spatial cap than maxCorners ever would).

    Approximation vs OpenCV: min-distance suppression is a (2r+1)^2
    square-window nonmax with ``score >= pooled``, not OpenCV's greedy
    Euclidean walk — members of an exactly-tied plateau inside one window
    all survive here. Downstream per-cell top-K bucketing bounds the
    practical impact to the tie set within one cell."""
    score = shi_tomasi_score_map(img)
    r = int(min_distance)
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (2 * r + 1, 2 * r + 1), (1, 1), "SAME"
    )
    is_peak = (score >= pooled) & (score > quality_level * jnp.max(score))
    return jnp.where(is_peak, score, 0.0)


def good_features_to_track(
    img: jnp.ndarray,
    max_corners: int = 5000,
    quality_level: float = 0.01,
    min_distance: float = 5.0,
):
    """Behavioral equivalent of cv::goodFeaturesToTrack (reference
    src/feature.cpp:49-62). Quality gate relative to the global max response;
    min-distance enforced by (2r+1)^2 spatial NMS rather than OpenCV's greedy
    grid walk (same spacing guarantee).

    Returns (points (K, 2) xy, scores (K,), valid (K,)).
    """
    score = shi_tomasi_score_map(img)
    r = int(min_distance)
    # NMS over a (2r+1) square via two-pass separable max-pool.
    pooled = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (2 * r + 1, 2 * r + 1), (1, 1), "SAME"
    )
    is_peak = (score >= pooled) & (score > quality_level * jnp.max(score))
    masked = jnp.where(is_peak, score, 0.0)
    H, W = masked.shape
    flat = masked.reshape(-1)
    k = min(max_corners, flat.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat, k)
    ys = (top_idx // W).astype(jnp.float32)
    xs = (top_idx % W).astype(jnp.float32)
    return jnp.stack([xs, ys], axis=-1), top_scores, top_scores > 0
