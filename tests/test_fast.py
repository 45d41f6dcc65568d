import numpy as np
import jax.numpy as jnp
import pytest

from visual_odom_tpu.ops.fast import fast_score_map, fast_corners

from conftest import make_textured_image

cv2 = pytest.importorskip("cv2")


def cv_fast_points(img_u8, threshold=20, nonmax=True):
    det = cv2.FastFeatureDetector_create(
        threshold=threshold, nonmaxSuppression=nonmax
    )
    kps = det.detect(img_u8)
    return {(int(k.pt[0]), int(k.pt[1])) for k in kps}, kps


def test_fast_matches_opencv_detections():
    img = make_textured_image(120, 160, seed=3)
    img_u8 = img.astype(np.uint8)
    cv_set, _ = cv_fast_points(img_u8)

    score = np.asarray(fast_score_map(jnp.asarray(img_u8), threshold=20, nonmax=True))
    ours = {(x, y) for y, x in zip(*np.nonzero(score > 0))}

    # Allow small disagreement from NMS tie-breaking at equal scores.
    inter = len(cv_set & ours)
    union = max(len(cv_set | ours), 1)
    assert len(cv_set) > 10, "test image should contain corners"
    assert inter / union > 0.9, (len(cv_set), len(ours), inter)


def test_fast_scores_match_opencv_response():
    img = make_textured_image(120, 160, seed=4)
    img_u8 = img.astype(np.uint8)
    _, kps = cv_fast_points(img_u8)
    score = np.asarray(fast_score_map(jnp.asarray(img_u8), threshold=20, nonmax=True))
    checked = 0
    for k in kps:
        x, y = int(k.pt[0]), int(k.pt[1])
        if score[y, x] > 0:
            assert abs(score[y, x] - k.response) <= 1.0, (x, y, score[y, x], k.response)
            checked += 1
    assert checked >= 5


def test_fast_no_corners_on_flat_image():
    img = jnp.full((120, 160), 128, dtype=jnp.uint8)
    score = np.asarray(fast_score_map(img))
    assert (score == 0).all()


def test_fast_corners_sparse_api():
    img = make_textured_image(120, 160, seed=5)
    pts, scores, valid = fast_corners(jnp.asarray(img.astype(np.uint8)), max_corners=256)
    pts, scores, valid = map(np.asarray, (pts, scores, valid))
    n = valid.sum()
    assert n > 0
    # Scores descending; valid entries first.
    assert (np.diff(scores[: int(n)]) <= 0).all()
    assert valid[: int(n)].all()


def test_shi_tomasi_corner_map_contract():
    """Dense Shi-Tomasi map shares fast_score_map's contract: > 0 exactly at
    accepted corners, peaks isolated by min_distance."""
    import numpy as np
    import jax.numpy as jnp

    from visual_odom_tpu.ops.fast import (
        good_features_to_track,
        shi_tomasi_corner_map,
    )

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    dense = np.asarray(shi_tomasi_corner_map(jnp.asarray(img)))
    assert dense.shape == (64, 96)
    ys, xs = np.nonzero(dense > 0)
    assert len(ys) > 5
    # Dense peaks == the sparse API's accepted corners (same semantics).
    pts, scores, valid = good_features_to_track(jnp.asarray(img))
    sparse = set((int(y), int(x)) for (x, y), v in
                 zip(np.asarray(pts), np.asarray(valid)) if v)
    assert set(zip(ys.tolist(), xs.tolist())) == sparse
