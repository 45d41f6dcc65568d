import numpy as np
import jax.numpy as jnp

from visual_odom_tpu.config import VOConfig
from visual_odom_tpu.frontend.bucketing import detect_and_bucket
from visual_odom_tpu.frontend.featureset import FeatureState, empty_feature_state

from conftest import make_textured_image

H, W = 120, 160
CFG = VOConfig.for_image(H, W)


def put_features(points, ages):
    st = empty_feature_state(CFG.padded_features)
    n = len(points)
    return FeatureState(
        points=st.points.at[:n].set(jnp.asarray(points, jnp.float32)),
        ages=st.ages.at[:n].set(jnp.asarray(ages, jnp.int32)),
        valid=st.valid.at[:n].set(True),
        ids=st.ids.at[:n].set(jnp.arange(n, dtype=jnp.int32)),
        next_id=jnp.int32(n),
    )


def test_empty_state_detects_corners():
    img = jnp.asarray(make_textured_image(H, W, seed=20))
    out = detect_and_bucket(img, empty_feature_state(CFG.padded_features), CFG)
    n = int(out.valid.sum())
    assert n > 20
    # at most one feature per cell, all with age 0
    assert int(out.ages[out.valid].max()) == 0
    pts = np.asarray(out.points)[np.asarray(out.valid)]
    bs = CFG.bucket_size
    cells = (pts[:, 1] // bs).astype(int) * CFG.grid_w + (pts[:, 0] // bs).astype(int)
    assert len(np.unique(cells)) == n


def test_tracked_feature_beats_fresh_corner():
    img = jnp.asarray(make_textured_image(H, W, seed=21))
    bs = CFG.bucket_size
    # one tracked feature in cell (2, 2)
    st = put_features([[2 * bs + 5.0, 2 * bs + 7.0]], [4])
    out = detect_and_bucket(img, st, CFG)
    cell = 2 * CFG.grid_w + 2
    assert bool(out.valid[cell])
    np.testing.assert_allclose(np.asarray(out.points[cell]), [2 * bs + 5, 2 * bs + 7])
    assert int(out.ages[cell]) == 4


def test_oldest_tracked_wins_cell():
    img = jnp.zeros((H, W))  # no corners
    bs = CFG.bucket_size
    st = put_features(
        [[bs + 2.0, bs + 2.0], [bs + 4.0, bs + 4.0], [bs + 6.0, bs + 6.0]],
        [2, 7, 5],
    )
    out = detect_and_bucket(img, st, CFG)
    cell = 1 * CFG.grid_w + 1
    assert bool(out.valid[cell])
    assert int(out.ages[cell]) == 7
    np.testing.assert_allclose(np.asarray(out.points[cell]), [bs + 4, bs + 4])
    # only that one winner in the whole grid
    assert int(out.valid.sum()) == 1


def test_age_cap_drops_old_features():
    img = jnp.zeros((H, W))
    bs = CFG.bucket_size
    st = put_features([[bs + 2.0, bs + 2.0]], [10])  # age >= 10 dropped
    out = detect_and_bucket(img, st, CFG)
    assert int(out.valid.sum()) == 0


def test_replenish_gate_blocks_detection_when_full():
    img = jnp.asarray(make_textured_image(H, W, seed=22))
    # Fill state with > replenish_below valid features (ages 1, spread out).
    cfg = VOConfig.for_image(H, W, replenish_below=4)
    bs = cfg.bucket_size
    pts = [[bs * (i % 3) + 3.0, bs * (i // 3) + 3.0] for i in range(6)]
    st = put_features(pts, [1] * 6)
    out = detect_and_bucket(img, st, cfg)
    # No fresh corners admitted: all outputs are the tracked features.
    assert int(out.ages[out.valid].min()) >= 1


def test_fixed_output_capacity():
    img = jnp.asarray(make_textured_image(H, W, seed=23))
    out = detect_and_bucket(img, empty_feature_state(CFG.padded_features), CFG)
    assert out.points.shape == (CFG.padded_features, 2)
    assert int(out.valid.sum()) <= CFG.num_buckets
