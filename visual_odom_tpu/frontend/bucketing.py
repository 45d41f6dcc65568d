"""Fused FAST detection + spatial bucketing.

Reference behavior being reproduced (in one dense pass):

1. appendNewFeatures: detect FAST corners on L(t0) and append them (age 0)
   when the live count is below 2000 (src/visualOdometry.cpp:95-101,
   src/feature.cpp:255-262).
2. bucketingFeatures: grid of (rows/bucket_size) x (cols/bucket_size) cells,
   keep <= features_per_bucket per cell, never keep age >= 10
   (src/feature.cpp:206-253, src/bucket.cpp:14-45). Earlier-arriving
   features win a cell; tracked features precede new detections in arrival
   order, so the effective policy is "tracked feature beats fresh corner".

TPU-native formulation: because the output is exactly one winner per grid
cell, detection + bucketing collapse into per-cell reductions —

- the FAST score map reshaped to (grid_h, bs, grid_w, bs) gives the best
  *new* corner per cell as a max-pool + argmax (pure VPU, no sparse top-k);
- the <=512 tracked features scatter-max into cells with key = (age, -slot),
  picking the oldest tracked feature per cell (the reference's intended
  replacement policy — its Bucket::add_feature comparison bug is fixed here,
  see src/bucket.cpp:29-39 and SURVEY.md section 2 row 5);
- a cell's winner is the tracked feature if one exists, else the corner.

The result is written densely: output slot i == grid cell i, so there is no
compaction step at all. Deviations from the reference (both deliberate,
SURVEY.md fidelity ledger): the aliased extra bucket row/col is dropped, and
among fresh corners in a cell the *strongest* (not scan-order-first) wins.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from visual_odom_tpu.config import VOConfig
from visual_odom_tpu.frontend.featureset import FeatureState
from visual_odom_tpu.ops.fast import fast_score_map


@partial(jax.jit, static_argnames=("config",))
def detect_and_bucket(
    image_l0: jnp.ndarray,
    state: FeatureState,
    config: VOConfig,
) -> FeatureState:
    """One bucketed feature per grid cell, from tracked state + fresh FAST.

    Args:
      image_l0: (H, W) grayscale left image at t0 (float32 0..255).
      state: current FeatureState with positions in image_l0 coordinates.
      config: static pipeline config.

    Returns:
      FeatureState of capacity config.padded_features where slot i holds the
      winner of grid cell i (or is invalid if the cell is empty).
    """
    bs = config.bucket_size
    gh, gw = config.grid_h, config.grid_w
    G = gh * gw
    P = config.padded_features
    N = state.capacity

    # ---- best fresh corner per cell (dense reduction over the score map) --
    score = fast_score_map(
        image_l0, threshold=config.fast_threshold, nonmax=config.fast_nonmax
    )
    cropped = score[: gh * bs, : gw * bs]
    cells = cropped.reshape(gh, bs, gw, bs).transpose(0, 2, 1, 3).reshape(G, bs * bs)
    corner_score = jnp.max(cells, axis=1)                      # (G,)
    corner_off = jnp.argmax(cells, axis=1).astype(jnp.int32)   # (G,)
    cell_ids = jnp.arange(G, dtype=jnp.int32)
    cy = cell_ids // gw
    cx = cell_ids % gw
    corner_x = (cx * bs + corner_off % bs).astype(jnp.float32)
    corner_y = (cy * bs + corner_off // bs).astype(jnp.float32)
    # Replenish gate (reference src/visualOdometry.cpp:95): only add fresh
    # corners when the live count is below the threshold.
    replenish = state.count() < config.replenish_below
    has_corner = (corner_score > 0) & replenish

    # ---- best tracked feature per cell (scatter-max over <= N features) ---
    fx = state.points[:, 0]
    fy = state.points[:, 1]
    fcx = jnp.clip((fx / bs).astype(jnp.int32), 0, gw - 1)
    fcy = jnp.clip((fy / bs).astype(jnp.int32), 0, gh - 1)
    fcell = fcy * gw + fcx
    age_ok = state.ages < config.age_threshold  # reference src/bucket.cpp:16
    participating = state.valid & age_ok
    # Pack (age, slot) into one int key: older wins, lower slot breaks ties
    # (arrival order, matching the reference's first-come insertion).
    slot = jnp.arange(N, dtype=jnp.int32)
    key = state.ages * N + (N - 1 - slot)
    key = jnp.where(participating, key, -1)
    cell_best = jnp.full((G,), -1, jnp.int32).at[fcell].max(key, mode="drop")
    has_tracked = cell_best >= 0
    best_slot = (N - 1 - (jnp.maximum(cell_best, 0) % N)).astype(jnp.int32)
    tracked_pts = state.points[best_slot]          # (G, 2)
    tracked_ages = state.ages[best_slot]
    tracked_ids = state.ids[best_slot]

    # ---- combine: tracked feature beats fresh corner ----------------------
    out_pts = jnp.where(
        has_tracked[:, None],
        tracked_pts,
        jnp.stack([corner_x, corner_y], axis=-1),
    )
    out_ages = jnp.where(has_tracked, tracked_ages, 0)
    out_valid = has_tracked | has_corner
    # Fresh corners draw ids from the allocation cursor; cell offsets keep
    # them unique within the frame (gaps for tracked-won cells are fine).
    fresh_ids = state.next_id + cell_ids
    out_ids = jnp.where(has_tracked, tracked_ids,
                        jnp.where(has_corner, fresh_ids, -1))

    pad = P - G
    return FeatureState(
        points=jnp.pad(out_pts, ((0, pad), (0, 0))),
        ages=jnp.pad(out_ages, ((0, pad),)),
        valid=jnp.pad(out_valid, ((0, pad),)),
        ids=jnp.pad(out_ids, ((0, pad),), constant_values=-1),
        next_id=state.next_id + G,
    )
