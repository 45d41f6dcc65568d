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

TPU-native formulation: the output is K = features_per_bucket winners per
grid cell, so detection + bucketing collapse into per-cell reductions —

- the FAST score map reshaped to (grid_h, bs, grid_w, bs) gives the best K
  *new* corners per cell as a per-cell top_k (pure VPU, no sparse
  compaction);
- the tracked features scatter-max into cells with key = (age, -slot), K
  rounds with winners retired between rounds, picking the K oldest tracked
  features per cell (the reference's intended replacement policy — its
  Bucket::add_feature comparison bug is fixed here, see src/bucket.cpp:29-39
  and SURVEY.md section 2 row 5);
- a cell's output slots hold its tracked features first, then fresh corners
  (the reference's arrival order: tracked precede detections).

The result is written densely: output slots [i*K, (i+1)*K) == grid cell i,
so there is no compaction step at all. Deviations from the reference (both
deliberate, SURVEY.md fidelity ledger): the aliased extra bucket row/col is
dropped, and among fresh corners in a cell the *strongest* (not
scan-order-first) win.
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
    K = config.features_per_bucket
    P = config.padded_features
    N = state.capacity

    # ---- best K fresh corners per cell (dense reduction, top_k per cell) --
    # Both detectors share the dense-map contract (score > 0 iff corner),
    # so the selector is a compile-time branch on the static config.
    if config.detector == "shi-tomasi":
        from visual_odom_tpu.ops.fast import shi_tomasi_corner_map

        score = shi_tomasi_corner_map(
            image_l0, quality_level=config.shi_tomasi_quality,
            min_distance=config.shi_tomasi_min_distance)
    else:
        score = fast_score_map(
            image_l0, threshold=config.fast_threshold,
            nonmax=config.fast_nonmax)
    cropped = score[: gh * bs, : gw * bs]
    cells = cropped.reshape(gh, bs, gw, bs).transpose(0, 2, 1, 3).reshape(G, bs * bs)
    # Per-cell top-K via K max/argmax rounds (NOT lax.top_k: that lowers to
    # a sort over the bs*bs axis, ~ms slower per frame on TPU; K rounds of
    # VPU reductions are cheap for the small K this knob takes).
    scores_k, offs_k = [], []
    remaining = cells
    for _ in range(K):
        s_best = jnp.max(remaining, axis=1)
        o_best = jnp.argmax(remaining, axis=1).astype(jnp.int32)
        scores_k.append(s_best)
        offs_k.append(o_best)
        if K > 1:
            remaining = remaining.at[jnp.arange(G), o_best].set(-jnp.inf)
    corner_score = jnp.stack(scores_k, axis=1)                  # (G, K)
    corner_off = jnp.stack(offs_k, axis=1)
    cell_ids = jnp.arange(G, dtype=jnp.int32)
    cy = cell_ids // gw
    cx = cell_ids % gw
    corner_x = (cx[:, None] * bs + corner_off % bs).astype(jnp.float32)
    corner_y = (cy[:, None] * bs + corner_off // bs).astype(jnp.float32)
    corner_pts = jnp.stack([corner_x, corner_y], axis=-1)       # (G, K, 2)
    # Replenish gate (reference src/visualOdometry.cpp:95): only add fresh
    # corners when the live count is below the threshold.
    replenish = state.count() < config.replenish_below
    corner_ok = (corner_score > 0) & replenish                  # (G, K)

    # ---- best K tracked features per cell (K scatter-max rounds) ----------
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
    key0 = state.ages * N + (N - 1 - slot)
    key = jnp.where(participating, key0, -1)
    tracked_slots = []
    tracked_oks = []
    for k in range(K):
        cell_best = jnp.full((G,), -1, jnp.int32).at[fcell].max(
            key, mode="drop")
        ok = cell_best >= 0
        best_slot = (N - 1 - (jnp.maximum(cell_best, 0) % N)).astype(jnp.int32)
        tracked_slots.append(best_slot)
        tracked_oks.append(ok)
        if k + 1 < K:
            # Retire this round's winners before the next round.
            won = ok[fcell] & (key == cell_best[fcell])
            key = jnp.where(won, -1, key)
    t_slot = jnp.stack(tracked_slots, axis=1)                   # (G, K)
    has_tracked = jnp.stack(tracked_oks, axis=1)                # (G, K)
    tracked_pts = state.points[t_slot]                          # (G, K, 2)
    tracked_ages = state.ages[t_slot]
    tracked_ids = state.ids[t_slot]
    tracked_flow = state.flow[t_slot]                           # (G, K, 2)
    tracked_disp = state.disp[t_slot]

    # ---- combine: tracked features first, corners fill the remainder ------
    # (reference arrival order: tracked precede fresh detections,
    # src/visualOdometry.cpp:95-108 + src/feature.cpp:206-253.)
    n_tracked = jnp.sum(has_tracked, axis=1)                    # (G,)
    j = jnp.arange(K, dtype=jnp.int32)[None, :]                 # (1, K)
    take_tracked = j < n_tracked[:, None]                       # (G, K)
    c_idx = jnp.clip(j - n_tracked[:, None], 0, K - 1)          # (G, K)
    c_pts = jnp.take_along_axis(corner_pts, c_idx[..., None], axis=1)
    c_ok = jnp.take_along_axis(corner_ok, c_idx, axis=1) & (j >= n_tracked[:, None])

    out_pts = jnp.where(take_tracked[..., None], tracked_pts, c_pts)
    out_ages = jnp.where(take_tracked, tracked_ages, 0)
    out_valid = take_tracked | c_ok

    # Motion priors ride with their feature. Fresh corners inherit a
    # NEIGHBOR prior: tracked flows/disparities scatter-mean into the
    # bucket grid and propagate into empty cells (optical flow and
    # disparity are locally smooth), so a fresh corner's LK starts near
    # its neighborhood's motion instead of the identity. This matters for
    # throughput: the LK kernel interleaves features in groups that run
    # until the SLOWEST member converges — one unseeded fresh corner would
    # stall its whole group at full iteration count.
    fweight = participating.astype(jnp.float32)
    cnt = jnp.zeros((G,), jnp.float32).at[fcell].add(fweight, mode="drop")
    fsum = jnp.zeros((G, 2), jnp.float32).at[fcell].add(
        state.flow * fweight[:, None], mode="drop")
    dsum = jnp.zeros((G, 2), jnp.float32).at[fcell].add(
        state.disp * fweight[:, None], mode="drop")
    denom = jnp.maximum(cnt, 1.0)[:, None]
    cell_flow = (fsum / denom).reshape(gh, gw, 2)
    cell_disp = (dsum / denom).reshape(gh, gw, 2)
    have = (cnt > 0).reshape(gh, gw)
    for _ in range(4):  # fill holes from 3x3 neighborhoods, 4 rings deep
        hf = have[..., None].astype(jnp.float32)
        ncnt = jax.lax.reduce_window(hf[..., 0], 0.0, jax.lax.add,
                                     (3, 3), (1, 1), "SAME")
        nflow = jnp.stack([
            jax.lax.reduce_window(cell_flow[..., c] * hf[..., 0], 0.0,
                                  jax.lax.add, (3, 3), (1, 1), "SAME")
            for c in range(2)], axis=-1)
        ndisp = jnp.stack([
            jax.lax.reduce_window(cell_disp[..., c] * hf[..., 0], 0.0,
                                  jax.lax.add, (3, 3), (1, 1), "SAME")
            for c in range(2)], axis=-1)
        fill = (~have) & (ncnt > 0)
        nd = jnp.maximum(ncnt, 1.0)[..., None]
        cell_flow = jnp.where(fill[..., None], nflow / nd, cell_flow)
        cell_disp = jnp.where(fill[..., None], ndisp / nd, cell_disp)
        have = have | fill
    corner_flow = cell_flow.reshape(G, 2)[:, None, :]       # (G, 1, 2)
    corner_disp = cell_disp.reshape(G, 2)[:, None, :]
    out_flow = jnp.where(take_tracked[..., None], tracked_flow,
                         jnp.broadcast_to(corner_flow, tracked_flow.shape))
    out_disp = jnp.where(take_tracked[..., None], tracked_disp,
                         jnp.broadcast_to(corner_disp, tracked_disp.shape))
    # Fresh corners draw ids from the allocation cursor; (cell, slot)
    # offsets keep them unique within the frame (gaps are fine).
    fresh_ids = state.next_id + cell_ids[:, None] * K + j
    out_ids = jnp.where(take_tracked, tracked_ids,
                        jnp.where(c_ok, fresh_ids, -1))

    GK = G * K
    pad = P - GK
    return FeatureState(
        points=jnp.pad(out_pts.reshape(GK, 2), ((0, pad), (0, 0))),
        ages=jnp.pad(out_ages.reshape(GK), ((0, pad),)),
        valid=jnp.pad(out_valid.reshape(GK), ((0, pad),)),
        ids=jnp.pad(out_ids.reshape(GK), ((0, pad),), constant_values=-1),
        next_id=state.next_id + GK,
        flow=jnp.pad(out_flow.reshape(GK, 2), ((0, pad), (0, 0))),
        disp=jnp.pad(out_disp.reshape(GK, 2), ((0, pad), (0, 0))),
    )
