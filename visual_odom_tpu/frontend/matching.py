"""Circular matching across the stereo image quad.

Reproduces the reference's frontend state machine (matchingFeatures,
src/visualOdometry.cpp:81-129 + circularMatching, src/feature.cpp:118-148):

    L(t0) -> R(t0) -> R(t1) -> L(t1) -> L(t0)_return

four chained LK legs, then one fused validity reduction combining

- the four LK statuses (deleteUnmatchFeaturesCircle, src/feature.cpp:76-116),
- the negative-coordinate rejections for L0/R0/R1/L1 (same function),
- the circular-closure check |L0_return - L0|_Chebyshev <= threshold
  (checkValidMatch with threshold 0, src/visualOdometry.cpp:44-61, 119-120),

and the age increment for every surviving feature (src/feature.cpp:83-86).
Unlike the reference, ages are filtered by exactly the same mask as points
(fixing the desync noted in SURVEY.md section 2 row 7).

All four legs run on the full fixed-capacity slot array under one jit; the
reference's erase-based compaction is replaced by mask updates.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from visual_odom_tpu.ops.lk import LKImage, LKParams, lk_track_pyramid
from visual_odom_tpu.frontend.featureset import FeatureState


class CircularMatchResult(NamedTuple):
    points_l0: jnp.ndarray      # (N, 2) — bucketed source points
    points_r0: jnp.ndarray
    points_r1: jnp.ndarray
    points_l1: jnp.ndarray
    points_l0_return: jnp.ndarray
    valid: jnp.ndarray          # (N,) — survived all checks
    ages: jnp.ndarray           # (N,) — incremented survivor ages
    ids: jnp.ndarray            # (N,) — persistent track ids (pass-through)
    next_id: jnp.ndarray        # () — allocation cursor (pass-through)


@partial(jax.jit, static_argnames=("params", "circle_threshold", "backend",
                                   "seeding", "seed_start_level"))
def circular_match(
    img_l0: LKImage,
    img_r0: LKImage,
    img_l1: LKImage,
    img_r1: LKImage,
    bucketed: FeatureState,
    params: LKParams = LKParams(),
    circle_threshold: float = 0.0,
    backend: str = "xla",
    seeding: bool = True,
    seed_start_level: int = None,
) -> CircularMatchResult:
    """Track the bucketed features around the quad and filter.

    The reference tracks every feature through all four legs regardless of
    intermediate status (statuses are only combined at the end,
    src/feature.cpp:136-144); we do the same so positions match.

    ``backend`` selects the LK engine: "pallas" (the Mosaic TPU kernel,
    ~8x faster on a v5e) or "xla" (portable vmapped while_loop). Both share
    numerics; tests assert parity.

    ``seeding`` enables motion-prior initialization: each leg's LK starts
    from the feature's previous flow/disparity (FeatureState.flow/.disp)
    instead of the identity, roughly halving the data-dependent iteration
    counts. Beyond-reference (OpenCV's OPTFLOW_USE_INITIAL_FLOW exists but
    the reference never passes it); the converged fixed point is the same
    minimum, and the closure check still validates every track.
    """
    pts_l0 = bucketed.points
    valid_in = bucketed.valid
    # Coarse-level skip is only sound when the priors actually seed the
    # legs (config.lk_seed_skip_levels; see ops/lk.py start_level).
    sl = seed_start_level if seeding else None

    if seeding:
        # Clamp the priors: a corrupted carry must degrade to a bad seed
        # (feature fails its checks), never an unbounded one.
        rows0, cols0 = img_l0.shapes[0]
        lim = jnp.asarray([cols0 / 4.0, rows0 / 4.0], jnp.float32)
        flow = jnp.clip(bucketed.flow, -lim, lim)
        disp = jnp.clip(bucketed.disp, -lim, lim)
    else:
        flow = jnp.zeros_like(pts_l0)
        disp = jnp.zeros_like(pts_l0)

    if backend == "pallas":
        # The whole quad runs as two fused 2-leg kernels (ops/lk_pallas.py
        # _legs_kernel): each keeps its 3 images' pyramids VMEM-resident,
        # no per-level dispatch. Numerically identical to the chained
        # per-leg calls.
        from visual_odom_tpu.ops.lk_pallas import lk_circular_quad_pallas

        pts_r0, pts_r1, pts_l1, pts_ret, legs_ok = lk_circular_quad_pallas(
            img_l0, img_r0, img_r1, img_l1, pts_l0, valid_in, params,
            flow=flow, disp=disp, start_level=sl)
    else:
        track = partial(lk_track_pyramid, params=params, start_level=sl)
        pts_r0, s0 = track(img_l0, img_r0, pts_l0, valid_in,
                           init_pts=pts_l0 + disp)
        pts_r1, s1 = track(img_r0, img_r1, pts_r0, valid_in,
                           init_pts=pts_r0 + flow)
        pts_l1, s2 = track(img_r1, img_l1, pts_r1, valid_in,
                           init_pts=pts_r1 - disp)
        pts_ret, s3 = track(img_l1, img_l0, pts_l1, valid_in,
                            init_pts=pts_l1 - flow)
        legs_ok = s0 & s1 & s2 & s3

    def nonneg(p):
        return (p[:, 0] >= 0) & (p[:, 1] >= 0)

    # deleteUnmatchFeaturesCircle (src/feature.cpp:96-99): all statuses and
    # the L0/R0/R1/L1 coordinates must be non-negative.
    track_ok = (
        legs_ok
        & nonneg(pts_l0) & nonneg(pts_r0) & nonneg(pts_r1) & nonneg(pts_l1)
    )

    # checkValidMatch (src/visualOdometry.cpp:44-61): Chebyshev round-trip
    # closure. The reference declares `int offset` (:46) so the float
    # distance TRUNCATES before the `> threshold` comparison — threshold 0
    # therefore means "round trip closes within 1 pixel", not exact
    # equality. We reproduce the truncation semantics bit-for-bit.
    offset = jnp.maximum(
        jnp.abs(pts_l0[:, 0] - pts_ret[:, 0]),
        jnp.abs(pts_l0[:, 1] - pts_ret[:, 1]),
    )
    closure_ok = jnp.floor(offset) <= circle_threshold

    valid = valid_in & track_ok & closure_ok
    # Ages increment for every feature entering the circular match
    # (src/feature.cpp:83-86); dead slots' ages are irrelevant (masked).
    ages = bucketed.ages + 1

    return CircularMatchResult(
        points_l0=pts_l0,
        points_r0=pts_r0,
        points_r1=pts_r1,
        points_l1=pts_l1,
        points_l0_return=pts_ret,
        valid=valid,
        ages=ages,
        ids=bucketed.ids,
        next_id=bucketed.next_id,
    )


def commit_tracked_state(result: CircularMatchResult) -> FeatureState:
    """New persistent state: survivors at their L(t1) positions
    (reference src/visualOdometry.cpp:127: currentVOFeatures.points = L_t1),
    with the measured flow (l1 - l0) and stereo offset (r1 - l1) carried as
    the next frame's motion priors."""
    v = result.valid[:, None]
    return FeatureState(
        points=result.points_l1,
        ages=result.ages,
        valid=result.valid,
        ids=result.ids,
        next_id=result.next_id,
        flow=jnp.where(v, result.points_l1 - result.points_l0, 0.0),
        disp=jnp.where(v, result.points_r1 - result.points_l1, 0.0),
    )


def skip_mode_match(img_l0, img_r0, img_l1, img_r1, bucketed, params,
                    config, backend):
    """Circular match under VOConfig's skip policy — the ONE entry point
    the sequential, scan, batched and pipelined front doors all share (so
    their outputs stay bitwise-comparable).

    "fixed": one quad at the configured safe level.

    "adaptive" (config.lk_skip_mode docstring — the self-verifying fast
    path): every frame runs the FAST quad (lk_fast_skip_levels skipped)
    plus a compact 64-slot PROBE tracked at the safe level; a frame whose
    probe disagrees (> lk_probe_px on > lk_probe_disagree_frac of
    comparable tracks, or too few comparable tracks to judge) re-tracks
    everything at the safe level inside lax.cond. Lattice aliasing on
    periodic texture shifts all four legs by the same period, so the
    circular-closure check cannot catch it — the safe-level probe can
    (TEXTURE_ABLATION_r05.json; thresholds validated on-chip: checker
    family green at safe-level quality, value-noise throughput ~169 FPS
    steady vs 152 fixed-safe / 205 unguarded-fast)."""
    import numpy as np

    sl_safe = (config.lk_levels - config.lk_seed_skip_levels
               if config.lk_seed_skip_levels else None)

    def match_at(feats, start_level):
        return circular_match(
            img_l0, img_r0, img_l1, img_r1, feats,
            params, config.circle_threshold, backend,
            seeding=config.predictive_seeding,
            seed_start_level=start_level)

    if not (config.lk_skip_mode == "adaptive"
            and config.predictive_seeding
            and config.lk_fast_skip_levels > config.lk_seed_skip_levels):
        return match_at(bucketed, sl_safe)

    sl_fast = config.lk_levels - config.lk_fast_skip_levels
    match_fast = match_at(bucketed, sl_fast)
    P = bucketed.points.shape[0]
    idx = np.arange(0, P, max(1, P // 64))[:64]
    probe_feats = jax.tree.map(
        lambda a: a[idx] if getattr(a, "ndim", 0) >= 1 else a, bucketed)
    probe = match_at(probe_feats, sl_safe)
    both = probe.valid & match_fast.valid[idx]
    d = jnp.max(jnp.abs(probe.points_l1 - match_fast.points_l1[idx]),
                axis=1)
    n_both = jnp.sum(both)
    n_bad = jnp.sum(both & (d > config.lk_probe_px))
    aliased = (n_bad > config.lk_probe_disagree_frac
               * jnp.maximum(1, n_both)) | (n_both < 8)
    return jax.lax.cond(
        aliased,
        lambda _: match_at(bucketed, sl_safe),
        lambda _: match_fast,
        operand=None)
