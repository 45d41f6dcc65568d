"""Fixed-capacity masked feature state.

TPU-native replacement for the reference's FeatureSet
(``vector<Point2f> points; vector<int> ages`` — src/feature.h:33-43) whose
per-frame ``vector::erase`` mutation is hostile to XLA's static-shape model.

Design (SURVEY.md section 7): a fixed number of slots with a validity mask.
"Delete" = clear the mask bit; "append"/"replace" = masked writes. The slot
count equals the padded bucket-grid size, since bucketing (the stage that
bounds the live feature count in the reference, src/visualOdometry.cpp:106-108)
runs before tracking every frame.

This also fixes the reference's ages/points desync bug: ages are filtered by
exactly the same mask as points (reference loses sync at
src/visualOdometry.cpp:119-127, see SURVEY.md section 2 row 7).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class FeatureState(NamedTuple):
    """Per-sequence persistent tracked-feature store.

    points: (N, 2) float32 (x, y) in the current left image.
    ages:   (N,) int32 — frames survived (incremented on every successful
            circular match, reference src/feature.cpp:83-86).
    valid:  (N,) bool — slot liveness mask.
    ids:    (N,) int32 — persistent per-feature track id, carried as a
            feature moves between grid-cell slots across frames. The
            reference declares (and never uses) per-feature ids
            (FeaturePoint::id, src/feature.h:27-31); here they are
            load-bearing: multi-frame observation tracks for windowed
            bundle adjustment are keyed by id. -1 = dead slot.
    next_id: () int32 — allocation cursor for fresh detections.
    """

    points: jnp.ndarray
    ages: jnp.ndarray
    valid: jnp.ndarray
    ids: jnp.ndarray
    next_id: jnp.ndarray
    #: (N, 2) last frame-to-frame motion of the feature (l1 - l0 of its most
    #: recent circular match; 0 for fresh detections). Seeds the temporal LK
    #: legs' initial estimates (motion prior — beyond-reference, cuts the
    #: data-dependent iteration counts roughly in half on real motion).
    flow: jnp.ndarray
    #: (N, 2) last stereo offset (r1 - l1 of the most recent match; 0 for
    #: fresh detections). Seeds the stereo legs.
    disp: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.points.shape[-2]

    def count(self) -> jnp.ndarray:
        """Live feature count (reference FeatureSet::size())."""
        return jnp.sum(self.valid, axis=-1)


def empty_feature_state(capacity: int, batch: tuple = ()) -> FeatureState:
    return FeatureState(
        points=jnp.zeros(batch + (capacity, 2), jnp.float32),
        ages=jnp.zeros(batch + (capacity,), jnp.int32),
        valid=jnp.zeros(batch + (capacity,), bool),
        ids=jnp.full(batch + (capacity,), -1, jnp.int32),
        next_id=jnp.zeros(batch, jnp.int32),
        flow=jnp.zeros(batch + (capacity, 2), jnp.float32),
        disp=jnp.zeros(batch + (capacity, 2), jnp.float32),
    )
