"""Keyframe abstraction.

The reference declares a `Frame` class (reference src/Frame.h:12-36: stereo
projection matrices, a world pose, matched stereo feature points, and
`triangulateFeaturePoints`) but never instantiates it from `main`. Here the
*useful* contract is implemented as an immutable pytree-friendly dataclass:
it is what the windowed-BA layer (visual_odom_tpu/ba) consumes as a keyframe
record, so unlike the reference's version it is actually load-bearing.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from visual_odom_tpu.core.triangulate import triangulate_points


@dataclass
class Frame:
    """One stereo frame: projection matrices, world pose, matched features.

    ``world_pose`` is the 4x4 camera->world transform (the reference splits
    it into m_worldRotation/m_worldTranslation, src/Frame.h:29).
    """

    frame_id: int
    proj_left: np.ndarray            # (3, 4)
    proj_right: np.ndarray           # (3, 4)
    world_pose: np.ndarray           # (4, 4)
    points_left: Optional[np.ndarray] = None   # (N, 2)
    points_right: Optional[np.ndarray] = None  # (N, 2)
    valid: Optional[np.ndarray] = field(default=None)  # (N,) bool

    def set_features(self, points_left: np.ndarray, points_right: np.ndarray,
                     valid: Optional[np.ndarray] = None) -> None:
        """Attach index-aligned stereo matches (Frame::setFeatures parity)."""
        self.points_left = np.asarray(points_left, np.float32)
        self.points_right = np.asarray(points_right, np.float32)
        self.valid = (np.ones(len(self.points_left), bool)
                      if valid is None else np.asarray(valid, bool))

    def triangulate_feature_points(self) -> np.ndarray:
        """Batched DLT triangulation of the attached stereo matches -> (N, 3)
        camera-frame points (Frame::triangulateFeaturePoints parity,
        reference src/Frame.cpp:25-28, returned euclidean not homogeneous)."""
        if self.points_left is None or self.points_right is None:
            raise ValueError("set_features() before triangulating")
        pts = triangulate_points(
            jnp.asarray(self.proj_left, jnp.float32),
            jnp.asarray(self.proj_right, jnp.float32),
            jnp.asarray(self.points_left),
            jnp.asarray(self.points_right),
        )
        return np.asarray(pts)

    def points_world(self) -> np.ndarray:
        """Triangulated points lifted into the world frame via world_pose."""
        pc = self.triangulate_feature_points()
        R, t = self.world_pose[:3, :3], self.world_pose[:3, 3]
        return pc @ R.T + t
