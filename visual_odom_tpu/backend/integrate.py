"""Pose gating + trajectory integration.

Reproduces the reference's acceptance logic exactly:

- Euler gate: reject the frame update when any component of
  rotationMatrixToEulerAngles(R) has |angle| >= 0.1 rad
  (reference src/main.cpp:196-208).
- Scale gate: accept iff 0.05 < ||t|| < 10
  (integrateOdometryStereo, reference src/utils.cpp:71-84).
- Chaining: frame_pose = frame_pose @ T^-1 where T = [R|t; 0 1]
  (reference src/utils.cpp:78-84; the solved pose maps world(t0) ->
  camera(t1), so its inverse advances the world pose).

The device side (`gate_and_integrate`) returns T^-1 and the accept flag so
the host can chain poses in float64 (the reference chains in double;
float32 chaining would drift measurably over KITTI-length sequences). For
fully on-device batched evaluation, `pose_delta` also composes in-graph.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from visual_odom_tpu.core.lie import (
    rodrigues,
    rotation_to_euler,
    se3_inverse,
    se3_matrix,
)


class PoseGate(NamedTuple):
    T_inv: jnp.ndarray     # (4, 4) accepted rigid-body delta inverse
    accept: jnp.ndarray    # () bool — both gates passed
    scale: jnp.ndarray     # () ||t||
    euler: jnp.ndarray     # (3,) diagnostic


@jax.jit
def gate_and_integrate(rvec: jnp.ndarray, tvec: jnp.ndarray) -> PoseGate:
    """Apply both reference gates to a solved (rvec, t) frame delta."""
    R = rodrigues(rvec)
    euler = rotation_to_euler(R)
    rot_ok = jnp.all(jnp.abs(euler) < 0.1)          # src/main.cpp:201
    scale = jnp.sqrt(jnp.sum(tvec * tvec))
    scale_ok = (scale > 0.05) & (scale < 10.0)      # src/utils.cpp:80
    T = se3_matrix(R, tvec)
    return PoseGate(
        T_inv=se3_inverse(T),
        accept=rot_ok & scale_ok,
        scale=scale,
        euler=euler,
    )


@jax.jit
def pose_delta(frame_pose: jnp.ndarray, gate: PoseGate) -> jnp.ndarray:
    """In-graph chaining for batched/on-device eval: pose @ T^-1 if accepted."""
    new = jnp.matmul(frame_pose, gate.T_inv, precision=jax.lax.Precision.HIGHEST)
    return jnp.where(gate.accept, new, frame_pose)


def integrate_pose_host(
    frame_pose: np.ndarray, T_inv: np.ndarray, accept: bool
) -> np.ndarray:
    """Float64 host-side chaining (matches the reference's double-precision
    cv::Mat arithmetic, src/main.cpp:87 + src/utils.cpp:84)."""
    if accept:
        return frame_pose @ np.asarray(T_inv, dtype=np.float64)
    return frame_pose
