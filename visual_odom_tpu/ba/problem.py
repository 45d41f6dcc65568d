"""Windowed bundle-adjustment problem structure.

The reference is strictly frame-to-frame (no BA of any kind — SURVEY.md
section 5 "long-context"); windowed BA is the mandated beyond-reference
extension (BASELINE.json north star). The TPU formulation is dense and
masked:

- W keyframe poses (axis-angle + translation, 6 params each; pose 0 is
  gauged fixed),
- L landmarks (3 params each),
- a dense (W, L) observation grid of stereo measurements (u_left, v_left,
  u_right) with a validity mask — real tracks fill only part of the grid,
  but the dense layout is exactly what vectorizes: every Jacobian block is
  one batched einsum, and the landmark axis shards cleanly across devices
  (parallel/sharded_ba.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from visual_odom_tpu.core.lie import rodrigues


class BAProblem(NamedTuple):
    poses: jnp.ndarray         # (W, 6) [rvec|tvec], world -> camera
    landmarks: jnp.ndarray     # (L, 3) world coordinates
    observations: jnp.ndarray  # (W, L, 3) (u_l, v_l, u_r)
    mask: jnp.ndarray          # (W, L) bool
    fx: float
    fy: float
    cx: float
    cy: float
    bf: float                  # P_right[0, 3] = -fx * baseline


def project_stereo(pose6: jnp.ndarray, X: jnp.ndarray, intr) -> jnp.ndarray:
    """Stereo projection of (..., 3) points under one pose6: returns
    (..., 3) = (u_l, v_l, u_r). u_r = u_l + bf/z (rectified pair)."""
    fx, fy, cx, cy, bf = intr
    R = rodrigues(pose6[:3])
    p = jnp.matmul(X, R.T, precision=jax.lax.Precision.HIGHEST) + pose6[3:]
    z = jnp.where(jnp.abs(p[..., 2:3]) < 1e-9, 1e-9, p[..., 2:3])
    u_l = p[..., 0:1] / z * fx + cx
    v_l = p[..., 1:2] / z * fy + cy
    u_r = u_l + bf / z
    return jnp.concatenate([u_l, v_l, u_r], axis=-1)


def residuals(problem: BAProblem) -> jnp.ndarray:
    """(W, L, 3) masked reprojection residuals."""
    intr = (problem.fx, problem.fy, problem.cx, problem.cy, problem.bf)
    pred = jax.vmap(lambda p: project_stereo(p, problem.landmarks, intr))(
        problem.poses
    )
    r = pred - problem.observations
    return jnp.where(problem.mask[..., None], r, 0.0)


def total_cost(problem: BAProblem) -> jnp.ndarray:
    r = residuals(problem)
    return 0.5 * jnp.sum(r * r)


def synthetic_ba_problem(
    num_poses: int = 6,
    num_landmarks: int = 64,
    pixel_noise: float = 0.25,
    pose_perturb: float = 0.02,
    landmark_perturb: float = 0.1,
    seed: int = 0,
    fx: float = 718.856,
    fy: float = 718.856,
    cx: float = 607.19,
    cy: float = 185.21,
    bf: float = -386.1448,
    obs_window: int | None = None,
):
    """Ground-truth BA problem + perturbed initialization (for tests).

    ``obs_window`` localizes observations the way real VO tracks are: each
    landmark is assigned an anchor keyframe and observed only by poses
    within +-obs_window of it (track length <= 2*obs_window + 1). None =
    every pose observes every landmark (dense grid).

    Returns (problem_init, poses_gt (W, 6), landmarks_gt (L, 3)).
    """
    rng = np.random.default_rng(seed)
    poses_gt = np.zeros((num_poses, 6))
    poses_gt[:, 5] = -0.8 * np.arange(num_poses)  # camera advancing in +z world
    poses_gt[:, :3] = rng.normal(0, 0.01, (num_poses, 3))

    landmarks_gt = np.stack(
        [
            rng.uniform(-15, 15, num_landmarks),
            rng.uniform(-4, 4, num_landmarks),
            rng.uniform(8, 50, num_landmarks) + 0.8 * num_poses,
        ],
        axis=1,
    )

    intr = (fx, fy, cx, cy, bf)
    obs = np.asarray(
        jax.vmap(
            lambda p: project_stereo(jnp.asarray(p), jnp.asarray(landmarks_gt), intr)
        )(jnp.asarray(poses_gt))
    )
    obs = obs + rng.normal(0, pixel_noise, obs.shape)
    if obs_window is None:
        mask = np.ones((num_poses, num_landmarks), bool)
    else:
        anchor_kf = rng.integers(0, num_poses, num_landmarks)      # (L,)
        dist = np.abs(np.arange(num_poses)[:, None] - anchor_kf[None, :])
        mask = dist <= obs_window

    poses_init = poses_gt + rng.normal(0, pose_perturb, poses_gt.shape)
    poses_init[0] = poses_gt[0]  # gauge
    landmarks_init = landmarks_gt + rng.normal(0, landmark_perturb,
                                               landmarks_gt.shape)

    problem = BAProblem(
        poses=jnp.asarray(poses_init, jnp.float32),
        landmarks=jnp.asarray(landmarks_init, jnp.float32),
        observations=jnp.asarray(obs, jnp.float32),
        mask=jnp.asarray(mask),
        fx=fx, fy=fy, cx=cx, cy=cy, bf=bf,
    )
    return problem, poses_gt, landmarks_gt
