"""Vectorized PnP-RANSAC with Gauss-Newton/Levenberg-Marquardt refinement.

TPU-native equivalent of cv::solvePnPRansac(SOLVEPNP_ITERATIVE,
useExtrinsicGuess=true, iterationsCount=500, reprojectionError=0.5,
confidence=0.999) as invoked by the reference (src/visualOdometry.cpp:161-189):
estimate camera(t1) <- world(t0) from 3-D points at t0 and their 2-D
projections in L(t1), warm-started from the previous frame's solution.

Architecture (nothing like OpenCV's sequential hypothesis loop — this is the
jit-friendly formulation, SURVEY.md section 7 "hard parts" item 2):

- All `iterations` hypotheses run CONCURRENTLY as one batched computation:
  each draws a minimal sample (uniform without replacement via top-k of iid
  uniforms), runs a fixed number of damped Gauss-Newton steps from the warm
  start, then scores inliers over all N correspondences at the 0.5 px
  threshold. Batched 6x6 normal-equation solves vectorize perfectly.
- Reprojection Jacobians come from jax.jacfwd of the rendering residual —
  exact derivatives through Rodrigues, no hand-derived chain rule to get
  subtly wrong.
- The best hypothesis's pose is polished with more damped-GN iterations on
  its full inlier set (OpenCV refines on inliers the same way).
- Degenerate samples produce non-finite steps; they are masked to zero
  inliers rather than branching.

The `confidence` parameter is accepted for API parity but — by design — the
hypothesis count is static: OpenCV's early-exit adaptive iteration count is a
data-dependent loop bound that XLA cannot trace, and at 500 batched
hypotheses the all-at-once formulation is faster than any early exit.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from visual_odom_tpu.core.lie import rodrigues

_HI = jax.lax.Precision.HIGHEST


class PnPResult(NamedTuple):
    rvec: jnp.ndarray          # (3,) axis-angle, camera(t1) <- world(t0)
    tvec: jnp.ndarray          # (3,)
    inliers: jnp.ndarray       # (N,) bool
    num_inliers: jnp.ndarray   # () int32
    best_hypothesis: jnp.ndarray  # () int32 (diagnostic)


def _project(pose6: jnp.ndarray, X: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Project (N, 3) world points with pose6 = [rvec, tvec] through K."""
    R = rodrigues(pose6[:3])
    p = jnp.matmul(X, R.T, precision=_HI) + pose6[3:]
    z = jnp.where(jnp.abs(p[..., 2:3]) < 1e-9, 1e-9, p[..., 2:3])
    uv = p[..., :2] / z
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([uv[..., 0] * fx + cx, uv[..., 1] * fy + cy], axis=-1)


def _gn_refine(pose6, X, x_obs, w, K, iters: int, damping: float = 1e-3):
    """Weighted damped Gauss-Newton on the reprojection residual.

    X: (M, 3), x_obs: (M, 2), w: (M,) weights in [0, 1]. Fixed `iters` steps
    (no convergence branch — XLA-friendly, extra steps are no-ops at the
    optimum).
    """

    def residual(p6):
        r = (_project(p6, X, K) - x_obs) * w[:, None]
        return r.reshape(-1)

    def body(pose6, _):
        r = residual(pose6)
        J = jax.jacfwd(residual)(pose6)                       # (2M, 6)
        JtJ = jnp.matmul(J.T, J, precision=_HI)
        Jtr = jnp.matmul(J.T, r, precision=_HI)
        A = JtJ + damping * jnp.eye(6, dtype=pose6.dtype)
        step = jnp.linalg.solve(A, Jtr)
        new = pose6 - step
        ok = jnp.all(jnp.isfinite(new))
        return jnp.where(ok, new, pose6), None

    pose6, _ = jax.lax.scan(body, pose6, None, length=iters)
    return pose6


@partial(
    jax.jit,
    static_argnames=("iterations", "sample_size", "refine_iters"),
)
def pnp_ransac(
    points3d: jnp.ndarray,
    points2d: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    rvec0: jnp.ndarray,
    tvec0: jnp.ndarray,
    key: jnp.ndarray,
    iterations: int = 500,
    reproj_threshold: float = 0.5,
    sample_size: int = 6,
    refine_iters: int = 10,
) -> PnPResult:
    """Estimate the frame-to-frame pose from masked 3D-2D correspondences.

    Args:
      points3d: (N, 3) triangulated points in the t0 left-camera frame.
      points2d: (N, 2) matched pixels in L(t1).
      valid: (N,) bool correspondence mask.
      K: (3, 3) intrinsics (from P_left, reference src/visualOdometry.cpp:163).
      rvec0/tvec0: warm start (reference passes the previous frame's
        translation and a zero rvec, src/main.cpp:81-82 +
        src/visualOdometry.cpp:162).
      key: PRNG key for hypothesis sampling.

    Returns: PnPResult.
    """
    N = points3d.shape[0]
    pose0 = jnp.concatenate([rvec0, tvec0]).astype(jnp.float32)

    # --- minimal-sample draw: top-k of iid uniforms over valid slots -------
    u = jax.random.uniform(key, (iterations, N))
    u = jnp.where(valid[None, :], u, -1.0)
    _, sample_idx = jax.lax.top_k(u, sample_size)             # (H, k)
    sample_ok = jnp.take_along_axis(
        jnp.broadcast_to(valid[None, :], (iterations, N)), sample_idx, axis=1
    ).all(axis=1)

    X_s = points3d[sample_idx]                                 # (H, k, 3)
    x_s = points2d[sample_idx]                                 # (H, k, 2)
    w_s = jnp.ones((iterations, sample_size), jnp.float32)

    refine = jax.vmap(
        lambda X, x, w: _gn_refine(pose0, X, x, w, K, refine_iters)
    )
    poses = refine(X_s, x_s, w_s)                              # (H, 6)

    # --- score every hypothesis against all correspondences ----------------
    def score(pose6):
        proj = _project(pose6, points3d, K)
        err2 = jnp.sum((proj - points2d) ** 2, axis=-1)
        inl = (err2 < reproj_threshold * reproj_threshold) & valid
        return inl, jnp.sum(inl)

    inlier_masks, counts = jax.vmap(score)(poses)
    finite = jnp.all(jnp.isfinite(poses), axis=1) & sample_ok
    counts = jnp.where(finite, counts, 0)

    best = jnp.argmax(counts)
    best_pose = poses[best]
    best_inliers = inlier_masks[best]

    # --- final polish on the inlier set ------------------------------------
    w_ref = best_inliers.astype(jnp.float32)
    polished = _gn_refine(best_pose, points3d, points2d, w_ref, K,
                          refine_iters * 2)
    # Re-score with the polished pose (inlier set may grow slightly).
    final_inliers, final_count = score(polished)
    use_polished = jnp.all(jnp.isfinite(polished)) & (final_count >= counts[best])
    pose_out = jnp.where(use_polished, polished, best_pose)
    inl_out = jnp.where(use_polished, final_inliers, best_inliers)
    cnt_out = jnp.where(use_polished, final_count, counts[best])

    return PnPResult(
        rvec=pose_out[:3],
        tvec=pose_out[3:],
        inliers=inl_out,
        num_inliers=cnt_out.astype(jnp.int32),
        best_hypothesis=best.astype(jnp.int32),
    )
