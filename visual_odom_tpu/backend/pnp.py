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
from visual_odom_tpu.core.linalg import solve_spd

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

    Parametrization: SE(3) left-perturbation (R <- exp(dw) R, t <- t + dt)
    with closed-form Jacobians — dp/ddw = -[p - t]_x, dp/ddt = I — instead
    of autodiff through Rodrigues: all elementwise math plus one batched
    6x6 solve per iteration, which is what vectorizes over hundreds of
    RANSAC hypotheses on the MXU.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    def body(state, _):
        R, t = state
        p = jnp.matmul(X, R.T, precision=_HI) + t          # (M, 3)
        z = jnp.where(jnp.abs(p[:, 2]) < 1e-9, 1e-9, p[:, 2])
        inv_z = 1.0 / z
        u = p[:, 0] * inv_z * fx + cx
        v = p[:, 1] * inv_z * fy + cy
        r = jnp.stack([u, v], axis=-1) - x_obs             # (M, 2)

        # du/dp, dv/dp rows (M, 3).
        du = jnp.stack([fx * inv_z, jnp.zeros_like(z),
                        -fx * p[:, 0] * inv_z * inv_z], axis=-1)
        dv = jnp.stack([jnp.zeros_like(z), fy * inv_z,
                        -fy * p[:, 1] * inv_z * inv_z], axis=-1)
        # dp/ddelta = [-[q]_x | I] with q = R X = p - t.
        q = p - t                                           # (M, 3)
        zero = jnp.zeros_like(q[:, 0])
        # -[q]_x rows: [[0, q3, -q2], [-q3, 0, q1], [q2, -q1, 0]].
        neg_qx = jnp.stack(
            [
                jnp.stack([zero, q[:, 2], -q[:, 1]], -1),
                jnp.stack([-q[:, 2], zero, q[:, 0]], -1),
                jnp.stack([q[:, 1], -q[:, 0], zero], -1),
            ],
            axis=-2,
        )                                                   # (M, 3, 3)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), neg_qx.shape)
        dp = jnp.concatenate([neg_qx, eye], axis=-1)        # (M, 3, 6)
        Ju = jnp.einsum("mi,mik->mk", du, dp, precision=_HI)
        Jv = jnp.einsum("mi,mik->mk", dv, dp, precision=_HI)
        J = jnp.stack([Ju, Jv], axis=1) * w[:, None, None]  # (M, 2, 6)
        rw = r * w[:, None]

        G = jnp.einsum("mri,mrj->ij", J, J, precision=_HI)
        g = jnp.einsum("mri,mr->i", J, rw, precision=_HI)
        A = G + damping * jnp.eye(6, dtype=G.dtype)
        # Unrolled SPD solve: elementwise under vmap across hypotheses
        # (jnp.linalg.solve is a serialized pivoted LU on TPU).
        step = solve_spd(A, g)
        dw, dt = step[:3], step[3:]
        R_new = jnp.matmul(rodrigues(-dw), R, precision=_HI)
        t_new = t - dt
        ok = jnp.all(jnp.isfinite(step))
        R_out = jnp.where(ok, R_new, R)
        t_out = jnp.where(ok, t_new, t)
        return (R_out, t_out), None

    R0 = rodrigues(pose6[:3])
    (R, t), _ = jax.lax.scan(body, (R0, pose6[3:]), None, length=iters)
    from visual_odom_tpu.core.lie import rodrigues_inverse

    return jnp.concatenate([rodrigues_inverse(R), t])


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

    # Dual-start hypotheses: even hypotheses refine from the warm start, odd
    # ones from the identity pose. Frame-to-frame deltas are small, so the
    # identity is always a sane basin; this makes RANSAC recover even when
    # the warm start is far off (a diverged previous frame), at zero extra
    # cost — same hypothesis count, best-by-inliers selection below.
    pose_id = jnp.zeros(6, jnp.float32)
    starts = jnp.where((jnp.arange(iterations) % 2 == 0)[:, None],
                       pose0[None, :], pose_id[None, :])       # (H, 6)

    refine = jax.vmap(
        lambda p0, X, x, w: _gn_refine(p0, X, x, w, K, refine_iters)
    )
    poses = refine(starts, X_s, x_s, w_s)                      # (H, 6)

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
