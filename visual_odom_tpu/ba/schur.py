"""Gauss-Newton bundle adjustment with Schur-complement landmark elimination.

The classic two-block structure, laid out for TPU:

    [ Hpp  Hpl ] [ dp ]   [ bp ]
    [ Hpl' Hll ] [ dx ] = [ bl ]

- Every Jacobian block comes from one vmapped jacfwd over the (W, L)
  observation grid (exact derivatives through Rodrigues);
- Hll is (L, 3, 3) block-diagonal -> batched 3x3 inverse;
- the reduced camera system S = Hpp - Hpl Hll^-1 Hpl' is formed by einsums
  whose contraction axis is the LANDMARK axis — this is the axis
  parallel/sharded_ba.py shards across devices, with the S/rhs contributions
  combined by psum (the "distributed Schur reduction over collectives" of
  BASELINE.json);
- S is dense (6W, 6W) with W ~ 4..16 keyframes: a single small solve;
- the gauge is fixed by a large prior on pose 0 (the window's anchor).

No reference counterpart exists (the reference has no BA at all,
SURVEY.md section 5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from visual_odom_tpu.ba.problem import BAProblem, project_stereo, residuals

_HI = jax.lax.Precision.HIGHEST
_GAUGE_PRIOR = 1e9


def _jacobian_blocks(problem: BAProblem, huber_delta: float = 0.0):
    """Per-observation Jacobians A (d r / d pose) and B (d r / d landmark).

    Returns (A (W, L, 3, 6), B (W, L, 3, 3), r (W, L, 3)) with masked rows
    zeroed (zero residual AND zero Jacobian = observation absent).

    ``huber_delta`` > 0 applies iteratively-reweighted least squares with
    the Huber loss at that pixel scale: each observation is scaled by
    sqrt(min(1, delta / |r|)), so outliers (bad LK tracks that slipped
    through the closure check) enter the normal equations with bounded
    influence instead of quadratic pull.
    """
    intr = (problem.fx, problem.fy, problem.cx, problem.cy, problem.bf)

    def obs_residual(pose6, X, target):
        return project_stereo(pose6, X, intr) - target

    def per_pose(pose6, obs_row):
        def per_lm(X, target):
            A = jax.jacfwd(obs_residual, argnums=0)(pose6, X, target)
            B = jax.jacfwd(obs_residual, argnums=1)(pose6, X, target)
            r = obs_residual(pose6, X, target)
            return A, B, r

        return jax.vmap(per_lm)(problem.landmarks, obs_row)

    A, B, r = jax.vmap(per_pose)(problem.poses, problem.observations)
    m = problem.mask[..., None]
    r = jnp.where(m, r, 0.0)
    A = jnp.where(m[..., None], A, 0.0)
    B = jnp.where(m[..., None], B, 0.0)
    if huber_delta > 0.0:
        nrm = jnp.linalg.norm(r, axis=-1, keepdims=True)        # (W, L, 1)
        w = jnp.sqrt(jnp.minimum(1.0, huber_delta / jnp.maximum(nrm, 1e-12)))
        r = r * w
        A = A * w[..., None]
        B = B * w[..., None]
    return A, B, r


@partial(jax.jit, static_argnames=("damping", "huber_delta"))
def ba_gauss_newton_step(problem: BAProblem, damping: float = 1e-4,
                         anchor=None, anchor_w=None,
                         huber_delta: float = 0.0) -> BAProblem:
    """One damped GN step. Returns the updated problem.

    anchor (W, 6) / anchor_w (W,) add per-pose quadratic priors
    0.5 * w_i * ||pose_i - anchor_i||^2 — e.g. to pin a window's boundary
    keyframes to externally-known estimates (the VO->BA wiring anchors the
    window's first pose to the odometry chain). Default (None) anchors
    pose 0 to itself with a large weight, i.e. the classic gauge prior
    (dp_0 ~ 0). The ring-sharded sequence-parallel solver lives in
    parallel/ring_ba.py; it solves the same reduced system with ring-matvec
    PCG rather than through these priors.
    """
    W = problem.poses.shape[0]
    if anchor is None:
        anchor = problem.poses
    if anchor_w is None:
        anchor_w = jnp.zeros(W, problem.poses.dtype).at[0].set(_GAUGE_PRIOR)
    A, B, r = _jacobian_blocks(problem, huber_delta=huber_delta)

    # Block accumulations (contraction over landmarks marked "L!").
    Hpp = jnp.einsum("wlri,wlrj->wij", A, A, precision=_HI)        # (W, 6, 6)
    Hll = jnp.einsum("wlri,wlrj->lij", B, B, precision=_HI)        # (L, 3, 3)
    Hpl = jnp.einsum("wlri,wlrj->wlij", A, B, precision=_HI)       # (W, L, 6, 3)
    bp = jnp.einsum("wlri,wlr->wi", A, r, precision=_HI)           # (W, 6)
    bl = jnp.einsum("wlri,wlr->li", B, r, precision=_HI)           # (L, 3)

    # LM damping + batched 3x3 landmark-block inverse.
    Hll = Hll + damping * jnp.eye(3, dtype=Hll.dtype)
    Hll_inv = jnp.linalg.inv(Hll)                                   # (L, 3, 3)

    # Schur complement: contraction over landmarks (L!) — the sharded axis.
    HplWinv = jnp.einsum("wlij,ljk->wlik", Hpl, Hll_inv, precision=_HI)
    S_red = jnp.einsum("wlik,vljk->wvij", HplWinv, Hpl, precision=_HI)
    rhs_red = jnp.einsum("wlik,lk->wi", HplWinv, bl, precision=_HI)

    S = jnp.zeros_like(S_red)
    S = S.at[jnp.arange(W), jnp.arange(W)].set(
        Hpp + damping * jnp.eye(6, dtype=Hpp.dtype)
    )
    S = S - S_red
    rhs = bp - rhs_red

    # Per-pose anchor priors (gauge by default; halo pins in ring BA).
    S = S.at[jnp.arange(W), jnp.arange(W)].add(
        anchor_w[:, None, None] * jnp.eye(6, dtype=S.dtype)
    )
    rhs = rhs + anchor_w[:, None] * (problem.poses - anchor)

    S_dense = S.transpose(0, 2, 1, 3).reshape(W * 6, W * 6)
    rhs_dense = rhs.reshape(W * 6)
    dp = jnp.linalg.solve(S_dense, rhs_dense).reshape(W, 6)

    # Landmark back-substitution.
    corr = jnp.einsum("wlij,wi->lj", Hpl, dp, precision=_HI)
    dx = jnp.einsum("lij,lj->li", Hll_inv, bl - corr, precision=_HI)

    ok = jnp.all(jnp.isfinite(dp)) & jnp.all(jnp.isfinite(dx))
    new_poses = jnp.where(ok, problem.poses - dp, problem.poses)
    new_landmarks = jnp.where(ok, problem.landmarks - dx, problem.landmarks)
    return problem._replace(poses=new_poses, landmarks=new_landmarks)


@partial(jax.jit, static_argnames=("iterations", "damping", "huber_delta"))
def ba_solve(problem: BAProblem, iterations: int = 10,
             damping: float = 1e-4, huber_delta: float = 0.0) -> BAProblem:
    """Fixed-iteration GN loop (static trip count; extra steps are no-ops at
    the optimum). ``huber_delta`` > 0 = robust (Huber IRLS) solve."""

    def body(p, _):
        return ba_gauss_newton_step(p, damping=damping,
                                    huber_delta=huber_delta), None

    out, _ = jax.lax.scan(body, problem, None, length=iterations)
    return out
