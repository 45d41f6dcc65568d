"""Batched linear (DLT) stereo triangulation.

TPU-native equivalent of cv::triangulatePoints + convertPointsFromHomogeneous
(reference src/main.cpp:169-171): for each correspondence build the 4x4 DLT
system

    A = [ xl * Pl[2] - Pl[0]
          yl * Pl[2] - Pl[1]
          xr * Pr[2] - Pr[0]
          yr * Pr[2] - Pr[1] ]

and take the null vector of A. Instead of a per-point SVD (what OpenCV does)
we take the eigenvector of the 4x4 symmetric matrix A^T A with smallest
eigenvalue — identical null space, and a batched 4x4 ``eigh`` maps far better
onto XLA than batched SVD.

Shapes are fully batched: N points triangulate as one fused computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_points(
    P_left: jnp.ndarray,
    P_right: jnp.ndarray,
    pts_left: jnp.ndarray,
    pts_right: jnp.ndarray,
) -> jnp.ndarray:
    """Triangulate pixel correspondences to 3-D points.

    Args:
      P_left, P_right: (3, 4) projection matrices.
      pts_left, pts_right: (..., N, 2) pixel coordinates.

    Returns:
      (..., N, 3) points in the left-camera frame (dehomogenized), matching
      cv::triangulatePoints followed by convertPointsFromHomogeneous.
    """
    dtype = pts_left.dtype
    Pl = P_left.astype(dtype)
    Pr = P_right.astype(dtype)

    xl = pts_left[..., 0:1]   # (..., N, 1)
    yl = pts_left[..., 1:2]
    xr = pts_right[..., 0:1]
    yr = pts_right[..., 1:2]

    # Rows of A: (..., N, 4)
    r0 = xl * Pl[2] - Pl[0]
    r1 = yl * Pl[2] - Pl[1]
    r2 = xr * Pr[2] - Pr[0]
    r3 = yr * Pr[2] - Pr[1]
    A = jnp.stack([r0, r1, r2, r3], axis=-2)  # (..., N, 4, 4)

    # Row-normalize for conditioning (OpenCV does the equivalent internally).
    A = A / (jnp.linalg.norm(A, axis=-1, keepdims=True) + 1e-12)

    AtA = jnp.einsum("...ij,...ik->...jk", A, A, precision=jax.lax.Precision.HIGHEST)
    # Smallest-eigenvalue eigenvector of a symmetric 4x4.
    _, V = jnp.linalg.eigh(AtA)
    X = V[..., :, 0]  # (..., N, 4); eigh sorts ascending.

    w = X[..., 3:4]
    w = jnp.where(jnp.abs(w) < 1e-12, jnp.full_like(w, 1e-12), w)
    return X[..., :3] / w


def stereo_depth_from_disparity(
    pts_left: jnp.ndarray, disparity: jnp.ndarray, fx: float, baseline: float
) -> jnp.ndarray:
    """Fast-path stereo depth z = fx * b / d for rectified pairs.

    Not used by the main pipeline (which mirrors the reference's general DLT)
    but exposed for the RGB-D/depth-direct path (BASELINE.json config 4).
    """
    d = jnp.maximum(disparity, 1e-6)
    return fx * baseline / d
