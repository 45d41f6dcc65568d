"""SO(3)/SE(3) primitives.

Conventions match the reference exactly:

- ``rodrigues`` == cv::Rodrigues(rvec -> R) (used at reference
  src/visualOdometry.cpp:188).
- ``rotation_to_euler`` reproduces rotationMatrixToEulerAngles
  (reference src/utils.cpp:107-131): x = atan2(R21, R22),
  y = atan2(-R20, sqrt(R00^2 + R10^2)), z = atan2(R10, R00), with the
  singular branch at sy < 1e-6.
- ``euler_to_rotation`` reproduces euler2rot (reference
  src/visualOdometry.cpp:4-42) — note its idiosyncratic axis composition.
- ``se3_inverse`` is the closed-form inverse of [R|t; 0 1] used for pose
  chaining frame_pose *= T^-1 (reference src/utils.cpp:78-84).

All functions are jit/vmap-compatible, shape-polymorphic over leading batch
dimensions where noted, and safe at the theta -> 0 singularity (Taylor
fallbacks keep gradients finite).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from functools import partial

_EPS = 1e-8


def _hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3) vectors -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


@jax.jit
def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3).

    R = I + sin(t)/t [w]_x + (1-cos(t))/t^2 [w]_x^2, with Taylor expansion
    near t = 0 so the function is smooth and NaN-free under jit/grad.
    """
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(t)/t and (1-cos t)/t^2 with series fallback near zero.
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    K = _hat(rvec)
    # K^2 = w w^T - theta^2 I in closed form (outer product, not a matmul —
    # keeps full f32 precision regardless of the backend matmul default).
    outer = rvec[..., :, None] * rvec[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    cos_t = jnp.where(small, 1.0 - theta2 * 0.5, jnp.cos(theta))
    return cos_t[..., None, None] * eye + a[..., None, None] * K + b[..., None, None] * outer


@jax.jit
def rodrigues_inverse(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3) (cv::Rodrigues R->rvec).

    Uses the standard log map; at theta ~ pi falls back to the diagonal
    extraction. Accurate to ~1e-6 for well-formed rotations.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Generic branch: w = theta/(2 sin theta) * vee(R - R^T)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    generic_scale = jnp.where(
        jnp.abs(sin_theta) < 1e-6,
        0.5 + theta * theta / 12.0,          # theta -> 0 series of t/(2 sin t)
        theta / (2.0 * jnp.maximum(jnp.abs(sin_theta), _EPS))
        * jnp.sign(sin_theta + _EPS),
    )
    w_generic = vee * generic_scale[..., None]

    # theta ~ pi branch: axis from the largest diagonal of (R + I)/2.
    A = 0.5 * (R + jnp.eye(3, dtype=R.dtype))
    diag = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip(diag, 0.0, None)
    axis = jnp.sqrt(axis_sq + _EPS * _EPS)
    # Fix signs using off-diagonals relative to the largest component.
    k = jnp.argmax(diag, axis=-1)

    def sign_fix(axis, A, k):
        s01 = jnp.sign(A[0, 1])
        s02 = jnp.sign(A[0, 2])
        s12 = jnp.sign(A[1, 2])
        ax0 = jnp.array([axis[0], axis[1] * s01, axis[2] * s02])
        ax1 = jnp.array([axis[0] * s01, axis[1], axis[2] * s12])
        ax2 = jnp.array([axis[0] * s02, axis[1] * s12, axis[2]])
        return jax.lax.switch(k, [lambda: ax0, lambda: ax1, lambda: ax2])

    if R.ndim == 2:
        axis_fixed = sign_fix(axis, A, k)
    else:
        flatR = A.reshape((-1, 3, 3))
        flat_axis = axis.reshape((-1, 3))
        flat_k = k.reshape((-1,))
        axis_fixed = jax.vmap(sign_fix)(flat_axis, flatR, flat_k).reshape(axis.shape)
    axis_fixed = axis_fixed / jnp.linalg.norm(axis_fixed, axis=-1, keepdims=True)
    w_pi = axis_fixed * theta[..., None]

    near_pi = (jnp.pi - theta) < 1e-3
    return jnp.where(near_pi[..., None], w_pi, w_generic)


@partial(jax.jit, static_argnames=('tol',))
def is_rotation_matrix(R: jnp.ndarray, tol: float = 1e-6) -> jnp.ndarray:
    """Frobenius check ||R^T R - I|| < tol (reference src/utils.cpp:93-102)."""
    RtR = jnp.matmul(R.swapaxes(-1, -2), R, precision=jax.lax.Precision.HIGHEST)
    err = RtR - jnp.eye(3, dtype=R.dtype)
    return jnp.sqrt(jnp.sum(err * err, axis=(-2, -1))) < tol


@jax.jit
def rotation_to_euler(R: jnp.ndarray) -> jnp.ndarray:
    """Reference rotationMatrixToEulerAngles (src/utils.cpp:107-131).

    Returns (..., 3) = (x, y, z) angles; used only for the 0.1 rad gate
    (reference src/main.cpp:201).
    """
    sy = jnp.sqrt(R[..., 0, 0] ** 2 + R[..., 1, 0] ** 2)
    singular = sy < 1e-6
    x = jnp.where(
        singular,
        jnp.arctan2(-R[..., 1, 2], R[..., 1, 1]),
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
    )
    y = jnp.arctan2(-R[..., 2, 0], sy)
    z = jnp.where(singular, jnp.zeros_like(sy), jnp.arctan2(R[..., 1, 0], R[..., 0, 0]))
    return jnp.stack([x, y, z], axis=-1)


@jax.jit
def euler_to_rotation(euler: jnp.ndarray) -> jnp.ndarray:
    """Reference euler2rot (src/visualOdometry.cpp:4-42), kept for API parity.

    Note: this is NOT the inverse of rotation_to_euler (the reference's
    euler2rot uses a different axis composition); it is reproduced verbatim
    because the reference exposes it.
    """
    x, y, z = euler[..., 0], euler[..., 1], euler[..., 2]
    ch, sh = jnp.cos(z), jnp.sin(z)
    ca, sa = jnp.cos(y), jnp.sin(y)
    cb, sb = jnp.cos(x), jnp.sin(x)
    row0 = jnp.stack([ch * ca, sh * sb - ch * sa * cb, ch * sa * sb + sh * cb], -1)
    row1 = jnp.stack([sa, ca * cb, -ca * sb], -1)
    row2 = jnp.stack([-sh * ca, sh * sa * cb + ch * sb, -sh * sa * sb + ch * cb], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


@jax.jit
def se3_matrix(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build (..., 4, 4) [R|t; 0 1] (reference src/utils.cpp:64-67)."""
    batch = R.shape[:-2]
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


@jax.jit
def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of (..., 4, 4) rigid transforms
    (reference src/utils.cpp:78 uses a generic matrix inverse)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = R.swapaxes(-1, -2)
    t_inv = -jnp.sum(Rt * t[..., None, :], axis=-1)
    return se3_matrix(Rt, t_inv)
