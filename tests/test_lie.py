import numpy as np
import jax.numpy as jnp
import pytest

from visual_odom_tpu.core import (
    rodrigues,
    rodrigues_inverse,
    rotation_to_euler,
    euler_to_rotation,
    is_rotation_matrix,
    se3_matrix,
    se3_inverse,
)

cv2 = pytest.importorskip("cv2")


def random_rvecs(n, scale=1.0, seed=0):
    r = np.random.default_rng(seed)
    return (r.standard_normal((n, 3)) * scale).astype(np.float32)


def test_rodrigues_matches_opencv():
    for rvec in random_rvecs(20, scale=1.2):
        R_cv, _ = cv2.Rodrigues(rvec.astype(np.float64))
        R_ours = np.asarray(rodrigues(jnp.asarray(rvec)))
        np.testing.assert_allclose(R_ours, R_cv, atol=1e-5)


def test_rodrigues_inverse_roundtrip():
    # Compare as rotations: |rvec| may exceed pi, where the log map returns
    # the equivalent representative with theta <= pi.
    rvecs = random_rvecs(50, scale=1.5, seed=1)
    R = rodrigues(jnp.asarray(rvecs))
    back = rodrigues_inverse(R)
    R2 = np.asarray(rodrigues(back))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-4)
    assert (np.linalg.norm(np.asarray(back), axis=-1) <= np.pi + 1e-4).all()


def test_rodrigues_zero():
    R = np.asarray(rodrigues(jnp.zeros(3)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_rotation_to_euler_matches_reference_formula():
    # Reference rotationMatrixToEulerAngles (src/utils.cpp:107-131).
    for rvec in random_rvecs(20, scale=0.5, seed=2):
        R_cv, _ = cv2.Rodrigues(rvec.astype(np.float64))
        e = np.asarray(rotation_to_euler(jnp.asarray(R_cv, dtype=jnp.float32)))
        sy = np.sqrt(R_cv[0, 0] ** 2 + R_cv[1, 0] ** 2)
        expect = np.array(
            [
                np.arctan2(R_cv[2, 1], R_cv[2, 2]),
                np.arctan2(-R_cv[2, 0], sy),
                np.arctan2(R_cv[1, 0], R_cv[0, 0]),
            ]
        )
        np.testing.assert_allclose(e, expect, atol=1e-5)


def test_euler_to_rotation_is_reference_euler2rot():
    # Spot-check the exact matrix layout of reference euler2rot
    # (src/visualOdometry.cpp:4-42) at a known angle set.
    x, y, z = 0.1, -0.2, 0.3
    R = np.asarray(euler_to_rotation(jnp.array([x, y, z])))
    ch, sh = np.cos(z), np.sin(z)
    ca, sa = np.cos(y), np.sin(y)
    cb, sb = np.cos(x), np.sin(x)
    expect = np.array(
        [
            [ch * ca, sh * sb - ch * sa * cb, ch * sa * sb + sh * cb],
            [sa, ca * cb, -ca * sb],
            [-sh * ca, sh * sa * cb + ch * sb, -sh * sa * sb + ch * cb],
        ]
    )
    np.testing.assert_allclose(R, expect, atol=1e-6)


def test_is_rotation_matrix():
    R = rodrigues(jnp.array([0.3, -0.2, 0.9]))
    assert bool(is_rotation_matrix(R))
    assert not bool(is_rotation_matrix(R * 1.01))


def test_se3_inverse():
    rvec = jnp.array([0.2, 0.1, -0.3])
    t = jnp.array([1.0, -2.0, 0.5])
    T = np.asarray(se3_matrix(rodrigues(rvec), t))
    Tinv = np.asarray(se3_inverse(jnp.asarray(T)))
    np.testing.assert_allclose(T @ Tinv, np.eye(4), atol=1e-6)
