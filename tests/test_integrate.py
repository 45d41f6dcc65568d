import numpy as np
import jax.numpy as jnp

from visual_odom_tpu.backend.integrate import (
    gate_and_integrate,
    integrate_pose_host,
)
from visual_odom_tpu.core.lie import rodrigues, se3_matrix


def test_accept_normal_motion():
    rvec = jnp.array([0.01, 0.02, -0.005])
    tvec = jnp.array([0.05, -0.02, 0.9])
    g = gate_and_integrate(rvec, tvec)
    assert bool(g.accept)
    # frame_pose chaining moves the camera forward in world.
    pose = integrate_pose_host(np.eye(4), np.asarray(g.T_inv), bool(g.accept))
    assert pose[2, 3] < 0 or abs(pose[2, 3]) > 0.5  # moved along z


def test_reject_large_rotation():
    # any euler component >= 0.1 rad fails (reference src/main.cpp:201)
    g = gate_and_integrate(jnp.array([0.2, 0.0, 0.0]), jnp.array([0.0, 0.0, 1.0]))
    assert not bool(g.accept)


def test_reject_small_scale():
    g = gate_and_integrate(jnp.zeros(3), jnp.array([0.0, 0.0, 0.01]))
    assert not bool(g.accept)  # scale <= 0.05 (reference src/utils.cpp:80)


def test_reject_huge_scale():
    g = gate_and_integrate(jnp.zeros(3), jnp.array([0.0, 0.0, 50.0]))
    assert not bool(g.accept)


def test_scale_boundaries():
    # strict inequalities: 0.05 and 10 exactly are rejected
    g1 = gate_and_integrate(jnp.zeros(3), jnp.array([0.05, 0.0, 0.0]))
    assert not bool(g1.accept)
    g2 = gate_and_integrate(jnp.zeros(3), jnp.array([0.0, 0.0, 0.06]))
    assert bool(g2.accept)


def test_T_inv_is_inverse():
    rvec = jnp.array([0.01, 0.02, -0.005])
    tvec = jnp.array([0.1, 0.0, 0.5])
    g = gate_and_integrate(rvec, tvec)
    T = np.asarray(se3_matrix(rodrigues(rvec), tvec))
    np.testing.assert_allclose(T @ np.asarray(g.T_inv), np.eye(4), atol=1e-5)


def test_host_integration_skips_rejected():
    pose = np.eye(4)
    out = integrate_pose_host(pose, np.diag([1.0, 1, 1, 1]), False)
    np.testing.assert_array_equal(out, pose)
