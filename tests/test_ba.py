import numpy as np
import jax
import jax.numpy as jnp

from visual_odom_tpu.ba.problem import (
    synthetic_ba_problem,
    total_cost,
    residuals,
)
from visual_odom_tpu.ba.schur import ba_gauss_newton_step, ba_solve


def test_residuals_zero_at_ground_truth():
    problem, poses_gt, lms_gt = synthetic_ba_problem(pixel_noise=0.0,
                                                     pose_perturb=0.0,
                                                     landmark_perturb=0.0)
    r = np.asarray(residuals(problem))
    assert np.abs(r).max() < 2e-2  # f32 projection roundoff at KITTI focal


def test_gn_step_reduces_cost():
    problem, *_ = synthetic_ba_problem(seed=1)
    c0 = float(total_cost(problem))
    p1 = ba_gauss_newton_step(problem)
    c1 = float(total_cost(p1))
    assert c1 < c0 * 0.5, (c0, c1)


def test_ba_converges_to_ground_truth():
    problem, poses_gt, lms_gt = synthetic_ba_problem(
        pixel_noise=0.0, pose_perturb=0.01, landmark_perturb=0.05, seed=2
    )
    solved = ba_solve(problem, iterations=8)
    # Noise-free observations: exact recovery up to f32.
    np.testing.assert_allclose(np.asarray(solved.poses), poses_gt, atol=2e-3)
    np.testing.assert_allclose(np.asarray(solved.landmarks), lms_gt, atol=2e-2)


def test_ba_with_noise_improves_poses():
    problem, poses_gt, _ = synthetic_ba_problem(
        pixel_noise=0.3, pose_perturb=0.02, landmark_perturb=0.2, seed=3
    )
    err0 = np.abs(np.asarray(problem.poses) - poses_gt).max()
    solved = ba_solve(problem, iterations=10)
    err1 = np.abs(np.asarray(solved.poses) - poses_gt).max()
    assert err1 < err0 * 0.3, (err0, err1)


def test_ba_respects_mask():
    problem, *_ = synthetic_ba_problem(seed=4)
    # Corrupt observations of masked-out entries; solution must not change.
    mask = np.asarray(problem.mask).copy()
    mask[:, ::3] = False
    obs_bad = np.asarray(problem.observations).copy()
    obs_bad[:, ::3] += 1e5
    p_masked = problem._replace(
        mask=jnp.asarray(mask), observations=jnp.asarray(obs_bad)
    )
    p_ref = problem._replace(mask=jnp.asarray(mask))
    a = ba_solve(p_masked, iterations=3)
    b = ba_solve(p_ref, iterations=3)
    np.testing.assert_allclose(np.asarray(a.poses), np.asarray(b.poses),
                               atol=1e-5)


def test_gauge_pose0_fixed():
    problem, *_ = synthetic_ba_problem(seed=5)
    p0 = np.asarray(problem.poses[0]).copy()
    solved = ba_solve(problem, iterations=5)
    np.testing.assert_allclose(np.asarray(solved.poses[0]), p0, atol=1e-4)
