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


def test_huber_robust_solve_resists_outliers():
    """Huber IRLS (ba_solve(huber_delta=...)) bounds outlier influence: with
    a handful of grossly wrong observations, the robust solve recovers poses
    much better than plain least squares."""
    import numpy as np
    import jax.numpy as jnp

    problem, poses_gt, _ = synthetic_ba_problem(
        num_poses=6, num_landmarks=96, pixel_noise=0.2, seed=9)
    obs = np.asarray(problem.observations).copy()
    rng = np.random.default_rng(0)
    # Corrupt 4% of observations by 30-80 px.
    W, L, _ = obs.shape
    n_bad = (W * L) // 25
    wi = rng.integers(0, W, n_bad)
    li = rng.integers(0, L, n_bad)
    obs[wi, li] += rng.uniform(30, 80, (n_bad, 3)) * rng.choice(
        [-1, 1], (n_bad, 3))
    corrupted = problem._replace(observations=jnp.asarray(obs, jnp.float32))

    plain = ba_solve(corrupted, iterations=10)
    robust = ba_solve(corrupted, iterations=10, huber_delta=1.5)
    err_plain = np.abs(np.asarray(plain.poses) - poses_gt).max()
    err_robust = np.abs(np.asarray(robust.poses) - poses_gt).max()
    assert err_robust < 0.5 * err_plain, (err_plain, err_robust)
    assert err_robust < 0.01, err_robust
