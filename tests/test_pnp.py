import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visual_odom_tpu.backend.pnp import pnp_ransac
from visual_odom_tpu.core.lie import rodrigues

cv2 = pytest.importorskip("cv2")

FX, FY, CX, CY = 718.856, 718.856, 607.19, 185.21
K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)


def make_problem(n=256, outlier_frac=0.0, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    X = np.stack(
        [rng.uniform(-10, 10, n), rng.uniform(-3, 3, n), rng.uniform(6, 50, n)],
        axis=1,
    ).astype(np.float32)
    rvec = np.array([0.01, -0.03, 0.005], np.float32)
    tvec = np.array([0.1, -0.05, -0.8], np.float32)
    R = np.asarray(rodrigues(jnp.asarray(rvec)))
    p = X @ R.T + tvec
    uv = np.stack(
        [p[:, 0] / p[:, 2] * FX + CX, p[:, 1] / p[:, 2] * FY + CY], axis=1
    ).astype(np.float32)
    if noise:
        uv += rng.normal(0, noise, uv.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    idx = rng.choice(n, n_out, replace=False)
    uv[idx] += rng.uniform(8, 60, (n_out, 2)).astype(np.float32)
    return X, uv, rvec, tvec, idx


def run_pnp(X, uv, valid=None, iterations=300):
    n = len(X)
    if valid is None:
        valid = np.ones(n, bool)
    return pnp_ransac(
        jnp.asarray(X),
        jnp.asarray(uv),
        jnp.asarray(valid),
        jnp.asarray(K),
        jnp.zeros(3, jnp.float32),
        jnp.zeros(3, jnp.float32),
        jax.random.PRNGKey(0),
        iterations=iterations,
    )


def test_pnp_exact_recovery():
    X, uv, rvec, tvec, _ = make_problem()
    res = run_pnp(X, uv)
    np.testing.assert_allclose(np.asarray(res.rvec), rvec, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.tvec), tvec, atol=1e-3)
    assert int(res.num_inliers) >= 250


def test_pnp_with_outliers():
    X, uv, rvec, tvec, out_idx = make_problem(outlier_frac=0.3, noise=0.1, seed=1)
    res = run_pnp(X, uv)
    np.testing.assert_allclose(np.asarray(res.rvec), rvec, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.tvec), tvec, atol=5e-2)
    # Outliers must be excluded from the inlier set.
    inl = np.asarray(res.inliers)
    assert not inl[out_idx].any()
    assert inl.sum() > 150


def test_pnp_matches_opencv():
    X, uv, rvec, tvec, _ = make_problem(outlier_frac=0.2, noise=0.2, seed=2)
    ok, rv_cv, t_cv, inl_cv = cv2.solvePnPRansac(
        X.astype(np.float64),
        uv.astype(np.float64),
        K.astype(np.float64),
        np.zeros(4),
        flags=cv2.SOLVEPNP_ITERATIVE,
        iterationsCount=500,
        reprojectionError=0.5,
        confidence=0.999,
    )
    assert ok
    res = run_pnp(X, uv)
    np.testing.assert_allclose(np.asarray(res.rvec), rv_cv.ravel(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.tvec), t_cv.ravel(), atol=3e-2)


def test_pnp_respects_mask():
    X, uv, rvec, tvec, _ = make_problem(seed=3)
    # Corrupt half the points but mask them out.
    valid = np.ones(len(X), bool)
    valid[128:] = False
    uv2 = uv.copy()
    uv2[128:] += 500.0
    res = run_pnp(X, uv2, valid=valid)
    np.testing.assert_allclose(np.asarray(res.rvec), rvec, atol=1e-3)
    assert not np.asarray(res.inliers)[128:].any()


def test_pnp_degenerate_too_few_points():
    X, uv, *_ = make_problem(seed=4)
    valid = np.zeros(len(X), bool)
    valid[:3] = True  # fewer than the minimal sample
    res = run_pnp(X, uv, valid=valid, iterations=50)
    # Must not produce NaNs.
    assert np.isfinite(np.asarray(res.rvec)).all()
    assert np.isfinite(np.asarray(res.tvec)).all()
