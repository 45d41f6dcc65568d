import numpy as np
import jax.numpy as jnp
import pytest

from visual_odom_tpu.config import KITTI00
from visual_odom_tpu.core.triangulate import triangulate_points

cv2 = pytest.importorskip("cv2")


def project(P, X):
    Xh = np.concatenate([X, np.ones((len(X), 1))], axis=1)
    x = (P @ Xh.T).T
    return x[:, :2] / x[:, 2:3]


def random_points(n=64, seed=0):
    r = np.random.default_rng(seed)
    X = np.stack(
        [
            r.uniform(-10, 10, n),
            r.uniform(-3, 3, n),
            r.uniform(5, 60, n),
        ],
        axis=1,
    )
    return X


def test_triangulation_recovers_known_points():
    Pl = KITTI00.proj_left()
    Pr = KITTI00.proj_right()
    X = random_points()
    xl = project(Pl, X)
    xr = project(Pr, X)
    X_hat = np.asarray(
        triangulate_points(jnp.asarray(Pl), jnp.asarray(Pr), jnp.asarray(xl, dtype=jnp.float32), jnp.asarray(xr, dtype=jnp.float32))
    )
    np.testing.assert_allclose(X_hat, X, rtol=1e-3, atol=5e-3)


def test_triangulation_matches_opencv():
    Pl = KITTI00.proj_left()
    Pr = KITTI00.proj_right()
    X = random_points(seed=1)
    r = np.random.default_rng(2)
    xl = project(Pl, X) + r.normal(0, 0.3, (len(X), 2))
    xr = project(Pr, X) + r.normal(0, 0.3, (len(X), 2))

    pts4 = cv2.triangulatePoints(Pl, Pr, xl.T.astype(np.float32), xr.T.astype(np.float32))
    cv_pts3 = cv2.convertPointsFromHomogeneous(pts4.T).reshape(-1, 3)

    ours = np.asarray(
        triangulate_points(
            jnp.asarray(Pl), jnp.asarray(Pr),
            jnp.asarray(xl, dtype=jnp.float32), jnp.asarray(xr, dtype=jnp.float32),
        )
    )
    # Same linear solution up to noise amplification on far points: median
    # agreement tight, and accuracy against the true points must match
    # OpenCV's (we use inhomogeneous DLT, OpenCV homogeneous SVD — they
    # differ only where measurement noise dominates anyway).
    rel = np.linalg.norm(ours - cv_pts3, axis=1) / np.linalg.norm(cv_pts3, axis=1)
    assert np.median(rel) < 2e-3
    err_ours = np.linalg.norm(ours - X, axis=1)
    err_cv = np.linalg.norm(cv_pts3 - X, axis=1)
    assert err_ours.mean() < err_cv.mean() * 1.05
