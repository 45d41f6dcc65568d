import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visual_odom_tpu.backend.essential import find_essential_ransac
from visual_odom_tpu.core.lie import rodrigues

cv2 = pytest.importorskip("cv2")

FX = 718.856
PP = (607.19, 185.21)


def make_two_view(n=256, rvec=(0.01, -0.04, 0.008), t=(0.3, -0.05, 0.95),
                  noise=0.0, outlier_frac=0.0, seed=0):
    rng = np.random.default_rng(seed)
    X = np.stack(
        [rng.uniform(-12, 12, n), rng.uniform(-4, 4, n), rng.uniform(8, 60, n)],
        axis=1,
    )
    R = np.asarray(rodrigues(jnp.asarray(np.float32(rvec))))
    t = np.asarray(t) / np.linalg.norm(t)
    X2 = X @ R.T + t
    uv1 = np.stack([X[:, 0] / X[:, 2] * FX + PP[0],
                    X[:, 1] / X[:, 2] * FX + PP[1]], 1)
    uv2 = np.stack([X2[:, 0] / X2[:, 2] * FX + PP[0],
                    X2[:, 1] / X2[:, 2] * FX + PP[1]], 1)
    uv1 += rng.normal(0, noise, uv1.shape)
    uv2 += rng.normal(0, noise, uv2.shape)
    n_out = int(outlier_frac * n)
    idx = rng.choice(n, n_out, replace=False)
    uv2[idx] += rng.uniform(10, 80, (n_out, 2))
    return uv1.astype(np.float32), uv2.astype(np.float32), R, t, idx


def angle_between(R_a, R_b):
    c = (np.trace(R_a.T @ R_b) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def run(uv1, uv2):
    n = len(uv1)
    return find_essential_ransac(
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(n, bool),
        FX, PP, jax.random.PRNGKey(0),
    )


def test_rotation_recovery_clean():
    uv1, uv2, R_gt, t_gt, _ = make_two_view()
    res = run(uv1, uv2)
    assert angle_between(np.asarray(res.R), R_gt) < 0.1
    # translation up to scale & sign handled by cheirality: direction match
    assert abs(np.dot(np.asarray(res.t), t_gt)) > 0.995


def test_rotation_with_outliers_and_noise():
    uv1, uv2, R_gt, t_gt, out_idx = make_two_view(noise=0.3, outlier_frac=0.25,
                                                  seed=1)
    res = run(uv1, uv2)
    assert angle_between(np.asarray(res.R), R_gt) < 1.0
    inl = np.asarray(res.inliers)
    assert inl.sum() > 120
    assert inl[out_idx].mean() < 0.2


def test_matches_opencv_recoverpose():
    uv1, uv2, R_gt, t_gt, _ = make_two_view(noise=0.2, seed=2)
    E_cv, mask = cv2.findEssentialMat(uv1, uv2, FX, PP, cv2.RANSAC, 0.999, 1.0)
    _, R_cv, t_cv, _ = cv2.recoverPose(E_cv, uv1, uv2, focal=FX, pp=PP,
                                       mask=mask.copy())
    res = run(uv1, uv2)
    # recoverPose returns cam1->cam2 with our same convention; compare to cv
    assert angle_between(np.asarray(res.R), R_cv) < 0.3
    assert abs(np.dot(np.asarray(res.t), t_cv.ravel())) > 0.98
