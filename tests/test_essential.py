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


def test_five_point_minimal_exact():
    """The batched Nister solver recovers the true E from 5 exact
    correspondences (reference algorithm: cv::findEssentialMat's minimal
    solver, src/visualOdometry.cpp:154)."""
    from visual_odom_tpu.backend.five_point import five_point_essential

    rng = np.random.default_rng(7)
    ok_trials = 0
    for seed in range(6):
        uv1, uv2, R_gt, t_gt, _ = make_two_view(n=5, seed=seed)
        x1 = (uv1 - np.asarray(PP)) / FX
        x2 = (uv2 - np.asarray(PP)) / FX
        Es, ok = five_point_essential(jnp.asarray(x1), jnp.asarray(x2))
        Es, ok = np.asarray(Es), np.asarray(ok)
        T = np.array([[0, -t_gt[2], t_gt[1]], [t_gt[2], 0, -t_gt[0]],
                      [-t_gt[1], t_gt[0], 0]])
        E_true = T @ R_gt
        E_true /= np.linalg.norm(E_true)
        best = min(
            (min(np.linalg.norm(Es[j] - E_true),
                 np.linalg.norm(Es[j] + E_true))
             for j in range(10) if ok[j]),
            default=np.inf)
        if best < 2e-2:
            ok_trials += 1
    # f32 floor: ~65% of minimal samples recover their true root (measured;
    # the rest are f32-conditioning casualties RANSAC absorbs — the final R
    # accuracy comes from the inlier-set polish, gated by the tests below).
    assert ok_trials >= 3, ok_trials


def test_five_point_and_eight_point_ransac_agree():
    uv1, uv2, R_gt, t_gt, _ = make_two_view(noise=0.3, outlier_frac=0.2,
                                            seed=3)
    n = len(uv1)
    res5 = find_essential_ransac(
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(n, bool), FX, PP,
        jax.random.PRNGKey(0), solver="5pt")
    res8 = find_essential_ransac(
        jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(n, bool), FX, PP,
        jax.random.PRNGKey(0), solver="8pt")
    assert angle_between(np.asarray(res5.R), R_gt) < 1.0
    assert angle_between(np.asarray(res8.R), R_gt) < 1.0
    assert angle_between(np.asarray(res5.R), np.asarray(res8.R)) < 1.0
