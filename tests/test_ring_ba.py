"""Ring-sharded sequence-parallel windowed BA (parallel/ring_ba.py).

SURVEY.md section 5 "long-context": trajectory windows sharded across
devices, boundary coupling via halo keyframes exchanged with ppermute,
landmark reduction all-reduced — converging to the global single-device
solve. Runs on the conftest-provided 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_odom_tpu.ba.problem import synthetic_ba_problem, total_cost
from visual_odom_tpu.ba.schur import ba_solve, ba_gauss_newton_step
from visual_odom_tpu.parallel.mesh import make_mesh
from visual_odom_tpu.parallel.ring_ba import (
    make_ring_windows,
    merge_ring_windows,
    ring_ba_solve,
)


def _long_problem(num_poses=16, num_landmarks=128, seed=3, obs_window=1):
    """VO-realistic windowed problem: landmark tracks span at most
    2*obs_window + 1 consecutive keyframes (coupling distance 2*obs_window,
    so ring halo = 2*obs_window reproduces the global system exactly)."""
    return synthetic_ba_problem(
        num_poses=num_poses, num_landmarks=num_landmarks,
        pixel_noise=0.2, pose_perturb=0.015, landmark_perturb=0.08,
        seed=seed, obs_window=obs_window,
    )


def test_windowing_roundtrip_identity():
    """Splitting then merging without solving returns the input exactly."""
    problem, *_ = _long_problem(num_poses=8, num_landmarks=32)
    win = make_ring_windows(problem, num_windows=4, halo=2)
    out = merge_ring_windows(problem, win, np.asarray(win.poses),
                             np.asarray(win.landmarks))
    np.testing.assert_allclose(out.poses, problem.poses, atol=1e-7)
    np.testing.assert_allclose(out.landmarks, problem.landmarks, atol=1e-6)


def test_window_masks_cover_each_obs_once():
    problem, *_ = _long_problem(num_poses=8, num_landmarks=32)
    win = make_ring_windows(problem, num_windows=4, halo=2)
    core, halo = win.core, win.halo
    core_mask = np.asarray(win.mask[:, halo:halo + core])  # (D, core, L)
    flat = core_mask.reshape(-1, core_mask.shape[-1])
    np.testing.assert_array_equal(flat, np.asarray(problem.mask))


@pytest.mark.parametrize("num_windows", [4, 8])
def test_ring_ba_matches_global_solve(num_windows):
    """Ring solve reproduces the single-device global GN trajectory: same
    rounds, same optimum, float-level parity (the per-round step is the
    exact global step — landmark reduction psummed, reduced camera system
    solved by ring-matvec PCG)."""
    problem, poses_gt, _ = _long_problem()
    mesh = make_mesh({"seq": num_windows})

    ref = ba_solve(problem, iterations=10)
    out = ring_ba_solve(problem, mesh, halo=2, rounds=10)

    c0 = float(total_cost(problem))
    c_ref = float(total_cost(ref))
    c_ring = float(total_cost(out))
    assert c_ring < 0.05 * c0, (c0, c_ring)
    assert abs(c_ring - c_ref) < 0.01 * c_ref + 1e-3
    np.testing.assert_allclose(np.asarray(out.poses),
                               np.asarray(ref.poses), atol=1e-4)
    # Pose accuracy against ground truth, not just self-consistency: the
    # ring solve must be as accurate as the global solve (short noisy
    # tracks leave ~1e-2 drift at the chain end for BOTH).
    err_ring = np.abs(np.asarray(out.poses) - poses_gt).max()
    err_ref = np.abs(np.asarray(ref.poses) - poses_gt).max()
    assert err_ring < err_ref * 1.05 + 1e-4, (err_ring, err_ref)


def test_ring_ba_gauge_pose_fixed():
    """The global gauge pose is hard-projected: it must not move AT ALL."""
    problem, *_ = _long_problem()
    mesh = make_mesh({"seq": 8})
    out = ring_ba_solve(problem, mesh, halo=2, rounds=6)
    np.testing.assert_array_equal(np.asarray(out.poses[0]),
                                  np.asarray(problem.poses[0]))


def test_ring_ba_single_window_degenerates_to_local():
    """D=1: no halos, no neighbors — must equal the plain global solve."""
    problem, *_ = _long_problem(num_poses=8, num_landmarks=64)
    mesh = make_mesh({"seq": 1}, devices=jax.devices()[:1])
    out = ring_ba_solve(problem, mesh, halo=0, rounds=10)
    ref = ba_solve(problem, iterations=10)
    np.testing.assert_allclose(np.asarray(out.poses), np.asarray(ref.poses),
                               atol=1e-4)


def test_make_ring_windows_rejects_undersized_halo():
    """ADVICE.md round 2 (medium): a halo smaller than the observed track
    span must raise, not silently drop pose-pose coupling."""
    problem, *_ = _long_problem(obs_window=2)  # spans up to 5 poses
    from visual_odom_tpu.parallel.ring_ba import required_ring_halo

    assert required_ring_halo(problem) == 4
    with pytest.raises(ValueError, match="span"):
        make_ring_windows(problem, num_windows=4, halo=1)
    # halo >= span is accepted.
    make_ring_windows(problem, num_windows=4, halo=4)


def test_ring_ba_auto_halo_and_huber_match_global():
    """halo=None derives the exact halo from the mask; huber_delta routes
    the same IRLS weighting as ba_solve — together the ring solve still
    float-matches the global robust solve."""
    problem, _, _ = _long_problem(obs_window=1)
    # Inject a gross outlier observation to give Huber something to clamp.
    obs = np.asarray(problem.observations).copy()
    mask = np.asarray(problem.mask)
    w, l = np.argwhere(mask)[0]
    obs[w, l, :2] += 25.0
    problem = problem._replace(observations=jnp.asarray(obs))

    mesh = make_mesh({"seq": 8})
    ref = ba_solve(problem, iterations=8, huber_delta=1.5)
    out = ring_ba_solve(problem, mesh, halo=None, rounds=8, huber_delta=1.5)
    np.testing.assert_allclose(np.asarray(out.poses),
                               np.asarray(ref.poses), atol=5e-4)


def test_pad_problem_for_ring_is_inert():
    """Padded observation-less poses take a zero GN update and the core
    solution matches the unpadded solve."""
    from visual_odom_tpu.parallel.ring_ba import pad_problem_for_ring

    problem, *_ = _long_problem(num_poses=12, num_landmarks=64)
    padded = pad_problem_for_ring(problem, 16)
    mesh = make_mesh({"seq": 4})
    out = ring_ba_solve(padded, mesh, halo=2, rounds=8)
    ref = ba_solve(problem, iterations=8)
    np.testing.assert_allclose(np.asarray(out.poses[:12]),
                               np.asarray(ref.poses), atol=1e-4)


def test_anchor_prior_pulls_pose_toward_anchor():
    """ADVICE.md round 1: the non-default anchor path (anchor != poses,
    nonzero weight off pose 0) must pull the solved pose toward the anchor,
    and the default-arg path must be unchanged."""
    import jax.numpy as jnp

    problem, *_ = _long_problem(num_poses=4, num_landmarks=48,
                                obs_window=None)
    W = problem.poses.shape[0]

    # Default path: gauge on pose 0 only.
    default_step = ba_gauss_newton_step(problem)
    explicit_default = ba_gauss_newton_step(
        problem, anchor=problem.poses,
        anchor_w=jnp.zeros(W).at[0].set(1e9))
    np.testing.assert_allclose(np.asarray(default_step.poses),
                               np.asarray(explicit_default.poses), atol=1e-7)

    # Anchor pose 2 to a perturbed target with moderate weight: the result
    # must move toward the anchor relative to the unanchored step.
    target = np.asarray(problem.poses).copy()
    target[2, 3] += 0.05  # pull translation x
    aw = np.zeros(W, np.float32)
    aw[0] = 1e9
    aw[2] = 1e5
    anchored = ba_gauss_newton_step(
        problem, anchor=jnp.asarray(target), anchor_w=jnp.asarray(aw))
    d_anchored = abs(float(anchored.poses[2, 3]) - target[2, 3])
    d_default = abs(float(default_step.poses[2, 3]) - target[2, 3])
    assert d_anchored < d_default
    assert d_anchored < 0.01
