"""VO -> windowed-BA wiring (ba/window.py): BA on REAL pipeline tracks.

VERDICT.md round-1 missing #2: build BAProblems from the pipeline's
persistent track ids and show windowed BA measurably improves the chained
frame-to-frame trajectory.
"""

import numpy as np
import pytest

from visual_odom_tpu.ba.problem import residuals, total_cost
from visual_odom_tpu.ba.window import (
    WindowTracks,
    build_window_problem,
    smooth_trajectory_ba,
)
from visual_odom_tpu.config import CameraIntrinsics, VOConfig
from visual_odom_tpu.eval.kitti_eval import ate_rmse
from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
from visual_odom_tpu.runner.pipeline import run_sequence

H, W = 120, 160


@pytest.fixture(scope="module")
def vo_run():
    intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2,
                            bf=-120.0 * 0.54, width=W, height=H)
    cfg = VOConfig.for_image(H, W, ransac_iterations=200)
    seq = SyntheticStereoSequence(intr, num_frames=17, seed=0, speed=0.5)
    poses, results, snaps = run_sequence(seq, cfg, intr, collect_tracks=True)
    return seq, intr, poses, snaps


def _window_tracks(snaps, frames):
    rows = []
    for f in frames:
        if f == 0:
            s = snaps[0]
            uvr = np.stack([np.asarray(s.points_l0)[:, 0],
                            np.asarray(s.points_l0)[:, 1],
                            np.asarray(s.points_r0)[:, 0]], axis=1)
        else:
            s = snaps[f - 1]
            uvr = np.stack([np.asarray(s.points_l1)[:, 0],
                            np.asarray(s.points_l1)[:, 1],
                            np.asarray(s.points_r1)[:, 0]], axis=1)
        rows.append((np.asarray(s.ids), uvr, np.asarray(s.valid)))
    return WindowTracks(ids=np.stack([r[0] for r in rows]),
                        obs=np.stack([r[1] for r in rows]),
                        valid=np.stack([r[2] for r in rows]))


def test_window_problem_from_real_tracks(vo_run):
    """The constructed problem is consistent: observations come from real
    multi-frame tracks, the odometry init reprojects tightly, every frame
    (including the gauge frame) carries observations."""
    seq, intr, poses, snaps = vo_run
    tracks = _window_tracks(snaps, list(range(0, 8)))
    problem = build_window_problem(tracks, poses[:8], intr)
    assert problem is not None
    mask = np.asarray(problem.mask)
    assert mask.shape[0] == 8
    # Gauge frame must be observed (otherwise the window has a free rigid
    # mode — the round-1 wiring bug).
    assert mask[0].sum() >= 8
    assert all(mask[f].sum() >= 8 for f in range(8))
    # Tracks really span frames: plenty of landmarks seen 3+ times.
    assert (mask.sum(axis=0) >= 3).sum() >= 20
    # Odometry-initialized reprojection is tight after outlier pruning.
    r = np.asarray(residuals(problem))
    assert np.abs(r).max() <= 4.0 + 1e-5
    rms = np.sqrt((r[mask] ** 2).mean())
    assert rms < 1.5, rms


def test_ba_solve_reduces_window_cost(vo_run):
    from visual_odom_tpu.ba.schur import ba_solve

    seq, intr, poses, snaps = vo_run
    tracks = _window_tracks(snaps, list(range(0, 8)))
    problem = build_window_problem(tracks, poses[:8], intr)
    solved = ba_solve(problem, iterations=8)
    c0, c1 = float(total_cost(problem)), float(total_cost(solved))
    assert c1 < 0.7 * c0, (c0, c1)
    # Gauge pose did not move (anchored).
    np.testing.assert_allclose(np.asarray(solved.poses[0]),
                               np.asarray(problem.poses[0]), atol=1e-4)


def test_ba_smoothing_improves_ate(vo_run):
    """The VERDICT.md done-criterion: windowed BA on live tracks measurably
    reduces ATE vs raw frame-to-frame chaining."""
    seq, intr, poses, snaps = vo_run
    gt = seq.poses[: len(poses)]
    ate_chain = ate_rmse(gt, poses)
    smoothed = smooth_trajectory_ba(snaps, poses, intr, window=8,
                                    iterations=8)
    ate_ba = ate_rmse(gt, smoothed)
    assert ate_ba < ate_chain * 0.85, (ate_chain, ate_ba)
    # Continuity: frame 0 is still the identity (up to the float32
    # rvec->matrix round trip of the gauge pose).
    np.testing.assert_allclose(smoothed[0], np.eye(4), atol=1e-6)


def test_ba_smoothing_with_ring_solver_exact(vo_run):
    """VERDICT.md round-2 weak #4 done-criterion: live-track ring smoothing
    is EXACT — the sharded solver path produces the same smoothed
    trajectory as the single-device ba_solve (auto-halo from the observed
    track spans; unsharded fallback whenever the mesh can't afford the
    halo, so the result is never silently approximate)."""
    from visual_odom_tpu.parallel.mesh import make_mesh
    from visual_odom_tpu.parallel.ring_ba import make_ring_window_solver

    seq, intr, poses, snaps = vo_run
    gt = seq.poses[: len(poses)]
    mesh = make_mesh({"seq": 4})

    ref = smooth_trajectory_ba(snaps, poses, intr, window=8, iterations=8)
    ring = smooth_trajectory_ba(snaps, poses, intr, window=8,
                                solver=make_ring_window_solver(mesh))
    np.testing.assert_allclose(ring, ref, atol=5e-4)
    assert ate_rmse(gt, ring) < ate_rmse(gt, poses)


def test_ring_window_solver_engages_ring_path(vo_run):
    """When the window is long enough that core >= required halo, the ring
    branch (not the fallback) runs — and still float-matches the global
    solve on the same live-track problem."""
    from visual_odom_tpu.ba.schur import ba_solve
    from visual_odom_tpu.parallel.mesh import make_mesh
    from visual_odom_tpu.parallel.ring_ba import (
        make_ring_window_solver,
        pad_problem_for_ring,
        required_ring_halo,
        ring_ba_solve,
    )

    # Short-lived tracks (age cap 4) keep the required halo below the core
    # size; the default age cap of 10 makes every 16-frame window fall back
    # to the (equally exact) unsharded solve.
    intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2,
                            bf=-120.0 * 0.54, width=W, height=H)
    cfg = VOConfig.for_image(H, W, ransac_iterations=200, age_threshold=4)
    seq = SyntheticStereoSequence(intr, num_frames=17, seed=0, speed=0.5)
    poses, results, snaps = run_sequence(seq, cfg, intr, collect_tracks=True)
    tracks = _window_tracks(snaps, list(range(0, 16)))
    problem = build_window_problem(tracks, poses[:16], intr)
    assert problem is not None
    halo = required_ring_halo(problem)
    D = 2
    core = 16 // D
    assert halo <= core, (
        f"tracks span too far (halo {halo} > core {core}); "
        "ring path untested")
    mesh = make_mesh({"seq": D})
    ring = ring_ba_solve(problem, mesh, halo=None, rounds=8,
                         huber_delta=1.5)
    ref = ba_solve(problem, iterations=8, huber_delta=1.5)
    np.testing.assert_allclose(np.asarray(ring.poses),
                               np.asarray(ref.poses), atol=5e-4)
    # And the factory picks the same path for this problem shape.
    solved = make_ring_window_solver(mesh)(problem)
    np.testing.assert_allclose(np.asarray(solved.poses),
                               np.asarray(ring.poses), atol=5e-4)


def test_smoothing_noop_without_enough_tracks(vo_run):
    """Windows where no usable tracks exist leave the chain untouched."""
    seq, intr, poses, snaps = vo_run
    dead = [s._replace(valid=np.zeros_like(np.asarray(s.valid)))
            for s in snaps]
    out = smooth_trajectory_ba(dead, poses, intr, window=8)
    np.testing.assert_allclose(out, poses, atol=1e-12)


def test_scan_path_track_collection_matches_interactive(vo_run):
    """VERDICT.md r4 weak #4 done-criterion: the scan fast path emits
    TrackSnapshots (make_scan_step_fn with_tracks) equivalent to the
    interactive runner's, and BA smoothing over them improves ATE — BA no
    longer needs the ~10x slower per-frame runner."""
    from visual_odom_tpu.runner.pipeline import run_sequence_scan

    seq, intr, poses_i, snaps_i = vo_run
    cfg = VOConfig.for_image(H, W, ransac_iterations=200)
    out = run_sequence_scan(list(seq), cfg, intr, chunk=8,
                            collect_tracks=True)
    poses_s, fetched, _, _, snaps_s = out
    n = len(snaps_i)
    assert len(snaps_s) == n
    # Same step math, different jit boundary: identical track topology,
    # near-identical measurements.
    for a, b in zip(snaps_i, snaps_s):
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid))
        np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
        v = np.asarray(a.valid)
        np.testing.assert_allclose(np.asarray(a.points_l1)[v],
                                   np.asarray(b.points_l1)[v], atol=1e-3)
    gt = seq.poses[: len(poses_s)]
    smoothed = smooth_trajectory_ba(snaps_s, poses_s[: n + 1], intr,
                                    window=8, iterations=8)
    assert ate_rmse(gt[: n + 1], smoothed) < ate_rmse(
        gt[: len(poses_s)], poses_s) * 0.9
