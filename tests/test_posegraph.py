"""Pose-graph optimization (ba/posegraph.py) + loop closure wiring
(runner/loopclosure.py) — SURVEY.md section 7 layer 8 "pose-graph
refinement" (VERDICT r4 missing #2 / next-step #4)."""

import numpy as np
import pytest

from visual_odom_tpu.ba.posegraph import (
    PoseGraph,
    build_keyframe_graph,
    posegraph_solve,
    redistribute_poses,
    sharded_posegraph_solve,
)


def _yaw(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _circle_truth(n, radius=10.0):
    """True world poses around a closed circle (headings tangent)."""
    Ts = []
    for k in range(n):
        th = 2 * np.pi * k / n
        T = np.eye(4)
        T[:3, :3] = _yaw(th)
        T[:3, 3] = [radius * np.sin(th), 0.0, radius * (1 - np.cos(th))]
        Ts.append(T)
    return np.stack(Ts)


def _drifted_chain(truth, rot_noise=0.004, t_noise=0.02, seed=3):
    """Chained odometry with per-edge noise — the drifted initialization."""
    from visual_odom_tpu.core.lie import rodrigues

    rng = np.random.default_rng(seed)
    inv = np.linalg.inv
    chained = [truth[0]]
    for k in range(len(truth) - 1):
        rel = inv(truth[k]) @ truth[k + 1]
        D = np.eye(4)
        D[:3, :3] = np.asarray(
            rodrigues(rng.normal(0, rot_noise, 3).astype(np.float32)),
            np.float64)
        D[:3, 3] = rng.normal(0, t_noise, 3)
        chained.append(chained[-1] @ rel @ D)
    return np.stack(chained)


@pytest.fixture(scope="module")
def drifted_circle():
    truth = _circle_truth(40)
    est = _drifted_chain(truth)
    return truth, est


def _endpoint_err(poses, truth):
    return float(np.linalg.norm(poses[-1][:3, 3] - truth[-1][:3, 3]))


def test_posegraph_closes_drifted_circle(drifted_circle):
    """A single measured loop edge pulls the drifted chain back onto the
    circle: endpoint error drops by >= 5x, gauge node pinned."""
    truth, est = drifted_circle
    inv = np.linalg.inv
    true_rel = inv(truth[0]) @ truth[-1]
    graph = build_keyframe_graph(est, np.arange(len(est)),
                                 [(0, len(est) - 1, true_rel, 10.0)])
    solved = posegraph_solve(graph, iterations=10)
    nodes = np.asarray(solved.nodes, np.float64)
    before = _endpoint_err(est, truth)
    after = _endpoint_err(nodes, truth)
    assert after < 0.2 * before, (before, after)
    # Gauge: node 0 did not move.
    np.testing.assert_allclose(nodes[0], est[0], atol=1e-4)
    # Every node still a rotation (retraction stayed on the manifold).
    RtR = np.einsum("nij,nik->njk", nodes[:, :3, :3], nodes[:, :3, :3])
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape),
                               atol=1e-4)


def test_posegraph_noop_without_loop_edge(drifted_circle):
    """Odometry-only graph: GN has nothing to redistribute — nodes stay on
    the chained trajectory (residuals already ~0)."""
    truth, est = drifted_circle
    graph = build_keyframe_graph(est, np.arange(len(est)), [])
    solved = posegraph_solve(graph, iterations=5)
    np.testing.assert_allclose(np.asarray(solved.nodes), est, atol=1e-3)


def test_sharded_posegraph_matches_single(drifted_circle):
    """Edge-sharded solve over the 8-device CPU mesh float-matches the
    single-device solve (zero-weight padding edges are exact no-ops)."""
    from visual_odom_tpu.parallel.mesh import make_mesh

    truth, est = drifted_circle
    inv = np.linalg.inv
    true_rel = inv(truth[0]) @ truth[-1]
    graph = build_keyframe_graph(est, np.arange(len(est)),
                                 [(0, len(est) - 1, true_rel, 10.0)])
    single = posegraph_solve(graph, iterations=8)
    mesh = make_mesh({"model": 8})
    sharded = sharded_posegraph_solve(graph, mesh, iterations=8)
    np.testing.assert_allclose(np.asarray(sharded.nodes),
                               np.asarray(single.nodes), atol=2e-4)


def test_redistribute_preserves_relative_chain(drifted_circle):
    """Non-keyframe frames keep their odometry deltas relative to their
    anchoring keyframe after redistribution."""
    truth, est = drifted_circle
    kf = np.arange(0, len(est), 5)
    if kf[-1] != len(est) - 1:
        kf = np.append(kf, len(est) - 1)
    new_kf = est[kf].copy()
    new_kf[2:, :3, 3] += 0.5  # pretend the solver moved keyframes 2+
    out = redistribute_poses(est, kf, new_kf)
    np.testing.assert_allclose(out[kf], new_kf, atol=1e-9)
    inv = np.linalg.inv
    # In-segment relative poses unchanged.
    np.testing.assert_allclose(inv(out[5]) @ out[7],
                               inv(est[5]) @ est[7], atol=1e-9)


def test_close_loops_on_loop_course():
    """End-to-end: run the scan pipeline over a small loop course, detect
    the revisit from the ESTIMATE, measure the loop edge with a real VO
    step, solve, and verify the trajectory's own loop-closure error
    shrinks (the VERDICT r4 done-criterion at bench scale)."""
    from visual_odom_tpu.config import CameraIntrinsics, VOConfig
    from visual_odom_tpu.io.synthetic import (
        SyntheticStereoSequence,
        make_course,
    )
    from visual_odom_tpu.runner.loopclosure import close_loops
    from visual_odom_tpu.runner.pipeline import run_sequence_scan

    H, W = 120, 160
    intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2,
                            bf=-120.0 * 0.54, width=W, height=H)
    # Pinned toy config: this test exercises the loop-closure machinery,
    # not the inlier-floor default (the 120x160 loop course has healthy
    # frames near the auto floor, which would skew the drift it detects).
    cfg = VOConfig.for_image(H, W, ransac_iterations=200,
                             min_accept_inliers=0)
    n = 150
    seq = make_course("loop", intr, num_frames=n, speed=0.5)
    frames = list(seq)
    lf = SyntheticStereoSequence._loop_schedule(n)[2]
    poses, fetched, _, _ = run_sequence_scan(frames, cfg, intr, chunk=16)
    poses = poses[:n]

    new_poses, info = close_loops(
        poses, lambda i: frames[i], cfg, intr,
        keyframe_every=8, radius=12.0, min_separation=lf - 16,
        min_edge_inliers=3, max_measurements=16, gt_loop_pair=(0, lf))
    assert info.candidates, "no revisit candidate found"
    assert info.edges, "no loop edge accepted"
    assert info.closure_after_m is not None
    # GT closes to ~the lateral wobble; the refined estimate must land
    # well inside the raw drift.
    assert info.closure_after_m < info.closure_before_m, info
    gt = seq.poses[:n]
    err_new = np.linalg.norm(new_poses[:, :3, 3] - gt[:, :3, 3], axis=1)
    err_old = np.linalg.norm(poses[:, :3, 3] - gt[:, :3, 3], axis=1)
    assert np.sqrt((err_new ** 2).mean()) <= np.sqrt(
        (err_old ** 2).mean()) * 1.05
