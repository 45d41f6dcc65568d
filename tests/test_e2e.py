"""End-to-end integration: synthetic stereo sequence -> trajectory -> score.

SURVEY.md section 4 "Integration": short synthetic sequence end-to-end with
the trajectory checked against exact ground truth.
"""

import numpy as np
import pytest

from visual_odom_tpu.config import CameraIntrinsics, VOConfig
from visual_odom_tpu.eval.kitti_eval import ate_rmse
from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
from visual_odom_tpu.runner.pipeline import run_sequence

H, W = 120, 160


@pytest.fixture(scope="module")
def e2e_run(tmp_path_factory):
    intr = CameraIntrinsics(
        fx=120.0, fy=120.0, cx=W / 2, cy=H / 2, bf=-120.0 * 0.54,
        width=W, height=H,
    )
    cfg = VOConfig.for_image(H, W, ransac_iterations=200)
    seq = SyntheticStereoSequence(intr, num_frames=10, seed=0, speed=0.5)
    tmp = tmp_path_factory.mktemp("e2e")
    poses, results = run_sequence(
        seq, cfg, intr,
        metrics_path=str(tmp / "metrics.jsonl"),
        poses_path=str(tmp / "poses.txt"),
    )
    return seq, poses, results, tmp


def test_trajectory_close_to_ground_truth(e2e_run):
    seq, poses, results, _ = e2e_run
    gt = seq.poses[: len(poses)]
    ate = ate_rmse(gt, poses)
    assert ate < 0.12, f"ATE {ate}"
    # Scale: total distance within 10% of ground truth.
    dist_gt = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum()
    dist_vo = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1).sum()
    assert abs(dist_vo - dist_gt) / dist_gt < 0.1


def test_frames_accepted_and_tracked(e2e_run):
    _, _, results, _ = e2e_run
    accept_ratio = np.mean([r.accept for r in results])
    assert accept_ratio >= 0.8
    assert all(r.num_matched > 20 for r in results)
    assert all(r.num_inliers > 10 for r in results)


def test_artifacts_written(e2e_run):
    import json

    seq, poses, results, tmp = e2e_run
    from visual_odom_tpu.io.kitti import load_poses

    saved = load_poses(str(tmp / "poses.txt"))
    assert len(saved) == len(poses)
    np.testing.assert_allclose(saved[-1], poses[-1], atol=1e-6)

    lines = (tmp / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == len(results)
    rec = json.loads(lines[0])
    for k in ("num_inliers", "num_matched", "scale", "accept", "frame_time_ms"):
        assert k in rec


def test_checkpoint_resume(e2e_run):
    """Checkpoint mid-sequence, resume, and land on the same trajectory."""
    from visual_odom_tpu.config import CameraIntrinsics, VOConfig
    from visual_odom_tpu.runner.pipeline import VisualOdometry
    from visual_odom_tpu.utils.checkpoint import (
        load_checkpoint,
        restore_vo,
        save_checkpoint,
    )

    seq, poses_full, _, tmp = e2e_run
    intr = CameraIntrinsics(
        fx=120.0, fy=120.0, cx=W / 2, cy=H / 2, bf=-120.0 * 0.54,
        width=W, height=H,
    )
    cfg = VOConfig.for_image(H, W, ransac_iterations=200)

    frames = [seq.frame(i) for i in range(len(seq))]
    vo = VisualOdometry(cfg, intr, seed=0)
    vo.initialize(*frames[0])
    for i in range(1, 5):
        vo.process_frame(*frames[i])
    ck = str(tmp / "ck.npz")
    save_checkpoint(ck, vo)

    vo2 = VisualOdometry(cfg, intr, seed=0)
    vo2.initialize(*frames[0])
    nxt = restore_vo(vo2, load_checkpoint(ck), *frames[4])
    assert nxt == 5
    r_a = vo.process_frame(*frames[5])
    r_b = vo2.process_frame(*frames[5])
    np.testing.assert_allclose(r_a.pose, r_b.pose, atol=1e-5)
    assert r_a.num_matched == r_b.num_matched


def test_reacquire_after_total_tracking_loss():
    """Recovery regression (VERDICT.md round-1 weak #1): blank out two frames
    so every track dies and PnP diverges, then verify the tracker re-acquires
    within a couple of frames once structure returns. Exercises both fixes:
    the warm-start reset on gate rejection (a diverged tvec must not poison
    later solves) and the identity-start RANSAC hypotheses."""
    from visual_odom_tpu.runner.pipeline import VisualOdometry

    intr = CameraIntrinsics(
        fx=120.0, fy=120.0, cx=W / 2, cy=H / 2, bf=-120.0 * 0.54,
        width=W, height=H,
    )
    cfg = VOConfig.for_image(H, W, ransac_iterations=200)
    seq = SyntheticStereoSequence(intr, num_frames=12, seed=1, speed=0.5)
    frames = [seq.frame(i) for i in range(len(seq))]
    blank = np.zeros((H, W), np.uint8)

    vo = VisualOdometry(cfg, intr, seed=0)
    vo.initialize(*frames[0])
    for i in (1, 2, 3):
        assert vo.process_frame(*frames[i]).accept
    # Two featureless frames: all tracks die, the PnP solution diverges and
    # both frames must be gate-rejected.
    r_blank1 = vo.process_frame(blank, blank)
    r_blank2 = vo.process_frame(blank, blank)
    assert not r_blank2.accept
    assert r_blank2.num_matched == 0
    pose_frozen = vo.frame_pose.copy()
    # Structure returns. Frame 5 re-seeds detections against the blank t0
    # (no matches possible); from frame 6 on, tracking must be live again.
    vo.process_frame(*frames[5])
    recovered = [vo.process_frame(*frames[i]) for i in (6, 7, 8)]
    assert all(r.accept for r in recovered), [r.accept for r in recovered]
    assert all(r.num_inliers > 10 for r in recovered)
    # The pose was frozen through the outage (gate held), not corrupted.
    np.testing.assert_allclose(pose_frozen, r_blank2.pose, atol=1e-12)


def test_mono_rotation_mode_runs():
    """mono_rotation=True routes rotation through the essential path
    (reference src/visualOdometry.h:42 default; main passes false)."""
    from visual_odom_tpu.config import CameraIntrinsics, VOConfig
    from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
    from visual_odom_tpu.runner.pipeline import run_sequence
    from visual_odom_tpu.eval.kitti_eval import ate_rmse

    intr = CameraIntrinsics(
        fx=120.0, fy=120.0, cx=W / 2, cy=H / 2, bf=-120.0 * 0.54,
        width=W, height=H,
    )
    cfg = VOConfig.for_image(H, W, ransac_iterations=100, mono_rotation=True)
    seq = SyntheticStereoSequence(intr, num_frames=6, seed=3, speed=0.5)
    poses, results = run_sequence(seq, cfg, intr)
    assert np.mean([r.accept for r in results]) >= 0.6
    assert ate_rmse(seq.poses[: len(poses)], poses) < 0.3


@pytest.mark.parametrize("course", ["turning", "stress"])
def test_gauntlet_courses_trackable(course):
    """The adversarial gauntlet (VERDICT.md round-2 missing #1) at CI
    scale: near-gate turns, photometric drift, occluders and a low-texture
    stretch must not break tracking. The KITTI-size 1%-of-length accuracy
    gate runs in the bench; here we assert healthy tracking statistics and
    bounded drift at 120x160."""
    from visual_odom_tpu.io.synthetic import make_course

    intr = CameraIntrinsics(
        fx=120.0, fy=120.0, cx=W / 2, cy=H / 2, bf=-120.0 * 0.54,
        width=W, height=H,
    )
    cfg = VOConfig.for_image(H, W, ransac_iterations=200)
    seq = make_course(course, intr, num_frames=45, speed=0.5)
    poses, results = run_sequence(seq, cfg, intr)
    accept = np.mean([r.accept for r in results])
    assert accept >= 0.9, accept
    gt = seq.poses[: len(poses)]
    course_len = np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1))
    assert ate_rmse(gt, poses) <= 0.03 * course_len
    # The turning episodes really approach the gate: peak commanded yaw
    # above half the 0.1 rad rejection threshold.
    peak = max(abs(seq._turning_yaw_rate(i, len(seq))) for i in range(len(seq)))
    assert peak > 0.05


def test_rotation_gate_rejects_spike_and_recovers():
    """The "gatespike" course has a 3-frame 0.15 rad/frame yaw spike at
    mid-course: the 0.1 rad gate (reference src/main.cpp:201-208) must
    reject those frames (accept=False, pose integration skipped — exactly
    the reference's behavior) while the frames before the spike and after
    re-acquisition are accepted and tracked as healthily as ever."""
    import numpy as np

    from visual_odom_tpu.config import CameraIntrinsics, VOConfig
    from visual_odom_tpu.io.synthetic import make_course
    from visual_odom_tpu.runner.pipeline import run_sequence_scan

    H, W = 120, 160
    intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2,
                            bf=-120.0 * 0.54, width=W, height=H)
    cfg = VOConfig.for_image(H, W, ransac_iterations=150)
    n = 41
    seq = make_course("gatespike", intr, num_frames=n, speed=0.5)
    poses, fetched, _, _ = run_sequence_scan(list(seq), cfg, intr, chunk=8)
    accept = np.asarray(fetched.accept)[: n - 1]
    mid = n // 2
    # Step output k is the transition frame k -> k+1; the renderer applies
    # yaw(i) when stepping pose i -> i+1 with the spike at i in
    # [mid, mid+3), so transitions mid, mid+1, mid+2 carry 0.15 rad.
    spike_steps = {mid, mid + 1, mid + 2}
    for s in sorted(spike_steps):
        assert not accept[s], f"step {s} (0.15 rad yaw) must be rejected"
    before = accept[:mid]
    after = accept[mid + 5:]
    assert before.mean() >= 0.95, before.mean()
    assert after.mean() >= 0.9, after.mean()
    # Tracking re-acquires: late matches as healthy as early ones.
    nm = np.asarray(fetched.num_matched)[: n - 1]
    assert nm[mid + 6:].mean() >= 0.6 * nm[: mid - 1].mean()


def test_shi_tomasi_detector_tracks_sequence():
    """VOConfig.detector="shi-tomasi" (reference goodFeaturesToTrack surface,
    src/feature.cpp:49-62) drives the full pipeline green — VERDICT.md
    round-3 weak #8: the alternative detector must be reachable, not just
    implemented."""
    intr = CameraIntrinsics(
        fx=120.0, fy=120.0, cx=W / 2, cy=H / 2, bf=-120.0 * 0.54,
        width=W, height=H,
    )
    cfg = VOConfig.for_image(H, W, ransac_iterations=200,
                             detector="shi-tomasi")
    seq = SyntheticStereoSequence(intr, num_frames=10, seed=0, speed=0.5)
    poses, results = run_sequence(seq, cfg, intr)
    gt = seq.poses[: len(poses)]
    assert ate_rmse(gt, poses) < 0.15
    assert np.mean([r.accept for r in results]) >= 0.8
    assert all(r.num_matched > 20 for r in results)


def test_unknown_detector_rejected():
    with pytest.raises(ValueError, match="detector"):
        VOConfig.for_image(H, W, detector="orb")


def test_min_inlier_gate_rejects_scene_cut():
    """Beyond-reference failure detection (VOConfig.min_accept_inliers):
    a hard scene cut (lap-seam teleport) passes the reference's
    rotation+scale gates on a near-empty consensus — measured in the
    round-4 multi-lap soak — but the inlier floor rejects it. Floor 0 =
    reference semantics (cut accepted; the CLI opt-out); the shipped
    default is the feature-budget-scaled auto floor, settled by
    INLIER_FLOOR_r05.json."""
    from visual_odom_tpu.runner.pipeline import run_sequence_scan

    intr = CameraIntrinsics(
        fx=120.0, fy=120.0, cx=W / 2, cy=H / 2, bf=-120.0 * 0.54,
        width=W, height=H,
    )
    seq = SyntheticStereoSequence(intr, num_frames=12, seed=0, speed=0.5)
    seq2 = SyntheticStereoSequence(intr, num_frames=12, seed=7, speed=0.5)
    # A REAL scene cut: different procedural world (re-rolled textures).
    # (Teleporting within the SAME corridor is not a cut — the tracker
    # legitimately matches it and estimates the jump; measured.)
    cut = list(seq) + list(seq2)

    accepts = {}
    for floor in (0, 30):
        cfg = VOConfig.for_image(H, W, ransac_iterations=100,
                                 min_accept_inliers=floor)
        poses, fetched, _, _ = run_sequence_scan(iter(cut), cfg, intr,
                                                 chunk=4)
        accepts[floor] = np.asarray(fetched.accept)
    seam_step = 11                 # step consuming the teleported frame
    assert not accepts[30][seam_step]          # floor detects the cut
    # away from the seam both configs behave identically
    assert accepts[30][:10].all() and accepts[30][14:22].all()
    np.testing.assert_array_equal(accepts[0][:10], accepts[30][:10])


def test_parallel_uploader_matches_single_thread():
    """_ParallelChunkUploader (VERDICT r4 #2): N-thread uploads feed the
    scan loop in strict chunk order — poses and outputs are identical to
    the single-thread path, and the stats carry per-thread attribution."""
    import numpy as np

    from visual_odom_tpu.config import CameraIntrinsics, VOConfig
    from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
    from visual_odom_tpu.runner.pipeline import run_sequence_scan

    H, W = 120, 160
    intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2,
                            bf=-120.0 * 0.54, width=W, height=H)
    cfg = VOConfig.for_image(H, W, ransac_iterations=150)
    seq = SyntheticStereoSequence(intr, num_frames=41, seed=0, speed=0.5)
    frames = list(seq)
    p1, f1, _, n1 = run_sequence_scan(frames, cfg, intr, chunk=8)
    stats = {}
    p3, f3, _, n3 = run_sequence_scan(frames, cfg, intr, chunk=8,
                                      upload_threads=3, stats_out=stats)
    assert n1 == n3
    np.testing.assert_array_equal(p1, p3)
    np.testing.assert_array_equal(np.asarray(f1.accept),
                                  np.asarray(f3.accept))
    assert stats["threads"] == 3
    assert stats["chunks"] == 4  # chunk 0 uploads before the pool starts
    assert len(stats["per_thread"]) == 3
    assert stats["agg_upload_mb_s"] >= 0


def test_adaptive_skip_mode_branches():
    """lk_skip_mode="adaptive" (self-verifying fast path): the per-frame
    probe decides IN-PROGRAM between the fast and safe quads. Forcing the
    probe threshold to its extremes must reproduce the two fixed-mode
    trajectories bitwise — proving both cond branches are live and exactly
    the fixed-path computations (TEXTURE_ABLATION_r05.json motivates the
    probe; the accuracy validation is on-chip at KITTI scale)."""
    import numpy as np

    from visual_odom_tpu.config import CameraIntrinsics, VOConfig
    from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
    from visual_odom_tpu.runner.pipeline import run_sequence_scan

    intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2,
                            bf=-120.0 * 0.54, width=W, height=H)
    seq = SyntheticStereoSequence(intr, num_frames=17, seed=0, speed=0.5)
    frames = list(seq)

    def run(**kw):
        cfg = VOConfig.for_image(H, W, ransac_iterations=150, **kw)
        poses, fetched, _, _ = run_sequence_scan(frames, cfg, intr, chunk=8)
        return poses, fetched

    p_fast, f_fast = run(lk_skip_mode="fixed", lk_seed_skip_levels=2)
    p_safe, f_safe = run(lk_skip_mode="fixed", lk_seed_skip_levels=1)
    # Huge tolerance: probe never disagrees -> always the fast branch.
    p_ad_fast, _ = run(lk_skip_mode="adaptive", lk_probe_px=1e6)
    np.testing.assert_array_equal(p_ad_fast, p_fast)
    # Zero tolerance: probe always disagrees -> always the safe branch.
    p_ad_safe, _ = run(lk_skip_mode="adaptive", lk_probe_px=-1.0)
    np.testing.assert_array_equal(p_ad_safe, p_safe)
    # Sanity: the two fixed modes genuinely differ on this course.
    assert not np.array_equal(p_fast, p_safe)
