import numpy as np

from visual_odom_tpu.eval.kitti_eval import (
    ate_rmse,
    average_errors,
    calc_sequence_errors,
    rotation_error,
    translation_error,
    trajectory_distances,
    evaluate_sequence,
)
from visual_odom_tpu.io.kitti import load_poses, save_poses_kitti


def straight_line_poses(n, step=1.0):
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 2, 3] = np.arange(n) * step
    return poses


def test_trajectory_distances():
    poses = straight_line_poses(5, step=2.0)
    d = trajectory_distances(poses)
    np.testing.assert_allclose(d, [0, 2, 4, 6, 8])


def test_zero_error_on_identical():
    poses = straight_line_poses(1500, step=1.0)  # 1.5 km: covers all lengths
    errs = calc_sequence_errors(poses, poses)
    assert len(errs) > 0
    t, r = average_errors(errs)
    assert t == 0.0 and r == 0.0
    assert ate_rmse(poses, poses) == 0.0


def test_translation_error_hand_computed():
    # Result lags GT by 1% along a 200 m segment.
    gt = straight_line_poses(2001, step=0.5)     # 1 km
    res = straight_line_poses(2001, step=0.495)  # 1% slower
    errs = calc_sequence_errors(gt, res)
    t, r = average_errors(errs)
    assert abs(t - 0.01) < 1e-3, t
    assert r < 1e-9


def test_rotation_error_hand_computed():
    th = 0.05
    E = np.eye(4)
    E[:3, :3] = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    assert abs(rotation_error(E) - th) < 1e-9
    E2 = np.eye(4)
    E2[:3, 3] = [3.0, 4.0, 0.0]
    assert abs(translation_error(E2) - 5.0) < 1e-12


def test_segment_structure_matches_devkit():
    # step 10 starts, lengths {100..800}: a 250 m straight path at 1 m/frame
    # yields segments of length 100 and 200 only.
    gt = straight_line_poses(251, step=1.0)
    errs = calc_sequence_errors(gt, gt)
    lengths = {e.length for e in errs}
    assert lengths == {100.0, 200.0}
    firsts = sorted({e.first_frame for e in errs})
    assert firsts[0] == 0 and all(f % 10 == 0 for f in firsts)
    # speed = len / (0.1 * num_frames); 100 m in 101 frames
    e100 = [e for e in errs if e.length == 100.0 and e.first_frame == 0][0]
    assert abs(e100.speed - 100.0 / (0.1 * 102)) < 1e-5


def test_pose_io_roundtrip(tmp_path):
    poses = straight_line_poses(7, 0.3)
    poses[3, :3, :3] = np.array(
        [[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float64
    )
    p = tmp_path / "poses.txt"
    save_poses_kitti(str(p), poses)
    back = load_poses(str(p))
    np.testing.assert_allclose(back, poses, atol=1e-8)


def test_evaluate_sequence_keys():
    poses = straight_line_poses(1200)
    out = evaluate_sequence(poses, poses)
    for k in ("t_err_pct", "r_err_deg_per_m", "ate_rmse_m", "rpe_trans_m"):
        assert k in out


def test_live_display_offscreen():
    """LiveDisplay (the reference's imshow windows, guarded for headless
    hosts) renders per-frame in offscreen mode through run_sequence."""
    import numpy as np

    from visual_odom_tpu.config import CameraIntrinsics, VOConfig
    from visual_odom_tpu.eval.plot import LiveDisplay
    from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
    from visual_odom_tpu.runner.pipeline import run_sequence

    H, W = 120, 160
    intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2,
                            bf=-120.0 * 0.54, width=W, height=H)
    cfg = VOConfig.for_image(H, W, ransac_iterations=100)
    seq = SyntheticStereoSequence(intr, num_frames=4, seed=0, speed=0.5)
    live = LiveDisplay(poses_gt=seq.poses, offscreen=True)
    poses, results = run_sequence(seq, cfg, intr, live=live)
    assert live.frames_shown == 3
    assert live.canvas.any()                      # GT + estimate drawn
    assert live.last_tracks_vis is not None
    assert live.last_tracks_vis.shape == (H, W, 3)
