"""Checkpoint/resume: an interrupted run must reproduce an uninterrupted one."""

import numpy as np

from visual_odom_tpu.config import CameraIntrinsics, VOConfig
from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
from visual_odom_tpu.runner.pipeline import run_sequence_resumable


def _setup(n=9):
    h, w = 120, 160
    intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0,
                            bf=-64.8, width=w, height=h)
    cfg = VOConfig.for_image(h, w)
    seq = SyntheticStereoSequence(intr, num_frames=n, seed=0)
    return seq, cfg, intr


def test_resume_bitwise_matches_uninterrupted(tmp_path):
    seq, cfg, intr = _setup(9)

    full_ck = str(tmp_path / "full.npz")
    poses_full, _ = run_sequence_resumable(
        seq, cfg, intr, checkpoint_path=full_ck, checkpoint_every=3)

    # Interrupted at frame 5 (snapshot written at i == n-1), then resumed.
    part_ck = str(tmp_path / "part.npz")
    poses_part, _ = run_sequence_resumable(
        seq, cfg, intr, checkpoint_path=part_ck, checkpoint_every=3,
        max_frames=6)
    assert len(poses_part) == 6
    poses_resumed, results = run_sequence_resumable(
        seq, cfg, intr, checkpoint_path=part_ck, checkpoint_every=3)

    assert len(poses_resumed) == len(poses_full) == 9
    np.testing.assert_array_equal(poses_resumed, poses_full)
    # resumed run only processed frames 6..8
    assert [r.frame_id for r in results] == [6, 7, 8]


def test_checkpoint_writes_poses_file(tmp_path):
    seq, cfg, intr = _setup(5)
    out = tmp_path / "poses.txt"
    poses, _ = run_sequence_resumable(
        seq, cfg, intr, checkpoint_path=str(tmp_path / "ck.npz"),
        checkpoint_every=2, poses_path=str(out))
    rows = out.read_text().splitlines()
    assert len(rows) == len(poses) == 5
    assert len(rows[0].split()) == 12  # KITTI 3x4 row format


def test_cli_run_with_checkpoint_synthetic(tmp_path):
    from visual_odom_tpu.runner.cli import main

    calib = tmp_path / "calib.yaml"
    calib.write_text(
        "%YAML:1.0\n"
        "Camera.fx: 120.0\nCamera.fy: 120.0\n"
        "Camera.cx: 80.0\nCamera.cy: 60.0\n"
        "Camera.bf: -64.8\nCamera.width: 160\nCamera.height: 120\n")
    ck = tmp_path / "ck.npz"
    rc = main(["run", "synthetic", str(calib), "--max-frames", "5",
               "--checkpoint", str(ck), "--checkpoint-every", "2",
               "--output", str(tmp_path / "p.txt"), "--quiet"])
    assert rc == 0
    assert ck.exists()
    # Resume to the full default length picks up from the snapshot.
    rc = main(["run", "synthetic", str(calib), "--max-frames", "8",
               "--checkpoint", str(ck),
               "--output", str(tmp_path / "p2.txt"), "--quiet"])
    assert rc == 0
    assert len((tmp_path / "p2.txt").read_text().splitlines()) == 8
