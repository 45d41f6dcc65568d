"""Failure-injection tests (SURVEY.md section 5 failure detection /
elastic recovery; VERDICT.md round-1 next-round item 8):

- a run SIGKILLed mid-sequence resumes from its checkpoint and lands on the
  identical trajectory an uninterrupted run produces;
- a missing or truncated PNG mid-sequence ends the sequence cleanly at the
  last good frame (the reference crashes: empty imread -> cvtColor throws,
  src/utils.cpp:178);
- a torn/corrupt checkpoint is rejected and the run starts fresh instead of
  resuming from garbage.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from visual_odom_tpu.config import CameraIntrinsics
from visual_odom_tpu.io.synthetic import SyntheticStereoSequence

CALIB = ("%YAML:1.0\n"
         "Camera.fx: 120.0\nCamera.fy: 120.0\n"
         "Camera.cx: 80.0\nCamera.cy: 60.0\n"
         "Camera.bf: -64.8\nCamera.width: 160\nCamera.height: 120\n")

_INTR = CameraIntrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0,
                         bf=-64.8, width=160, height=120)


def _write_kitti_dir(root, n_frames, seed=0):
    from PIL import Image

    seq = SyntheticStereoSequence(_INTR, num_frames=n_frames, seed=seed)
    os.makedirs(f"{root}/image_0")
    os.makedirs(f"{root}/image_1")
    for i in range(n_frames):
        l, r = seq.frame(i)
        Image.fromarray(np.asarray(l, np.uint8)).save(
            f"{root}/image_0/{i:06d}.png")
        Image.fromarray(np.asarray(r, np.uint8)).save(
            f"{root}/image_1/{i:06d}.png")


def _cli_env():
    env = dict(os.environ)
    # Force host CPU in the subprocess (sitecustomize would otherwise
    # register the axon TPU tunnel).
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", ""))
    return env


def test_kill_and_resume_matches_uninterrupted(tmp_path):
    """SIGKILL the run once a checkpoint exists; the resumed run's poses
    must be bitwise-identical to an uninterrupted run's."""
    calib = tmp_path / "calib.yaml"
    calib.write_text(CALIB)
    ck = tmp_path / "ck.npz"
    out_resumed = tmp_path / "resumed.txt"
    out_clean = tmp_path / "clean.txt"
    cmd = [sys.executable, "-m", "visual_odom_tpu.runner.cli", "run",
           "synthetic", str(calib), "--max-frames", "8",
           "--checkpoint", str(ck), "--checkpoint-every", "2", "--quiet"]

    # Victim process: kill it the moment the first snapshot lands.
    p = subprocess.Popen(cmd + ["--output", str(out_resumed)],
                         env=_cli_env(), stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    deadline = time.time() + 300
    while time.time() < deadline and p.poll() is None:
        if ck.exists() and ck.stat().st_size > 0:
            break
        time.sleep(0.2)
    if p.poll() is None:
        os.kill(p.pid, signal.SIGKILL)
        p.wait()
        assert ck.exists(), "no checkpoint was written before the kill"
        killed_mid_run = True
    else:
        # Finished before a snapshot beat the poll loop — still fine, the
        # resume below is then a no-op continuation.
        killed_mid_run = p.returncode != 0

    # Resume to completion.
    r = subprocess.run(cmd + ["--output", str(out_resumed)], env=_cli_env(),
                       capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]

    # Uninterrupted reference run (no checkpoint).
    cmd_clean = [sys.executable, "-m", "visual_odom_tpu.runner.cli", "run",
                 "synthetic", str(calib), "--max-frames", "8", "--quiet",
                 "--output", str(out_clean)]
    r2 = subprocess.run(cmd_clean, env=_cli_env(), capture_output=True,
                        text=True, timeout=420)
    assert r2.returncode == 0, r2.stderr[-2000:]

    resumed = np.loadtxt(out_resumed)
    clean = np.loadtxt(out_clean)
    assert resumed.shape == clean.shape == (8, 12)
    np.testing.assert_array_equal(resumed, clean)


def test_missing_png_mid_sequence_ends_cleanly(tmp_path):
    from visual_odom_tpu.io.kitti import KittiSequence

    _write_kitti_dir(str(tmp_path / "seq"), 6)
    os.remove(tmp_path / "seq" / "image_1" / "000003.png")  # right eye gone
    frames = list(KittiSequence(str(tmp_path / "seq")))
    assert len(frames) == 3  # frames 0..2, then clean EOS


def test_truncated_png_mid_sequence_ends_cleanly(tmp_path):
    from visual_odom_tpu.io.kitti import KittiSequence

    _write_kitti_dir(str(tmp_path / "seq"), 6)
    bad = tmp_path / "seq" / "image_0" / "000004.png"
    data = bad.read_bytes()
    bad.write_bytes(data[: len(data) // 3])  # torn mid-file
    frames = list(KittiSequence(str(tmp_path / "seq")))
    assert len(frames) == 4  # frames 0..3, then clean EOS


def test_missing_png_prefetched_stream_ends_cleanly(tmp_path):
    from visual_odom_tpu.io.kitti import KittiSequence

    _write_kitti_dir(str(tmp_path / "seq"), 6)
    os.remove(tmp_path / "seq" / "image_1" / "000002.png")
    frames = list(KittiSequence(str(tmp_path / "seq")).iter_prefetched())
    assert len(frames) == 2


def test_torn_checkpoint_rejected_and_run_starts_fresh(tmp_path):
    from visual_odom_tpu.config import VOConfig
    from visual_odom_tpu.runner.pipeline import (
        run_sequence,
        run_sequence_resumable,
    )
    from visual_odom_tpu.utils.checkpoint import (
        CorruptCheckpoint,
        load_checkpoint,
    )

    ck = tmp_path / "torn.npz"
    ck.write_bytes(b"PK\x03\x04 this is not a real npz payload")
    with pytest.raises(CorruptCheckpoint):
        load_checkpoint(str(ck))

    cfg = VOConfig.for_image(120, 160, ransac_iterations=100)
    seq = SyntheticStereoSequence(_INTR, num_frames=5, seed=0, speed=0.5)
    poses, results = run_sequence_resumable(
        seq, cfg, _INTR, checkpoint_path=str(ck), checkpoint_every=2)
    assert len(poses) == 5                       # full run, fresh start
    ref_poses, _ = run_sequence(seq, cfg, _INTR)
    np.testing.assert_allclose(poses, ref_poses, atol=1e-12)
    # The fresh run overwrote the torn file with a valid snapshot.
    assert int(load_checkpoint(str(ck))["frame_id"]) >= 2


def test_incomplete_checkpoint_keys_rejected(tmp_path):
    from visual_odom_tpu.utils.checkpoint import (
        CorruptCheckpoint,
        load_checkpoint,
    )

    ck = tmp_path / "partial.npz"
    np.savez(ck, frame_pose=np.eye(4), frame_id=np.int64(3))
    with pytest.raises(CorruptCheckpoint, match="missing keys"):
        load_checkpoint(str(ck))
