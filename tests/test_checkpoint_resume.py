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


# --- fast-path (chunked-scan) checkpointing — VERDICT.md round-3 weak #5 ---


class _FlakySeq:
    """Random-access view that raises once when frame ``crash_at`` is first
    requested — a decode failure mid-run, at whatever chunk it lands in."""

    def __init__(self, seq, crash_at):
        self._seq = seq
        self._crash_at = crash_at
        self._armed = True

    def __len__(self):
        return len(self._seq)

    def frame(self, i):
        if self._armed and i >= self._crash_at:
            self._armed = False
            raise RuntimeError("injected decode failure")
        return self._seq.frame(i)


def test_scan_resume_bitwise_matches_uninterrupted(tmp_path):
    """Crash mid-run, resume from the chunk-boundary snapshot: poses and
    every per-frame output match the uninterrupted run bit for bit (chunk
    boundaries realign because checkpoints round up to chunk multiples)."""
    import pytest

    from visual_odom_tpu.runner.pipeline import (
        run_sequence_scan,
        run_sequence_scan_resumable,
    )

    seq, cfg, intr = _setup(42)

    # Uninterrupted references: the plain scan runner AND the resumable
    # runner with no prior snapshot must agree with each other too.
    poses_plain, fetched_plain, _, _ = run_sequence_scan(
        iter(seq), cfg, intr, chunk=8)
    ck_full = str(tmp_path / "full.npz")
    poses_full, fetched_full, _, done = run_sequence_scan_resumable(
        seq, cfg, intr, checkpoint_path=ck_full, checkpoint_every=16,
        chunk=8)
    assert done == 41
    np.testing.assert_array_equal(poses_full, poses_plain)
    np.testing.assert_array_equal(fetched_full.T_inv, fetched_plain.T_inv)

    # Crash at frame 30: the failure lands while chunk 4 streams, so the
    # last durable snapshot is step 16. Resume with the healthy sequence.
    ck = str(tmp_path / "crash.npz")
    flaky = _FlakySeq(seq, crash_at=30)
    with pytest.raises(RuntimeError, match="injected"):
        run_sequence_scan_resumable(
            flaky, cfg, intr, checkpoint_path=ck, checkpoint_every=16,
            chunk=8)
    import os

    assert os.path.exists(ck)
    poses_res, fetched_res, _, done_res = run_sequence_scan_resumable(
        seq, cfg, intr, checkpoint_path=ck, checkpoint_every=16, chunk=8)
    assert done_res < 41  # resumed, did not redo the whole run
    np.testing.assert_array_equal(poses_res, poses_full)
    for a, b in zip(fetched_res, fetched_full):
        np.testing.assert_array_equal(a, b)

    # Resume-from-complete: when the last snapshot covers the whole run
    # (n_steps lands exactly on a checkpoint boundary), resuming returns
    # the stored outputs without reading a single frame.
    seq33, _, _ = _setup(33)  # 32 steps = 4 chunks; snapshots @ 16 and 32
    ck33 = str(tmp_path / "complete.npz")
    poses33, _, _, _ = run_sequence_scan_resumable(
        seq33, cfg, intr, checkpoint_path=ck33, checkpoint_every=16,
        chunk=8)
    poses_again, _, _, done_again = run_sequence_scan_resumable(
        _FlakySeq(seq33, crash_at=0), cfg, intr, checkpoint_path=ck33,
        checkpoint_every=16, chunk=8)
    assert done_again == 0
    np.testing.assert_array_equal(poses_again, poses33)


def test_scan_checkpoint_rejects_torn_snapshot(tmp_path):
    from visual_odom_tpu.utils.checkpoint import (
        CorruptCheckpoint,
        load_scan_checkpoint,
    )

    p = tmp_path / "torn.npz"
    p.write_bytes(b"PK\x03\x04 definitely not a full zip")
    import pytest

    with pytest.raises(CorruptCheckpoint):
        load_scan_checkpoint(str(p))


def test_cli_run_chunked_with_checkpoint(tmp_path):
    """`vo run --chunk N --checkpoint` rides the fast scan path: snapshot
    written, resume completes the run, poses saved."""
    from visual_odom_tpu.runner.cli import main

    calib = tmp_path / "calib.yaml"
    calib.write_text(
        "%YAML:1.0\n"
        "Camera.fx: 120.0\nCamera.fy: 120.0\n"
        "Camera.cx: 80.0\nCamera.cy: 60.0\n"
        "Camera.bf: -64.8\nCamera.width: 160\nCamera.height: 120\n")
    ck = tmp_path / "ck.npz"
    rc = main(["run", "synthetic", str(calib), "--max-frames", "17",
               "--chunk", "4", "--checkpoint", str(ck),
               "--checkpoint-every", "8",
               "--output", str(tmp_path / "p.txt"), "--quiet"])
    assert rc == 0
    assert ck.exists()
    rows = (tmp_path / "p.txt").read_text().splitlines()
    assert len(rows) == 17
    # Re-invoke: resumes from the final snapshot instead of recomputing.
    rc = main(["run", "synthetic", str(calib), "--max-frames", "17",
               "--chunk", "4", "--checkpoint", str(ck),
               "--output", str(tmp_path / "p2.txt"), "--quiet"])
    assert rc == 0
    assert (tmp_path / "p2.txt").read_text() == (tmp_path / "p.txt").read_text()


def test_scan_resume_with_tracks_bitwise(tmp_path):
    """collect_tracks on the resumable fast path: snapshots persist the
    per-frame track emissions (trk_* keys), so a crashed+resumed run hands
    windowed BA the same complete track list — poses AND every
    TrackSnapshot bitwise-equal to the uninterrupted run."""
    import pytest

    from visual_odom_tpu.runner.pipeline import run_sequence_scan_resumable
    from visual_odom_tpu.utils.checkpoint import (
        CorruptCheckpoint,
        load_scan_checkpoint,
    )

    seq, cfg, intr = _setup(42)
    ck_full = str(tmp_path / "full_trk.npz")
    poses_full, fetched_full, _, _, snaps_full = run_sequence_scan_resumable(
        seq, cfg, intr, checkpoint_path=ck_full, checkpoint_every=16,
        chunk=8, collect_tracks=True)
    assert len(snaps_full) == 41

    ck = str(tmp_path / "crash_trk.npz")
    flaky = _FlakySeq(seq, crash_at=30)
    with pytest.raises(RuntimeError, match="injected"):
        run_sequence_scan_resumable(
            flaky, cfg, intr, checkpoint_path=ck, checkpoint_every=16,
            chunk=8, collect_tracks=True)
    poses_res, fetched_res, _, done_res, snaps_res = \
        run_sequence_scan_resumable(
            seq, cfg, intr, checkpoint_path=ck, checkpoint_every=16,
            chunk=8, collect_tracks=True)
    assert done_res < 41
    np.testing.assert_array_equal(poses_res, poses_full)
    assert len(snaps_res) == len(snaps_full)
    for a, b in zip(snaps_res, snaps_full):
        for fa, fb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))

    # A snapshot WITHOUT track emissions cannot resume a collect_tracks
    # run: rejected as incompatible (fresh start), not silently resumed
    # with a truncated track list.
    ck_plain = str(tmp_path / "plain.npz")
    with pytest.raises(RuntimeError, match="injected"):
        run_sequence_scan_resumable(
            _FlakySeq(seq, crash_at=30), cfg, intr,
            checkpoint_path=ck_plain, checkpoint_every=16, chunk=8)
    poses_mixed, _, _, done_mixed, snaps_mixed = run_sequence_scan_resumable(
        seq, cfg, intr, checkpoint_path=ck_plain, checkpoint_every=16,
        chunk=8, collect_tracks=True)
    assert done_mixed == 41  # fresh start: the whole run was redone
    np.testing.assert_array_equal(poses_mixed, poses_full)
