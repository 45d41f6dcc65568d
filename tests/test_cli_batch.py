"""CLI surfaces: run-batch (data-parallel lockstep) and tracking overlays."""

import os

import numpy as np
import pytest

from visual_odom_tpu.config import CameraIntrinsics
from visual_odom_tpu.io.synthetic import SyntheticStereoSequence


CALIB = ("%YAML:1.0\n"
         "Camera.fx: 120.0\nCamera.fy: 120.0\n"
         "Camera.cx: 80.0\nCamera.cy: 60.0\n"
         "Camera.bf: -64.8\nCamera.width: 160\nCamera.height: 120\n")


def _write_kitti_dir(root, n_frames, seed):
    from PIL import Image

    intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0,
                            bf=-64.8, width=160, height=120)
    seq = SyntheticStereoSequence(intr, num_frames=n_frames, seed=seed)
    os.makedirs(f"{root}/image_0")
    os.makedirs(f"{root}/image_1")
    for i in range(n_frames):
        l, r = seq.frame(i)
        Image.fromarray(np.asarray(l, np.uint8)).save(
            f"{root}/image_0/{i:06d}.png")
        Image.fromarray(np.asarray(r, np.uint8)).save(
            f"{root}/image_1/{i:06d}.png")


def test_cli_run_batch_two_sequences(tmp_path, capsys):
    from visual_odom_tpu.runner.cli import main

    for name, seed in (("05", 0), ("06", 1)):
        _write_kitti_dir(str(tmp_path / name), 5, seed)
    calib = tmp_path / "calib.yaml"
    calib.write_text(CALIB)
    out = tmp_path / "out"
    rc = main(["run-batch", str(tmp_path / "05"), str(tmp_path / "06"),
               "--calibration", str(calib), "--out-dir", str(out),
               "--data-parallel", "2"])
    assert rc == 0
    for name in ("05", "06"):
        rows = (out / f"{name}.txt").read_text().splitlines()
        assert len(rows) == 5
        assert len(rows[0].split()) == 12
    assert "frames/s aggregate" in capsys.readouterr().out


def test_cli_run_tracks_dir(tmp_path):
    from visual_odom_tpu.runner.cli import main

    calib = tmp_path / "calib.yaml"
    calib.write_text(CALIB)
    tracks = tmp_path / "tracks"
    rc = main(["run", "synthetic", str(calib), "--max-frames", "4",
               "--tracks-dir", str(tracks), "--tracks-every", "2",
               "--quiet"])
    assert rc == 0
    pngs = sorted(os.listdir(tracks))
    assert "tracks_000001.png" in pngs and "tracks_000002.png" in pngs


def test_cli_algorithm_constant_overrides():
    """SURVEY.md section 5 config mandate: every reference constant is
    overridable via CLI (VERDICT.md round-1 missing #4)."""
    from visual_odom_tpu.runner.cli import config_from_args, main

    p_args = [
        "run", "x", "y",
        "--fast-threshold", "15", "--lk-window", "17", "--lk-levels", "2",
        "--lk-iters", "20", "--ransac-iters", "123", "--ransac-reproj",
        "0.7", "--max-rotation", "0.2", "--min-scale", "0.01",
        "--max-scale", "20", "--features-per-bucket", "2",
        "--replenish-below", "999", "--age-threshold", "7",
        "--circle-threshold", "1.0", "--lk-backend", "xla",
    ]
    import argparse

    from visual_odom_tpu.runner import cli as climod

    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd")
    pr = sub.add_parser("run")
    pr.add_argument("sequence")
    pr.add_argument("calibration")
    climod.add_config_flags(pr)
    args = parser.parse_args(p_args)
    cfg = config_from_args(args, 120, 160)
    assert cfg.fast_threshold == 15
    assert cfg.lk_window == 17 and cfg.lk_levels == 2 and cfg.lk_max_iters == 20
    assert cfg.ransac_iterations == 123
    assert cfg.ransac_reproj_threshold == 0.7
    assert cfg.max_rotation_rad == 0.2
    assert cfg.min_scale == 0.01 and cfg.max_scale == 20
    assert cfg.features_per_bucket == 2
    assert cfg.replenish_below == 999 and cfg.age_threshold == 7
    assert cfg.circle_threshold == 1.0
    assert cfg.resolved_lk_backend() == "xla"
    # capacity grows with features_per_bucket
    assert cfg.padded_features >= cfg.num_buckets * 2


def test_cli_run_with_overrides_and_ba(tmp_path):
    """End-to-end: overridden constants + --ba-window produce a scored run."""
    from visual_odom_tpu.runner.cli import main

    calib = tmp_path / "calib.yaml"
    calib.write_text(CALIB)
    out = tmp_path / "poses.txt"
    rc = main(["run", "synthetic", str(calib), "--max-frames", "8",
               "--ransac-iters", "150", "--fast-threshold", "15",
               "--ba-window", "4", "--output", str(out), "--quiet"])
    assert rc == 0
    rows = out.read_text().splitlines()
    assert len(rows) == 8


class _FlakyBatchSeq:
    """Random-access sequence that raises once at a given frame index."""

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


def test_batched_resume_bitwise_matches_uninterrupted(tmp_path):
    """VERDICT r4 next-step #5 done-criterion: the multi-sequence batched
    DP runner is restartable — crash mid-run, resume from the shared
    chunk-boundary snapshot, per-sequence poses match the uninterrupted
    run bit for bit."""
    from visual_odom_tpu.parallel.batch_eval import run_sequences_batched
    from visual_odom_tpu.parallel.mesh import make_mesh

    intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0,
                            bf=-64.8, width=160, height=120)
    from visual_odom_tpu.config import VOConfig

    cfg = VOConfig.for_image(120, 160, ransac_iterations=100)
    seqs = [SyntheticStereoSequence(intr, num_frames=33, seed=s, speed=0.5)
            for s in (0, 1)]
    mesh = make_mesh({"data": 2, "model": 1})

    ref_poses, ref_stats, _ = run_sequences_batched(
        seqs, cfg, intr, mesh, chunk=8)

    ck = str(tmp_path / "batch.npz")
    flaky = [_FlakyBatchSeq(seqs[0], crash_at=22), seqs[1]]
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected"):
        run_sequences_batched(flaky, cfg, intr, mesh, chunk=8,
                              checkpoint_path=ck, checkpoint_every=16)
    assert os.path.exists(ck)

    poses_res, stats_res, _ = run_sequences_batched(
        seqs, cfg, intr, mesh, chunk=8, checkpoint_path=ck,
        checkpoint_every=16)
    for a, b in zip(poses_res, ref_poses):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(stats_res, ref_stats):
        assert a == b

    # Batch-size mismatch is rejected as corrupt, not silently resumed.
    from visual_odom_tpu.utils.checkpoint import (
        CorruptCheckpoint,
        load_batch_checkpoint,
    )

    with _pytest.raises(CorruptCheckpoint, match="batch mismatch"):
        load_batch_checkpoint(ck, batch=3)
