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
