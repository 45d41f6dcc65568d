"""Devkit artifacts, calibration files, gyro I/O, notifier, Frame contract."""

import json
import os

import numpy as np
import pytest

from visual_odom_tpu.eval.devkit import (
    eval_all,
    eval_sequence_artifacts,
    save_error_plot_data,
    save_path_plot_data,
    save_sequence_errors,
    save_stats,
)
from visual_odom_tpu.eval.kitti_eval import SegmentError, calc_sequence_errors


def _straight_line_poses(n, step=1.0, drift=0.0):
    """n poses moving +z at `step` m/frame, optional x drift per frame."""
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 2, 3] = np.arange(n) * step
    poses[:, 0, 3] = np.arange(n) * drift
    return poses


def test_sequence_error_file_format(tmp_path):
    gt = _straight_line_poses(1200, step=1.0)
    res = _straight_line_poses(1200, step=1.0, drift=0.01)
    errors = calc_sequence_errors(gt, res)
    assert errors, "1.2 km straight line must produce 100m+ segments"
    out = tmp_path / "00.txt"
    save_sequence_errors(errors, str(out))
    rows = [l.split() for l in out.read_text().splitlines()]
    assert len(rows) == len(errors)
    # reference row format: first_frame r_err t_err len speed (:118-130)
    assert all(len(r) == 5 for r in rows)
    assert int(rows[0][0]) == errors[0].first_frame
    assert float(rows[0][3]) in (100.0, 200.0)


def test_path_plot_data_step3(tmp_path):
    gt = _straight_line_poses(30)
    res = _straight_line_poses(30, drift=0.5)
    out = tmp_path / "path.txt"
    save_path_plot_data(gt, res, str(out))
    rows = out.read_text().splitlines()
    assert len(rows) == 10  # step_size 3 (reference :139)
    vals = [float(v) for v in rows[1].split()]
    assert vals == [0.0, 3.0, 1.5, 3.0]  # gt_x gt_z res_x res_z at frame 3


def test_error_plot_binning_requires_three_samples(tmp_path):
    # two samples at 100 m -> bin dropped; three at 200 m -> kept
    errors = [SegmentError(0, 0.001, 0.02, 100.0, 10.0),
              SegmentError(10, 0.001, 0.02, 100.0, 10.0)] + [
        SegmentError(i, 0.002, 0.03, 200.0, 10.0) for i in range(3)
    ]
    prefix = str(tmp_path / "e")
    save_error_plot_data(errors, prefix)
    tl = [l.split() for l in open(prefix + "_tl.txt").read().splitlines()]
    assert [float(r[0]) for r in tl] == [200.0]
    assert float(tl[0][1]) == pytest.approx(0.03)
    # speed bins: all five samples fall in the |speed-10|<2 bucket, and the
    # neighbouring 8/12 buckets also capture them (window is +/-2)
    ts = [l.split() for l in open(prefix + "_ts.txt").read().splitlines()]
    assert any(float(r[0]) == 10.0 for r in ts)


def test_stats_and_artifacts_tree(tmp_path):
    gt = _straight_line_poses(1500)
    res = _straight_line_poses(1500, drift=0.02)
    errors = eval_sequence_artifacts(gt, res, str(tmp_path), "07", plots=True)
    assert errors
    assert (tmp_path / "errors" / "07.txt").exists()
    assert (tmp_path / "plot_path" / "07.txt").exists()
    assert (tmp_path / "plot_path" / "07.png").exists()
    for suffix in ("tl", "rl", "ts", "rs"):
        assert (tmp_path / "plot_error" / f"07_{suffix}.txt").exists()
        assert (tmp_path / "plot_error" / f"07_{suffix}.png").exists()
    save_stats(errors, str(tmp_path))
    t_avg, r_avg = map(float, open(tmp_path / "stats.txt").read().split())
    assert t_avg == pytest.approx(np.mean([e.t_err for e in errors]))
    assert r_avg == pytest.approx(np.mean([e.r_err for e in errors]))


def test_eval_all_directory_scoring(tmp_path, capsys):
    gt_dir, res_dir, out_dir = (tmp_path / d for d in ("gt", "res", "out"))
    os.makedirs(gt_dir), os.makedirs(res_dir), os.makedirs(out_dir)
    from visual_odom_tpu.io.kitti import save_poses_kitti

    for seq in ("00", "01"):
        save_poses_kitti(str(gt_dir / f"{seq}.txt"), _straight_line_poses(1200))
        save_poses_kitti(str(res_dir / f"{seq}.txt"),
                         _straight_line_poses(1200, drift=0.01))
    results = eval_all(str(gt_dir), str(res_dir), str(out_dir), plots=False)
    assert set(results) == {"00", "01", "avg"}
    assert results["00"]["t_err"] > 0
    assert "sequence 00" in capsys.readouterr().out


def test_cli_eval_all(tmp_path):
    from visual_odom_tpu.io.kitti import save_poses_kitti
    from visual_odom_tpu.runner.cli import main

    gt_dir, res_dir, out_dir = (tmp_path / d for d in ("gt", "res", "out"))
    os.makedirs(gt_dir), os.makedirs(res_dir), os.makedirs(out_dir)
    save_poses_kitti(str(gt_dir / "00.txt"), _straight_line_poses(1200))
    save_poses_kitti(str(res_dir / "00.txt"),
                     _straight_line_poses(1200, drift=0.01))
    rc = main(["eval-all", "--gt-dir", str(gt_dir), "--result-dir",
               str(res_dir), "--out-dir", str(out_dir), "--no-plots"])
    assert rc == 0
    summary = json.load(open(out_dir / "summary.json"))
    assert "00" in summary and "avg" in summary


def test_shipped_calibration_files_load():
    from visual_odom_tpu.config import load_calibration

    k = load_calibration("calibration/kitti00.yaml")
    assert k.fx == pytest.approx(718.856)
    assert k.bf == pytest.approx(-386.1448)
    assert k.baseline == pytest.approx(0.537, abs=1e-3)
    z = load_calibration("calibration/zed.yaml")
    assert (z.width, z.height) == (720, 1280)
    r = load_calibration("calibration/rgbd.yaml")
    assert (r.width, r.height) == (640, 480)
    assert r.fx == pytest.approx(581.367919921875)


def test_load_gyro(tmp_path):
    from visual_odom_tpu.io.gyro import integrate_gyro, load_gyro

    p = tmp_path / "gyro.txt"
    p.write_text("0.0 0.1 0.0 -0.2\n1.0 0.1 0.0 -0.2\n2.0 0.3 0.0 0.0\n\n")
    g = load_gyro(str(p))
    assert g.shape == (3, 4)
    assert g[2, 1] == pytest.approx(0.3)
    angles = integrate_gyro(g)
    assert angles.shape == (3, 3)
    assert angles[1, 0] == pytest.approx(0.1)   # trapezoid of constant 0.1
    assert angles[2, 2] == pytest.approx(-0.3)  # -0.2 then ramp to 0


def test_notifier_stdout_and_buffer(capsys):
    from visual_odom_tpu.utils.notify import Notifier

    with Notifier() as n:  # no email -> stdout only, close is a no-op
        n.msg("plain %s", "line")
    assert "plain line" in capsys.readouterr().out
    n2 = Notifier(email="someone@example.com")
    n2.msg("buffered")
    assert n2._lines == ["buffered"]


def test_frame_triangulation_roundtrip():
    from visual_odom_tpu.config import CameraIntrinsics
    from visual_odom_tpu.core.frame import Frame

    intr = CameraIntrinsics(fx=718.856, fy=718.856, cx=607.1928,
                            cy=185.2157, bf=-386.1448)
    P_l, P_r = intr.proj_left(), intr.proj_right()
    pts3d = np.array([[1.0, 2.0, 10.0], [-3.0, 0.5, 25.0]])
    def proj(P, X):
        x = P @ np.append(X, 1.0)
        return x[:2] / x[2]
    pl = np.stack([proj(P_l, X) for X in pts3d])
    pr = np.stack([proj(P_r, X) for X in pts3d])

    world = np.eye(4)
    world[:3, 3] = [5.0, 0.0, -2.0]
    fr = Frame(0, P_l, P_r, world)
    fr.set_features(pl, pr)
    rec = fr.triangulate_feature_points()
    np.testing.assert_allclose(rec, pts3d, atol=1e-2)
    np.testing.assert_allclose(fr.points_world(), pts3d + world[:3, 3],
                               atol=1e-2)
