"""Streaming + long-run soak coverage (VERDICT.md round-2 missing #4).

The scan runner is the throughput front door; round 2 materialized the
whole sequence on the host (full KITTI 00 ~ 4 GB decoded). These tests
prove the streaming rewrite:

- ``test_scan_streams_o_chunk`` (always on): the runner retains at most a
  couple of chunks of decoded frames at any moment — measured directly via
  weakrefs on the yielded arrays, which is robust where RSS is noisy.
- ``VO_SOAK=1`` gated tests: 1,200-frame streamed run with accuracy gates
  and no tracking degradation over time; 1,000-frame checkpointed run plus
  windowed-BA smoothing (the reference's loop runs 9,000 frames,
  src/main.cpp:123 — round 2's longest validated run was 161).

Run the soak locally:  VO_SOAK=1 python -m pytest tests/test_soak.py -q
"""

import os
import weakref

import numpy as np
import pytest

from visual_odom_tpu.config import CameraIntrinsics, VOConfig
from visual_odom_tpu.eval.kitti_eval import ate_rmse
from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
from visual_odom_tpu.runner.pipeline import run_sequence_scan

SOAK = bool(os.environ.get("VO_SOAK"))
H, W = 120, 160


def _intr():
    return CameraIntrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2,
                            bf=-120.0 * 0.54, width=W, height=H)


class _RetentionMonitor:
    """Wraps a frame iterator; tracks how many yielded arrays are still
    referenced anywhere (weakref liveness), sampled at every yield."""

    def __init__(self, frames):
        self._frames = frames
        self._refs = []
        self.max_alive = 0

    def __iter__(self):
        for left, right in self._frames:
            # Fresh arrays per yield so a hoarding consumer shows up.
            left = np.array(left)
            right = np.array(right)
            self._refs.append(weakref.ref(left))
            self._refs.append(weakref.ref(right))
            alive = sum(1 for r in self._refs if r() is not None)
            self.max_alive = max(self.max_alive, alive)
            yield left, right


def test_scan_streams_o_chunk():
    """The scan runner must hold O(chunk) decoded frames, not O(sequence):
    with chunk=8 over 70 frames, at most ~3 chunks of arrays (current
    stack + double-buffered next + in-flight yields) may be alive at once."""
    intr = _intr()
    cfg = VOConfig.for_image(H, W, ransac_iterations=100)
    seq = SyntheticStereoSequence(intr, num_frames=71, seed=0, speed=0.5)
    mon = _RetentionMonitor(seq)
    poses, fetched, wall, processed = run_sequence_scan(
        iter(mon), cfg, intr, chunk=8)
    assert processed >= 70
    assert len(poses) == 71
    # 3 chunks x 2 arrays each = 48; a materializing runner would hit 142.
    assert mon.max_alive <= 3 * 8 * 2, mon.max_alive
    # Sanity (not the point of this test): the trajectory is healthy. The
    # tight 1%-of-length accuracy gate lives in the KITTI-size bench; at
    # 120x160 the per-frame angular resolution is 7.8x coarser.
    assert float(np.mean(fetched.accept)) >= 0.95
    gt = seq.poses
    err = np.linalg.norm(poses[: len(gt), :3, 3] - gt[:, :3, 3], axis=1)
    assert float(np.sqrt((err ** 2).mean())) < 0.03 * 71 * 0.5


@pytest.mark.skipif(not SOAK, reason="set VO_SOAK=1 to run soak tests")
def test_soak_streaming_1200_frames():
    """1,200-frame streamed scan: accuracy gates hold end-to-end and the
    tracker does not degrade over time (state leak / id drift would show
    as falling match counts or accept rate in the last quarter)."""
    intr = _intr()
    cfg = VOConfig.for_image(H, W, ransac_iterations=200)
    n = 1201
    seq = SyntheticStereoSequence(intr, num_frames=n, seed=0, speed=0.5)
    poses, fetched, wall, processed = run_sequence_scan(
        iter(seq), cfg, intr, chunk=32)
    gt = seq.poses
    accept = float(np.mean(fetched.accept))
    assert accept >= 0.95, accept
    # Long-run health is a RATE question, not an endpoint-ATE question:
    # without loop closure, heading noise random-walks and end-to-end ATE
    # grows superlinearly with distance even for a healthy tracker (at
    # 160x120 the angular resolution is 7.8x coarser than KITTI; measured
    # r_err here is ~0.05 deg/m of pure sub-pixel noise, which alone puts
    # 600 m of endpoint ATE far past any fixed small percentage). The
    # 1%-of-length ATE gate at KITTI size is enforced by the bench
    # gauntlet. Here we gate what a soak can actually detect:
    # (a) the devkit drift RATE stays sane for this resolution, and
    # (b) it does NOT grow over the run (a state leak / id drift shows up
    #     as a rising rate), each quarter re-anchored at its own start.
    from visual_odom_tpu.eval.kitti_eval import evaluate_sequence

    q = len(gt) // 4
    t_errs = []
    for i in range(4):
        a, b = i * q, (i + 1) * q
        ga = np.linalg.inv(gt[a]) @ gt[a:b]
        pa = np.linalg.inv(poses[a]) @ poses[a:b]
        t_errs.append(float(evaluate_sequence(ga, pa)["t_err_pct"]))
    # Ceiling set just above measured reality (2.9-4.3% at this resolution,
    # ADVICE r3: 8.0 left ~2x headroom) so partial degradation still trips.
    assert all(t <= 6.0 for t in t_errs), t_errs
    assert t_errs[3] <= 1.3 * max(t_errs[0], 1.0), t_errs
    # No degradation: late-run tracking as healthy as early-run.
    early = np.mean(fetched.num_matched[:300])
    late = np.mean(fetched.num_matched[-300:])
    assert late >= 0.7 * early, (early, late)
    assert np.mean(fetched.accept[-300:]) >= 0.95


@pytest.mark.skipif(not SOAK, reason="set VO_SOAK=1 to run soak tests")
def test_soak_checkpointed_ba_1000_frames(tmp_path):
    """1,000-frame interactive run with periodic checkpointing, then
    windowed-BA smoothing over the collected tracks — the long-run
    configuration a production deployment uses."""
    from visual_odom_tpu.ba.window import smooth_trajectory_ba
    from visual_odom_tpu.runner.pipeline import (
        run_sequence,
        run_sequence_resumable,
    )

    intr = _intr()
    cfg = VOConfig.for_image(H, W, ransac_iterations=200)
    n = 1001
    seq = SyntheticStereoSequence(intr, num_frames=n, seed=1, speed=0.5)
    gt = seq.poses

    ckpt = str(tmp_path / "soak.npz")
    poses, results = run_sequence_resumable(
        seq, cfg, intr, checkpoint_path=ckpt, checkpoint_every=250)
    assert os.path.exists(ckpt)
    course = float(np.sum(np.linalg.norm(np.diff(gt[:, :3, 3], axis=0),
                                         axis=1)))
    ate_chain = ate_rmse(gt[: len(poses)], np.asarray(poses))
    assert ate_chain <= 0.02 * course, (ate_chain, course)

    poses2, _, snaps = run_sequence(seq, cfg, intr, collect_tracks=True)
    smoothed = smooth_trajectory_ba(snaps, poses2, intr, window=8)
    ate_ba = ate_rmse(gt[: len(smoothed)], smoothed)
    assert ate_ba <= ate_rmse(gt[: len(poses2)], poses2) * 1.02


def test_scan_stats_out_attribution():
    """run_sequence_scan(stats_out=...) reports uploader busy fraction and
    MB/s — the attribution behind every streamed-FPS number (VERDICT.md
    round-3 weak #1)."""
    intr = _intr()
    cfg = VOConfig.for_image(H, W, ransac_iterations=100)
    seq = SyntheticStereoSequence(intr, num_frames=17, seed=0, speed=0.5)
    stats = {}
    poses, fetched, wall, processed = run_sequence_scan(
        iter(seq), cfg, intr, chunk=4, stats_out=stats)
    assert processed >= 16
    # The first chunk uploads out-of-band before the thread starts (its
    # cost is excluded from the timed wall), so the uploader sees 3 of 4.
    assert stats["chunks"] == 3
    expected = 3 * 4 * 2 * H * W          # chunks x frames x L/R x bytes
    assert stats["upload_bytes"] == expected
    assert 0.0 <= stats["busy_frac"] <= 1.0
    assert stats["upload_mb_s"] > 0.0
    assert stats["thread_wall_s"] > 0.0
