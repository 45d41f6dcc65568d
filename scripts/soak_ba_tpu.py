"""Round-5 soak: windowed BA at SCAN-PATH throughput over 1,000+ frames.

VERDICT r4 next-step #3 done-criterion: with track emission on the fast
path (make_scan_step_fn with_tracks), BA smoothing must (a) improve ATE
over the chained trajectory on a 1,000+ frame course and (b) cost < ~10%
of the no-tracks scan throughput. This runs the 1,025-frame / 1.28 km
"long" course (KITTI size) streamed through 4 uploader threads:

  run A: streamed scan, no tracks       -> fps_streamed baseline
  run B: streamed scan + track emission -> fps_streamed_tracks + snapshots
  BA:    smooth_trajectory_ba over B's snapshots (window 8, Huber)
  run C: one preuploaded rep            -> device-pipeline FPS at the
         round-5 defaults (skip=1, auto inlier floor) for the ledger

Writes SOAK_r05.json. Run on the TPU:  python scripts/soak_ba_tpu.py
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1025)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--ba-window", type=int, default=16)
    ap.add_argument("--ba-min-track-len", type=int, default=5)
    ap.add_argument("--ba-huber", type=float, default=0.8)
    ap.add_argument("--ba-landmarks", type=int, default=384)
    ap.add_argument("--out", default="SOAK_r05.json")
    args = ap.parse_args()

    from bench import enable_compile_cache, render_course
    from visual_odom_tpu.ba.window import smooth_trajectory_ba
    from visual_odom_tpu.config import VOConfig
    from visual_odom_tpu.eval.kitti_eval import evaluate_sequence
    from visual_odom_tpu.runner.pipeline import run_sequence_scan

    enable_compile_cache()
    frames, gt, intr = render_course("long", args.frames, 376, 1241)
    cfg = VOConfig.for_image(376, 1241)
    n = len(gt)

    def ate(poses):
        err = np.linalg.norm(poses[:n, :3, 3] - gt[:, :3, 3], axis=1)
        return float(np.sqrt(np.mean(err ** 2)))

    out = {"course": "long", "frames": args.frames, "chunk": args.chunk,
           "upload_threads": args.threads,
           "config": {"lk_skip_mode": cfg.lk_skip_mode,
                      "lk_seed_skip_levels": cfg.lk_seed_skip_levels,
                      "min_accept_inliers":
                          cfg.resolved_min_accept_inliers()}}

    # Run A: streamed, no tracks.
    stats_a = {}
    poses_a, fetched_a, wall_a, proc_a = run_sequence_scan(
        frames, cfg, intr, chunk=args.chunk, preupload=False,
        upload_threads=args.threads, stats_out=stats_a)
    out["runA_no_tracks"] = {
        "fps_streamed": round(proc_a / wall_a, 2),
        "accept_ratio": round(float(np.mean(fetched_a.accept)), 4),
        "ate_chain_m": round(ate(poses_a), 4),
        "agg_upload_mb_s": round(stats_a.get("agg_upload_mb_s", 0.0), 1),
        "busy_frac": round(stats_a.get("busy_frac", 0.0), 3),
    }
    print(out["runA_no_tracks"], flush=True)

    # Run B: streamed + track emission.
    stats_b = {}
    poses_b, fetched_b, wall_b, proc_b, snaps = run_sequence_scan(
        frames, cfg, intr, chunk=args.chunk, preupload=False,
        upload_threads=args.threads, stats_out=stats_b,
        collect_tracks=True)
    fps_a = proc_a / wall_a
    fps_b = proc_b / wall_b
    out["runB_with_tracks"] = {
        "fps_streamed": round(fps_b, 2),
        "fps_ratio_vs_no_tracks": round(fps_b / fps_a, 3),
        "accept_ratio": round(float(np.mean(fetched_b.accept)), 4),
        "agg_upload_mb_s": round(stats_b.get("agg_upload_mb_s", 0.0), 1),
    }
    print(out["runB_with_tracks"], flush=True)

    # BA smoothing over the scan-collected tracks (km-scale config from
    # the committed sweep — SOAK ba_tune_rows / PERF_NOTES round 5).
    t0 = time.perf_counter()
    smoothed = smooth_trajectory_ba(snaps, poses_b[: len(snaps) + 1], intr,
                                    window=args.ba_window,
                                    max_landmarks=args.ba_landmarks,
                                    min_track_len=args.ba_min_track_len,
                                    huber_delta=args.ba_huber)
    ba_wall = time.perf_counter() - t0
    ate_chain = ate(poses_b)
    ate_ba = ate(smoothed)
    sc_chain = evaluate_sequence(gt, poses_b[:n])
    sc_ba = evaluate_sequence(gt, np.asarray(smoothed)[:n])
    out["ba"] = {
        "window": args.ba_window,
        "ate_chain_m": round(ate_chain, 4),
        "ate_ba_m": round(ate_ba, 4),
        "improved": bool(ate_ba < ate_chain),
        "t_err_chain_pct": round(float(sc_chain["t_err_pct"]), 4),
        "t_err_ba_pct": round(float(sc_ba["t_err_pct"]), 4),
        "ba_wall_s": round(ba_wall, 1),
        "ba_ms_per_frame": round(ba_wall / max(1, len(snaps)) * 1000, 2),
    }
    print(out["ba"], flush=True)

    # Run C: preuploaded device-pipeline FPS at round-5 defaults.
    poses_c, fetched_c, wall_c, proc_c = run_sequence_scan(
        frames, cfg, intr, chunk=args.chunk, preupload=True)
    out["runC_preuploaded"] = {
        "fps_device_pipeline": round(proc_c / wall_c, 2),
        "accept_ratio": round(float(np.mean(fetched_c.accept)), 4),
        "ate_chain_m": round(ate(poses_c), 4),
    }
    print(out["runC_preuploaded"], flush=True)

    out["gates"] = {
        "accuracy_green": bool(
            out["runB_with_tracks"]["accept_ratio"] >= 0.9
            and ate_chain <= 0.01 * 1280.0),
        "ba_improves_ate": out["ba"]["improved"],
        "tracks_cost_under_10pct": bool(fps_b >= 0.9 * fps_a),
    }
    print(out["gates"], flush=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
