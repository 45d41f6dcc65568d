"""BA-window hyperparameter sweep on the km-scale course (round 5).

SOAK_r05 first cut: window-8 BA smoothing DEGRADED ATE on the 1,025-frame
long course (1.69 -> 2.00 m) while improving every short course — the
per-window gauge noise composes as a random walk over 128 windows. This
sweep collects tracks ONCE (cached to /tmp) and iterates window size /
landmark budget / track length / Huber to find a km-scale-safe config.

Run on the TPU:  python scripts/ba_tune_tpu.py
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, ".")

import numpy as np

CACHE = "/tmp/ba_tune_snaps.pkl"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=1025)
    ap.add_argument("--out", default="/tmp/ba_tune.json")
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

    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            poses, snaps = pickle.load(f)
        print("loaded cached snapshots", flush=True)
    else:
        poses, fetched, _, _, snaps = run_sequence_scan(
            frames, cfg, intr, chunk=64, preupload=True,
            collect_tracks=True)
        with open(CACHE, "wb") as f:
            pickle.dump((poses, snaps), f)
        print("collected + cached snapshots", flush=True)

    def ate(ps):
        err = np.linalg.norm(ps[:n, :3, 3] - gt[:, :3, 3], axis=1)
        return float(np.sqrt(np.mean(err ** 2)))

    ate_chain = ate(poses)
    t_chain = float(evaluate_sequence(gt, poses[:n])["t_err_pct"])
    print({"ate_chain": round(ate_chain, 4),
           "t_err_chain": round(t_chain, 4)}, flush=True)

    rows = []
    for (win, lms, mtl, hub) in [
        (16, 384, 4, 1.0),     # the skip-1-chain pick (re-check on this chain)
        (16, 384, 5, 0.8),
        (12, 320, 4, 1.0),
        (24, 448, 5, 1.0),
        (32, 512, 6, 1.0),
    ]:
        t0 = time.perf_counter()
        sm = smooth_trajectory_ba(snaps, poses[: len(snaps) + 1], intr,
                                  window=win, max_landmarks=lms,
                                  min_track_len=mtl, huber_delta=hub)
        row = {"window": win, "max_landmarks": lms, "min_track_len": mtl,
               "huber": hub, "ate_ba": round(ate(sm), 4),
               "t_err_ba": round(float(
                   evaluate_sequence(gt, np.asarray(sm)[:n])["t_err_pct"]),
                   4),
               "improved": bool(ate(sm) < ate_chain),
               "wall_s": round(time.perf_counter() - t0, 1)}
        rows.append(row)
        print(row, flush=True)

    with open(args.out, "w") as f:
        json.dump({"ate_chain": ate_chain, "t_err_chain": t_chain,
                   "rows": rows}, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
