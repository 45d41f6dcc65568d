"""Texture-family ablation for the seeded level-skip default (VERDICT r4
next-step #9 / weak #7).

lk_seed_skip_levels=2 deviates from reference numerics and was only
accuracy-cleared on the 8-octave value-noise texture family. This renders
the straight + turning courses with the spectrally-disjoint "checker"
family (periodic checker + interference gratings + blobs — the structure
most likely to alias coarse-to-fine LK) and compares skip 0 vs the shipped
skip 2 on accuracy.

Run on the TPU:  python scripts/texture_ablation.py
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=161)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--width", type=int, default=1241)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--out", default="TEXTURE_ABLATION_r05.json")
    args = ap.parse_args()

    from bench import _kitti_intrinsics, enable_compile_cache
    from visual_odom_tpu.config import VOConfig
    from visual_odom_tpu.io.synthetic import make_course
    from visual_odom_tpu.runner.pipeline import run_sequence_scan

    enable_compile_cache()
    intr = _kitti_intrinsics(args.height, args.width)

    rows = []
    for course in ("straight", "turning"):
        seq = make_course(course, intr, num_frames=args.frames,
                          texture_family="checker")
        frames = list(seq)
        gt = seq.poses
        course_len = float(np.sum(np.linalg.norm(
            np.diff(gt[:, :3, 3], axis=0), axis=1)))
        for skip in (0, 2):
            # Pin fixed mode: this artifact measures the raw skip levels
            # (the adaptive default would guard the skip under test).
            cfg = VOConfig.for_image(args.height, args.width,
                                     lk_skip_mode="fixed",
                                     lk_seed_skip_levels=skip)
            poses, fetched, _, _ = run_sequence_scan(
                frames, cfg, intr, chunk=args.chunk, preupload=True)
            err = np.linalg.norm(
                poses[: len(gt), :3, 3] - gt[:, :3, 3], axis=1)
            ate = float(np.sqrt(np.mean(err ** 2)))
            row = {"course": course, "texture": "checker", "skip": skip,
                   "accept_ratio": round(float(np.mean(fetched.accept)), 4),
                   "ate_rmse_m": round(ate, 4),
                   "ate_budget_m": round(0.01 * course_len, 3),
                   "mean_matched": round(
                       float(np.mean(fetched.num_matched)), 1),
                   "ok": bool(float(np.mean(fetched.accept)) >= 0.9
                              and ate <= 0.01 * course_len)}
            rows.append(row)
            print(row, flush=True)

    with open(args.out, "w") as f:
        json.dump({"image": f"{args.width}x{args.height}",
                   "frames": args.frames, "rows": rows}, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
