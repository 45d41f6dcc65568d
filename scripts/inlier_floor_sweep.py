"""min_accept_inliers sweep (VERDICT r4 next-step #7).

The floor exists because the reference's rotation+scale gates are blind to
total tracking loss (the round-4 multi-lap soak measured every lap seam
ACCEPTED on a 1-inlier consensus). It has shipped default-off (reference
semantics). This sweep settles the default with evidence: floors
{0, 10, 20, 30} over the three gauntlet courses (accept ratio + ATE must
not regress) plus a hard scene-cut course (the cut step must be REJECTED)
and a gate-spike course (re-acquisition must not be hurt).

Run on the TPU:  python scripts/inlier_floor_sweep.py
(CPU works too: the floor is gating logic, but the artifact is recorded
on-chip to match the bench's numerics.)
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
    ap.add_argument("--floors", default="0,10,20,30")
    ap.add_argument("--out", default="INLIER_FLOOR_r05.json")
    args = ap.parse_args()

    from bench import enable_compile_cache, render_course, _kitti_intrinsics
    from visual_odom_tpu.config import VOConfig
    from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
    from visual_odom_tpu.runner.pipeline import run_sequence_scan

    enable_compile_cache()
    floors = [int(f) for f in args.floors.split(",")]
    courses = {}
    for name in ("straight", "turning", "stress", "gatespike"):
        courses[name] = render_course(name, args.frames, args.height,
                                      args.width)

    # Hard scene cut: two different procedural worlds butted together
    # (the test_e2e scene-cut construction at bench scale).
    intr_c = _kitti_intrinsics(args.height, args.width)
    s1 = SyntheticStereoSequence(intr_c, num_frames=33, seed=0)
    s2 = SyntheticStereoSequence(intr_c, num_frames=33, seed=7)
    cut_frames = list(s1) + list(s2)
    cut_seam = 32  # step consuming the first frame of world 2

    rows = []
    for floor in floors:
        cfg_kw = dict(min_accept_inliers=floor)
        row = {"floor": floor, "courses": {}}
        for name, (frames, gt, intr) in courses.items():
            cfg = VOConfig.for_image(args.height, args.width, **cfg_kw)
            poses, fetched, _, _ = run_sequence_scan(
                frames, cfg, intr, chunk=args.chunk, preupload=True)
            err = np.linalg.norm(
                poses[: len(gt), :3, 3] - gt[:, :3, 3], axis=1)
            row["courses"][name] = {
                "accept_ratio": round(float(np.mean(fetched.accept)), 4),
                "ate_rmse_m": round(float(np.sqrt(np.mean(err ** 2))), 4),
                "mean_inliers": round(
                    float(np.mean(fetched.num_inliers)), 1),
                "min_inliers_on_accepted": int(np.min(
                    np.asarray(fetched.num_inliers)[
                        np.asarray(fetched.accept)]))
                if np.any(fetched.accept) else None,
            }
        cfg = VOConfig.for_image(args.height, args.width, **cfg_kw)
        poses, fetched, _, _ = run_sequence_scan(
            iter(cut_frames), cfg, intr_c, chunk=32, preupload=True)
        acc = np.asarray(fetched.accept)
        row["scene_cut"] = {
            "seam_accepted": bool(acc[cut_seam]),
            "seam_inliers": int(np.asarray(
                fetched.num_inliers)[cut_seam]),
            "away_accept_ratio": round(float(
                np.concatenate([acc[:cut_seam - 1],
                                acc[cut_seam + 4:]]).mean()), 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump({"image": f"{args.width}x{args.height}",
                   "frames": args.frames, "rows": rows}, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
