"""Streamed-path uploader-thread sweep (VERDICT r4 next-step #2).

Measures run_sequence_scan streamed (preupload=False) over the straight
course at KITTI size with 1..4 uploader threads, with full per-thread
attribution, and derives ``link_ceiling_fps`` = measured concurrent upload
MB/s / (MB per stereo frame) — the FPS the link itself admits. Done
criterion: fps_streamed ~= min(link ceiling, device pipeline FPS).

Run on the TPU:  python scripts/upload_sweep.py
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--threads", default="1,2,3,4")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default="UPLOAD_SWEEP_r05.json")
    args = ap.parse_args()

    from bench import enable_compile_cache, render_course
    from visual_odom_tpu.config import VOConfig
    from visual_odom_tpu.runner.pipeline import run_sequence_scan

    enable_compile_cache()
    frames, gt, intr = render_course("straight", args.frames + 1, 376, 1241)
    cfg = VOConfig.for_image(376, 1241)
    mb_per_frame = 2 * frames[0][0].nbytes / 1e6

    rows = []
    for nt in [int(t) for t in args.threads.split(",")]:
        best = None
        for _ in range(args.reps):
            stats = {}
            poses, fetched, wall, proc = run_sequence_scan(
                frames, cfg, intr, chunk=args.chunk, preupload=False,
                upload_threads=nt, stats_out=stats)
            fps = proc / wall
            if best is None or fps > best[0]:
                best = (fps, stats)
        fps, stats = best
        row = {"threads": nt, "fps_streamed": round(fps, 2),
               "accept": round(float(np.mean(fetched.accept)), 4)}
        if stats:
            agg = stats.get("agg_upload_mb_s") or stats.get("upload_mb_s", 0)
            row["upload_mb_s_per_stream"] = round(
                stats.get("upload_mb_s", 0.0), 1)
            row["agg_upload_mb_s"] = round(agg, 1)
            row["busy_frac"] = round(stats.get("busy_frac", 0.0), 3)
            row["link_ceiling_fps"] = round(agg / mb_per_frame, 1)
            if "per_thread" in stats:
                row["per_thread"] = [
                    {"chunks": t["chunks"],
                     "upload_mb_s": round(t["upload_mb_s"], 1),
                     "busy_frac": round(t["busy_frac"], 3)}
                    for t in stats["per_thread"]]
        rows.append(row)
        print(row, flush=True)

    with open(args.out, "w") as f:
        json.dump({"mb_per_frame": round(mb_per_frame, 3),
                   "frames": args.frames, "chunk": args.chunk,
                   "rows": rows}, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
