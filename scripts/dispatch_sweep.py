"""Separate per-dispatch overhead from true per-frame device time.

FLOOR_ATTR_r05: the noop scan floor is ~0.4 ms/frame (round-4's 3.7 ms
reading was tunnel congestion), yet full-step chunk-32 over 64 frames reads
8.5 ms/frame while the production bench reads 5.7 at chunk 64 over 161.
Hypothesis: a fixed per-DISPATCH cost (axon tunnel RPC / program setup)
that only amortizes with frames-per-dispatch and total dispatches.

Model: wall = n_dispatch * D + n_frames * F.  Sweeping chunk at fixed
total frames and total frames at fixed chunk identifies D and F.

Run on the TPU:  python scripts/dispatch_sweep.py
"""

import argparse
import json
import sys
import time
from functools import partial

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--width", type=int, default=1241)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="DISPATCH_SWEEP_r05.json")
    args = ap.parse_args()

    import jax

    from bench import render_course
    from visual_odom_tpu.config import VOConfig
    from visual_odom_tpu.runner.pipeline import (
        init_vo_state, make_scan_step_fn)

    frames, gt, intr = render_course("straight", args.frames + 1,
                                     args.height, args.width)
    cfg = VOConfig.for_image(args.height, args.width)
    lefts = np.stack([f[0] for f in frames[1:]])
    rights = np.stack([f[1] for f in frames[1:]])

    rows = []
    for chunk, nframes in ((32, 64), (32, 256), (64, 64), (64, 256),
                           (128, 256), (256, 256)):
        scan = make_scan_step_fn(cfg, intr, chunk)
        n_chunks = nframes // chunk
        dl = [jax.device_put(lefts[i * chunk:(i + 1) * chunk])
              for i in range(n_chunks)]
        dr = [jax.device_put(rights[i * chunk:(i + 1) * chunk])
              for i in range(n_chunks)]

        def run_once(state):
            outs = None
            for i in range(n_chunks):
                state, outs = scan(state, dl[i], dr[i])
            jax.tree.map(np.asarray, outs)
            return state

        state = run_once(init_vo_state(cfg, intr, frames[0][0],
                                       frames[0][1]))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state = run_once(state)
            best = min(best, time.perf_counter() - t0)
        ms = best / nframes * 1000.0
        rows.append({"chunk": chunk, "frames": nframes,
                     "dispatches": n_chunks, "ms_per_frame": round(ms, 3),
                     "wall_ms": round(best * 1000.0, 1)})
        print(rows[-1], flush=True)

    # Least-squares fit wall = D * n_dispatch + F * n_frames.
    A = np.array([[r["dispatches"], r["frames"]] for r in rows], float)
    b = np.array([r["wall_ms"] for r in rows])
    (D, F), *_ = np.linalg.lstsq(A, b, rcond=None)
    fit = {"per_dispatch_ms": round(float(D), 2),
           "per_frame_ms": round(float(F), 3)}
    print(fit)
    with open(args.out, "w") as f:
        json.dump({"rows": rows, "fit": fit}, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
