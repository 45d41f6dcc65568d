"""Committed _GROUP x _FEATURE_BLOCK sweep (VERDICT r4 next-step #6).

VO_LK_GROUP / VO_LK_FEATURE_BLOCK are import-time env knobs that have
never had a committed artifact. Each config runs in a SUBPROCESS (one TPU
process at a time; env read at import), measuring the FULL pipeline over
the straight course at 256 frames / chunk 64 preuploaded — the production
metric, where the latency-bound LK quad is ~72% of the per-frame time.
Session-fixed cost (~220 ms, DISPATCH_SWEEP_r05) is differenced out via a
64-frame run in the same process: steady_ms = (wall_256 - wall_64) / 192.

Run on the TPU:  python scripts/lk_sweep.py
"""

import itertools
import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

_CHILD = r"""
import json, sys, time
sys.path.insert(0, ".")
import numpy as np
from bench import enable_compile_cache, render_course
from visual_odom_tpu.config import VOConfig
from visual_odom_tpu.runner.pipeline import run_sequence_scan

enable_compile_cache()
frames, gt, intr = render_course("straight", 257, 376, 1241)
cfg = VOConfig.for_image(376, 1241)

def run(n):
    best = None
    for _ in range(3):
        poses, fetched, wall, proc = run_sequence_scan(
            frames[:n + 1], cfg, intr, chunk=64, preupload=True)
        best = wall if best is None else min(best, wall)
    acc = float(np.mean(fetched.accept))
    return best, acc, proc

w64, acc64, _ = run(64)
w256, acc256, _ = run(256)
steady_ms = (w256 - w64) / 192 * 1000.0
print("CHILD_RESULT " + json.dumps({
    "steady_ms_per_frame": round(steady_ms, 3),
    "wall64_ms": round(w64 * 1000, 1), "wall256_ms": round(w256 * 1000, 1),
    "fps_steady": round(1000.0 / steady_ms, 1),
    "accept_256": round(acc256, 4)}))
"""


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="LK_SWEEP_r05.json")
    ap.add_argument("--groups", default="2,4,8,16")
    ap.add_argument("--blocks", default="32,64,128")
    ap.add_argument("--extra-env", default="",
                    help="comma-separated K=V pairs applied to every child")
    args = ap.parse_args()

    rows = []
    groups = [int(g) for g in args.groups.split(",")]
    blocks = [int(b) for b in args.blocks.split(",")]
    for g, fb in itertools.product(groups, blocks):
        if g > fb:
            continue
        env = dict(os.environ)
        env.update({"VO_LK_GROUP": str(g), "VO_LK_FEATURE_BLOCK": str(fb)})
        for kv in args.extra_env.split(","):
            if "=" in kv:
                k, v = kv.split("=", 1)
                env[k] = v
        p = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                           capture_output=True, text=True, timeout=3000)
        res = None
        for line in p.stdout.splitlines():
            if line.startswith("CHILD_RESULT "):
                res = json.loads(line[len("CHILD_RESULT "):])
        if res is None:
            print(f"G={g} FB={fb}: FAILED\n{p.stdout[-2000:]}"
                  f"\n{p.stderr[-2000:]}", flush=True)
            rows.append({"group": g, "block": fb, "error": True})
            continue
        rows.append({"group": g, "block": fb, **res})
        print(f"G={g:2d} FB={fb:3d}: {res['steady_ms_per_frame']:6.3f} "
              f"ms/frame steady ({res['fps_steady']} FPS), "
              f"accept {res['accept_256']}", flush=True)

    with open(args.out, "w") as f:
        json.dump({"method": "full pipeline straight course, chunk 64, "
                             "preuploaded; steady = (wall256-wall64)/192, "
                             "best-of-3 each", "rows": rows}, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
