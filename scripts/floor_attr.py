"""Attribute the scan-harness floor (VERDICT r4 next-step #1).

ROOFLINE_r04: a noop prefix scan (donated state passed through, zero
compute) costs ~1.7-3.7 ms per scan ITERATION and does not amortize with
chunk size — 44% of the full frame. This script isolates the cause with
controlled on-chip experiments:

  noop_u{1,2,4,8}   noop scan at lax.scan unroll=k — if the floor is
                    per-iteration loop orchestration, it divides by k
  noop_c64_u1       chunk 64 cross-check (floor is per-iteration, so
                    ms/frame should match chunk 32)
  noop_tinycarry    carry = PRNG key only (no pyramids/features) — isolates
                    carry-size / donation-copy cost
  noop_noxs         carry = full VOState, xs = (chunk,) f32 counter —
                    isolates the uint8 image-stack slicing cost
  full_u{1,2,4,8}   the real step at unroll=k — the production payoff

Each variant: compile+load warmup, then best-of-REPS timed sweeps.
Writes FLOOR_ATTR_r05.json.

Run on the TPU:  python scripts/floor_attr.py
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
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--width", type=int, default=1241)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--out", default="FLOOR_ATTR_r05.json")
    ap.add_argument("--only", default="",
                    help="comma-separated variant-name substrings to run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import render_course
    from visual_odom_tpu.config import VOConfig
    from visual_odom_tpu.runner.pipeline import (
        VOState, _make_raw_step, init_vo_state)

    frames, gt, intr = render_course("straight", args.frames + 1,
                                     args.height, args.width)
    cfg = VOConfig.for_image(args.height, args.width)
    lefts = np.stack([f[0] for f in frames[1:]])
    rights = np.stack([f[1] for f in frames[1:]])

    base = _make_raw_step(cfg, intr)

    def make_noop(chunk, unroll):
        @partial(jax.jit, donate_argnums=(0,))
        def scan_chunk(state, ls, rs):
            def body(s, lr):
                # Pass-through carry; consume xs so they are not DCE'd
                # (sum of one pixel each), tiny output per step.
                tag = (lr[0][0, 0].astype(jnp.float32)
                       + lr[1][0, 0].astype(jnp.float32))
                return s, tag
            return jax.lax.scan(body, state, (ls, rs), unroll=unroll)
        return scan_chunk

    def make_tinycarry(chunk, unroll):
        @jax.jit
        def scan_chunk(key, ls, rs):
            def body(k, lr):
                tag = (lr[0][0, 0].astype(jnp.float32)
                       + lr[1][0, 0].astype(jnp.float32))
                return k, tag
            return jax.lax.scan(body, key, (ls, rs), unroll=unroll)
        return scan_chunk

    def make_noxs(chunk, unroll):
        @partial(jax.jit, donate_argnums=(0,))
        def scan_chunk(state, counters):
            def body(s, c):
                return s, c + 1.0
            return jax.lax.scan(body, state, counters, unroll=unroll)
        return scan_chunk

    def make_full(chunk, unroll):
        @partial(jax.jit, donate_argnums=(0,))
        def scan_chunk(state, ls, rs):
            def body(s, lr):
                return base(s, lr[0], lr[1])
            return jax.lax.scan(body, state, (ls, rs), unroll=unroll)
        return scan_chunk

    variants = []
    for u in (1, 2, 4, 8):
        variants.append((f"noop_u{u}", make_noop(args.chunk, u), args.chunk,
                         "imgs"))
    variants.append(("noop_c64_u1", make_noop(64, 1), 64, "imgs"))
    variants.append(("noop_tinycarry_u1", make_tinycarry(args.chunk, 1),
                     args.chunk, "tiny"))
    variants.append(("noop_noxs_u1", make_noxs(args.chunk, 1), args.chunk,
                     "noxs"))
    for u in (1, 2, 4, 8):
        variants.append((f"full_u{u}", make_full(args.chunk, u), args.chunk,
                         "imgs"))

    if args.only:
        keys = args.only.split(",")
        variants = [v for v in variants if any(k in v[0] for k in keys)]

    results = {}
    for name, scan, chunk, kind in variants:
        n_chunks = max(1, len(lefts) // chunk)
        dl = [jax.device_put(lefts[i * chunk:(i + 1) * chunk])
              for i in range(n_chunks)]
        dr = [jax.device_put(rights[i * chunk:(i + 1) * chunk])
              for i in range(n_chunks)]
        counters = jax.device_put(np.zeros(chunk, np.float32))

        def fresh_state():
            if kind == "tiny":
                return jax.random.PRNGKey(0)
            return init_vo_state(cfg, intr, frames[0][0], frames[0][1])

        def run_once(state):
            outs = None
            for i in range(n_chunks):
                if kind == "noxs":
                    state, outs = scan(state, counters)
                else:
                    state, outs = scan(state, dl[i], dr[i])
            jax.tree.map(np.asarray, outs)
            return state

        t_c0 = time.perf_counter()
        state = run_once(fresh_state())   # compile + program load
        compile_s = time.perf_counter() - t_c0
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            state = run_once(state)
            dt = time.perf_counter() - t0
            best = min(best, dt)
        per_frame = best / (n_chunks * chunk) * 1000.0
        results[name] = round(per_frame, 3)
        print(f"{name:18s} {per_frame:7.3f} ms/frame  "
              f"(compile+load {compile_s:.1f}s)", flush=True)

    with open(args.out, "w") as f:
        json.dump({"image": f"{args.width}x{args.height}",
                   "chunk": args.chunk, "reps": args.reps,
                   "per_frame_ms": results}, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
