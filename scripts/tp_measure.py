"""Tensor-parallel (feature-axis) measurement -> settle SURVEY's TP row.

VERDICT.md round-2 missing #5: feature-axis sharding exists and is
parity-tested, but no number showed whether it helps. This script times the
batched sharded step on an 8-virtual-device CPU mesh at a real aspect-class
shape with the SAME total device count split between data and model axes:

    (data=4, model=1)  vs  (data=2, model=2)  vs  (data=1, model=4)

Per-device work is identical across rows (B = data, so each data group owns
one sequence); any step-latency difference is the cost/benefit of slicing
the feature axis across devices. The CPU mesh cannot see ICI costs, but it
DOES see the orchestration + collective insertion overhead that bounds any
real TP win for this workload, and the per-feature LK solve is
latency-bound (sequential dependent VPU ops), so splitting 384 features
4 ways cannot shorten the critical path — it only adds collectives to the
convergence predicates and the RANSAC argmax.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/tp_measure.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from visual_odom_tpu.config import VOConfig
    from visual_odom_tpu.parallel.batch import (
        batched_init_state,
        make_batched_step_fn,
    )
    from visual_odom_tpu.parallel.mesh import make_mesh
    from __graft_entry__ import _kitti_cfg

    h, w = 376, 512
    cfg, intr = _kitti_cfg(h, w)
    rng = np.random.default_rng(0)

    rows = []
    for data, model in ((4, 1), (2, 2), (1, 4)):
        mesh = make_mesh({"data": data, "model": model})
        B = data
        lefts = rng.integers(0, 255, (B, h, w), dtype=np.uint8)
        rights = rng.integers(0, 255, (B, h, w), dtype=np.uint8)
        state = batched_init_state(cfg, lefts, rights, mesh)
        step = make_batched_step_fn(cfg, intr, mesh)
        l = jax.numpy.asarray(lefts)
        r = jax.numpy.asarray(rights)
        # Warm up (compile), then steady-state timing.
        state, out = step(state, l, r)
        jax.block_until_ready(out)
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            state, out = step(state, l, r)
        jax.block_until_ready(out)
        wall = time.perf_counter() - t0
        per_step_ms = wall / iters * 1000.0
        rows.append({
            "data": data, "model": model, "batch": B,
            "step_ms": round(per_step_ms, 1),
            "step_ms_per_seq": round(per_step_ms / B, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    out = {
        "harness": "batched sharded step, 8-dev CPU mesh, 512x376",
        "note": "equal per-device FLOPs across rows; step_ms_per_seq is "
                "the comparable number (model>1 shards 384 features over "
                "the model axis)",
        "rows": rows,
    }
    with open("TP_MEASURE_r03.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote TP_MEASURE_r03.json")


if __name__ == "__main__":
    main()
