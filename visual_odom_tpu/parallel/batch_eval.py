"""Multi-sequence batched evaluation (data-parallel KITTI sweep).

BASELINE.json eval config 5: all sequences sharded across devices/hosts.
B sequences advance in lockstep through the batched sharded step
(parallel/batch.py); per-frame deltas accumulate in device buffers
(one fetch at the end, as in runner.run_sequence_buffered) and pose chaining
happens per-sequence on the host in float64.

Sequences of unequal length are padded with their last frame; frames beyond
a sequence's end are masked out of its pose chain.
"""

from __future__ import annotations

import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from visual_odom_tpu.config import CameraIntrinsics, VOConfig
from visual_odom_tpu.parallel.batch import batched_init_state, make_batched_step_fn
from visual_odom_tpu.runner.pipeline import chain_poses_host


def run_sequences_batched(
    sequences: Sequence,            # list of iterables of (left, right)
    config: VOConfig,
    intrinsics: CameraIntrinsics,
    mesh: Mesh,
    seed: int = 0,
):
    """Run B sequences in lockstep. Returns (list of (Ni+1, 4, 4) pose
    arrays, per-sequence stats dicts, wall_seconds)."""
    frame_lists = [list(s) for s in sequences]
    B = len(frame_lists)
    lengths = [len(f) for f in frame_lists]
    n_steps = max(lengths) - 1

    def frame_at(b, i):
        fl = frame_lists[b]
        return fl[min(i, len(fl) - 1)]

    lefts0 = np.stack([frame_at(b, 0)[0] for b in range(B)])
    rights0 = np.stack([frame_at(b, 0)[1] for b in range(B)])

    state = batched_init_state(config, lefts0, rights0, mesh, seed=seed)
    step = make_batched_step_fn(config, intrinsics, mesh)

    t_invs = []   # device arrays, fetched once at the end
    accepts = []
    inliers = []
    t0 = time.perf_counter()
    for i in range(1, n_steps + 1):
        lefts = jnp.asarray(np.stack([frame_at(b, i)[0] for b in range(B)]))
        rights = jnp.asarray(np.stack([frame_at(b, i)[1] for b in range(B)]))
        state, out = step(state, lefts, rights)
        t_invs.append(out.T_inv)
        accepts.append(out.accept)
        inliers.append(out.num_inliers)
    jax.block_until_ready(t_invs[-1])
    wall = time.perf_counter() - t0

    T = np.asarray(jnp.stack(t_invs))        # (n, B, 4, 4) — single fetch
    A = np.asarray(jnp.stack(accepts))       # (n, B)
    I = np.asarray(jnp.stack(inliers))

    poses, stats = [], []
    for b in range(B):
        nb = lengths[b] - 1
        poses.append(chain_poses_host(T[:nb, b], A[:nb, b]))
        stats.append({
            "frames": lengths[b],
            "accept_ratio": float(A[:nb, b].mean()) if nb else 0.0,
            "mean_inliers": float(I[:nb, b].mean()) if nb else 0.0,
        })
    return poses, stats, wall
