"""Pipeline-parallel VO: frontend / backend stages on separate devices.

The optional PP row of SURVEY.md section 2's parallelism inventory (the
reference is single-threaded; SURVEY marks stage pipelining low-priority —
implemented here for inventory completeness and as the pattern
demonstration for heavier backends).

Split: per frame, the step is ~90% frontend (pyramid build + FAST +
4 Lucas-Kanade legs) and ~10% backend (triangulation + PnP-RANSAC + gate).
Stage 0 owns the tracked-feature state and the image pyramids on device 0;
stage 1 owns the PnP warm start and RNG on device 1. The only inter-stage
traffic is the matched-feature packet — (P, 7) float32 = l0.xy, r0.xy,
l1.xy, valid ≈ 11 KB per frame — moved device-to-device with
``jax.device_put``.

Each stage is its own jitted program pinned to its device by committed
inputs; the host submits frontend(i) and backend(i-1) back-to-back without
blocking, so JAX's async dispatch runs the two devices CONCURRENTLY with a
one-frame skew (software pipelining, no SPMD divergence tricks).

Outputs are equal to the sequential runner's (tests/test_pipe.py): the
split is at a pure data boundary and the backend consumes the same packet
and RNG stream.

This split's steady-state throughput is bounded by the slower stage
(~1.1x best case over sequential here) — it exists to prove the pattern;
use DP over sequences (parallel/batch_eval.py) when chips are plentiful.
"""

from __future__ import annotations

import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from visual_odom_tpu.backend.integrate import gate_and_integrate
from visual_odom_tpu.backend.pnp import pnp_ransac
from visual_odom_tpu.config import CameraIntrinsics, VOConfig
from visual_odom_tpu.core.triangulate import triangulate_points
from visual_odom_tpu.frontend.bucketing import detect_and_bucket
from visual_odom_tpu.frontend.featureset import empty_feature_state
from visual_odom_tpu.frontend.matching import (
    skip_mode_match,
    commit_tracked_state,
)
from visual_odom_tpu.runner.pipeline import (
    StepOutput,
    _lk_params,
    chain_poses_host,
    prep_image,
)


def run_sequence_pipelined(
    frames,
    config: VOConfig,
    intrinsics: CameraIntrinsics,
    devices: Optional[Sequence] = None,
    seed: int = 0,
):
    """Two-stage pipelined sequence run over two devices.

    Returns (poses (N+1, 4, 4) float64, fetched StepOutput stack, wall_s) —
    same contract (and the same numbers) as runner.run_sequence_scan.
    """
    devs = list(devices if devices is not None else jax.devices())
    if len(devs) < 2:
        raise ValueError("pipeline parallelism needs two devices")
    dev_front, dev_back = devs[0], devs[1]

    frames = list(frames)
    n = len(frames) - 1
    params = _lk_params(config)
    lk_backend = config.resolved_lk_backend()
    P_l = intrinsics.proj_left()
    P_r = intrinsics.proj_right()
    K = intrinsics.intrinsic_matrix()

    @jax.jit
    def frontend(feats, lk_l0, lk_r0, left, right):
        lk_l1 = prep_image(left, config)
        lk_r1 = prep_image(right, config)
        pad = lk_l0.pad
        h, w = lk_l0.shapes[0]
        raw_l0 = jax.lax.dynamic_slice(lk_l0.pyramid[0], (pad, pad), (h, w))
        bucketed = detect_and_bucket(raw_l0, feats, config)
        match = skip_mode_match(lk_l0, lk_r0, lk_l1, lk_r1, bucketed,
                                params, config, lk_backend)
        packet = jnp.concatenate(
            [match.points_l0, match.points_r0, match.points_l1,
             match.valid[:, None].astype(jnp.float32)], axis=1)
        return commit_tracked_state(match), lk_l1, lk_r1, packet

    @jax.jit
    def backend(tvec, key, packet):
        pts_l0 = packet[:, 0:2]
        pts_r0 = packet[:, 2:4]
        pts_l1 = packet[:, 4:6]
        valid = packet[:, 6] > 0.5
        pts3d = triangulate_points(P_l, P_r, pts_l0, pts_r0)
        safe = jnp.array([0.0, 0.0, 10.0], jnp.float32)
        pts3d = jnp.where(valid[:, None], pts3d, safe)
        key, sub = jax.random.split(key)
        pnp = pnp_ransac(
            pts3d, pts_l1, valid, K,
            rvec0=jnp.zeros(3, jnp.float32), tvec0=tvec, key=sub,
            iterations=config.ransac_iterations,
            reproj_threshold=config.ransac_reproj_threshold,
            sample_size=config.ransac_sample_size,
            refine_iters=config.pnp_refine_iters,
        )
        # Optional mono rotation — the SAME ops and RNG stream as the
        # sequential step (runner/pipeline.py step: sub2 from a second
        # split, key advanced), so pipelined numbers stay bitwise-equal.
        # The packet already carries the l0/l1 correspondences the
        # essential solve needs (packet columns 0:2 and 4:6).
        rvec_out = pnp.rvec
        if config.mono_rotation:
            from visual_odom_tpu.backend.essential import (
                find_essential_ransac,
            )
            from visual_odom_tpu.core.lie import rodrigues_inverse

            key2, sub2 = jax.random.split(key)
            ess = find_essential_ransac(
                pts_l0, pts_l1, valid,
                float(intrinsics.fx),
                (float(intrinsics.cx), float(intrinsics.cy)),
                sub2,
            )
            rvec_out = rodrigues_inverse(ess.R)
            key = key2

        gate = gate_and_integrate(rvec_out, pnp.tvec)
        accept = gate.accept
        if config.resolved_min_accept_inliers() > 0:
            accept = accept & (pnp.num_inliers
                               >= config.resolved_min_accept_inliers())
        warm = jnp.where(
            accept & jnp.bool_(config.use_extrinsic_guess),
            pnp.tvec, jnp.zeros(3, jnp.float32))
        out = StepOutput(
            T_inv=gate.T_inv, accept=accept, scale=gate.scale,
            euler=gate.euler, rvec=rvec_out, tvec=pnp.tvec,
            num_inliers=pnp.num_inliers,
            num_matched=jnp.sum(valid).astype(jnp.int32),
            num_bucketed=jnp.sum(valid).astype(jnp.int32),
        )
        return warm, key, out

    # Committed inputs pin each stage's program to its device.
    put_f = lambda x: jax.device_put(x, dev_front)
    put_b = lambda x: jax.device_put(x, dev_back)

    feats = put_f(empty_feature_state(config.padded_features))
    lk_l0 = jax.tree.map(put_f, prep_image(put_f(jnp.asarray(
        np.asarray(frames[0][0]))), config))
    lk_r0 = jax.tree.map(put_f, prep_image(put_f(jnp.asarray(
        np.asarray(frames[0][1]))), config))
    tvec = put_b(jnp.zeros(3, jnp.float32))
    key = put_b(jax.random.PRNGKey(seed))

    outs = []
    packet_prev = None
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        left = put_f(jnp.asarray(np.asarray(frames[i][0])))
        right = put_f(jnp.asarray(np.asarray(frames[i][1])))
        # Submit frontend(i); do NOT block — backend(i-1) below runs on the
        # other device concurrently.
        feats, lk_l0, lk_r0, packet = frontend(feats, lk_l0, lk_r0,
                                               left, right)
        if packet_prev is not None:
            tvec, key, out = backend(tvec, key, packet_prev)
            outs.append(out)
        packet_prev = put_b(packet)  # async D2D copy overlaps both stages
    # Drain the pipeline: last frame's packet.
    tvec, key, out = backend(tvec, key, packet_prev)
    outs.append(out)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0

    fetched = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *outs)
    poses = chain_poses_host(fetched.T_inv, fetched.accept)
    return poses, fetched, wall
