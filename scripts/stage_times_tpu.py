"""Per-stage timing of the VO step on the real TPU (KITTI-size)."""

import os, time
import numpy as np

import jax
import jax.numpy as jnp

from visual_odom_tpu.config import CameraIntrinsics, VOConfig
from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
from visual_odom_tpu.ops.lk import LKParams, lk_track_pyramid, prepare_lk_image
from visual_odom_tpu.ops.fast import fast_score_map
from visual_odom_tpu.frontend.featureset import empty_feature_state
from visual_odom_tpu.frontend.bucketing import detect_and_bucket
from visual_odom_tpu.frontend.matching import circular_match
from visual_odom_tpu.core.triangulate import triangulate_points
from visual_odom_tpu.backend.pnp import pnp_ransac

H, W = 376, 1241
intr = CameraIntrinsics(fx=718.856, fy=718.856, cx=W/2, cy=H/2,
                        bf=-718.856 * 0.537, width=W, height=H)
cfg = VOConfig.for_image(H, W)
print("rendering 3 frames...", flush=True)
seq = SyntheticStereoSequence(intr, num_frames=3, seed=0, speed=0.8)
(l0, r0), (l1, r1) = seq.frame(0), seq.frame(1)

params = LKParams()


def timeit(name, fn, n=5):
    out = fn()
    jax.block_until_ready(out)
    t = time.perf_counter()
    for _ in range(n):
        out = fn()
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t) / n * 1000
    print(f"{name}: {dt:.2f} ms", flush=True)
    return out


iml0 = timeit("prepare_lk_image", lambda: prepare_lk_image(jnp.asarray(l0, jnp.float32), params))
imr0 = prepare_lk_image(jnp.asarray(r0, jnp.float32), params)
iml1 = prepare_lk_image(jnp.asarray(l1, jnp.float32), params)
imr1 = prepare_lk_image(jnp.asarray(r1, jnp.float32), params)

timeit("fast_score_map", lambda: fast_score_map(jnp.asarray(l0, jnp.float32)))

state = empty_feature_state(cfg.padded_features)
bucketed = timeit("detect_and_bucket",
                  lambda: detect_and_bucket(jnp.asarray(l0, jnp.float32), state, cfg))
print("bucketed count:", int(bucketed.valid.sum()), flush=True)

one_leg = timeit("lk one leg (l0->r0)",
                 lambda: lk_track_pyramid(iml0, imr0, bucketed.points,
                                          bucketed.valid, params))

match = timeit("circular_match xla (4 legs)",
               lambda: circular_match(iml0, imr0, iml1, imr1, bucketed,
                                      params, cfg.circle_threshold, "xla"))
print("matched xla:", int(match.valid.sum()), flush=True)

if jax.default_backend() != "cpu":
    match_p = timeit("circular_match pallas (4 legs)",
                     lambda: circular_match(iml0, imr0, iml1, imr1, bucketed,
                                            params, cfg.circle_threshold,
                                            "pallas"))
    print("matched pallas:", int(match_p.valid.sum()), flush=True)

Pl = intr.proj_left()
Pr = intr.proj_right()
pts3d = timeit("triangulate", lambda: triangulate_points(Pl, Pr, match.points_l0, match.points_r0))
safe = np.array([0, 0, 10.0], np.float32)
pts3d = jnp.where(match.valid[:, None], pts3d, safe)

K = intr.intrinsic_matrix()
timeit("pnp_ransac 500", lambda: pnp_ransac(
    pts3d, match.points_l1, match.valid, K,
    jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32),
    jax.random.PRNGKey(0), iterations=cfg.ransac_iterations))
