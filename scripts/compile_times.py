"""Time trace+lower+compile of each pipeline component in isolation."""

import os, time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/vo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import jax.numpy as jnp

from visual_odom_tpu.config import CameraIntrinsics, VOConfig

H, W = 120, 160
intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2, bf=-120.0 * 0.54,
                        width=W, height=H)
cfg = VOConfig.for_image(H, W, ransac_iterations=200)
P = cfg.padded_features

img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (H, W)).astype(np.float32))


def timeit(name, fn):
    t = time.time()
    out = fn()
    jax.block_until_ready(out)
    print(f"{name}: {time.time()-t:.1f}s", flush=True)
    return out


from visual_odom_tpu.ops.lk import LKParams, prepare_lk_image, lk_track_pyramid

params = LKParams()
li = timeit("prepare_lk_image", lambda: prepare_lk_image(img, params))

from visual_odom_tpu.frontend.featureset import empty_feature_state
from visual_odom_tpu.frontend.bucketing import detect_and_bucket

state = empty_feature_state(P)
bucketed = timeit("detect_and_bucket", lambda: detect_and_bucket(img, state, cfg))

pts = jnp.zeros((P, 2), jnp.float32) + 50.0
valid = jnp.ones((P,), bool)
timeit("lk_track one leg", lambda: lk_track_pyramid(li, li, pts, valid, params))

from visual_odom_tpu.frontend.matching import circular_match

timeit("circular_match 4 legs",
       lambda: circular_match(li, li, li, li, bucketed, params, 0.0))

from visual_odom_tpu.core.triangulate import triangulate_points

Pl = jnp.asarray(intr.proj_left())
Pr = jnp.asarray(intr.proj_right())
timeit("triangulate", lambda: triangulate_points(Pl, Pr, pts, pts + 1.0))

from visual_odom_tpu.backend.pnp import pnp_ransac

X = jnp.concatenate([pts, jnp.full((P, 1), 10.0)], axis=1)
K = jnp.asarray(intr.intrinsic_matrix())
timeit(
    "pnp_ransac 200 hyp",
    lambda: pnp_ransac(X, pts, valid, K, jnp.zeros(3), jnp.zeros(3),
                       jax.random.PRNGKey(0), iterations=200),
)

from visual_odom_tpu.backend.integrate import gate_and_integrate

timeit("gate", lambda: gate_and_integrate(jnp.zeros(3), jnp.ones(3)))
print("all components compiled")
