"""AOT-phase timing of the full VO step."""

import os, time, sys

os.environ["JAX_PLATFORMS"] = os.environ.get("VO_PLATFORM", "cpu")
import jax
jax.config.update("jax_platforms", os.environ.get("VO_PLATFORM", "cpu"))

jax.config.update("jax_compilation_cache_dir", "/tmp/vo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import jax.numpy as jnp

from visual_odom_tpu.config import CameraIntrinsics, VOConfig
from visual_odom_tpu.runner.pipeline import VisualOdometry, make_step_fn

H, W = 120, 160
intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2, bf=-120.0 * 0.54,
                        width=W, height=H)
cfg = VOConfig.for_image(H, W, ransac_iterations=200)

vo = VisualOdometry(cfg, intr)
img = np.random.default_rng(0).uniform(0, 255, (H, W)).astype(np.uint8)
vo.initialize(img, img)

step = vo._step
t = time.time()
traced = step.trace(vo.state, jnp.asarray(img), jnp.asarray(img))
print(f"trace: {time.time()-t:.1f}s", flush=True)
print("jaxpr eqns:", len(traced.jaxpr.jaxpr.eqns), flush=True)
t = time.time()
lowered = traced.lower()
print(f"lower: {time.time()-t:.1f}s", flush=True)
t = time.time()
compiled = lowered.compile()
print(f"compile: {time.time()-t:.1f}s", flush=True)
t = time.time()
out = compiled(vo.state, jnp.asarray(img), jnp.asarray(img))
jax.block_until_ready(out)
print(f"run: {time.time()-t:.2f}s", flush=True)
