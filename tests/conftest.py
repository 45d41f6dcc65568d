"""Test configuration: run on CPU with a virtual 8-device mesh.

Real-TPU runs are exercised by bench.py and the driver; unit tests must be
hermetic and device-free, so we force the host platform and fake 8 devices
for the sharding/collective tests (SURVEY.md section 4: "Distributed without
a cluster").
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compilation cache: XLA-CPU compiles are slow on this box; cache
# them across test runs. (This jax build ignores the env vars, so configure
# explicitly.)
import jax

# This machine's sitecustomize force-registers the axon TPU backend and
# overwrites jax_platforms to "axon,cpu" at interpreter startup; claw it
# back so tests run on the real host CPU (and get the 8 fake devices).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.environ.get("VO_JAX_CACHE", "/tmp/vo_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_textured_image(h, w, seed=0, smooth=3):
    """Synthetic textured grayscale image in 0..255 with trackable structure."""
    r = np.random.default_rng(seed)
    img = r.uniform(0, 255, size=(h, w)).astype(np.float32)
    # Smooth white noise into blobby texture so LK has gradients at scale.
    for _ in range(smooth):
        img = (
            img
            + np.roll(img, 1, 0) + np.roll(img, -1, 0)
            + np.roll(img, 1, 1) + np.roll(img, -1, 1)
        ) / 5.0
    img = img - img.min()
    img = img / img.max() * 255.0
    return img.astype(np.float32)


def warp_translate(img, dx, dy):
    """Bilinear-translated image: out[y, x] = img[y - dy, x - dx] (edge clamp)."""
    h, w = img.shape
    ys = np.clip(np.arange(h, dtype=np.float64) - dy, 0, h - 1)
    xs = np.clip(np.arange(w, dtype=np.float64) - dx, 0, w - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    a = img[np.ix_(y0, x0)]
    b = img[np.ix_(y0, x1)]
    c = img[np.ix_(y1, x0)]
    d = img[np.ix_(y1, x1)]
    return ((1 - fy) * (1 - fx) * a + (1 - fy) * fx * b
            + fy * (1 - fx) * c + fy * fx * d).astype(np.float32)
