"""Microbench: where do the 6.7 ms/frame of pyramid prep go?

ROOFLINE_r03.json shows the per-frame scan prefix that ONLY builds the two
LK pyramids costs 6.68 ms — as much as the whole LK quad and ~1000x the
arithmetic speed-of-light (the blur is ~26 MFLOP/frame).  This bench times
isolated scan programs that carry the prepped pyramids as donated state
(matching the real pipeline's materialization) for several formulations:

  base      uint8 upload -> f32 convert -> zero-padded copy only (memcpy floor)
  current   prepare_lk_image (shifted-add separable blur + reflect pads)
  conv      pyr_down via lax.conv_general_dilated stride-2 separable passes
  conv2d    one fused 5x5 conv stride 2 per level

Run on the TPU:  python scripts/prep_bench.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from visual_odom_tpu.ops.lk import LKParams, prepare_lk_image, _pad_reflect
    from visual_odom_tpu.ops.pyramid import _GAUSS5

    H, W = 376, 1241
    params = LKParams()
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (32, H, W), dtype=np.uint8)

    g = jnp.asarray(np.asarray(_GAUSS5, np.float32))

    def pyr_down_conv(img, fused=False):
        p = jnp.pad(img, ((2, 2), (2, 2)), mode="reflect")
        x = p[None, None]
        if fused:
            k = jnp.outer(g, g)[None, None]
            y = jax.lax.conv_general_dilated(x, k, (2, 2), "VALID")
        else:
            kv = g[None, None, :, None]
            kh = g[None, None, None, :]
            y = jax.lax.conv_general_dilated(x, kv, (2, 1), "VALID")
            y = jax.lax.conv_general_dilated(y, kh, (1, 2), "VALID")
        return y[0, 0]

    def prep_conv(img, fused):
        pyr = [img.astype(jnp.float32)]
        for _ in range(params.levels):
            pyr.append(pyr_down_conv(pyr[-1], fused))
        return tuple(_pad_reflect(p, params.window + 3) for p in pyr)

    def prep_base(img):
        f = img.astype(jnp.float32)
        pad = params.window + 3
        H_tot = aligned_extent(H, pad, 0)
        W_tot = aligned_extent(W, pad, 1)
        return (jnp.zeros((H_tot, W_tot), jnp.float32)
                .at[pad:pad + H, pad:pad + W].set(f),)

    def make_scan(prep):
        @partial(jax.jit, donate_argnums=(0,))
        def scan(state, imgs):
            def body(s, img):
                out = prep(img)
                return out, jnp.float32(0)

            return jax.lax.scan(body, state, imgs)

        return scan

    from visual_odom_tpu.ops.pyramid import aligned_extent, build_pyramid

    def prep_zero_pad(img):
        f = img.astype(jnp.float32)
        pad = params.window + 3
        H_tot = aligned_extent(H, pad, 0)
        W_tot = aligned_extent(W, pad, 1)
        return (jnp.pad(f, ((pad, H_tot - H - pad), (pad, W_tot - W - pad))),)

    def prep_reflect_pad(img):
        return (_pad_reflect(img.astype(jnp.float32), params.window + 3),)

    def prep_pyr_nopad(img):
        return tuple(build_pyramid(img.astype(jnp.float32), params.levels))

    def prep_pyr_zeropad(img):
        pyr = build_pyramid(img.astype(jnp.float32), params.levels)
        pad = params.window + 3
        out = []
        for p in pyr:
            h, w = p.shape
            H_tot = aligned_extent(h, pad, 0)
            W_tot = aligned_extent(w, pad, 1)
            out.append(jnp.pad(p, ((pad, H_tot - h - pad),
                                   (pad, W_tot - w - pad))))
        return tuple(out)

    variants = {
        "convert": lambda im: (im.astype(jnp.float32) * 1.0,),
        "zeropad": prep_zero_pad,
        "reflpad": prep_reflect_pad,
        "pyrnop": prep_pyr_nopad,
        "pyrzp": prep_pyr_zeropad,
        "current": lambda im: prepare_lk_image(
            im.astype(jnp.float32), params, with_derivs=False).pyramid,
        "conv": lambda im: prep_conv(im, False),
    }

    d_imgs = jax.device_put(frames)
    for name, prep in variants.items():
        scan = make_scan(prep)
        state = jax.tree.map(jnp.copy, prep(jnp.asarray(frames[0])))
        state, _ = scan(state, d_imgs)  # compile + warm
        state = jax.tree.map(jnp.copy, state)
        t0 = time.perf_counter()
        reps = 4
        for _ in range(reps):
            state, out = scan(state, d_imgs)
        np.asarray(out)
        wall = time.perf_counter() - t0
        print(f"{name:8s} {wall / (reps * 32) * 1000:7.3f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main()
