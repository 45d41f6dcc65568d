"""Batched pyramidal Lucas-Kanade sparse optical flow.

TPU-native replacement for the reference's hot loop — the four chained
cv::calcOpticalFlowPyrLK calls of circular matching (reference
src/feature.cpp:118-148; CUDA twin :150-204). Parameters mirror the
reference exactly: 21x21 window, 3 pyramid levels, <=30 iterations,
eps 0.01, minEigThreshold 0.001 (src/feature.cpp:127-139).

Numerics follow OpenCV's LKTrackerInvoker closely so downstream RANSAC
statistics match:

- pyramids via pyrDown (5-tap Gaussian, REFLECT_101), template gradients via
  Scharr (3,10,3)x(-1,0,1);
- per level: bilinear template/gradient patch gather at the integer-floored
  window corner, fixed 2x2 normal matrix G over the window;
- iterate: delta = -G^-1 . sum(dI * grad), stop at |delta|^2 <= eps^2, with
  OpenCV's oscillation damping (half-step back when delta flip-flops);
- spectral gate: lambda_min(G) / (1024 * winArea) < minEigThreshold fails the
  feature (the 1024 = 32^2 factor restores OpenCV's unnormalized-Scharr
  units, see ops/pyramid.py docstring);
- status=0 only when the failure happens at level 0, matching OpenCV.

Design: each *image* is prepared once per frame (`prepare_lk_image`: padded
pyramid + Scharr derivatives) and reused by the two legs that read it; the
tracker itself is `vmap`ped over the feature axis so all N features advance
in lockstep — a batched while_loop that runs until every active feature
converges. All shapes static.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from visual_odom_tpu.ops.pyramid import build_pyramid, padded_pyr_down, scharr_derivatives


class LKParams(NamedTuple):
    window: int = 21
    levels: int = 3
    max_iters: int = 30
    eps: float = 0.01
    min_eig_threshold: float = 0.001


@jax.tree_util.register_pytree_node_class
class LKImage:
    """Per-image precomputation shared by every LK leg touching the image.

    All arrays are padded by ``pad`` pixels of REFLECT_101 border on each side
    (OpenCV's buildOpticalFlowPyramid pads each level by winSize for the same
    reason: windows may legally hang off the image edge).

    ``shapes`` (unpadded per-level dims) and ``pad`` are static pytree
    metadata, so jitted consumers can use them as Python ints.
    """

    def __init__(self, pyramid: tuple, ix: tuple, iy: tuple, shapes: tuple,
                 pad: int):
        self.pyramid = pyramid  # level -> (H_l + 2p, W_l + 2p) f32 image
        self.ix = ix            # level -> Scharr d/dx, same padded shape
        self.iy = iy            # level -> Scharr d/dy
        self.shapes = shapes    # level -> (H_l, W_l) unpadded, static
        self.pad = pad

    def tree_flatten(self):
        return (self.pyramid, self.ix, self.iy), (self.shapes, self.pad)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], children[2], aux[0], aux[1])


def _pad_reflect(img: jnp.ndarray, pad: int) -> jnp.ndarray:
    p = jnp.pad(img, ((pad, pad), (pad, pad)), mode="reflect")
    # Extra zero padding bottom/right for the Pallas kernel's aligned window
    # loads (the shared rule lives in ops.pyramid.aligned_extent). Outside
    # the legal gather region for both backends, so numerics are unaffected.
    from visual_odom_tpu.ops.pyramid import aligned_extent

    Hp, Wp = p.shape
    h, w = img.shape
    return jnp.pad(p, ((0, aligned_extent(h, pad, 0) - Hp),
                       (0, aligned_extent(w, pad, 1) - Wp)))


@partial(jax.jit, static_argnames=("params", "with_derivs"))
def prepare_lk_image(img: jnp.ndarray, params: LKParams = LKParams(),
                     with_derivs: bool = True) -> LKImage:
    """Build the padded pyramid (+ derivative stack) for one grayscale image.

    ``with_derivs=False`` skips the two full-image Scharr convolutions per
    level; the Pallas LK backend derives gradients in-kernel from the image
    superblock and never reads `ix`/`iy` (two fewer convs per frame and half
    the VMEM per plane set). The XLA backend requires with_derivs=True.
    """
    pad = params.window + 3
    # Pyramid built level-to-level in the padded aligned layout via banded
    # matmuls (ops/pyramid.padded_pyr_down): on TPU the unpadded levels'
    # lane-unaligned layouts and the [::2] strided decimation cost ~2.75
    # ms/image in Mosaic relayouts (ROOFLINE_r03.json); the composed band
    # matrices keep every buffer (8,128)-aligned and ride the MXU instead.
    padded, ixs, iys, shapes = [], [], [], []
    h, w = img.shape
    p = _pad_reflect(img.astype(jnp.float32), pad)
    for level in range(params.levels + 1):
        padded.append(p)
        shapes.append((h, w))
        if with_derivs:
            ix, iy = scharr_derivatives(p)
            ixs.append(ix)
            iys.append(iy)
        if level < params.levels:
            p = padded_pyr_down(p, h, w, pad)
            h, w = -(-h // 2), -(-w // 2)
    return LKImage(tuple(padded), tuple(ixs), tuple(iys), tuple(shapes), pad)


def _bilinear_patch(window: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, w: int):
    """(w+1, w+1) gathered window -> (w, w) bilinearly interpolated patch.

    a, b are the fractional x/y offsets; weights follow OpenCV:
    w00=(1-a)(1-b), w01=a(1-b), w10=(1-a)b, w11=ab.
    """
    w00 = (1.0 - a) * (1.0 - b)
    w01 = a * (1.0 - b)
    w10 = (1.0 - a) * b
    w11 = a * b
    return (
        w00 * window[:w, :w]
        + w01 * window[:w, 1 : w + 1]
        + w10 * window[1 : w + 1, :w]
        + w11 * window[1 : w + 1, 1 : w + 1]
    )


def _track_feature(image_I: LKImage, image_J: LKImage, pt0: jnp.ndarray,
                   params: LKParams, init0: jnp.ndarray = None,
                   start_level: int = None):
    """Track a single feature through the pyramid. Returns (pt1, status).

    ``init0`` (level-0 coords) seeds the solution estimate (OpenCV's
    OPTFLOW_USE_INITIAL_FLOW); default = pt0 (identity flow).

    ``start_level`` (default params.levels) starts the coarse-to-fine
    refinement below the pyramid top: with a good motion-prior ``init0``
    the coarse levels' job (absorbing large displacement) is already done,
    so seeded callers can skip them (config.lk_seed_skip_levels).

    Written for vmap over the feature axis; every branch is masked so the
    batched version is a single fused while_loop per level.
    """
    win = params.window
    half = (win - 1) * 0.5
    win_area = float(win * win)
    pad = image_I.pad
    # D < FLT_EPSILON in OpenCV units -> our units carry the 1024^2 factor.
    d_eps = 1.19209e-07 * (1024.0 ** 2)
    eps2 = params.eps * params.eps

    status = jnp.bool_(True)
    if init0 is None:
        init0 = pt0
    if start_level is None:
        start_level = params.levels
    next_pt = init0 / (2.0 ** start_level)  # estimate at the start level

    for level in range(start_level, -1, -1):
        rows, cols = image_I.shapes[level]
        I = image_I.pyramid[level]
        Ix = image_I.ix[level]
        Iy = image_I.iy[level]
        J = image_J.pyramid[level]

        prev_pt = pt0 / (2.0 ** level) - half
        if level != start_level:
            next_pt = next_pt * 2.0
        next_pt = next_pt - half

        ipt = jnp.floor(prev_pt)
        a = prev_pt[0] - ipt[0]
        b = prev_pt[1] - ipt[1]
        ipt = ipt.astype(jnp.int32)

        # Template-window validity (OpenCV LKTrackerInvoker bounds check).
        templ_ok = (
            (ipt[0] >= -win) & (ipt[0] < cols) & (ipt[1] >= -win) & (ipt[1] < rows)
        )

        start = (ipt[1] + pad, ipt[0] + pad)
        wI = jax.lax.dynamic_slice(I, start, (win + 1, win + 1))
        wIx = jax.lax.dynamic_slice(Ix, start, (win + 1, win + 1))
        wIy = jax.lax.dynamic_slice(Iy, start, (win + 1, win + 1))

        templ = _bilinear_patch(wI, a, b, win)
        gx = _bilinear_patch(wIx, a, b, win)
        gy = _bilinear_patch(wIy, a, b, win)

        A11 = jnp.sum(gx * gx)
        A12 = jnp.sum(gx * gy)
        A22 = jnp.sum(gy * gy)
        D = A11 * A22 - A12 * A12
        min_eig = (A22 + A11 - jnp.sqrt((A11 - A22) ** 2 + 4.0 * A12 * A12)) / (
            2.0 * win_area * 1024.0
        )
        spectral_ok = (min_eig >= params.min_eig_threshold) & (D >= d_eps)
        level_ok = templ_ok & spectral_ok
        D_safe = jnp.where(D == 0.0, 1.0, D)
        inv_D = 1.0 / D_safe

        def iter_cond(state):
            _, _, j, active, _ = state
            return active & (j < params.max_iters)

        def iter_body(state):
            pt, prev_delta, j, _, ok_lvl0 = state
            iipt = jnp.floor(pt)
            aa = pt[0] - iipt[0]
            bb = pt[1] - iipt[1]
            iipt_i = iipt.astype(jnp.int32)
            in_bounds = (
                (iipt_i[0] >= -win)
                & (iipt_i[0] < cols)
                & (iipt_i[1] >= -win)
                & (iipt_i[1] < rows)
            )
            wJ = jax.lax.dynamic_slice(
                J, (iipt_i[1] + pad, iipt_i[0] + pad), (win + 1, win + 1)
            )
            patch_J = _bilinear_patch(wJ, aa, bb, win)
            diff = patch_J - templ
            b1 = jnp.sum(diff * gx)
            b2 = jnp.sum(diff * gy)
            # OpenCV: delta = ((A12*b2 - A22*b1)*invD, (A12*b1 - A11*b2)*invD)
            delta = jnp.stack(
                [(A12 * b2 - A22 * b1) * inv_D, (A12 * b1 - A11 * b2) * inv_D]
            )
            new_pt = pt + delta
            converged = jnp.sum(delta * delta) <= eps2
            # Oscillation damping (OpenCV): if delta ~ -prev_delta, back off
            # half a step and stop.
            flip = (
                (j > 0)
                & (jnp.abs(delta[0] + prev_delta[0]) < 0.01)
                & (jnp.abs(delta[1] + prev_delta[1]) < 0.01)
            )
            new_pt = jnp.where(flip, new_pt - delta * 0.5, new_pt)
            stop = converged | flip | ~in_bounds
            # Out-of-bounds at level 0 kills the feature.
            ok_lvl0 = ok_lvl0 & (in_bounds | (level != 0))
            pt_out = jnp.where(in_bounds, new_pt, pt)
            return (pt_out, delta, j + 1, ~stop, ok_lvl0)

        init = (next_pt, jnp.zeros(2, jnp.float32), jnp.int32(0), level_ok,
                jnp.bool_(True))
        next_pt_refined, _, _, _, ok_lvl0 = jax.lax.while_loop(
            iter_cond, iter_body, init
        )
        # If the level failed its template/spectral gate the estimate passes
        # through unrefined (OpenCV `continue`), and at level 0 this also
        # clears status.
        next_pt = jnp.where(level_ok, next_pt_refined, next_pt) + half
        if level == 0:
            status = status & level_ok & ok_lvl0
        next_pt = next_pt  # carried to the next (finer) level

    return next_pt, status


@partial(jax.jit, static_argnames=("params", "start_level"))
def lk_track_pyramid(
    image_I: LKImage,
    image_J: LKImage,
    pts: jnp.ndarray,
    valid: jnp.ndarray,
    params: LKParams = LKParams(),
    init_pts: jnp.ndarray = None,
    start_level: int = None,
):
    """Track N features from image I to image J.

    Args:
      image_I/image_J: prepared pyramids (`prepare_lk_image`).
      pts: (N, 2) float32 source positions (x, y), full-resolution coords.
      valid: (N,) bool — inactive slots are passed through untouched with
        status False (fixed-capacity masked design; no dynamic shapes).
      params: LK parameters (defaults = reference constants).
      init_pts: optional (N, 2) initial solution estimates (motion-prior
        seeding, OpenCV OPTFLOW_USE_INITIAL_FLOW semantics); default pts.

    Returns:
      (pts1 (N, 2) float32, status (N,) bool).
    """
    # Clamp invalid slots to the image center so their gathers stay cheap and
    # in-bounds; results are masked out below.
    rows, cols = image_I.shapes[0]
    center = jnp.array([cols * 0.5, rows * 0.5], jnp.float32)
    safe_pts = jnp.where(valid[:, None], pts, center)
    if init_pts is None:
        init = safe_pts
    else:
        init = jnp.where(valid[:, None], init_pts, center)
    track = jax.vmap(
        lambda p, i0: _track_feature(image_I, image_J, p, params, i0,
                                     start_level))
    pts1, status = track(safe_pts, init)
    pts1 = jnp.where(valid[:, None], pts1, pts)
    status = status & valid
    return pts1, status


def lk_track(
    img_I: jnp.ndarray,
    img_J: jnp.ndarray,
    pts: jnp.ndarray,
    params: LKParams = LKParams(),
):
    """One-shot convenience API (featureTracking, reference src/feature.cpp:64-74):
    prepares both pyramids and tracks. Prefer prepare_lk_image + lk_track_pyramid
    in the pipeline, where pyramids are shared across the four legs."""
    li = prepare_lk_image(img_I, params)
    lj = prepare_lk_image(img_J, params)
    valid = jnp.ones(pts.shape[0], dtype=bool)
    return lk_track_pyramid(li, lj, pts, valid, params)
