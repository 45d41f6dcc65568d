"""Image pyramid + gradient ops.

TPU-native building blocks for the pyramidal LK tracker (the reference's
pyramids are built inside cv::calcOpticalFlowPyrLK, reference
src/feature.cpp:136-139):

- ``pyr_down``: OpenCV-compatible pyrDown — separable 5-tap Gaussian
  [1, 4, 6, 4, 1]/16 with BORDER_REFLECT_101, then 2x decimation keeping even
  rows/cols. Output size is ceil(n/2), matching OpenCV.
- ``scharr_derivatives``: OpenCV LK's calcScharrDeriv — smoothing [3, 10, 3]
  cross derivative [-1, 0, 1], here normalized to true derivative units
  (/16 smooth, /2 diff -> /32 overall) so the LK normal equations are in
  pixel units. The /32 normalization cancels inside LK; we also fold it into
  the minEig threshold check to preserve OpenCV's threshold semantics
  (see ops/lk.py).

Everything is plain XLA (convolutions fuse well and run on the MXU for the
multi-channel case); Pallas is reserved for the gather-heavy LK iterations.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_GAUSS5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0


def _reflect101_pad(img: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """cv BORDER_REFLECT_101 padding: gfedcb|abcdefgh|gfedcba."""
    return jnp.pad(img, ((pad_h, pad_h), (pad_w, pad_w)), mode="reflect")


def _sep_filter2(img: jnp.ndarray, kr: np.ndarray, kc: np.ndarray) -> jnp.ndarray:
    """Separable 2-D correlation with REFLECT_101 border on a (H, W) image."""
    rh = len(kr) // 2
    rw = len(kc) // 2
    x = _reflect101_pad(img, rh, rw)
    # Row pass (vertical kernel kr).
    acc = jnp.zeros_like(x[rh:-rh if rh else None, :])
    H = img.shape[0]
    for i, w in enumerate(kr):
        acc = acc + x[i : i + H, :] * float(w)
    # Column pass (horizontal kernel kc).
    W = img.shape[1]
    out = jnp.zeros_like(img)
    for j, w in enumerate(kc):
        out = out + acc[:, j : j + W] * float(w)
    return out


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """OpenCV pyrDown: Gaussian blur then decimate. (H, W) -> (ceil(H/2), ceil(W/2))."""
    blurred = _sep_filter2(img, _GAUSS5, _GAUSS5)
    return blurred[::2, ::2]


def build_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """Pyramid [level0=img, level1, ..., level_levels] — ``levels``+1 images,
    matching cv::buildOpticalFlowPyramid(maxLevel=levels)."""
    pyr = [img]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


_SCHARR_SMOOTH = np.array([3.0, 10.0, 3.0], dtype=np.float32) / 16.0
_SCHARR_DIFF = np.array([-1.0, 0.0, 1.0], dtype=np.float32) / 2.0


def scharr_derivatives(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(Ix, Iy) Scharr derivatives in true-pixel units.

    OpenCV's LK uses integer Scharr with weights (3, 10, 3) x (-1, 0, 1)
    without normalization (a x32 scale); we normalize here and compensate in
    the minEig threshold (ops/lk.py) so results match OpenCV semantics.
    """
    ix = _sep_filter2(img, _SCHARR_SMOOTH, _SCHARR_DIFF)
    iy = _sep_filter2(img, _SCHARR_DIFF, _SCHARR_SMOOTH)
    return ix, iy


@partial(jax.jit, static_argnames=("levels",))
def build_pyramid_with_derivs(img: jnp.ndarray, levels: int):
    """Pyramid plus per-level Scharr derivatives, as flat tuples.

    Returns (images, ixs, iys) — each a tuple of ``levels + 1`` arrays from
    fine to coarse. Computed once per frame and reused by all four LK legs
    that read the same image (the quad shares pyramids: L0 appears in legs
    1 and 4, reference src/feature.cpp:136-139).
    """
    pyr = build_pyramid(img, levels)
    ixs, iys = zip(*(scharr_derivatives(p) for p in pyr))
    return tuple(pyr), tuple(ixs), tuple(iys)


# ---------------------------------------------------------------------------
# Banded-matrix pyramid: blur + decimate + re-pad as two aligned matmuls.
#
# ROOFLINE_r03.json measured the shifted-add pyramid at ~2.75 ms/image on a
# v5e — ~1000x the arithmetic speed-of-light — because every intermediate
# (unpadded 1241-wide levels, [::2] strided decimation) lives in a
# lane-unaligned layout that Mosaic must relayout tile by tile.  pyrDown is
# linear, so the whole level step (crop pad -> 5-tap REFLECT_101 Gaussian ->
# even decimation -> reflect re-pad -> zero alignment tail) composes into ONE
# static band matrix per axis:  padded_{k+1} = Mv @ padded_k @ Mh^T.  The
# operands are (8,128)-aligned end to end and the matmuls ride the MXU
# (~1.5 GFLOP/frame at KITTI size, microseconds), replacing the relayout
# storm.  prepare_lk_image (ops/lk.py) is the consumer.
# ---------------------------------------------------------------------------


def _reflect101_index(j: int, n: int) -> int:
    """Index folding for cv BORDER_REFLECT_101 (period 2n-2)."""
    if n == 1:
        return 0
    period = 2 * (n - 1)
    j = j % period
    return j if j < n else period - j


def _down_band_matrix(n_in: int) -> np.ndarray:
    """(ceil(n_in/2), n_in): one pyrDown axis — REFLECT_101 5-tap Gaussian
    blur + even decimation — as a band matrix."""
    n_out = -(-n_in // 2)
    M = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        for t in range(5):
            M[i, _reflect101_index(2 * i + t - 2, n_in)] += float(_GAUSS5[t])
    return M


def aligned_extent(n_logical: int, pad: int, axis: int) -> int:
    """THE padded-buffer alignment rule, shared by every producer/consumer
    of LK image planes (ops.lk._pad_reflect, the band matrices below, the
    batch-gridded Pallas BlockSpecs, scripts/prep_bench.py): a (n_logical +
    2*pad) reflect-padded axis is zero-extended along ``axis`` (0=rows,
    1=lanes) so the Pallas kernel's tile-aligned (32, 256) superblock loads
    are always in-bounds — rows to a multiple of 8 with >= 10 rows of
    slack, lanes to a multiple of 128 with >= 234 lanes of slack."""
    npad = n_logical + 2 * pad
    if axis == 0:
        return -(-(npad + 10) // 8) * 8
    return -(-(npad + 234) // 128) * 128


_aligned_totals = aligned_extent  # internal alias (band-matrix builders)


@functools.lru_cache(maxsize=None)
def _padded_down_matrix(n_in: int, pad: int, axis: int) -> np.ndarray:
    """(out_tot, in_tot) operator: aligned padded level-k axis -> aligned
    padded level-(k+1) axis.  Composes crop, blur+decimate, reflect re-pad
    and the zero alignment tail."""
    n_out = -(-n_in // 2)
    in_tot = _aligned_totals(n_in, pad, axis)
    out_tot = _aligned_totals(n_out, pad, axis)
    D = _down_band_matrix(n_in)
    M = np.zeros((out_tot, in_tot), np.float32)
    for r in range(pad + n_out + pad):
        j = _reflect101_index(r - pad, n_out)   # logical out row (reflect pad)
        # D[j] samples logical level-k indices; shift by pad into the buffer.
        M[r, pad : pad + n_in] = D[j]
    return M


def padded_pyr_down(p: jnp.ndarray, n_rows: int, n_cols: int,
                    pad: int) -> jnp.ndarray:
    """One pyramid level step directly in the padded aligned layout.

    ``p``: (row_tot, col_tot) padded buffer for a (n_rows, n_cols) level.
    Returns the padded buffer for the (ceil(n_rows/2), ceil(n_cols/2)) level,
    bit-matching _pad_reflect(pyr_down(level), pad) to f32 matmul accuracy.
    """
    Mv = jnp.asarray(_padded_down_matrix(n_rows, pad, 0))
    Mh = jnp.asarray(_padded_down_matrix(n_cols, pad, 1))
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(jnp.matmul(Mv, p, precision=hi), Mh.T, precision=hi)
