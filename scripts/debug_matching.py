"""Stage-by-stage diagnosis of the circular matching chain on synthetic frames."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/vo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
import jax.numpy as jnp

from visual_odom_tpu.config import CameraIntrinsics, VOConfig
from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
from visual_odom_tpu.frontend.featureset import empty_feature_state
from visual_odom_tpu.frontend.bucketing import detect_and_bucket
from visual_odom_tpu.ops.lk import LKParams, prepare_lk_image, lk_track_pyramid

H, W = 120, 160
intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2, bf=-120.0 * 0.54,
                        width=W, height=H)
cfg = VOConfig.for_image(H, W)
seq = SyntheticStereoSequence(intr, num_frames=2, seed=0, speed=0.5)
l0, r0 = seq.frame(0)
l1, r1 = seq.frame(1)
print("image stats: l0 mean", l0.mean(), "std", l0.std())

state = empty_feature_state(cfg.padded_features)
bucketed = detect_and_bucket(jnp.asarray(l0, jnp.float32), state, cfg)
nb = int(bucketed.valid.sum())
print("bucketed:", nb, "/", cfg.num_buckets)

params = LKParams()
im = {k: prepare_lk_image(jnp.asarray(v, jnp.float32), params)
      for k, v in dict(l0=l0, r0=r0, l1=l1, r1=r1).items()}

pts_l0 = bucketed.points
valid = bucketed.valid
p_r0, s0 = lk_track_pyramid(im["l0"], im["r0"], pts_l0, valid, params)
p_r1, s1 = lk_track_pyramid(im["r0"], im["r1"], p_r0, valid, params)
p_l1, s2 = lk_track_pyramid(im["r1"], im["l1"], p_r1, valid, params)
p_ret, s3 = lk_track_pyramid(im["l1"], im["l0"], p_l1, valid, params)
for name, s in [("s0", s0), ("s1", s1), ("s2", s2), ("s3", s3)]:
    print(name, int(jnp.sum(s & valid)))

v = np.asarray(valid)
off = np.abs(np.asarray(pts_l0) - np.asarray(p_ret)).max(axis=1)
print("closure offsets (valid slots): median",
      np.median(off[v]), "p90", np.percentile(off[v], 90))
for th in [0.0, 0.01, 0.1, 0.5, 1.0, 2.0]:
    ok = (off <= th) & v & np.asarray(s0 & s1 & s2 & s3)
    print(f"  survive@{th}: {ok.sum()}")

# disparity sanity: r0 should be left-shifted (positive disparity)
d = np.asarray(pts_l0)[:, 0] - np.asarray(p_r0)[:, 0]
print("disparity med:", np.median(d[v & np.asarray(s0)]))

# flow l0->l1 magnitude
fl = np.linalg.norm(np.asarray(p_l1) - np.asarray(pts_l0), axis=1)
print("flow l0->l1 med:", np.median(fl[v & np.asarray(s0 & s1 & s2)]))

# compare with OpenCV circular matching on the same data
import cv2
ptsv = np.asarray(pts_l0)[v].astype(np.float32)
lk = dict(winSize=(21, 21), maxLevel=3,
          criteria=(cv2.TERM_CRITERIA_COUNT + cv2.TERM_CRITERIA_EPS, 30, 0.01),
          minEigThreshold=0.001)
a, st0, _ = cv2.calcOpticalFlowPyrLK(l0, r0, ptsv.reshape(-1, 1, 2), None, **lk)
b, st1, _ = cv2.calcOpticalFlowPyrLK(r0, r1, a, None, **lk)
c, st2, _ = cv2.calcOpticalFlowPyrLK(r1, l1, b, None, **lk)
dd, st3, _ = cv2.calcOpticalFlowPyrLK(l1, l0, c, None, **lk)
stv = (st0 & st1 & st2 & st3).reshape(-1).astype(bool)
cvoff = np.abs(dd.reshape(-1, 2) - ptsv).max(axis=1)
print("cv2: all-status pass:", stv.sum(), "of", len(ptsv))
print("cv2 closure offsets: median", np.median(cvoff[stv]))
for th in [0.0, 0.01, 0.1, 0.5, 1.0]:
    print(f"  cv2 survive@{th}: {((cvoff <= th) & stv).sum()}")
