"""Diagnose gate rejections on the KITTI-size synthetic bench sequence."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from visual_odom_tpu.config import CameraIntrinsics, VOConfig
from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
from visual_odom_tpu.runner.pipeline import run_sequence_scan

H, W = 376, 1241
s = W / 1241.0
intr = CameraIntrinsics(fx=718.856 * s, fy=718.856 * s, cx=W / 2.0,
                        cy=H / 2.0, bf=-718.856 * s * 0.537,
                        width=W, height=H)
cfg = VOConfig.for_image(H, W)
print("cfg:", cfg.resolved_lk_backend(), "padded:", cfg.padded_features)
seq = SyntheticStereoSequence(intr, num_frames=33, seed=0, speed=0.8)
frames = list(seq)

poses, out, wall, processed = run_sequence_scan(frames, cfg, intr, chunk=32)
print(f"wall {wall:.2f}s processed {processed}")
for i in range(len(out.accept)):
    e = np.asarray(out.euler[i])
    print(f"f{i+1:03d} acc={bool(out.accept[i])} scale={float(out.scale[i]):.3f} "
          f"euler=({e[0]:+.3f},{e[1]:+.3f},{e[2]:+.3f}) "
          f"inl={int(out.num_inliers[i])} match={int(out.num_matched[i])} "
          f"buck={int(out.num_bucketed[i])} tvec={np.asarray(out.tvec[i]).round(2)}")

# GT deltas for comparison
gt = seq.poses
d = np.linalg.inv(gt[1]) @ gt[2]
print("gt step translation:", d[:3, 3].round(3))
