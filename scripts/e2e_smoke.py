"""End-to-end smoke run on a synthetic stereo sequence (CPU-friendly sizes)."""

import os, sys, time

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/tmp/vo_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
from visual_odom_tpu.config import CameraIntrinsics, VOConfig
from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
from visual_odom_tpu.runner.pipeline import run_sequence
from visual_odom_tpu.eval.kitti_eval import evaluate_sequence, ate_rmse

H, W = 120, 160
intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2, bf=-120.0 * 0.54,
                        width=W, height=H)
cfg = VOConfig.for_image(H, W, ransac_iterations=200)
print("grid", cfg.grid_h, "x", cfg.grid_w, "padded", cfg.padded_features)

n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
seq = SyntheticStereoSequence(intr, num_frames=n_frames, seed=0, speed=0.5)
print("rendering done, running VO...")

t0 = time.time()
poses, results = run_sequence(seq, cfg, intr, verbose=True)
print(f"total {time.time()-t0:.1f}s")

gt = seq.poses
print("gt final pos", gt[-1, :3, 3])
print("vo final pos", poses[-1, :3, 3])
print("ate", ate_rmse(gt[: len(poses)], poses))
for i in range(min(len(poses), len(gt))):
    e = np.linalg.norm(poses[i, :3, 3] - gt[i, :3, 3])
    print(f"frame {i}: drift {e:.3f} m")
