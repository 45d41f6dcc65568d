"""TPU-native stereo visual odometry framework.

A from-scratch JAX/XLA/Pallas implementation of the SOFT-style stereo VO
pipeline (capabilities of ZhenghaoFei/visual_odom, re-designed TPU-first):

- FAST corner detection fused with spatial bucketing as a dense per-cell
  score-map reduction (reference: src/feature.cpp:39-62, 206-253).
- Batched pyramidal Lucas-Kanade circular matching over the stereo image quad
  L(t0) -> R(t0) -> R(t1) -> L(t1) -> L(t0) (reference: src/feature.cpp:118-148).
- Batched DLT stereo triangulation (reference: src/main.cpp:169-171).
- Vectorized PnP-RANSAC + Gauss-Newton pose refinement
  (reference: src/visualOdometry.cpp:132-193).
- Rotation/scale gating and pose chaining (reference: src/main.cpp:196-208,
  src/utils.cpp:57-91).
- KITTI odometry evaluation (reference: src/evaluate/evaluate_odometry.cpp).

Everything hot runs inside a single jitted per-frame step with fixed-capacity
masked feature state (no dynamic shapes); multi-device scaling uses
jax.sharding meshes with XLA collectives.
"""

from visual_odom_tpu.config import VOConfig, CameraIntrinsics

__all__ = ["VOConfig", "CameraIntrinsics"]
__version__ = "0.1.0"
