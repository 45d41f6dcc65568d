from visual_odom_tpu.backend.pnp import pnp_ransac, PnPResult
from visual_odom_tpu.backend.integrate import (
    pose_delta,
    gate_and_integrate,
    integrate_pose_host,
)

__all__ = [
    "pnp_ransac",
    "PnPResult",
    "pose_delta",
    "gate_and_integrate",
    "integrate_pose_host",
]
