from visual_odom_tpu.ops.pyramid import pyr_down, build_pyramid, scharr_derivatives
from visual_odom_tpu.ops.fast import fast_score_map, fast_corners
from visual_odom_tpu.ops.lk import lk_track_pyramid, LKParams

__all__ = [
    "pyr_down",
    "build_pyramid",
    "scharr_derivatives",
    "fast_score_map",
    "fast_corners",
    "lk_track_pyramid",
    "LKParams",
]
