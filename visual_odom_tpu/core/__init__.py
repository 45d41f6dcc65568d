from visual_odom_tpu.core.lie import (
    rodrigues,
    rodrigues_inverse,
    rotation_to_euler,
    euler_to_rotation,
    is_rotation_matrix,
    se3_matrix,
    se3_inverse,
)
from visual_odom_tpu.core.triangulate import triangulate_points

__all__ = [
    "rodrigues",
    "rodrigues_inverse",
    "rotation_to_euler",
    "euler_to_rotation",
    "is_rotation_matrix",
    "se3_matrix",
    "se3_inverse",
    "triangulate_points",
]
