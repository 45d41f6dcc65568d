from visual_odom_tpu.eval.kitti_eval import (
    SegmentError,
    trajectory_distances,
    calc_sequence_errors,
    average_errors,
    ate_rmse,
    rpe_errors,
    evaluate_sequence,
)

__all__ = [
    "SegmentError",
    "trajectory_distances",
    "calc_sequence_errors",
    "average_errors",
    "ate_rmse",
    "rpe_errors",
    "evaluate_sequence",
]
