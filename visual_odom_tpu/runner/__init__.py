from visual_odom_tpu.runner.pipeline import (
    VisualOdometry,
    VOState,
    StepOutput,
    OutputBuffers,
    make_step_fn,
    make_buffered_step_fn,
    run_sequence,
    run_sequence_buffered,
    chain_poses_host,
)

__all__ = [
    "VisualOdometry",
    "VOState",
    "StepOutput",
    "OutputBuffers",
    "make_step_fn",
    "make_buffered_step_fn",
    "run_sequence",
    "run_sequence_buffered",
    "chain_poses_host",
]
