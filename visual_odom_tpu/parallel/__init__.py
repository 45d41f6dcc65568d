from visual_odom_tpu.parallel.mesh import make_mesh, data_model_mesh
from visual_odom_tpu.parallel.batch import make_batched_step_fn, batched_init_state
from visual_odom_tpu.parallel.sharded_ba import sharded_ba_solve

__all__ = [
    "make_mesh",
    "data_model_mesh",
    "make_batched_step_fn",
    "batched_init_state",
    "sharded_ba_solve",
]
