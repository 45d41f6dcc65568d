from visual_odom_tpu.ba.problem import BAProblem, synthetic_ba_problem
from visual_odom_tpu.ba.schur import ba_gauss_newton_step, ba_solve

__all__ = [
    "BAProblem",
    "synthetic_ba_problem",
    "ba_gauss_newton_step",
    "ba_solve",
]
