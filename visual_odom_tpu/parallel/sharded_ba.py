"""Distributed windowed bundle adjustment: landmark-sharded Schur reduction.

The one genuinely novel distributed component (SURVEY.md section 7, hard
part 5): the reduced camera system

    S   = Hpp - sum_l  Hpl_l Hll_l^-1 Hpl_l'
    rhs = bp  - sum_l  Hpl_l Hll_l^-1 bl_l

is a sum over LANDMARKS, so sharding the landmark axis across the "model"
mesh axis turns the Schur assembly into independent per-shard contractions
followed by one psum each — exactly the pattern XLA generates from a
sharding constraint on the landmark axis. The small dense solve of S
(6W x 6W) is replicated; landmark back-substitution is again local to each
shard. Communication per GN iteration: 2 all-reduces of (6W)^2 + 6W floats
over ICI, independent of L.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from visual_odom_tpu.ba.problem import BAProblem
from visual_odom_tpu.ba.schur import ba_gauss_newton_step


def _shard_landmarks(problem: BAProblem) -> BAProblem:
    return problem._replace(
        landmarks=jax.lax.with_sharding_constraint(
            problem.landmarks, P("model", None)
        ),
        observations=jax.lax.with_sharding_constraint(
            problem.observations, P(None, "model", None)
        ),
        mask=jax.lax.with_sharding_constraint(problem.mask, P(None, "model")),
        poses=jax.lax.with_sharding_constraint(problem.poses, P()),
    )


def sharded_ba_solve(problem: BAProblem, mesh: Mesh, iterations: int = 10,
                     damping: float = 1e-4) -> BAProblem:
    """GN bundle adjustment with the landmark axis sharded over "model".

    Semantically identical to ba.schur.ba_solve — tests verify the sharded
    and single-device solutions agree to float tolerance.
    """

    @partial(jax.jit, static_argnames=("iterations",))
    def solve(p: BAProblem, iterations: int):
        p = _shard_landmarks(p)

        def body(p, _):
            p = ba_gauss_newton_step(p, damping=damping)
            return _shard_landmarks(p), None

        p, _ = jax.lax.scan(body, p, None, length=iterations)
        return p

    with jax.sharding.set_mesh(mesh):
        return solve(problem, iterations)
