"""Batched multi-sequence VO with (data, model) sharding.

DP x TP composition (SURVEY.md parallelism inventory):

- "data" shards the sequence batch: each device group tracks different
  sequences in lockstep (the reference's single loop, replicated — eval
  config 5 in BASELINE.json);
- "model" shards the per-step feature axis for the LK legs and bucketing,
  and the RANSAC hypothesis axis inside the PnP solve — XLA inserts the
  all-reduces for the global reductions (while-loop convergence predicates,
  argmax over hypotheses) automatically from the sharding constraints.

The same step function works on any mesh; `dryrun_multichip` in
__graft_entry__.py compiles and runs it on a virtual CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visual_odom_tpu.config import CameraIntrinsics, VOConfig
from visual_odom_tpu.frontend.featureset import FeatureState, empty_feature_state
from visual_odom_tpu.ops.lk import prepare_lk_image
from visual_odom_tpu.runner.pipeline import (
    VOState,
    _lk_params,
    _make_raw_step,
)


def _constrain(x, spec: P):
    return jax.lax.with_sharding_constraint(x, spec)


def _make_sharded_step(config: VOConfig, intrinsics: CameraIntrinsics):
    """Unjitted sharded batched step shared by the per-frame and the
    chunked-scan front doors."""
    raw = _make_raw_step(config, intrinsics)

    def shard_state(state: VOState) -> VOState:
        feats = FeatureState(
            points=_constrain(state.features.points, P("data", "model", None)),
            ages=_constrain(state.features.ages, P("data", "model")),
            valid=_constrain(state.features.valid, P("data", "model")),
            ids=_constrain(state.features.ids, P("data", "model")),
            next_id=_constrain(state.features.next_id, P("data")),
            flow=_constrain(state.features.flow, P("data", "model", None)),
            disp=_constrain(state.features.disp, P("data", "model", None)),
        )
        img_spec = P("data", None, None)
        lk_l0 = jax.tree.map(lambda a: _constrain(a, img_spec), state.lk_l0)
        lk_r0 = jax.tree.map(lambda a: _constrain(a, img_spec), state.lk_r0)
        return VOState(feats, lk_l0, lk_r0,
                       _constrain(state.tvec, P("data", None)),
                       _constrain(state.key, P("data", None)))

    def step(state: VOState, left, right):
        left = _constrain(left, P("data", None, None))
        right = _constrain(right, P("data", None, None))
        state = shard_state(state)
        # Note on lk_skip_mode="adaptive" (the default): under vmap the
        # per-frame lax.cond lowers to a SELECT — both the fast and safe
        # quads run for every sequence (per-sequence adaptivity, results
        # identical to the single-sequence runner's, at fast+safe cost).
        # Throughput-critical DP sweeps on known-natural content should
        # pass --lk-skip-mode fixed (vo run-batch forwards the flag).
        new_state, out = jax.vmap(raw)(state, left, right)
        return shard_state(new_state), out

    return step


def make_batched_step_fn(config: VOConfig, intrinsics: CameraIntrinsics,
                         mesh: Mesh):
    """jitted (batched_state, left (B,H,W), right (B,H,W)) ->
    (batched_state, batched StepOutput), sharded over the mesh."""
    step = _make_sharded_step(config, intrinsics)
    jitted = jax.jit(step, donate_argnums=(0,))

    def call(state, left, right):
        # The mesh context must be active at call (trace) time, not at jit
        # construction.
        with jax.sharding.set_mesh(mesh):
            return jitted(state, left, right)

    return call


def make_batched_scan_fn(config: VOConfig, intrinsics: CameraIntrinsics,
                         mesh: Mesh, chunk: int):
    """jitted (state, lefts (chunk,B,H,W), rights (chunk,B,H,W)) ->
    (state, StepOutput stacked (chunk,B,...)) — the batched twin of the
    single-sequence chunked scan (runner.run_sequence_scan): one device
    dispatch per ``chunk`` frames instead of per frame, which removes the
    dominant per-step dispatch latency from the DP front door."""
    step = _make_sharded_step(config, intrinsics)

    @partial(jax.jit, donate_argnums=(0,))
    def scan_chunk(state, lefts, rights):
        def body(s, lr):
            return step(s, lr[0], lr[1])

        return jax.lax.scan(body, state, (lefts, rights))

    def call(state, lefts, rights):
        with jax.sharding.set_mesh(mesh):
            return scan_chunk(state, lefts, rights)

    return call


def batched_init_state(config: VOConfig, lefts: np.ndarray, rights: np.ndarray,
                       mesh: Mesh, seed: int = 0) -> VOState:
    """Initial batched VOState from (B, H, W) first frames."""
    params = _lk_params(config)
    B = lefts.shape[0]
    with jax.sharding.set_mesh(mesh):
        from visual_odom_tpu.runner.pipeline import prep_image

        prep = jax.jit(jax.vmap(
            lambda l, r: (prep_image(l, config), prep_image(r, config))
        ))
        lk_l0, lk_r0 = prep(jnp.asarray(lefts), jnp.asarray(rights))
        keys = jax.vmap(jax.random.PRNGKey)(seed + jnp.arange(B, dtype=jnp.uint32))
        return VOState(
            features=empty_feature_state(config.padded_features, batch=(B,)),
            lk_l0=lk_l0,
            lk_r0=lk_r0,
            tvec=jnp.zeros((B, 3), jnp.float32),
            key=keys,
        )
