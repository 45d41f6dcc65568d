"""Distributed tests on the fake 8-device CPU mesh (conftest forces
--xla_force_host_platform_device_count=8; SURVEY.md section 4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visual_odom_tpu.parallel.mesh import make_mesh


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh({"data": 2, "model": 4})
    assert mesh.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        make_mesh({"data": 16})


def test_sharded_ba_matches_single_device():
    from visual_odom_tpu.ba.problem import synthetic_ba_problem
    from visual_odom_tpu.ba.schur import ba_solve
    from visual_odom_tpu.parallel.sharded_ba import sharded_ba_solve

    problem, *_ = synthetic_ba_problem(num_poses=4, num_landmarks=64, seed=7)
    mesh = make_mesh({"data": 1, "model": 8})
    single = ba_solve(problem, iterations=4)
    sharded = sharded_ba_solve(problem, mesh, iterations=4)
    np.testing.assert_allclose(
        np.asarray(sharded.poses), np.asarray(single.poses), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sharded.landmarks), np.asarray(single.landmarks), atol=1e-3
    )


def test_collective_wrappers():
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh({"model": 8})
    x = np.arange(8.0, dtype=np.float32)

    @jax.jit
    def summed(v):
        v = jax.lax.with_sharding_constraint(v, P("model"))
        return jnp.sum(v)

    with jax.sharding.set_mesh(mesh):
        assert float(summed(jnp.asarray(x))) == 28.0


def test_dryrun_multichip_entrypoint():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_batched_chunked_scan_matches_per_frame():
    """run_sequences_batched(chunk=K) — one dispatch per K frames — must
    produce the same trajectories and stats as the per-frame path."""
    import numpy as np

    from visual_odom_tpu.config import CameraIntrinsics, VOConfig
    from visual_odom_tpu.io.synthetic import SyntheticStereoSequence
    from visual_odom_tpu.parallel.batch_eval import run_sequences_batched
    from visual_odom_tpu.parallel.mesh import make_mesh

    H, W = 120, 160
    intr = CameraIntrinsics(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2,
                            bf=-120.0 * 0.54, width=W, height=H)
    cfg = VOConfig.for_image(H, W, ransac_iterations=100)
    seqs = [list(SyntheticStereoSequence(intr, num_frames=11, seed=s,
                                         speed=0.5)) for s in (0, 1)]
    mesh = make_mesh({"data": 2, "model": 1})
    poses_a, stats_a, _ = run_sequences_batched(seqs, cfg, intr, mesh)
    poses_b, stats_b, _ = run_sequences_batched(seqs, cfg, intr, mesh,
                                                chunk=4)
    for pa, pb in zip(poses_a, poses_b):
        np.testing.assert_allclose(pa, pb, atol=1e-5)
    for sa, sb in zip(stats_a, stats_b):
        assert sa["accept_ratio"] == sb["accept_ratio"]
