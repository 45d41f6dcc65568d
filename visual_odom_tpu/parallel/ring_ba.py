"""Ring-sharded sequence-parallel windowed bundle adjustment.

The CP/ring-attention analog mandated by SURVEY.md section 5
("long-context"): a long keyframe trajectory is split into contiguous
windows, one per device along a mesh axis, with `halo` overlap keyframes
mirrored from each neighbor. Per Gauss-Newton round each device:

1. assembles Jacobian blocks for its window's observation rows (halo rows
   replicate the neighbor's data, so boundary coupling blocks are computed
   locally and exactly);
2. all-reduces the LANDMARK normal equations (``psum`` of Hll and bl —
   SURVEY.md section 5: "the Schur-complement landmark reduction all-reduced
   across hosts"), making the landmark elimination globally exact and the
   landmark update replicated on every device;
3. solves the reduced camera system S dp = rhs EXACTLY with distributed
   block-Jacobi-preconditioned conjugate gradients: because feature tracks
   span at most ``halo + 1`` consecutive keyframes, S is block-banded with
   only adjacent-window coupling, so every CG matvec needs just one
   ring exchange of the (halo, 6) boundary vector entries via
   ``jax.lax.ppermute`` — this is the ring-attention communication pattern;
4. back-substitutes landmarks with one more psum.

Because steps 2-4 reproduce the full-problem Gauss-Newton step exactly
(up to CG tolerance), the iteration follows the same trajectory as the
single-device ba.schur.ba_solve — tests/test_ring_ba.py verifies parity on
an 8-device CPU mesh. The gauge is handled by hard-projecting the global
pose-0 update to zero (ba_solve's 1e9 soft prior drifts ~1e-9/step; the
projection is the exact limit of that prior).

Communication per GN round: one psum of 12-L floats (L = landmarks), one
psum of 3-L, and per CG iteration two ppermutes of (halo, 6) floats plus
two scalar psums — independent of image size and window length.

Validity requirement: a landmark may couple poses at distance <= halo
(track span <= halo + 1 keyframes). make_ring_windows ENFORCES this (it
raises on any longer track — ADVICE.md round 2: a silent long track would
drop pose-pose coupling and quietly turn the solve approximate);
``required_ring_halo`` derives the minimal exact halo from the mask, and
``ring_ba_solve(halo=None)`` selects it automatically.

No reference counterpart exists — the reference has no BA at all
(SURVEY.md section 2 parallelism inventory; BASELINE.json north star).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from visual_odom_tpu.ba.problem import BAProblem
from visual_odom_tpu.ba.schur import _jacobian_blocks

_HI = jax.lax.Precision.HIGHEST


class RingWindows(NamedTuple):
    """Host-built windowed view of a BAProblem, ready to shard over the
    sequence axis. D = number of windows (devices), Wl = core + 2*halo."""

    poses: jnp.ndarray         # (D, Wl, 6)
    landmarks: jnp.ndarray     # (D, L, 3) replicated copies
    observations: jnp.ndarray  # (D, Wl, L, 3)
    mask: jnp.ndarray          # (D, Wl, L) bool
    pose_valid: jnp.ndarray    # (D, Wl) bool — False for out-of-range halos
    core: int                  # poses owned per window
    halo: int


def required_ring_halo(problem: BAProblem) -> int:
    """Minimal halo for which the ring solve is EXACT: the maximum
    pose-index span any landmark track couples (track over poses i..j
    couples pose pairs up to distance j - i)."""
    mask = np.asarray(problem.mask)                            # (W, L)
    W = mask.shape[0]
    idx = np.arange(W)[:, None]
    lo = np.where(mask, idx, W).min(axis=0)                    # (L,)
    hi = np.where(mask, idx, -1).max(axis=0)
    span = np.where(hi >= lo, hi - lo, 0)
    return int(span.max(initial=0))


def pad_problem_for_ring(problem: BAProblem, target_poses: int) -> BAProblem:
    """Append observation-less poses so W divides the window count. Padded
    poses have empty mask rows: zero residuals and Jacobians, so their GN
    update is exactly zero — they ride along untouched and are trimmed by
    the caller."""
    W = problem.poses.shape[0]
    if target_poses == W:
        return problem
    extra = target_poses - W
    return problem._replace(
        poses=jnp.concatenate(
            [problem.poses,
             jnp.tile(problem.poses[-1:], (extra, 1))], axis=0),
        observations=jnp.concatenate(
            [problem.observations,
             jnp.zeros((extra,) + problem.observations.shape[1:],
                       problem.observations.dtype)], axis=0),
        mask=jnp.concatenate(
            [problem.mask,
             jnp.zeros((extra,) + problem.mask.shape[1:], bool)], axis=0),
    )


def make_ring_windows(problem: BAProblem, num_windows: int,
                      halo: int = 1, check_span: bool = True) -> RingWindows:
    """Split a (W, L) BAProblem into overlapping windows.

    W must be divisible by num_windows (pad_problem_for_ring first if not).
    Out-of-range halo slots on the edge windows are clamped to index 0 and
    masked invalid. Raises when any landmark track spans more than halo + 1
    poses — the solve would silently drop that track's long-range pose-pose
    coupling and become approximate (ADVICE.md round 2).
    """
    W = problem.poses.shape[0]
    D = num_windows
    if W % D != 0:
        raise ValueError(f"poses ({W}) not divisible by windows ({D})")
    core = W // D
    if halo > core:
        raise ValueError(f"halo ({halo}) cannot exceed core ({core})")
    if check_span and D > 1:
        need = required_ring_halo(problem)
        if need > halo:
            raise ValueError(
                f"landmark tracks span up to {need + 1} poses but halo is "
                f"{halo}: the ring solve would drop pose-pose coupling and "
                f"be silently approximate; pass halo >= {need} (or halo="
                f"None to ring_ba_solve for auto-selection)")

    # Global pose index for each (window, local-slot).
    local = np.arange(-halo, core + halo)
    gidx = np.arange(D)[:, None] * core + local[None, :]     # (D, Wl)
    valid = (gidx >= 0) & (gidx < W)
    cidx = np.clip(gidx, 0, W - 1)

    poses = jnp.asarray(problem.poses)[cidx]                  # (D, Wl, 6)
    obs = jnp.asarray(problem.observations)[cidx]             # (D, Wl, L, 3)
    mask = jnp.asarray(problem.mask)[cidx] & jnp.asarray(valid)[..., None]
    landmarks = jnp.broadcast_to(
        problem.landmarks[None], (D,) + problem.landmarks.shape
    )
    return RingWindows(
        poses=poses,
        landmarks=landmarks,
        observations=obs,
        mask=mask,
        pose_valid=jnp.asarray(valid),
        core=core,
        halo=halo,
    )


def merge_ring_windows(problem: BAProblem, win: RingWindows,
                       out_poses: np.ndarray,
                       out_landmarks: np.ndarray) -> BAProblem:
    """Reassemble the global problem: core poses from their owner window.
    Landmark updates are psum-replicated, so every window holds the same
    copy — take window 0's."""
    D, Wl, _ = out_poses.shape
    core, halo = win.core, win.halo
    poses = out_poses[:, halo:halo + core].reshape(D * core, 6)
    return problem._replace(
        poses=jnp.asarray(poses, problem.poses.dtype),
        landmarks=jnp.asarray(out_landmarks[0], problem.landmarks.dtype),
    )


def ring_ba_solve(
    problem: BAProblem,
    mesh: Mesh,
    axis: str = "seq",
    halo: int | None = 1,
    rounds: int = 10,
    cg_iters: int = 32,
    damping: float = 1e-4,
    huber_delta: float = 0.0,
) -> BAProblem:
    """Sequence-parallel BA over ``mesh.shape[axis]`` trajectory windows.

    Each round is the exact global GN step of ba.schur.ba_solve, computed
    with ring-only pose communication (see module docstring).

    ``halo=None`` auto-selects the minimal exact halo from the observed
    track spans. ``huber_delta`` > 0 applies the same Huber IRLS weighting
    as ba_solve (weights computed from replicated halo rows, so every
    window sees identical weights for shared observations).
    """
    D = mesh.shape[axis]
    if halo is None:
        halo = max(1, required_ring_halo(problem))
    win = make_ring_windows(problem, D, halo=halo)
    core = win.core
    Wl = core + 2 * halo
    intr = dict(fx=problem.fx, fy=problem.fy, cx=problem.cx, cy=problem.cy,
                bf=problem.bf)

    def local_solve(poses, landmarks, obs, mask, pose_valid):
        # shard_map local views: leading window axis is size 1 here.
        poses, landmarks = poses[0], landmarks[0]
        obs, mask, pose_valid = obs[0], mask[0], pose_valid[0]
        idx = jax.lax.axis_index(axis)

        has_left = idx > 0
        has_right = idx < D - 1
        pos = jnp.arange(Wl)
        is_core = (pos >= halo) & (pos < halo + core)           # (Wl,)
        is_gauge = (idx == 0) & (pos == halo)                   # global pose 0
        # CG solves over the free core slots; gauge + invalid slots pinned.
        free = (is_core & pose_valid & ~is_gauge).astype(poses.dtype)

        fwd = [(i, (i + 1) % D) for i in range(D)]
        bwd = [(i, (i - 1) % D) for i in range(D)]
        core_w = is_core.astype(poses.dtype)                    # (Wl,)

        def refresh_halos(x):
            """Mirror each neighbor's boundary core entries into this
            window's halo slots of a distributed (Wl, ...) vector."""
            to_right = jax.lax.slice_in_dim(x, core, core + halo, axis=0)
            to_left = jax.lax.slice_in_dim(x, halo, 2 * halo, axis=0)
            from_left = jax.lax.ppermute(to_right, axis, fwd)
            from_right = jax.lax.ppermute(to_left, axis, bwd)
            left = jnp.where(has_left, from_left, jnp.zeros_like(from_left))
            right = jnp.where(has_right, from_right,
                              jnp.zeros_like(from_right))
            return jnp.concatenate([left, x[halo:halo + core], right], axis=0)

        def round_body(carry, _):
            poses, landmarks = carry
            # Linearization point: halo poses mirror their owner exactly.
            poses = jnp.where(pose_valid[:, None], refresh_halos(poses),
                              poses)

            local = BAProblem(poses=poses, landmarks=landmarks,
                              observations=obs, mask=mask, **intr)
            A, B, r = _jacobian_blocks(local, huber_delta=huber_delta)
            # shapes: (Wl,L,3,6) (Wl,L,3,3) (Wl,L,3)

            # --- globally-reduced landmark normal equations --------------
            # Every observation row is core to exactly one window, so the
            # psum of core-row contributions is the full-problem reduction.
            Bc = B * core_w[:, None, None, None]
            Hll = jax.lax.psum(
                jnp.einsum("wlri,wlrj->lij", Bc, B, precision=_HI), axis)
            bl = jax.lax.psum(
                jnp.einsum("wlri,wlr->li", Bc, r, precision=_HI), axis)
            Hll = Hll + damping * jnp.eye(3, dtype=Hll.dtype)
            Hll_inv = jnp.linalg.inv(Hll)                       # (L, 3, 3)

            # --- local rows of the global reduced camera system ----------
            # Halo rows replicate the neighbor's observation rows, so
            # S[w, v] for v up to `halo` slots into the neighbor is exact.
            Hpp = jnp.einsum("wlri,wlrj->wij", A, A, precision=_HI)
            Hpl = jnp.einsum("wlri,wlrj->wlij", A, B, precision=_HI)
            bp = jnp.einsum("wlri,wlr->wi", A, r, precision=_HI)
            HplWinv = jnp.einsum("wlij,ljk->wlik", Hpl, Hll_inv,
                                 precision=_HI)
            S = -jnp.einsum("wlik,vljk->wvij", HplWinv, Hpl, precision=_HI)
            S = S.at[jnp.arange(Wl), jnp.arange(Wl)].add(
                Hpp + damping * jnp.eye(6, dtype=Hpp.dtype))
            rhs = bp - jnp.einsum("wlik,lk->wi", HplWinv, bl, precision=_HI)

            # --- distributed block-Jacobi PCG on S dp = rhs ---------------
            # Matvec = local (Wl, Wl) block contraction after one ring
            # refresh of the operand's halo entries. Reductions over the
            # core slots of all windows (psum).
            Pinv = jnp.linalg.inv(
                S[jnp.arange(Wl), jnp.arange(Wl)]
                + 1e-12 * jnp.eye(6, dtype=S.dtype))            # (Wl, 6, 6)

            def matvec(x):
                y = jnp.einsum("wvij,vj->wi", S, refresh_halos(x),
                               precision=_HI)
                return y * free[:, None]

            def precond(r_):
                return jnp.einsum("wij,wj->wi", Pinv, r_,
                                  precision=_HI) * free[:, None]

            def dot(a, b_):
                return jax.lax.psum(jnp.sum(a * b_), axis)

            b = rhs * free[:, None]
            x0 = jnp.zeros_like(b)
            z0 = precond(b)
            rz0 = dot(b, z0)

            def cg_body(state, _):
                x, res, z, p, rz = state
                Ap = matvec(p)
                pAp = dot(p, Ap)
                alpha = jnp.where(pAp > 0, rz / jnp.maximum(pAp, 1e-30), 0.0)
                x = x + alpha * p
                res = res - alpha * Ap
                z = precond(res)
                rz_new = dot(res, z)
                beta = jnp.where(rz > 0, rz_new / jnp.maximum(rz, 1e-30), 0.0)
                p = z + beta * p
                return (x, res, z, p, rz_new), None

            (dp, *_), _ = jax.lax.scan(
                cg_body, (x0, b, z0, z0, rz0), None, length=cg_iters)

            # --- exact global landmark back-substitution ------------------
            # corr_l = sum over ALL global rows of Hpl' dp — core rows only
            # per window, psummed. dx is identical on every device, so the
            # landmark copies never diverge.
            Hpl_c = Hpl * core_w[:, None, None, None]
            corr = jax.lax.psum(
                jnp.einsum("wlij,wi->lj", Hpl_c, dp, precision=_HI), axis)
            dx = jnp.einsum("lij,lj->li", Hll_inv, bl - corr, precision=_HI)

            ok = jnp.all(jnp.isfinite(dp)) & jnp.all(jnp.isfinite(dx))
            poses = jnp.where(ok, poses - dp, poses)
            landmarks = jnp.where(ok, landmarks - dx, landmarks)
            return (poses, landmarks), None

        (poses, landmarks), _ = jax.lax.scan(
            round_body, (poses, landmarks), None, length=rounds)
        return poses[None], landmarks[None]

    spec = P(axis)
    solve = jax.jit(jax.shard_map(
        local_solve,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec),
        out_specs=(spec, spec),
    ))
    out_poses, out_landmarks = solve(
        win.poses, win.landmarks, win.observations, win.mask, win.pose_valid)
    return merge_ring_windows(problem, win, np.asarray(out_poses),
                              np.asarray(out_landmarks))


def make_ring_window_solver(mesh: Mesh, axis: str = "seq",
                            rounds: int = 8, cg_iters: int = 32,
                            huber_delta: float = 1.5):
    """solver(problem) closure for ba.window.smooth_trajectory_ba that
    shards each window's solve over ``mesh`` — EXACTLY.

    Per problem it (1) derives the minimal exact halo from the observed
    track spans, (2) pads the pose axis to a multiple of the mesh size,
    and (3) falls back to the single-device ba_solve with identical
    iteration count and robust weighting whenever the mesh cannot afford
    the halo (halo > core) — the result is then still exact, just not
    sharded (VERDICT.md round-2 weak #4: live-track ring smoothing must be
    exact, never silently approximate).
    """
    from visual_odom_tpu.ba.schur import ba_solve

    D = mesh.shape[axis]

    def solver(problem: BAProblem) -> BAProblem:
        W = problem.poses.shape[0]
        halo = max(1, required_ring_halo(problem))
        Wpad = -(-W // D) * D
        if halo > Wpad // D or D == 1:
            return ba_solve(problem, iterations=rounds,
                            huber_delta=huber_delta)
        padded = pad_problem_for_ring(problem, Wpad)
        out = ring_ba_solve(padded, mesh, axis=axis, halo=halo,
                            rounds=rounds, cg_iters=cg_iters,
                            huber_delta=huber_delta)
        return out._replace(
            poses=out.poses[:W],
            observations=out.observations[:W],
            mask=out.mask[:W],
        )

    return solver
