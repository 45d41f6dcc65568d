"""Checkpoint / resume for long multi-sequence runs.

The reference has no checkpointing (SURVEY.md section 5); for batch KITTI
evaluation across hosts we snapshot the full resumable state per sequence:
the integrated pose, tracked-feature arrays, frame index, and RNG key. The
prepared image pyramids are NOT stored — they are recomputed from the
sequence images at resume (pure function of frame t0).

Format: a single .npz per sequence; tiny (a few hundred KB), written
atomically (tmp + rename) so a crash never leaves a torn snapshot.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

import numpy as np


def save_checkpoint(path: str, vo, extra: Optional[dict] = None) -> None:
    """Snapshot a VisualOdometry instance's resumable state."""
    state = vo.state
    payload = {
        "frame_pose": vo.frame_pose,
        "frame_id": np.int64(vo.frame_id),
        "points": np.asarray(state.features.points),
        "ages": np.asarray(state.features.ages),
        "valid": np.asarray(state.features.valid),
        "ids": np.asarray(state.features.ids),
        "next_id": np.asarray(state.features.next_id),
        "flow": np.asarray(state.features.flow),
        "disp": np.asarray(state.features.disp),
        "tvec": np.asarray(state.tvec),
        "key": np.asarray(state.key),
    }
    for k, v in (extra or {}).items():
        payload["extra_" + k] = np.asarray(v)
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


_REQUIRED_KEYS = ("frame_pose", "frame_id", "points", "ages", "valid",
                  "ids", "next_id", "tvec", "key")
# flow/disp are motion-prior LK seeds added after the first checkpoint
# format shipped. They are benign (zero = identity seeding, the closure
# check still validates every track), so snapshots written before they
# existed restore with zeros instead of being rejected as corrupt —
# a missing OPTIONAL key is a format version difference, not a torn file.
_OPTIONAL_ZERO_KEYS = ("flow", "disp")


class CorruptCheckpoint(ValueError):
    """A checkpoint file that cannot be trusted (torn write, truncation,
    wrong format). Callers treat it as absent rather than resuming from
    garbage."""


def load_checkpoint(path: str) -> dict:
    """Load + validate a snapshot; raises CorruptCheckpoint on torn or
    incomplete files (the atomic tmp+rename write makes these rare, but a
    crashed filesystem or manual copy can still produce one)."""
    try:
        with np.load(path) as z:
            ckpt = {k: z[k] for k in z.files}
    except Exception as e:
        raise CorruptCheckpoint(f"{path}: unreadable ({e!r})") from e
    missing = [k for k in _REQUIRED_KEYS if k not in ckpt]
    if missing:
        raise CorruptCheckpoint(f"{path}: missing keys {missing}")
    for k in _OPTIONAL_ZERO_KEYS:
        if k not in ckpt:
            ckpt[k] = np.zeros_like(ckpt["points"])  # (N, 2) zero seeds
    return ckpt


def _atomic_savez(path: str, payload: dict) -> None:
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


# --- scan-runner (chunk-boundary) checkpoints ------------------------------
# The fast path's snapshot (VERDICT.md round-3 weak #5: checkpointing that
# only exists on the 10x-slower interactive runner inverts the point). The
# snapshot stores the device VOState's resumable arrays, the absolute step
# cursor, and the per-frame outputs fetched so far; pyramids are rebuilt at
# resume from seq.frame(frames_done) exactly as restore_vo does.

_SCAN_REQUIRED = ("frames_done", "points", "ages", "valid", "ids", "next_id",
                  "flow", "disp", "tvec", "key", "out_T_inv", "out_accept",
                  "out_scale", "out_euler", "out_rvec", "out_tvec",
                  "out_num_inliers", "out_num_matched", "out_num_bucketed")


def save_scan_checkpoint(path: str, frames_done: int, state_arrays: dict,
                         fetched_outputs, tracks=None) -> None:
    """Snapshot a scan run at a chunk boundary. ``state_arrays`` holds the
    VOState's resumable arrays as host numpy (points/ages/valid/ids/next_id/
    flow/disp/tvec/key — the runner fetches them as two packed vectors to
    pay two tunnel round trips, not nine); ``fetched_outputs`` is the numpy
    StepOutput stack of the ``frames_done`` steps so far. ``tracks`` (a
    stacked TrackSnapshot pytree, optional) persists the per-frame track
    emissions of a collect_tracks run (~19 kB/frame) so windowed BA can
    resume with the outputs."""
    payload = {"frames_done": np.int64(frames_done)}
    for k in ("points", "ages", "valid", "ids", "next_id", "flow", "disp",
              "tvec", "key"):
        payload[k] = np.asarray(state_arrays[k])
    for k, v in fetched_outputs._asdict().items():
        payload["out_" + k] = np.asarray(v)
    if tracks is not None:
        for k, v in tracks._asdict().items():
            payload["trk_" + k] = np.asarray(v)
    _atomic_savez(path, payload)


def load_scan_checkpoint(path: str) -> dict:
    """Load + validate a scan snapshot; raises CorruptCheckpoint on torn or
    incomplete files (same contract as load_checkpoint)."""
    try:
        with np.load(path) as z:
            ckpt = {k: z[k] for k in z.files}
    except Exception as e:
        raise CorruptCheckpoint(f"{path}: unreadable ({e!r})") from e
    missing = [k for k in _SCAN_REQUIRED if k not in ckpt]
    if missing:
        raise CorruptCheckpoint(f"{path}: missing keys {missing}")
    if int(ckpt["frames_done"]) != len(ckpt["out_accept"]):
        raise CorruptCheckpoint(
            f"{path}: cursor/output mismatch "
            f"({int(ckpt['frames_done'])} vs {len(ckpt['out_accept'])})")
    return ckpt


def restore_vo(vo, ckpt: dict, left_t0: np.ndarray, right_t0: np.ndarray) -> int:
    """Restore a VisualOdometry instance; returns the next frame index.

    left_t0/right_t0 must be the images of the checkpointed frame (pyramids
    are rebuilt from them).
    """
    import jax.numpy as jnp

    from visual_odom_tpu.frontend.featureset import FeatureState
    from visual_odom_tpu.runner.pipeline import VOState, prep_image

    vo.frame_pose = np.asarray(ckpt["frame_pose"], np.float64)
    vo.frame_id = int(ckpt["frame_id"])
    # Pyramids rebuilt exactly as the pipeline builds them (prep_image picks
    # the deriv layout matching the configured LK backend).
    vo.state = VOState(
        features=FeatureState(
            points=jnp.asarray(ckpt["points"]),
            ages=jnp.asarray(ckpt["ages"]),
            valid=jnp.asarray(ckpt["valid"]),
            ids=jnp.asarray(ckpt["ids"]),
            next_id=jnp.asarray(ckpt["next_id"]),
            flow=jnp.asarray(ckpt["flow"]),
            disp=jnp.asarray(ckpt["disp"]),
        ),
        lk_l0=prep_image(jnp.asarray(left_t0), vo.config),
        lk_r0=prep_image(jnp.asarray(right_t0), vo.config),
        tvec=jnp.asarray(ckpt["tvec"]),
        key=jnp.asarray(ckpt["key"]),
    )
    return vo.frame_id + 1


# --- batched (multi-sequence DP) chunk-boundary checkpoints ----------------
# SURVEY.md section 5: "for multi-host batch eval make sequence shards
# restartable" (VERDICT r4 missing #3 / next-step #5). One snapshot covers
# ALL B lockstep sequences: the batched VOState's resumable arrays carry a
# leading batch axis, outputs are the (steps, B, ...) stacks the chunked
# batch runner accumulates.

_BATCH_REQUIRED = ("frames_done", "points", "ages", "valid", "ids",
                   "next_id", "flow", "disp", "tvec", "key",
                   "out_T_inv", "out_accept", "out_num_inliers")


def save_batch_checkpoint(path: str, frames_done: int, state_arrays: dict,
                          outs: dict) -> None:
    """Snapshot the batched scan at a chunk boundary. ``state_arrays``:
    batched resumable arrays (leading B); ``outs``: {"T_inv": (steps, B,
    4, 4), "accept": (steps, B), "num_inliers": (steps, B)}."""
    payload = {"frames_done": np.int64(frames_done)}
    for k in ("points", "ages", "valid", "ids", "next_id", "flow", "disp",
              "tvec", "key"):
        payload[k] = np.asarray(state_arrays[k])
    for k, v in outs.items():
        payload["out_" + k] = np.asarray(v)
    _atomic_savez(path, payload)


def load_batch_checkpoint(path: str, batch: int) -> dict:
    """Load + validate a batched snapshot for a B=``batch`` run; raises
    CorruptCheckpoint on torn files, cursor/output mismatch, or a batch
    size that does not match the resuming run."""
    try:
        with np.load(path) as z:
            ckpt = {k: z[k] for k in z.files}
    except Exception as e:
        raise CorruptCheckpoint(f"{path}: unreadable ({e!r})") from e
    missing = [k for k in _BATCH_REQUIRED if k not in ckpt]
    if missing:
        raise CorruptCheckpoint(f"{path}: missing keys {missing}")
    if int(ckpt["frames_done"]) != len(ckpt["out_accept"]):
        raise CorruptCheckpoint(
            f"{path}: cursor/output mismatch "
            f"({int(ckpt['frames_done'])} vs {len(ckpt['out_accept'])})")
    if ckpt["points"].shape[0] != batch:
        raise CorruptCheckpoint(
            f"{path}: batch mismatch (snapshot B={ckpt['points'].shape[0]},"
            f" run B={batch})")
    return ckpt
