"""Course-generator geometry invariants (pose-only, no rendering).

The endurance/devkit evidence (SOAK_*, bench long/loop rows) leans on
these properties; a regression in the yaw schedules would silently turn
the gauntlet into an unfair or gate-violating course.
"""

import numpy as np

from visual_odom_tpu.config import CameraIntrinsics
from visual_odom_tpu.io.synthetic import SyntheticStereoSequence, make_course


def _intr():
    return CameraIntrinsics(fx=120.0, fy=120.0, cx=80.0, cy=60.0,
                            bf=-64.8, width=160, height=120)


def _per_frame_yaws(poses):
    yaws = []
    for i in range(len(poses) - 1):
        R = np.linalg.inv(poses[i][:3, :3]) @ poses[i + 1][:3, :3]
        yaws.append(abs(np.arctan2(R[0, 2], R[2, 2])))
    return np.asarray(yaws)


def test_loop_closes_and_stays_under_gate():
    seq = make_course("loop", _intr(), num_frames=401)
    p = seq.poses[:, :3, 3]
    lf = seq.loop_frame
    # Ground truth returns to its start (lateral wobble bounds the gap).
    assert np.linalg.norm(p[lf] - p[0]) < 1.0
    # Heading closes too (4 exact 90-degree turns).
    R_close = np.linalg.inv(seq.poses[0][:3, :3]) @ seq.poses[lf][:3, :3]
    ang = np.degrees(np.arccos(np.clip((np.trace(R_close) - 1) / 2, -1, 1)))
    assert ang < 2.0, ang
    # Every per-frame yaw stays under the reference's 0.1 rad gate.
    assert _per_frame_yaws(seq.poses).max() < 0.1


def test_long_course_is_long_and_non_self_intersecting():
    seq = make_course("long", _intr(), num_frames=650)
    p = seq.poses[:, :3, 3]
    length = float(np.sum(np.linalg.norm(np.diff(p, axis=0), axis=1)))
    assert length >= 800.0, length           # every devkit bucket reachable
    assert _per_frame_yaws(seq.poses).max() < 0.1
    # Non-self-intersection proxy: no two poses more than 60 frames apart
    # come within twice the corridor width of each other (walls at +-16 m).
    horiz = p[:, [0, 2]]
    for i in range(0, len(horiz), 10):
        d = np.linalg.norm(horiz[i + 60:] - horiz[i], axis=1)
        if len(d):
            assert d.min() > 2 * SyntheticStereoSequence.WALL_OFFSET, i


def test_turn_steps_integrate_to_exact_quarter_turn():
    T = SyntheticStereoSequence.TURN_FRAMES
    total = sum(SyntheticStereoSequence._turn_step(t, 1.0) for t in range(T))
    assert abs(total - np.pi / 2) < 1e-12
    peak = max(SyntheticStereoSequence._turn_step(t, 1.0) for t in range(T))
    assert peak < 0.1                        # under the rejection gate
