"""Synthetic stereo sequence generator with exact ground truth.

There is no public imagery in this environment, so integration tests and
benchmarks render their own: a rigid 3-D scene of textured planes (ground
plane + fronto-parallel billboards at several depths) ray-cast through the
stereo rig at each ground-truth pose. This plays the role of SURVEY.md
section 4's "short synthetic stereo sequence" — end-to-end trajectories are
scored against the exact poses used for rendering.

Rendering is plain vectorized NumPy on the host (it is test/bench input
generation, not part of the pipeline).
"""

from __future__ import annotations

import numpy as np

from visual_odom_tpu.config import CameraIntrinsics


def _smooth_noise(h, w, rng, octaves=4):
    """Multi-octave value noise in [0, 255] with structure at several scales
    (gives FAST corners and LK-trackable gradients)."""
    img = np.zeros((h, w), np.float64)
    for o in range(octaves):
        s = 2 ** (octaves - o)
        small = rng.uniform(0, 1, (h // s + 2, w // s + 2))
        ys = np.linspace(0, small.shape[0] - 1.001, h)
        xs = np.linspace(0, small.shape[1] - 1.001, w)
        y0 = ys.astype(int)
        x0 = xs.astype(int)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        a = small[np.ix_(y0, x0)]
        b = small[np.ix_(y0, x0 + 1)]
        c = small[np.ix_(y0 + 1, x0)]
        d = small[np.ix_(y0 + 1, x0 + 1)]
        up = (1 - fy) * (1 - fx) * a + (1 - fy) * fx * b + fy * (1 - fx) * c + fy * fx * d
        img += up * (0.5 ** o)
    img -= img.min()
    img /= img.max()
    return img * 255.0


class _Plane:
    def __init__(self, p0, e1, e2, extent1, extent2, texture, tex_scale):
        self.p0 = np.asarray(p0, np.float64)
        self.e1 = np.asarray(e1, np.float64)
        self.e2 = np.asarray(e2, np.float64)
        self.n = np.cross(self.e1, self.e2)
        self.extent1 = extent1
        self.extent2 = extent2
        self.texture = texture
        self.tex_scale = tex_scale

    def sample(self, a, b):
        th, tw = self.texture.shape
        u = (a / self.tex_scale) % 1.0 * (tw - 1)
        v = (b / self.tex_scale) % 1.0 * (th - 1)
        u0 = u.astype(int)
        v0 = v.astype(int)
        u1 = np.minimum(u0 + 1, tw - 1)
        v1 = np.minimum(v0 + 1, th - 1)
        fu = u - u0
        fv = v - v0
        t = self.texture
        return ((1 - fv) * (1 - fu) * t[v0, u0] + (1 - fv) * fu * t[v0, u1]
                + fv * (1 - fu) * t[v1, u0] + fv * fu * t[v1, u1])


class SyntheticStereoSequence:
    """Renders (left, right) uint8 frames along a smooth forward trajectory.

    Poses follow the KITTI convention: ``poses[i]`` maps camera-i coordinates
    to world coordinates (T_w_cam); camera looks down +z, x right, y down.
    """

    def __init__(
        self,
        intrinsics: CameraIntrinsics,
        num_frames: int = 20,
        seed: int = 0,
        speed: float = 0.8,
        yaw_rate: float = 0.004,
    ):
        self.K = intrinsics
        self.num_frames = num_frames
        rng = np.random.default_rng(seed)

        # Scene: ground plane + three billboards at staggered depths, each
        # with its own texture so every image region carries structure.
        self.planes = [
            _Plane(  # ground: y = +1.6 (camera ~1.6 m above ground)
                p0=[0, 1.6, 0], e1=[1, 0, 0], e2=[0, 0, 1],
                extent1=400, extent2=400,
                texture=_smooth_noise(512, 512, rng), tex_scale=24.0,
            ),
            _Plane(  # near wall
                p0=[-18, -6, 26], e1=[1, 0, 0], e2=[0, 1, 0],
                extent1=36, extent2=14,
                texture=_smooth_noise(512, 512, rng), tex_scale=18.0,
            ),
            _Plane(  # mid wall
                p0=[-35, -9, 55], e1=[1, 0, 0], e2=[0, 1, 0],
                extent1=80, extent2=20,
                texture=_smooth_noise(512, 512, rng), tex_scale=30.0,
            ),
            _Plane(  # far backdrop
                p0=[-150, -40, 160], e1=[1, 0, 0], e2=[0, 1, 0],
                extent1=300, extent2=90,
                texture=_smooth_noise(512, 512, rng), tex_scale=80.0,
            ),
        ]

        # Ground-truth trajectory: forward along +z with gentle yaw.
        self.poses = np.zeros((num_frames, 4, 4))
        T = np.eye(4)
        for i in range(num_frames):
            self.poses[i] = T
            yaw = yaw_rate * (1.0 + 0.3 * np.sin(i * 0.21))
            c, s = np.cos(yaw), np.sin(yaw)
            R_step = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            step = np.eye(4)
            step[:3, :3] = R_step
            step[:3, 3] = [0.02 * np.sin(i * 0.13), 0.0, speed]
            T = T @ step

    def _render(self, T_w_cam: np.ndarray, right: bool) -> np.ndarray:
        K = self.K
        H, W = K.height, K.width
        # Right camera sits +baseline along the left camera's x axis.
        T = T_w_cam.copy()
        if right:
            T = T @ np.array(
                [[1, 0, 0, K.baseline], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1.0]]
            )
        R_wc = T[:3, :3]
        origin = T[:3, 3]

        us, vs = np.meshgrid(np.arange(W, dtype=np.float64),
                             np.arange(H, dtype=np.float64))
        d_cam = np.stack(
            [(us - K.cx) / K.fx, (vs - K.cy) / K.fy, np.ones_like(us)], axis=-1
        )
        d_world = d_cam @ R_wc.T  # (H, W, 3)

        img = np.full((H, W), 40.0)
        zbuf = np.full((H, W), np.inf)
        for pl in self.planes:
            denom = d_world @ pl.n
            denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
            t = ((pl.p0 - origin) @ pl.n) / denom
            hit = origin[None, None] + t[..., None] * d_world
            rel = hit - pl.p0
            a = rel @ pl.e1
            b = rel @ pl.e2
            ok = (
                (t > 0.1) & (t < zbuf)
                & (a >= 0) & (a < pl.extent1) & (b >= 0) & (b < pl.extent2)
            )
            vals = pl.sample(np.where(ok, a, 0.0), np.where(ok, b, 0.0))
            img = np.where(ok, vals, img)
            zbuf = np.where(ok, t, zbuf)
        return np.clip(img, 0, 255).astype(np.uint8)

    def frame(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        T = self.poses[i]
        return self._render(T, right=False), self._render(T, right=True)

    def __len__(self):
        return self.num_frames

    def __iter__(self):
        for i in range(self.num_frames):
            yield self.frame(i)
