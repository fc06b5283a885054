"""Synthetic textured-world renderer for end-to-end SLAM tests and benches.

The environment has no real SLAM datasets (zero egress), so integration
tests replay rendered sequences with exact ground truth — serving the role
the reference's EuRoC/TUM dataset replay serves (SURVEY.md §4.1). The
world is a set of textured planes (a room: floor + walls); frames render
by ray-plane intersection + bilinear texture sampling, fully vectorized.
Ground-truth poses, IMU samples, and depth are all available.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np

from viorb_tpu.geometry.camera import PinholeCamera


class Plane(NamedTuple):
    origin: np.ndarray  # (3,) a point on the plane
    ax_u: np.ndarray  # (3,) texture u axis (unit)
    ax_v: np.ndarray  # (3,) texture v axis (unit)
    size_u: float
    size_v: float
    texture: np.ndarray  # (Ht,Wt) float32 0..255

    @property
    def normal(self) -> np.ndarray:
        n = np.cross(self.ax_u, self.ax_v)
        return n / np.linalg.norm(n)


def _make_texture(rng, size=512, octaves=4) -> np.ndarray:
    """Multi-octave random texture with plenty of corners."""
    tex = np.zeros((size, size), np.float32)
    for o in range(octaves):
        s = 8 * (2**o)
        layer = rng.uniform(0, 1, size=(s, s)).astype(np.float32)
        reps = size // s
        tex += np.kron(layer, np.ones((reps, reps), np.float32)) * (0.6**o)
    tex -= tex.min()
    tex *= 255.0 / max(tex.max(), 1e-6)
    return tex


def default_room(seed: int = 0) -> List[Plane]:
    """A 10x8x4 m room around the origin; camera starts at origin looking +z."""
    rng = np.random.default_rng(seed)
    ex = np.array([1.0, 0, 0])
    ey = np.array([0, 1.0, 0])
    ez = np.array([0, 0, 1.0])
    planes = [
        # front wall at z=6
        Plane(np.array([0.0, 0.0, 6.0]), ex, ey, 12.0, 8.0, _make_texture(rng)),
        # left wall x=-5
        Plane(np.array([-5.0, 0.0, 0.0]), ez, ey, 14.0, 8.0, _make_texture(rng)),
        # right wall x=5
        Plane(np.array([5.0, 0.0, 0.0]), ez, ey, 14.0, 8.0, _make_texture(rng)),
        # floor y=3 (y down)
        Plane(np.array([0.0, 3.0, 0.0]), ex, ez, 12.0, 14.0, _make_texture(rng)),
        # ceiling y=-3
        Plane(np.array([0.0, -3.0, 0.0]), ex, ez, 12.0, 14.0, _make_texture(rng)),
    ]
    return planes


def render_frame(
    cam: PinholeCamera,
    r_wc: np.ndarray,  # (3,3) camera->world rotation
    c_w: np.ndarray,  # (3,) camera center in world
    planes: List[Plane],
) -> np.ndarray:
    """Render (H,W) f32 image by ray casting."""
    h, w = cam.height, cam.width
    us, vs = np.meshgrid(np.arange(w), np.arange(h))
    d_cam = np.stack(
        [(us - cam.cx) / cam.fx, (vs - cam.cy) / cam.fy, np.ones_like(us, np.float32)],
        axis=-1,
    ).astype(np.float32)
    d_w = d_cam @ r_wc.T  # (H,W,3)

    img = np.full((h, w), 127.0, np.float32)
    best_t = np.full((h, w), np.inf, np.float32)
    for pl in planes:
        n = pl.normal
        denom = d_w @ n
        denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        t = ((pl.origin - c_w) @ n) / denom
        hit = c_w + t[..., None] * d_w
        rel = hit - pl.origin
        u = rel @ pl.ax_u
        v = rel @ pl.ax_v
        ok = (
            (t > 0.05)
            & (t < best_t)
            & (np.abs(u) < pl.size_u / 2)
            & (np.abs(v) < pl.size_v / 2)
        )
        ht, wt = pl.texture.shape
        tu = (u / pl.size_u + 0.5) * (wt - 1)
        tv = (v / pl.size_v + 0.5) * (ht - 1)
        tu = np.clip(tu, 0, wt - 1.001)
        tv = np.clip(tv, 0, ht - 1.001)
        x0 = tu.astype(np.int32)
        y0 = tv.astype(np.int32)
        fx_ = tu - x0
        fy_ = tv - y0
        tex = pl.texture
        val = (
            tex[y0, x0] * (1 - fx_) * (1 - fy_)
            + tex[y0, x0 + 1] * fx_ * (1 - fy_)
            + tex[y0 + 1, x0] * (1 - fx_) * fy_
            + tex[y0 + 1, x0 + 1] * fx_ * fy_
        )
        img = np.where(ok, val, img)
        best_t = np.where(ok, t, best_t)
    return img


class SyntheticSequence(NamedTuple):
    images: List[np.ndarray]
    r_wc: np.ndarray  # (T,3,3) ground-truth camera->world
    c_w: np.ndarray  # (T,3) camera centers
    timestamps: np.ndarray  # (T,)
    cam: PinholeCamera


def make_trajectory(
    n_frames: int, dt: float = 0.05, kind: str = "arc"
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (r_wc (T,3,3), c_w (T,3)): smooth sideways arc with slight
    yaw, good parallax against the room walls."""
    from viorb_tpu.geometry.so3 import exp_so3
    import jax.numpy as jnp

    ts = np.arange(n_frames) * dt
    cs = np.stack(
        [
            1.2 * np.sin(0.5 * ts),
            0.3 * np.sin(0.9 * ts + 0.4),
            0.6 * (1 - np.cos(0.45 * ts)),
        ],
        axis=1,
    ).astype(np.float32)
    yaw = 0.15 * np.sin(0.7 * ts)
    pitch = 0.06 * np.sin(0.5 * ts + 0.2)
    rs = []
    for y, p in zip(yaw, pitch):
        R = np.asarray(exp_so3(jnp.asarray([p, y, 0.0], jnp.float32)))
        rs.append(R)
    return np.stack(rs).astype(np.float32), cs


def make_sequence(
    n_frames: int = 60,
    cam: PinholeCamera | None = None,
    seed: int = 0,
    dt: float = 0.05,
) -> SyntheticSequence:
    cam = cam or PinholeCamera(
        fx=450.0, fy=450.0, cx=376.0, cy=240.0, width=752, height=480
    )
    planes = default_room(seed)
    r_wc, c_w = make_trajectory(n_frames, dt)
    images = [render_frame(cam, r_wc[i], c_w[i], planes) for i in range(n_frames)]
    return SyntheticSequence(
        images=images,
        r_wc=r_wc,
        c_w=c_w,
        timestamps=np.arange(n_frames) * dt,
        cam=cam,
    )
