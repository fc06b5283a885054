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


def _box_blur(x: np.ndarray, k: int) -> np.ndarray:
    c = np.cumsum(np.cumsum(np.pad(x, ((k, 0), (k, 0))), 0), 1)
    return (c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]) / (k * k)


def _make_texture(rng, size=512, octaves=4) -> np.ndarray:
    """APERIODIC random texture with sharp corners.

    (An earlier kron-upsampled texture repeated every 8 px, which made
    window-gated matching lock onto an 8 px-shifted lattice whenever the
    motion prediction erred by half a period — diverging consistently.)
    Sharp, non-repeating edges come from level-set crossings of two
    independent smooth random fields; a fine noise layer adds texture.
    """
    t1 = _box_blur(rng.uniform(0, 1, (size, size)), 13)
    t2 = _box_blur(rng.uniform(0, 1, (size, size)), 29)
    t3 = _box_blur(rng.uniform(0, 1, (size, size)), 7)
    t4 = _box_blur(rng.uniform(0, 1, (size, size)), 19)
    tex = (
        40.0
        + 130.0 * (t1 > t2).astype(np.float32)
        + 60.0 * (t3 > t4).astype(np.float32)
        + 25.0 * _box_blur(rng.uniform(0, 1, (size, size)), 3)
    )
    return tex.astype(np.float32)


def default_room(seed: int = 0, closed: bool = False) -> List[Plane]:
    """A 10x8x4 m room around the origin; camera starts at origin looking +z.

    closed=True adds a back wall at z=-6 so full-turn trajectories (the
    loop-closure circuit) always face texture; forward-looking sequences
    never see it, so the open room stays render-identical."""
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
    if closed:
        planes.append(
            # back wall at z=-6
            Plane(
                np.array([0.0, 0.0, -6.0]), ex, ey, 12.0, 8.0, _make_texture(rng)
            )
        )
    return planes


def _render_frame_jax(cam: PinholeCamera, r_wc, c_w, plane_arrays):
    """Jittable single-frame ray-cast renderer. plane_arrays: stacked plane
    params + textures (P,...)."""
    import jax
    import jax.numpy as jnp

    origins, ax_u, ax_v, sizes, textures = plane_arrays
    h, w = cam.height, cam.width
    us = jnp.arange(w, dtype=jnp.float32)[None, :]
    vs = jnp.arange(h, dtype=jnp.float32)[:, None]
    d_cam = jnp.stack(
        [
            jnp.broadcast_to((us - cam.cx) / cam.fx, (h, w)),
            jnp.broadcast_to((vs - cam.cy) / cam.fy, (h, w)),
            jnp.ones((h, w), jnp.float32),
        ],
        axis=-1,
    )
    d_w = d_cam @ r_wc.T  # (H,W,3)

    def one_plane(origin, au, av, size, tex):
        n = jnp.cross(au, av)
        n = n / jnp.linalg.norm(n)
        denom = d_w @ n
        denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        t = jnp.dot(origin - c_w, n) / denom
        hit = c_w + t[..., None] * d_w
        rel = hit - origin
        u = rel @ au
        v = rel @ av
        ok = (t > 0.05) & (jnp.abs(u) < size[0] / 2) & (jnp.abs(v) < size[1] / 2)
        ht, wt = tex.shape
        tu = jnp.clip((u / size[0] + 0.5) * (wt - 1), 0, wt - 1.001)
        tv = jnp.clip((v / size[1] + 0.5) * (ht - 1), 0, ht - 1.001)
        x0 = tu.astype(jnp.int32)
        y0 = tv.astype(jnp.int32)
        fx_ = tu - x0
        fy_ = tv - y0
        val = (
            tex[y0, x0] * (1 - fx_) * (1 - fy_)
            + tex[y0, x0 + 1] * fx_ * (1 - fy_)
            + tex[y0 + 1, x0] * (1 - fx_) * fy_
            + tex[y0 + 1, x0 + 1] * fx_ * fy_
        )
        return jnp.where(ok, val, jnp.nan), jnp.where(ok, t, jnp.inf)

    vals, ts = jax.vmap(one_plane)(origins, ax_u, ax_v, sizes, textures)
    best = jnp.argmin(ts, axis=0)
    img = jnp.take_along_axis(vals, best[None], axis=0)[0]
    # depth = camera-z of the hit point: t is distance along d_w whose
    # camera-frame z component is 1, so t IS the z-depth
    depth = jnp.take_along_axis(ts, best[None], axis=0)[0]
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    return jnp.nan_to_num(img, nan=127.0), depth


def _stack_planes(planes: List[Plane]):
    import jax.numpy as jnp

    return (
        jnp.asarray(np.stack([p.origin for p in planes]).astype(np.float32)),
        jnp.asarray(np.stack([p.ax_u for p in planes]).astype(np.float32)),
        jnp.asarray(np.stack([p.ax_v for p in planes]).astype(np.float32)),
        jnp.asarray(
            np.stack([[p.size_u, p.size_v] for p in planes]).astype(np.float32)
        ),
        jnp.asarray(np.stack([p.texture for p in planes])),
    )


def render_frame(
    cam: PinholeCamera,
    r_wc: np.ndarray,
    c_w: np.ndarray,
    planes: List[Plane],
) -> np.ndarray:
    """Render (H,W) f32 image by ray casting (jitted; cached per camera)."""
    arrays = _stack_planes(planes)
    fn = _get_render_fn(cam)
    img, _ = fn(np.asarray(r_wc, np.float32), np.asarray(c_w, np.float32), arrays)
    return np.asarray(img)


_RENDER_CACHE = {}


def _get_render_fn(cam: PinholeCamera):
    import jax

    key = (cam.width, cam.height, cam.fx, cam.fy, cam.cx, cam.cy)
    if key not in _RENDER_CACHE:
        _RENDER_CACHE[key] = jax.jit(
            lambda r, c, arrays: _render_frame_jax(cam, r, c, arrays)
        )
    return _RENDER_CACHE[key]


def depth_at(
    cam: PinholeCamera,
    r_wc: np.ndarray,
    c_w: np.ndarray,
    planes: List[Plane],
    uv: np.ndarray,  # (N,2) pixels
) -> np.ndarray:
    """Ground-truth depth (camera z) at given pixels; inf where no hit."""
    d_cam = np.stack(
        [
            (uv[:, 0] - cam.cx) / cam.fx,
            (uv[:, 1] - cam.cy) / cam.fy,
            np.ones(len(uv), np.float32),
        ],
        axis=-1,
    )
    d_w = d_cam @ r_wc.T
    best_t = np.full(len(uv), np.inf, np.float32)
    for pl in planes:
        n = pl.normal
        denom = d_w @ n
        denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        t = ((pl.origin - c_w) @ n) / denom
        hit = c_w + t[:, None] * d_w
        rel = hit - pl.origin
        u = rel @ pl.ax_u
        v = rel @ pl.ax_v
        ok = (
            (t > 0.05)
            & (t < best_t)
            & (np.abs(u) < pl.size_u / 2)
            & (np.abs(v) < pl.size_v / 2)
        )
        best_t = np.where(ok, t, best_t)
    return best_t  # note: t is distance along unit-z-normalized ray = depth


class SyntheticSequence(NamedTuple):
    images: List[np.ndarray]
    r_wc: np.ndarray  # (T,3,3) ground-truth camera->world
    c_w: np.ndarray  # (T,3) camera centers
    timestamps: np.ndarray  # (T,)
    cam: PinholeCamera


GRAVITY_W = np.array([0.0, 0.0, -9.81], np.float32)


class SyntheticImu(NamedTuple):
    """Dense IMU stream for a trajectory (body frame = camera frame)."""

    t: np.ndarray  # (S,)
    gyro: np.ndarray  # (S,3) rad/s, body frame
    acc: np.ndarray  # (S,3) m/s^2 specific force (includes -g)
    velocity: np.ndarray  # (S,3) ground-truth world velocity at samples


def _arc_pose_params(ts: np.ndarray):
    """The 'arc' trajectory's exact pose spline, shared by the renderer
    (make_trajectory) and the analytic IMU (make_imu).

    Rotational excitation matters: with gentle rotation, accel bias +
    gravity tilt absorb a global scale error almost exactly (the classic
    VI degeneracy — measured: a 7.5% scale error cost the IMU chain
    nothing at ±0.15 rad yaw), so the amplitudes here are EuRoC-MAV-like.
    """
    cs = np.stack(
        [
            1.2 * np.sin(0.5 * ts),
            0.3 * np.sin(0.9 * ts + 0.4),
            0.6 * (1 - np.cos(0.45 * ts)),
        ],
        axis=1,
    )
    yaw = 0.35 * np.sin(0.7 * ts)
    pitch = 0.18 * np.sin(0.9 * ts + 0.2)
    roll = 0.12 * np.sin(1.1 * ts + 0.7)
    rs = np.stack(
        [
            _rodrigues_np(np.array([p, y, r_]))
            for y, p, r_ in zip(yaw, pitch, roll)
        ]
    )
    return rs, cs


def _spin_pose_params(ts: np.ndarray):
    """V1_03-class stress spline (the reference's own documented failure
    regime: fast rotation + low parallax, launch/euroc.yaml:12-14): the
    'arc' path with a violent-but-smooth Gaussian yaw excursion around
    t=5 s (late enough that VI init completes on the clean prefix). The
    peak pans at ~220 deg/s through a ~178-degree sweep — through walls
    no keyframe ever mapped and across the room's OPEN (textureless)
    side, with arc-scale translation (low parallax) — starving vision
    for ~1-2 s before the view returns. The VI pipeline must bridge the
    outage with IMU-only dead reckoning and re-lock (or relocalize)."""
    rs_arc, cs = _arc_pose_params(ts)
    extra = 3.1 * np.exp(-(((ts - 5.0) / 0.7) ** 2))
    rs = np.stack(
        [
            _rodrigues_np(np.array([0.0, e, 0.0])) @ r
            for e, r in zip(extra, rs_arc)
        ]
    )
    return rs, cs


def _circuit_pose_params(ts: np.ndarray, period: float):
    """The 'circuit' trajectory's exact pose spline (shared by
    make_trajectory and make_imu): a closed loop with a full 2*pi yaw
    turn, returning to the start pose at t = period."""
    th = 2 * np.pi * ts / period
    cs = np.stack(
        [
            1.4 * np.sin(th),
            0.25 * np.sin(2 * th),
            0.9 * (1 - np.cos(th)),
        ],
        axis=1,
    ).astype(np.float64)
    yaw = th
    pitch = 0.08 * np.sin(2 * th + 0.3)
    rs = []
    for y, p in zip(yaw, pitch):
        cy, sy = np.cos(y), np.sin(y)
        cp, sp = np.cos(p), np.sin(p)
        r_yaw = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        r_pitch = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
        rs.append(r_yaw @ r_pitch)
    return np.stack(rs), cs


def make_imu(
    n_frames: int,
    frame_dt: float,
    hz: float = 200.0,
    bias_g: np.ndarray | None = None,
    bias_a: np.ndarray | None = None,
    noise_g: float = 0.0,
    noise_a: float = 0.0,
    seed: int = 1,
    kind: str = "arc",
) -> SyntheticImu:
    """Analytic IMU for make_trajectory's path (any `kind`), via dense
    finite differences of the exact pose spline (error O(h^2) at 2 kHz
    internal sampling)."""
    rng = np.random.default_rng(seed)
    t_end = (n_frames - 1) * frame_dt
    h = 1.0 / 2000.0
    tt = np.arange(0.0, t_end + h, h)

    if kind == "circuit":
        period = 0.8 * (n_frames - 1) * frame_dt
        R, c = _circuit_pose_params(tt, period)
    elif kind == "laps":
        period = 0.4 * (n_frames - 1) * frame_dt
        R, c = _circuit_pose_params(tt, period)
    elif kind == "spin":
        R, c = _spin_pose_params(tt)
    else:
        R, c = _arc_pose_params(tt)
    v = np.gradient(c, h, axis=0)
    a_w = np.gradient(v, h, axis=0)
    # body rates: omega_hat = R^T dR/dt
    dR = np.gradient(R, h, axis=0)
    omega_body = np.stack(
        [
            np.array(
                [
                    (R[i].T @ dR[i])[2, 1],
                    (R[i].T @ dR[i])[0, 2],
                    (R[i].T @ dR[i])[1, 0],
                ]
            )
            for i in range(len(tt))
        ]
    )
    # downsample to the IMU rate
    step = int(round(2000.0 / hz))
    idx = np.arange(0, len(tt), step)
    t_s = tt[idx]
    gyro = omega_body[idx]
    acc_body = np.stack([R[i].T @ (a_w[i] - GRAVITY_W) for i in idx])
    if bias_g is not None:
        gyro = gyro + bias_g
    if bias_a is not None:
        acc_body = acc_body + bias_a
    if noise_g > 0:
        gyro = gyro + rng.normal(0, noise_g, gyro.shape)
    if noise_a > 0:
        acc_body = acc_body + rng.normal(0, noise_a, acc_body.shape)
    return SyntheticImu(
        t=t_s.astype(np.float32),
        gyro=gyro.astype(np.float32),
        acc=acc_body.astype(np.float32),
        velocity=v[idx].astype(np.float32),
    )


def _rodrigues_np(w: np.ndarray) -> np.ndarray:
    th = np.linalg.norm(w)
    if th < 1e-10:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


def make_trajectory(
    n_frames: int, dt: float = 0.05, kind: str = "arc"
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (r_wc (T,3,3), c_w (T,3)). Pure numpy (no device
    roundtrips — the TPU tunnel makes per-call syncs expensive).

    kinds:
      * "arc" — smooth sideways arc with slight yaw, good parallax
        against the room walls;
      * "circuit" — closed loop that returns EXACTLY to the start pose at
        80% of the frames and re-traverses the beginning (for loop-closure
        tests; drift accumulates around the circuit, closure on revisit).
    """
    ts = np.arange(n_frames) * dt
    if kind == "circuit":
        # full-turn yaw: the camera pans through 2*pi around the circuit so
        # views DECORRELATE along the loop (mid-circuit frames face other
        # walls). Without the turn every keyframe stays covisible with
        # every other and no loop-closure topology ever exists — the map
        # is one covisibility blob and DetectLoop correctly finds nothing.
        # Composed as R_y(yaw) @ R_x(pitch) (a single rotvec is degenerate
        # near |v| = 2*pi).
        period = 0.8 * (n_frames - 1) * dt
        rs, cs = _circuit_pose_params(ts, period)
        return rs.astype(np.float32), cs.astype(np.float32)
    if kind == "laps":
        # TWO full circuits (long-run stress: multi-loop closure + map
        # growth): same closed loop, half the period — every point of the
        # circuit is revisited once, the start twice
        period = 0.4 * (n_frames - 1) * dt
        rs, cs = _circuit_pose_params(ts, period)
        return rs.astype(np.float32), cs.astype(np.float32)
    if kind == "spin":
        rs, cs = _spin_pose_params(ts)
        return rs.astype(np.float32), cs.astype(np.float32)
    rs, cs = _arc_pose_params(ts)
    return rs.astype(np.float32), cs.astype(np.float32)


def make_sequence(
    n_frames: int = 60,
    cam: PinholeCamera | None = None,
    seed: int = 0,
    dt: float = 0.05,
    cache_dir: str = "/root/repo/.synth_cache",
    with_depth: bool = False,
    kind: str = "arc",
    noise_std: float = 0.0,
):
    """Rendered sequence with disk caching (rendering is jitted and batched;
    a cached 60-frame 752x480 sequence loads in <1s). with_depth=True
    returns (SyntheticSequence, [depth images]) for the RGB-D pipeline.

    noise_std > 0 adds seeded per-frame Gaussian pixel noise AFTER the
    cache (ray-cast frames are noise-free, so keypoints localize to
    unrealistic sub-pixel accuracy and a mono run barely drifts; sensor
    noise restores realistic drift for loop-closure tests)."""
    import os

    cam = cam or PinholeCamera(
        fx=450.0, fy=450.0, cx=376.0, cy=240.0, width=752, height=480
    )
    os.makedirs(cache_dir, exist_ok=True)
    kind_tag = "" if kind == "arc" else f"_{kind}2"
    tag = f"seq_v4_{n_frames}_{seed}_{dt}_{cam.width}x{cam.height}_{cam.fx}{kind_tag}"
    path = os.path.join(cache_dir, tag + ".npz")
    r_wc, c_w = make_trajectory(n_frames, dt, kind=kind)
    if os.path.exists(path):
        data = np.load(path)
        stack = data["images"]  # decompress ONCE
        dstack = data["depths"]
        images = [stack[i] for i in range(n_frames)]
        depths = [dstack[i] for i in range(n_frames)]
    else:
        import jax

        # Render on the LOCAL CPU backend: rendering is test/bench
        # scaffolding, and the remote-TPU tunnel makes gather-heavy
        # kernels + per-chunk syncs pathologically slow.
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            planes = default_room(seed, closed=(kind in ("circuit", "laps")))
            arrays = _stack_planes(planes)
            fn = _get_render_fn(cam)
            batched = jax.jit(jax.vmap(fn, in_axes=(0, 0, None)))
            chunk = 10
            outs = []
            douts = []
            for s in range(0, n_frames, chunk):
                e = min(s + chunk, n_frames)
                # pad the last chunk to keep one compiled shape
                idx = list(range(s, e)) + [e - 1] * (chunk - (e - s))
                img, dep = batched(
                    np.asarray(r_wc[idx]), np.asarray(c_w[idx]), arrays
                )
                outs.append(np.asarray(img)[: e - s])
                douts.append(np.asarray(dep)[: e - s])
        images = [im for o in outs for im in o]
        depths = [dm for o in douts for dm in o]
        np.savez_compressed(
            path, images=np.stack(images), depths=np.stack(depths)
        )
    if noise_std > 0.0:
        nrng = np.random.default_rng(seed + 991)
        images = [
            np.clip(
                im + nrng.normal(0.0, noise_std, im.shape).astype(np.float32),
                0.0,
                255.0,
            ).astype(im.dtype)
            for im in images
        ]
    seq = SyntheticSequence(
        images=images,
        r_wc=r_wc,
        c_w=c_w,
        timestamps=np.arange(n_frames) * dt,
        cam=cam,
    )
    if with_depth:
        return seq, depths
    return seq


def make_stereo_sequence(
    n_frames: int = 60,
    cam: PinholeCamera | None = None,
    seed: int = 0,
    dt: float = 0.05,
    baseline: float = 0.11,
    cache_dir: str = "/root/repo/.synth_cache",
    kind: str = "arc",
    noise_std: float = 0.0,
):
    """Rendered rectified stereo sequence: returns (SyntheticSequence for
    the LEFT camera, list of right images). The right camera sits at
    +baseline along the left camera's x axis with identical orientation
    (rectified geometry, like the reference's EuRoC stereo setup)."""
    import os

    cam = cam or PinholeCamera(
        fx=450.0, fy=450.0, cx=376.0, cy=240.0, width=752, height=480
    )
    seq = make_sequence(
        n_frames, cam=cam, seed=seed, dt=dt, cache_dir=cache_dir,
        kind=kind, noise_std=noise_std,
    )
    kind_tag = "" if kind == "arc" else f"_{kind}"
    tag = (
        f"stereoR_v2_{n_frames}_{seed}_{dt}_{baseline}"
        f"_{cam.width}x{cam.height}_{cam.fx}{kind_tag}"
    )
    path = os.path.join(cache_dir, tag + ".npz")
    # right camera centers: c + r_wc @ [b,0,0]
    offs = np.einsum("tij,j->ti", seq.r_wc, np.array([baseline, 0, 0], np.float32))
    c_r = seq.c_w + offs
    if os.path.exists(path):
        stack = np.load(path)["images"]
        right = [stack[i] for i in range(n_frames)]
    else:
        import jax

        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            planes = default_room(seed, closed=(kind in ("circuit", "laps")))
            arrays = _stack_planes(planes)
            fn = _get_render_fn(cam)
            batched = jax.jit(jax.vmap(fn, in_axes=(0, 0, None)))
            chunk = 10
            outs = []
            for s in range(0, n_frames, chunk):
                e = min(s + chunk, n_frames)
                idx = list(range(s, e)) + [e - 1] * (chunk - (e - s))
                img, _ = batched(
                    np.asarray(seq.r_wc[idx]), np.asarray(c_r[idx]), arrays
                )
                outs.append(np.asarray(img)[: e - s])
        right = [im for o in outs for im in o]
        np.savez_compressed(path, images=np.stack(right))
    if noise_std > 0.0:
        nrng = np.random.default_rng(seed + 1723)
        right = [
            np.clip(
                im + nrng.normal(0.0, noise_std, im.shape).astype(np.float32),
                0.0,
                255.0,
            ).astype(im.dtype)
            for im in right
        ]
    return seq, right
