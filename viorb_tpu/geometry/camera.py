"""Pinhole camera with radial-tangential distortion.

Replaces the reference's OpenCV-based intrinsics handling (reference:
src/Tracking.cc:647-763 reads fx/fy/cx/cy + k1,k2,p1,p2[,k3]; keypoint
undistortion at src/Frame.cc:584 via cv::undistortPoints, optional 8-coef
model src/Tracking.cc:660-673). Batched over leading dims.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    width: int = 752
    height: int = 480

    @property
    def K(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]], jnp.float32
        )


def distort(cam: PinholeCamera, xn: jax.Array) -> jax.Array:
    """Normalized coords (...,2) -> distorted normalized coords (...,2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xy = x * y
    xd = x * radial + 2.0 * cam.p1 * xy + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * xy
    return jnp.stack([xd, yd], axis=-1)


def project(cam: PinholeCamera, pc: jax.Array) -> jax.Array:
    """Camera-frame points (...,3) -> pixel coords (...,2). No validity
    check; caller gates on depth (see depth_mask)."""
    z = pc[..., 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    xn = pc[..., :2] / zsafe[..., None]
    xd = distort(cam, xn)
    return jnp.stack(
        [cam.fx * xd[..., 0] + cam.cx, cam.fy * xd[..., 1] + cam.cy], axis=-1
    )


def depth_mask(pc: jax.Array, min_depth: float = 0.05) -> jax.Array:
    return pc[..., 2] > min_depth


def pixel_to_normalized(cam: PinholeCamera, uv: jax.Array) -> jax.Array:
    """Pixels (...,2) -> distorted normalized coords."""
    return jnp.stack(
        [(uv[..., 0] - cam.cx) / cam.fx, (uv[..., 1] - cam.cy) / cam.fy], axis=-1
    )


def undistort_points(cam: PinholeCamera, uv: jax.Array, iters: int = 8) -> jax.Array:
    """Undistort pixel keypoints (...,2) -> undistorted pixel coords, by
    fixed-point inversion of the distortion (replaces cv::undistortPoints,
    reference src/Frame.cc:584)."""
    xd = pixel_to_normalized(cam, uv)
    x = xd
    for _ in range(iters):
        # x_{k+1} = xd - (distort(x_k) - x_k)
        x = xd - (distort(cam, x) - x)
    return jnp.stack(
        [cam.fx * x[..., 0] + cam.cx, cam.fy * x[..., 1] + cam.cy], axis=-1
    )


def in_image_mask(cam: PinholeCamera, uv: jax.Array, margin: float = 0.0) -> jax.Array:
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < cam.width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < cam.height - margin)
    )
