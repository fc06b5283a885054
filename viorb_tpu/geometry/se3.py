"""Batched SE(3) ops. Pose convention: world->camera T = (R, t) with
x_cam = R @ x_world + t (matches the reference's Tcw convention,
e.g. src/Frame.cc pose setters), stored as a pair of arrays rather than a
4x4 to keep XLA layouts tight.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from viorb_tpu.geometry.so3 import exp_so3, hat, left_jacobian, log_so3


def make_se3(R: jax.Array, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    return R, t


def se3_compose(
    Ra: jax.Array, ta: jax.Array, Rb: jax.Array, tb: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """(Ta * Tb): apply Tb first, then Ta."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def se3_inverse(R: jax.Array, t: jax.Array) -> Tuple[jax.Array, jax.Array]:
    Rinv = jnp.swapaxes(R, -1, -2)
    return Rinv, -(Rinv @ t[..., None])[..., 0]


def se3_apply(R: jax.Array, t: jax.Array, x: jax.Array) -> jax.Array:
    """x: (...,3) points."""
    return (R @ x[..., None])[..., 0] + t


def exp_se3(xi: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """xi = (rho, phi): (...,6) -> (R, t) with t = Jl(phi) rho."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = exp_so3(phi)
    t = (left_jacobian(phi) @ rho[..., None])[..., 0]
    return R, t


def log_se3(R: jax.Array, t: jax.Array) -> jax.Array:
    phi = log_so3(R)
    Jl_inv = _left_jacobian_inv(phi)
    rho = (Jl_inv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def _left_jacobian_inv(phi: jax.Array) -> jax.Array:
    from viorb_tpu.geometry.so3 import left_jacobian_inv

    return left_jacobian_inv(phi)


def se3_matrix(R: jax.Array, t: jax.Array) -> jax.Array:
    """(R,t) -> (...,4,4) homogeneous matrix (IO only)."""
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), (*batch, 1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
