"""Batched linear triangulation.

Replaces the per-pair SVD triangulation in the reference
(LocalMapping::CreateNewMapPoints, src/LocalMapping.cc:1235 and
Initializer::Triangulate) with one vmapped solve over all candidate pairs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_two_view(
    P1: jax.Array,  # (...,3,4) projection matrix K[R|t] or normalized [R|t]
    P2: jax.Array,
    x1: jax.Array,  # (...,2) pixel (or normalized) coords in view 1
    x2: jax.Array,
) -> jax.Array:
    """DLT triangulation; returns (...,3) world points.

    Solves the 4x4 homogeneous system via SVD (smallest singular vector),
    like the reference's Initializer::Triangulate.
    """
    rows = jnp.stack(
        [
            x1[..., 0, None] * P1[..., 2, :] - P1[..., 0, :],
            x1[..., 1, None] * P1[..., 2, :] - P1[..., 1, :],
            x2[..., 0, None] * P2[..., 2, :] - P2[..., 0, :],
            x2[..., 1, None] * P2[..., 2, :] - P2[..., 1, :],
        ],
        axis=-2,
    )  # (...,4,4)
    # smallest right singular vector
    _, _, vt = jnp.linalg.svd(rows)
    X = vt[..., 3, :]
    w = X[..., 3]
    w = jnp.where(jnp.abs(w) < 1e-10, 1e-10, w)
    return X[..., :3] / w[..., None]


def projection_matrix(K: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """K (3,3), R (...,3,3), t (...,3) -> (...,3,4)."""
    Rt = jnp.concatenate([R, t[..., None]], axis=-1)
    return K @ Rt


def parallax_cos(
    c1: jax.Array, c2: jax.Array, X: jax.Array
) -> jax.Array:
    """cos of the ray angle at X between camera centers c1, c2 (...,3)."""
    r1 = X - c1
    r2 = X - c2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    return jnp.sum(r1 * r2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)
