"""Batched SO(3) operations with numerically-stable small-angle paths.

Functional parity with the reference's Sophus copy (reference:
src/IMU/so3.{h,cpp} — exp/log/Jacobians at so3.h:17-60) and the
right/left Jacobian helpers of the preintegrator (reference:
src/IMU/IMUPreintegrator.h:98-166), but designed batched-first: every
function accepts arbitrary leading batch dimensions and is safe under
`jax.jit`/`vmap`/`grad`.

Rotations are stored as 3x3 matrices (f32): on TPU the 3x3 matmul chains
fuse well and avoid repeated quaternion<->matrix conversion in the hot
optimizer loops. Quaternion conversions are provided for IO and for
re-orthonormalization (the reference re-orthonormalizes extrinsics the
same way, src/IMU/configparam.cpp:40-68).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Below this angle (rad) we switch to Taylor expansions. f32 has ~7 decimal
# digits; theta^2 < eps makes the quadratic terms vanish in f32 anyway.
_SMALL_ANGLE = 1e-5


def hat(w: jax.Array) -> jax.Array:
    """(...,3) -> (...,3,3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """(...,3,3) skew -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _theta(w: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.sum(w * w, axis=-1) + 1e-30)


def exp_so3(w: jax.Array) -> jax.Array:
    """Rodrigues formula, (...,3) -> (...,3,3).

    R = I + sin(t)/t * W + (1-cos(t))/t^2 * W^2, with Taylor fallbacks.
    """
    t = _theta(w)
    t2 = t * t
    small = t < _SMALL_ANGLE
    # sin(t)/t and (1-cos t)/t^2 with series fallback
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def log_so3(R: jax.Array) -> jax.Array:
    """(...,3,3) -> (...,3). Stable near 0 and near pi.

    The generic branch recovers the angle via atan2(|anti|/2, (tr-1)/2) —
    well-conditioned everywhere — and the axis from the anti-symmetric
    part; near pi the axis comes from the diagonal-dominant extraction
    (the anti-symmetric part vanishes there).
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)

    anti = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    anti_norm = jnp.sqrt(jnp.sum(anti * anti, axis=-1) + 1e-30)
    sin_t = 0.5 * anti_norm
    t = jnp.arctan2(sin_t, cos_t)

    small = t < _SMALL_ANGLE
    near_pi = t > 2.9
    # w = t * axis = t * anti/|anti|; for small t, anti/|anti| -> anti/(2t)
    scale = jnp.where(
        small,
        0.5 + t * t / 12.0,
        t / jnp.where(anti_norm < 1e-10, 1.0, anti_norm),
    )
    w_generic = scale[..., None] * anti

    # Near pi: axis from the largest diagonal of (R + I)/2 = aa^T structure.
    # S = (R + R^T)/2 = I + (1-cos t) (aa^T - I) => aa^T = (S - cos_t I)/(1-cos_t)
    one_m_cos = jnp.maximum(1.0 - cos_t, 1e-7)
    S = (R + jnp.swapaxes(R, -1, -2)) * 0.5
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_t[..., None]) / one_m_cos[..., None], 0.0, 1.0)
    axis_abs = jnp.sqrt(axis_sq)
    # pick the largest component as reference k, derive signs from off-diagonals
    k = jnp.argmax(axis_abs, axis=-1)
    # off-diagonal products: S[i,j]/(1-cos) = a_i a_j
    Soff = S / one_m_cos[..., None, None]
    def _signed_axis(axis_abs, Soff, k):
        # a_k > 0 by convention; a_j = (S[k,j]/(1-cos)) / a_k
        ak = jnp.maximum(axis_abs[k], 1e-7)
        a = Soff[k, :] / ak
        a = a.at[k].set(ak)
        return a / jnp.maximum(jnp.linalg.norm(a), 1e-12)
    batch_shape = R.shape[:-2]
    if batch_shape:
        flat_axis = jax.vmap(_signed_axis)(
            axis_abs.reshape(-1, 3), Soff.reshape(-1, 3, 3), k.reshape(-1)
        ).reshape(*batch_shape, 3)
    else:
        flat_axis = _signed_axis(axis_abs, Soff, k)
    # fix overall sign using anti-symmetric part (sign of a·anti matches sin t >= 0)
    sgn = jnp.where(jnp.sum(flat_axis * anti, axis=-1) < 0.0, -1.0, 1.0)
    w_pi = t[..., None] * flat_axis * sgn[..., None]

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def right_jacobian(w: jax.Array) -> jax.Array:
    """Jr(w): Exp(w + dw) ~= Exp(w) Exp(Jr dw). (reference:
    src/IMU/IMUPreintegrator.h:98-166)."""
    t = _theta(w)
    t2 = t * t
    small = t < _SMALL_ANGLE
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0, (t - jnp.sin(t)) / (t2 * t))
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - b[..., None, None] * W + c[..., None, None] * W2


def right_jacobian_inv(w: jax.Array) -> jax.Array:
    t = _theta(w)
    t2 = t * t
    small = t < _SMALL_ANGLE
    # 1/t^2 - (1+cos t)/(2 t sin t); series: 1/12 + t^2/720
    sin_t = jnp.sin(t)
    safe = jnp.where(jnp.abs(sin_t) < 1e-10, 1.0, sin_t)
    c = jnp.where(
        small,
        1.0 / 12.0 + t2 / 720.0,
        1.0 / t2 - (1.0 + jnp.cos(t)) / (2.0 * t * safe),
    )
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + c[..., None, None] * W2


def left_jacobian(w: jax.Array) -> jax.Array:
    """Jl(w) = Jr(-w)."""
    return right_jacobian(-w)


def left_jacobian_inv(w: jax.Array) -> jax.Array:
    return right_jacobian_inv(-w)


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """(...,3,3) -> (...,4) quaternion (w,x,y,z), w >= 0.

    Shepperd's method, branch-free via selecting the max-trace variant.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate quaternions (unnormalized)
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (...,4cand,4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)[
        ..., 0, :
    ]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    sgn = jnp.where(q[..., :1] < 0.0, -1.0, 1.0)
    return q * sgn


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """(...,4) (w,x,y,z) -> (...,3,3)."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def normalize_rotation(R: jax.Array) -> jax.Array:
    """Re-orthonormalize via quaternion round-trip (the reference does the
    same for Tbc, src/IMU/configparam.cpp:40-68; the preintegrator
    renormalizes dR the same way, src/IMU/IMUPreintegrator.cpp:140-150)."""
    return quat_to_matrix(matrix_to_quat(R))
