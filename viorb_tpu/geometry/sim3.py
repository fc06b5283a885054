"""Batched Sim(3) ops, for loop-closure geometric verification and the
essential-graph optimization (reference: Thirdparty/g2o/g2o/types/sim3.h;
used by src/LoopClosing.cc:255-614 and src/Optimizer.cc:4313).

A Sim3 is (s, R, t): x' = s * R @ x + t.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from viorb_tpu.geometry.so3 import exp_so3, hat, log_so3

Sim3 = Tuple[jax.Array, jax.Array, jax.Array]  # (s scalar, R 3x3, t 3)


def sim3_compose(
    sa: jax.Array, Ra: jax.Array, ta: jax.Array,
    sb: jax.Array, Rb: jax.Array, tb: jax.Array,
) -> Sim3:
    """Sa * Sb (apply Sb first)."""
    s = sa * sb
    R = Ra @ Rb
    t = sa[..., None] * (Ra @ tb[..., None])[..., 0] + ta
    return s, R, t


def sim3_inverse(s: jax.Array, R: jax.Array, t: jax.Array) -> Sim3:
    Rinv = jnp.swapaxes(R, -1, -2)
    sinv = 1.0 / s
    tinv = -sinv[..., None] * (Rinv @ t[..., None])[..., 0]
    return sinv, Rinv, tinv


def sim3_apply(s: jax.Array, R: jax.Array, t: jax.Array, x: jax.Array) -> jax.Array:
    return s[..., None] * (R @ x[..., None])[..., 0] + t


def exp_sim3(xi: jax.Array) -> Sim3:
    """xi = (rho, phi, sigma): (...,7) -> (s,R,t).

    Uses the closed-form Sim3 V matrix (Strasdat); s = exp(sigma).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = exp_so3(phi)
    t_norm = jnp.sqrt(jnp.sum(phi * phi, axis=-1) + 1e-30)
    W = hat(phi)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    # f32 note: the general-case coefficients suffer catastrophic
    # cancellation below theta ~ 1e-3 — the small-theta series (exact to
    # O(theta^2) relative) takes over well before that noise floor.
    small_theta = t_norm < 1e-3
    small_sigma = jnp.abs(sigma) < 1e-4
    # V = A*I + B*W + C*W^2 (Sophus sim3 calcW convention with roles
    # relabelled: our A is Sophus' C, our B its A, our C its B)
    t2 = t_norm * t_norm
    sig = sigma
    es = s

    A_nosig = 1.0 + 0.5 * sig  # series of (e^s-1)/s
    A_sig = (es - 1.0) / jnp.where(small_sigma, 1.0, sig)
    A = jnp.where(small_sigma, A_nosig, A_sig)

    cos_t, sin_t = jnp.cos(t_norm), jnp.sin(t_norm)
    denom = sig * sig + t2  # sigma^2 + theta^2

    # general case (sigma != 0, theta != 0)
    a_gen = es * sin_t
    b_gen = es * cos_t
    safe_denom = jnp.where(small_theta, 1.0, denom)
    B_gen = (a_gen * sig + (1.0 - b_gen) * t_norm) / jnp.where(
        small_theta, 1.0, t_norm * safe_denom
    )
    C_gen = (A - ((b_gen - 1.0) * sig + a_gen * t_norm) / safe_denom) / jnp.where(
        small_theta, 1.0, t2
    )

    # sigma ~ 0, theta != 0 (reduces to SE3 left Jacobian coefficients)
    B_se3 = (1.0 - cos_t) / jnp.where(small_theta, 1.0, t2)
    C_se3 = (t_norm - sin_t) / jnp.where(small_theta, 1.0, t2 * t_norm)

    # theta ~ 0 (any sigma)
    B_small = jnp.where(
        small_sigma,
        0.5 + sig / 6.0,
        ((sig - 1.0) * es + 1.0) / jnp.where(small_sigma, 1.0, sig * sig),
    )
    C_small = jnp.where(
        small_sigma,
        1.0 / 6.0 + sig / 24.0,
        (es * 0.5 * sig * sig + es - 1.0 - sig * es)
        / jnp.where(small_sigma, 1.0, sig * sig * sig),
    )

    B = jnp.where(small_theta, B_small, jnp.where(small_sigma, B_se3, B_gen))
    C = jnp.where(small_theta, C_small, jnp.where(small_sigma, C_se3, C_gen))

    V = A[..., None, None] * eye + B[..., None, None] * W + C[..., None, None] * W2
    t_out = (V @ rho[..., None])[..., 0]
    return s, R, t_out


def log_sim3(s: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Inverse of exp_sim3 via solving V rho = t (V is 3x3, tiny solve)."""
    phi = log_so3(R)
    sigma = jnp.log(s)
    # Rebuild V with the same coefficients as exp_sim3
    xi_probe = jnp.concatenate(
        [jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1
    )
    # Recompute V by calling exp on basis vectors is wasteful; rebuild directly:
    _, _, Ve1 = exp_sim3(
        jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3, dtype=t.dtype)[0], phi.shape), phi, sigma[..., None]],
            axis=-1,
        )
    )
    _, _, Ve2 = exp_sim3(
        jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3, dtype=t.dtype)[1], phi.shape), phi, sigma[..., None]],
            axis=-1,
        )
    )
    _, _, Ve3 = exp_sim3(
        jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3, dtype=t.dtype)[2], phi.shape), phi, sigma[..., None]],
            axis=-1,
        )
    )
    V = jnp.stack([Ve1, Ve2, Ve3], axis=-1)
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
