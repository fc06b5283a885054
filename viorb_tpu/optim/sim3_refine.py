"""Sim3 refinement by two-way reprojection (reference:
Optimizer::OptimizeSim3, src/Optimizer.cc:4589 — g2o VertexSim3Expmap with
EdgeSim3ProjectXYZ / EdgeInverseSim3ProjectXYZ pairs, Huber, inlier
re-gating).

Given matched map points seen in two keyframes (each expressed in its own
camera frame), refine S12 (candidate-cam -> current-cam) so that
  * S12 · x2 projects onto the current keyframe's keypoint, and
  * S12^{-1} · x1 projects onto the candidate keyframe's keypoint.
Batched residuals + autodiff Jacobians, LM on the 7-DoF local increment.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from viorb_tpu.geometry.camera import PinholeCamera, project
from viorb_tpu.geometry.so3 import exp_so3
from viorb_tpu.optim.robust import CHI2_MONO_2DOF, huber_weight


def _apply_sim3(s, r, t, x):
    return s * (r @ x) + t


def _residuals(delta, s, r, t, x1, uv1, x2, uv2, cam):
    """delta: (7,) = (rho, phi, sigma) left-increment on S12.
    Returns (N,2) forward + (N,2) inverse residuals."""
    ds = jnp.exp(delta[6])
    dr = exp_so3(delta[3:6])
    s_new = ds * s
    r_new = dr @ r
    t_new = ds * (dr @ t) + delta[:3]

    # forward: candidate-cam points into current image
    xf = jax.vmap(lambda x: _apply_sim3(s_new, r_new, t_new, x))(x2)
    rf = jax.vmap(lambda x, uv: project(cam, x) - uv)(xf, uv1)
    # inverse: current-cam points into candidate image
    s_inv = 1.0 / s_new
    r_inv = r_new.T
    t_inv = -s_inv * (r_inv @ t_new)
    xi = jax.vmap(lambda x: _apply_sim3(s_inv, r_inv, t_inv, x))(x1)
    ri = jax.vmap(lambda x, uv: project(cam, x) - uv)(xi, uv2)
    return rf, ri


@partial(jax.jit, static_argnames=("iters", "fix_scale"))
def optimize_sim3_reproj(
    s12: jax.Array,  # ()
    r12: jax.Array,  # (3,3)
    t12: jax.Array,  # (3,)
    x1: jax.Array,  # (N,3) points in current-cam frame
    uv1: jax.Array,  # (N,2) current-kf keypoints matched to x2
    x2: jax.Array,  # (N,3) points in candidate-cam frame
    uv2: jax.Array,  # (N,2) candidate-kf keypoints matched to x1
    valid: jax.Array,  # (N,)
    cam: PinholeCamera,
    iters: int = 10,
    fix_scale: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (s, r, t, inlier_mask) with inliers gated at chi2 9.21
    (the reference uses th2=10 on 2-dof Sim3 edges). fix_scale pins
    s = 1 for stereo/RGB-D loops (reference Sim3Solver bFixScale,
    include/Sim3Solver.h:45)."""
    z7 = jnp.zeros(7, jnp.float32)
    th2 = 9.21

    def cost_and_chi2(s, r, t):
        rf, ri = _residuals(z7, s, r, t, x1, uv1, x2, uv2, cam)
        chi2 = jnp.sum(rf * rf, -1) + jnp.sum(ri * ri, -1)
        hw = huber_weight(chi2, th2)
        c = jnp.sum(jnp.where(valid, chi2 * jnp.minimum(hw, 1.0), 0.0))
        return c, chi2

    def step(carry, _):
        s, r, t, lam = carry

        def res_flat(delta):
            rf, ri = _residuals(delta, s, r, t, x1, uv1, x2, uv2, cam)
            w = valid.astype(jnp.float32)
            return jnp.concatenate(
                [(rf * w[:, None]).reshape(-1), (ri * w[:, None]).reshape(-1)]
            )

        rv = res_flat(z7)
        J = jax.jacfwd(res_flat)(z7)  # (4N,7)
        H = J.T @ J
        g = -J.T @ rv
        H = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6))
        if fix_scale:
            # pin the sigma dof: exact reduced solve with s frozen at 1
            H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
            g = g.at[6].set(0.0)
        dx = jnp.linalg.solve(H + 1e-8 * jnp.eye(7), g)
        ds = jnp.exp(dx[6])
        dr = exp_so3(dx[3:6])
        s_n = ds * s
        r_n = dr @ r
        t_n = ds * (dr @ t) + dx[:3]
        c0, _ = cost_and_chi2(s, r, t)
        c1, _ = cost_and_chi2(s_n, r_n, t_n)
        acc = c1 < c0
        s = jnp.where(acc, s_n, s)
        r = jnp.where(acc, r_n, r)
        t = jnp.where(acc, t_n, t)
        lam = jnp.where(acc, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 4, 1e4))
        return (s, r, t, lam), None

    (s, r, t, _), _ = jax.lax.scan(
        step, (s12, r12, t12, jnp.float32(1e-4)), None, length=iters
    )
    _, chi2 = cost_and_chi2(s, r, t)
    return s, r, t, valid & (chi2 <= th2)
