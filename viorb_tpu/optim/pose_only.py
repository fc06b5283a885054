"""Pose-only optimizers for tracking.

Counterparts of the reference's Optimizer::PoseOptimization family:
  * vision-only 6-DoF (src/Optimizer.cc:3749): 4 rounds x 10 LM iters with
    chi2 re-gating of outliers between rounds;
  * VI 15-DoF frame optimization against the last keyframe or frame with
    preintegration + bias edges, optional marginalized prior, and marginal
    covariance extraction for the next frame's prior
    (src/Optimizer.cc:323/:789, prior consumed at :407-423, marginals
    computed at :740-772).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from viorb_tpu.geometry.camera import PinholeCamera
from viorb_tpu.geometry.so3 import exp_so3
from viorb_tpu.imu.navstate import NavState
from viorb_tpu.imu.preintegration import PreintegratedImu
from viorb_tpu.optim.imu_factors import (
    bias_walk_residual,
    preint_residual,
    prior_residual,
    whitener_from_cov,
)
from viorb_tpu.optim.reprojection import (
    Extrinsics,
    reproj_residual_navstate,
    reproj_residual_tcw,
)
from viorb_tpu.optim.robust import CHI2_MONO_2DOF, CHI2_VI_9DOF, huber_weight


class PoseObs(NamedTuple):
    """Per-frame pose-only observations: matched map points + keypoints.

    points: (N,3) world; uv: (N,2) undistorted pixels; inv_sigma2: (N,);
    valid: (N,) bool."""

    points: jax.Array
    uv: jax.Array
    inv_sigma2: jax.Array
    valid: jax.Array


def _pose_blocks_tcw(r_cw, t_cw, obs: PoseObs, cam: PinholeCamera):
    z6 = jnp.zeros(6, jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)

    def per_obs(pw, uv):
        def f(d):
            return reproj_residual_tcw(d, r_cw, t_cw, pw, uv, cam)

        return f(z6), jax.jacfwd(f)(z6)

    return jax.vmap(per_obs)(obs.points, obs.uv)


@partial(jax.jit, static_argnames=("rounds", "iters_per_round"))
def pose_optimization_tcw(
    r_cw: jax.Array,
    t_cw: jax.Array,
    obs: PoseObs,
    cam: PinholeCamera,
    rounds: int = 4,
    iters_per_round: int = 10,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (r_cw, t_cw, inlier_mask) (reference: PoseOptimization,
    src/Optimizer.cc:3749 — 4x10 with chi2 5.991 re-gating)."""

    def gn_iter(carry, _):
        r_cw, t_cw, inlier, lam = carry
        r, J = _pose_blocks_tcw(r_cw, t_cw, obs, cam)
        chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
        hw = huber_weight(chi2, CHI2_MONO_2DOF)
        w = obs.inv_sigma2 * hw * (obs.valid & inlier).astype(r.dtype)
        H = jnp.einsum("nci,n,ncj->ij", J, w, J)
        g = -jnp.einsum("nci,n,nc->i", J, w, r)
        H = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6))
        dx = jnp.linalg.solve(H + 1e-8 * jnp.eye(6), g)
        dR = exp_so3(dx[3:6])
        r_new = dR @ r_cw
        t_new = dR @ t_cw + dx[:3]
        # accept if cost decreases
        def cost(rc, tc):
            rr, _ = _pose_blocks_tcw(rc, tc, obs, cam)
            c2 = jnp.sum(rr * rr, axis=-1) * obs.inv_sigma2
            h = huber_weight(c2, CHI2_MONO_2DOF)
            return jnp.sum(
                jnp.where(obs.valid & inlier, c2 * jnp.minimum(h, 1.0), 0.0)
            )

        c0 = cost(r_cw, t_cw)
        c1 = cost(r_new, t_new)
        acc = c1 < c0
        r_cw = jnp.where(acc, r_new, r_cw)
        t_cw = jnp.where(acc, t_new, t_cw)
        lam = jnp.where(acc, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 4, 1e4))
        return (r_cw, t_cw, inlier, lam), None

    inlier = jnp.ones(obs.points.shape[0], bool)
    for _ in range(rounds):
        (r_cw, t_cw, inlier, _), _ = jax.lax.scan(
            gn_iter,
            (r_cw, t_cw, inlier, jnp.float32(1e-4)),
            None,
            length=iters_per_round,
        )
        r, _ = _pose_blocks_tcw(r_cw, t_cw, obs, cam)
        chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
        inlier = chi2 <= CHI2_MONO_2DOF
    return r_cw, t_cw, inlier & obs.valid


# ---------------------------------------------------------------------------
# VI pose optimization (frame j against anchor i)
# ---------------------------------------------------------------------------


class ViPosePrior(NamedTuple):
    """Marginalized prior on the anchor state (reference Frame::mNavStatePrior
    + mMargCovInv, include/Frame.h:73-74)."""

    state: NavState
    info: jax.Array  # (15,15)
    valid: jax.Array  # () bool


def _vi_frame_system(
    ns_j: NavState,
    ns_i: NavState,
    obs: PoseObs,
    cam: PinholeCamera,
    ext: Extrinsics,
    pre: PreintegratedImu,
    gravity: jax.Array,
    bias_info_diag: jax.Array,
    prior: Optional[ViPosePrior],
    inlier: jax.Array,
    optimize_i: bool,
):
    """Build the (30,30) system over (delta_i, delta_j); if optimize_i is
    False the i-block is clamped at solve time."""
    z15 = jnp.zeros(15, jnp.float32)

    # vision (only-pose on j)
    def vres2(dj, pw, uv):
        return reproj_residual_navstate(
            dj[:9], jnp.zeros(3, jnp.float32), ns_j.p, ns_j.r, pw, uv, cam, ext
        )

    def per_obs(pw, uv):
        def f(dj):
            return vres2(dj, pw, uv)

        return f(z15), jax.jacfwd(f)(z15)

    r_v, J_v = jax.vmap(per_obs)(obs.points, obs.uv)  # (N,2),(N,2,15)
    chi2_v = jnp.sum(r_v * r_v, axis=-1) * obs.inv_sigma2
    hw = huber_weight(chi2_v, CHI2_MONO_2DOF)
    w_v = obs.inv_sigma2 * hw * (obs.valid & inlier).astype(r_v.dtype)

    H_jj = jnp.einsum("nci,n,ncj->ij", J_v, w_v, J_v)
    g_j = -jnp.einsum("nci,n,nc->i", J_v, w_v, r_v)
    H_ii = jnp.zeros((15, 15), jnp.float32)
    H_ij = jnp.zeros((15, 15), jnp.float32)
    g_i = jnp.zeros(15, jnp.float32)

    # preintegration edge i->j
    Lt = whitener_from_cov(pre.cov)

    def ires(di, dj):
        return Lt @ preint_residual(di, dj[:9], ns_i, ns_j, pre, gravity)

    r_i9 = ires(z15, z15)
    Ji = jax.jacfwd(ires, argnums=0)(z15, z15)
    Jj = jax.jacfwd(ires, argnums=1)(z15, z15)
    ichi2 = jnp.sum(r_i9 * r_i9)
    ihw = huber_weight(ichi2, CHI2_VI_9DOF)
    H_ii = H_ii + ihw * Ji.T @ Ji
    H_jj = H_jj + ihw * Jj.T @ Jj
    H_ij = H_ij + ihw * Ji.T @ Jj
    g_i = g_i - ihw * Ji.T @ r_i9
    g_j = g_j - ihw * Jj.T @ r_i9

    # bias random walk i->j
    def bres(di, dj):
        return bias_walk_residual(di, dj, ns_i, ns_j)

    r_b = bres(z15, z15)
    Bi = jax.jacfwd(bres, argnums=0)(z15, z15)
    Bj = jax.jacfwd(bres, argnums=1)(z15, z15)
    Wb = jnp.diag(bias_info_diag)
    H_ii = H_ii + Bi.T @ Wb @ Bi
    H_jj = H_jj + Bj.T @ Wb @ Bj
    H_ij = H_ij + Bi.T @ Wb @ Bj
    g_i = g_i - Bi.T @ Wb @ r_b
    g_j = g_j - Bj.T @ Wb @ r_b

    # prior on i
    if prior is not None:
        def pres(di):
            return prior_residual(di, ns_i, prior.state)

        r_p = pres(z15)
        Jp = jax.jacfwd(pres)(z15)
        pw = jnp.where(prior.valid, 1.0, 0.0)
        H_ii = H_ii + pw * Jp.T @ prior.info @ Jp
        g_i = g_i - pw * Jp.T @ prior.info @ r_p

    cost = (
        jnp.sum(jnp.where(obs.valid & inlier, chi2_v * jnp.minimum(hw, 1.0), 0.0))
        + ichi2 * jnp.minimum(ihw, 1.0)
        + r_b @ Wb @ r_b
    )
    if prior is not None:
        cost = cost + jnp.where(prior.valid, r_p @ prior.info @ r_p, 0.0)
    return H_ii, H_ij, H_jj, g_i, g_j, cost, chi2_v


@partial(jax.jit, static_argnames=("rounds", "iters_per_round", "optimize_i"))
def pose_optimization_vi(
    ns_j: NavState,
    ns_i: NavState,
    obs: PoseObs,
    cam: PinholeCamera,
    ext: Extrinsics,
    pre: PreintegratedImu,
    gravity: jax.Array,
    bias_info_diag: jax.Array,
    prior: Optional[ViPosePrior] = None,
    rounds: int = 4,
    iters_per_round: int = 5,
    optimize_i: bool = False,
) -> Tuple[NavState, NavState, jax.Array, jax.Array]:
    """VI tracking pose optimization.

    Returns (ns_j, ns_i, inlier_mask, marg_info_j) where marg_info_j is the
    15x15 information of frame j after marginalizing i — the prior carried
    to the next frame (reference: src/Optimizer.cc:740-772 computeMarginals
    producing Frame::mMargCovInv)."""
    n = obs.points.shape[0]
    inlier = jnp.ones(n, bool)

    def one_iter(carry, _):
        ns_j, ns_i, inlier, lam = carry
        H_ii, H_ij, H_jj, g_i, g_j, cost0, _ = _vi_frame_system(
            ns_j, ns_i, obs, cam, ext, pre, gravity, bias_info_diag, prior,
            inlier, optimize_i,
        )
        if optimize_i:
            H = jnp.block([[H_ii, H_ij], [H_ij.T, H_jj]])
            g = jnp.concatenate([g_i, g_j])
            H = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6))
            dx = jnp.linalg.solve(H + 1e-6 * jnp.eye(30), g)
            di, dj = dx[:15], dx[15:]
        else:
            H = H_jj + lam * jnp.diag(jnp.maximum(jnp.diag(H_jj), 1e-6))
            dj = jnp.linalg.solve(H + 1e-6 * jnp.eye(15), g_j)
            di = jnp.zeros(15, jnp.float32)
        cand_j = ns_j.inc_small(dj)
        cand_i = ns_i.inc_small(di)
        _, _, _, _, _, cost1, _ = _vi_frame_system(
            cand_j, cand_i, obs, cam, ext, pre, gravity, bias_info_diag, prior,
            inlier, optimize_i,
        )
        acc = cost1 < cost0
        ns_j = jax.tree.map(lambda a, b: jnp.where(acc, a, b), cand_j, ns_j)
        ns_i = jax.tree.map(lambda a, b: jnp.where(acc, a, b), cand_i, ns_i)
        lam = jnp.where(acc, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 4, 1e4))
        return (ns_j, ns_i, inlier, lam), None

    for _ in range(rounds):
        (ns_j, ns_i, inlier, _), _ = jax.lax.scan(
            one_iter, (ns_j, ns_i, inlier, jnp.float32(1e-3)), None,
            length=iters_per_round,
        )
        _, _, _, _, _, _, chi2_v = _vi_frame_system(
            ns_j, ns_i, obs, cam, ext, pre, gravity, bias_info_diag, prior,
            inlier, optimize_i,
        )
        inlier = chi2_v <= CHI2_MONO_2DOF

    # marginal information of j: H_jj - H_ji H_ii^{-1} H_ij
    H_ii, H_ij, H_jj, _, _, _, _ = _vi_frame_system(
        ns_j, ns_i, obs, cam, ext, pre, gravity, bias_info_diag, prior,
        inlier, optimize_i,
    )
    if optimize_i:
        H_ii_inv = jnp.linalg.inv(H_ii + 1e-6 * jnp.eye(15))
        marg_info = H_jj - H_ij.T @ H_ii_inv @ H_ij
    else:
        marg_info = H_jj
    # The marginal is carried UN-discounted: a forgetting factor < 1 was
    # measured to destabilize the chain (the anchor frame becomes nearly
    # unconstrained in the two-frame solve and the marginal's smallest
    # eigenvalue decays geometrically); the un-discounted chain is
    # self-stabilizing because each step's marginalization already
    # subtracts the information spent constraining the previous anchor.
    return ns_j, ns_i, inlier & obs.valid, marg_info
