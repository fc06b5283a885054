"""IMU factor residuals: preintegration edge, bias random walk, NavState prior.

Counterparts of the reference's g2o VI edges (reference:
src/IMU/g2otypes.cpp — EdgeNavStatePVR residual rP/rV/rPhi with
bias-Jacobian correction at :8-75, EdgeNavStateBias random walk at :231,
EdgeNavStatePriorPVRBias at g2otypes.h:286-309).

Residuals are functions of local increments (delta_i, delta_j) so jacfwd
at zero gives the manifold Jacobians; whitening matrices come from the
preintegrated covariance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from viorb_tpu.geometry.so3 import exp_so3, log_so3
from viorb_tpu.imu.navstate import NavState
from viorb_tpu.imu.preintegration import PreintegratedImu


def preint_residual(
    delta_i: jax.Array,  # (15,) increment on state i (P,V,phi,dbg,dba)
    delta_j: jax.Array,  # (9,) increment on state j PVR
    ns_i: NavState,
    ns_j: NavState,
    pre: PreintegratedImu,
    gravity_w: jax.Array,
) -> jax.Array:
    """9-dim residual (rP, rV, rPhi) (reference src/IMU/g2otypes.cpp:8-75):

      rP   = Rwb_i^T (Pj - Pi - Vi dt - 1/2 g dt^2) - dP_corr
      rV   = Rwb_i^T (Vj - Vi - g dt)               - dV_corr
      rPhi = Log(dR_corr^T Rwb_i^T Rwb_j)
    """
    p_i = ns_i.p + delta_i[0:3]
    v_i = ns_i.v + delta_i[3:6]
    r_i = ns_i.r @ exp_so3(delta_i[6:9])
    dbg_i = ns_i.dbg + delta_i[9:12]
    dba_i = ns_i.dba + delta_i[12:15]

    p_j = ns_j.p + delta_j[0:3]
    v_j = ns_j.v + delta_j[3:6]
    r_j = ns_j.r @ exp_so3(delta_j[6:9])

    dt = pre.dt
    dp_c, dv_c, dr_c = pre.corrected_deltas(dbg_i, dba_i)

    ri_t = r_i.T
    r_p = ri_t @ (p_j - p_i - v_i * dt - 0.5 * gravity_w * dt * dt) - dp_c
    r_v = ri_t @ (v_j - v_i - gravity_w * dt) - dv_c
    r_phi = log_so3(dr_c.T @ ri_t @ r_j)
    return jnp.concatenate([r_p, r_v, r_phi])


def bias_walk_residual(
    delta_i: jax.Array,  # (15,)
    delta_j: jax.Array,  # (15,)
    ns_i: NavState,
    ns_j: NavState,
) -> jax.Array:
    """6-dim bias random-walk residual (reference: EdgeNavStateBias,
    src/IMU/g2otypes.cpp:231): r = (bg_j+dbg_j) - (bg_i+dbg_i), acc analog.
    Information = (RW cov * dt)^{-1}, supplied by the caller."""
    bg_i = ns_i.bg + ns_i.dbg + delta_i[9:12]
    ba_i = ns_i.ba + ns_i.dba + delta_i[12:15]
    bg_j = ns_j.bg + ns_j.dbg + delta_j[9:12]
    ba_j = ns_j.ba + ns_j.dba + delta_j[12:15]
    return jnp.concatenate([bg_j - bg_i, ba_j - ba_i])


def prior_residual(
    delta: jax.Array,  # (15,)
    ns: NavState,
    prior: NavState,
) -> jax.Array:
    """15-dim manifold difference state ⊟ prior (reference:
    EdgeNavStatePriorPVRBias, src/IMU/g2otypes.h:286-309)."""
    p = ns.p + delta[0:3]
    v = ns.v + delta[3:6]
    r = ns.r @ exp_so3(delta[6:9])
    bg = ns.bg + ns.dbg + delta[9:12]
    ba = ns.ba + ns.dba + delta[12:15]
    r_p = p - prior.p
    r_v = v - prior.v
    r_phi = log_so3(prior.r.T @ r)
    r_bg = bg - (prior.bg + prior.dbg)
    r_ba = ba - (prior.ba + prior.dba)
    return jnp.concatenate([r_p, r_v, r_phi, r_bg, r_ba])


def whitener_from_cov(cov: jax.Array, eps: float = 1e-12) -> jax.Array:
    """cov (...,n,n) -> L^T with L L^T = cov^{-1}: whitened residual is
    r' = L^T r so that r'^T r' = r^T cov^{-1} r. Uses Cholesky of the
    inverse; symmetrized for safety."""
    n = cov.shape[-1]
    covs = 0.5 * (cov + jnp.swapaxes(cov, -1, -2)) + eps * jnp.eye(n, dtype=cov.dtype)
    info = jnp.linalg.inv(covs)
    info = 0.5 * (info + jnp.swapaxes(info, -1, -2))
    # add tiny jitter for PSD safety
    info = info + 1e-10 * jnp.eye(n, dtype=cov.dtype)
    L = jnp.linalg.cholesky(info)
    return jnp.swapaxes(L, -1, -2)
