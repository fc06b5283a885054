"""Visual-inertial initialization: gyro bias, scale, gravity, accel bias.

Counterpart of the reference's TryInitVIO pipeline (reference:
src/LocalMapping.cc:191-940):

  Step 1  gyro bias from relative rotations
          (Optimizer::OptimizeInitialGyroBias, src/Optimizer.cc:3138 —
          GN on r = Log(dR(bg)^T Rbi^T Rbj));
  Step 2  linear scale + gravity: for each consecutive KF triplet,
          eliminate velocities from the preintegrated kinematics to get
          lambda*s + beta*gw = gamma (src/LocalMapping.cc:311-390);
  Step 3  refine with |g| fixed at 9.81: 2-DoF gravity-direction
          correction + accel bias (src/LocalMapping.cc:396-504);
  Step 4  per-KF velocities from the position equations
          (src/LocalMapping.cc:620-688).

The systems are tiny ((3N x 4/6) least squares), so they run on host in
f64 — exactly the split the reference uses (its own VI-init thread).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from viorb_tpu.geometry.so3 import exp_so3, log_so3, right_jacobian
from viorb_tpu.imu.preintegration import PreintegratedImu

GRAVITY_MAG = 9.810


def estimate_gyro_bias(
    r_wb: np.ndarray,  # (N,3,3) body rotations from vision (Rwc @ Rcb)
    preints: PreintegratedImu,  # stacked, leading dim N-1 (i -> i+1)
    iters: int = 4,
) -> np.ndarray:
    """GN for bg minimizing sum ||Log((dR Exp(J dbg))^T R_i^T R_j)||^2."""
    r_wb = jnp.asarray(r_wb, jnp.float32)

    def residuals(bg):
        dR_corr = preints.delta_r @ exp_so3(
            (preints.j_r_bg @ bg[None, :, None])[..., 0]
        )
        rel = jnp.swapaxes(dR_corr, -1, -2) @ (
            jnp.swapaxes(r_wb[:-1], -1, -2) @ r_wb[1:]
        )
        return log_so3(rel).reshape(-1)

    bg = jnp.zeros(3, jnp.float32)
    for _ in range(iters):
        r = residuals(bg)
        J = jax.jacfwd(residuals)(bg)
        Jn = np.asarray(J, np.float64)
        rn = np.asarray(r, np.float64)
        delta = np.linalg.lstsq(Jn, -rn, rcond=None)[0]
        bg = bg + jnp.asarray(delta.astype(np.float32))
    return np.asarray(bg)


class ViInitResult(NamedTuple):
    success: bool
    scale: float
    gravity_w: np.ndarray  # (3,)
    bias_g: np.ndarray
    bias_a: np.ndarray
    velocities: np.ndarray  # (N,3) body velocities in world (scaled frame)
    condition_number: float


def _triplet_system(
    p_c: np.ndarray,  # (N,3) UNSCALED camera centers from the mono map
    r_wb: np.ndarray,  # (N,3,3) body orientation (gravity-free vision est.)
    p_bc_w: np.ndarray,  # (N,3) R_wc @ p_cb term: body-from-camera offset
    dts: np.ndarray,  # (N-1,)
    dp: np.ndarray,  # (N-1,3) preintegrated (bias-corrected) delta P
    dv: np.ndarray,  # (N-1,3) delta V
):
    """Rows (lambda_i, beta_i, gamma_i) of the velocity-eliminated triplet
    equations (reference src/LocalMapping.cc:311-355)."""
    n = len(p_c)
    lams, betas, gammas = [], [], []
    for i in range(n - 2):
        dt12, dt23 = dts[i], dts[i + 1]
        lam = (p_c[i + 2] - p_c[i + 1]) * dt12 - (p_c[i + 1] - p_c[i]) * dt23
        # eliminating V1 from the three kinematic equations gives
        # lam*s - 1/2(dt12^2 dt23 + dt23^2 dt12) g = gamma
        # (verified numerically against analytic trajectories)
        beta = -0.5 * (dt12 * dt12 * dt23 + dt23 * dt23 * dt12) * np.eye(3)
        gamma = (
            r_wb[i] @ dv[i] * dt12 * dt23
            + r_wb[i + 1] @ dp[i + 1] * dt12
            - r_wb[i] @ dp[i] * dt23
            - ((p_bc_w[i + 2] - p_bc_w[i + 1]) * dt12 - (p_bc_w[i + 1] - p_bc_w[i]) * dt23)
        )
        lams.append(lam)
        betas.append(beta)
        gammas.append(gamma)
    return np.stack(lams), np.stack(betas), np.stack(gammas)


def estimate_scale_gravity(
    p_c: np.ndarray,
    r_wb: np.ndarray,
    p_bc_w: np.ndarray,
    dts: np.ndarray,
    dp: np.ndarray,
    dv: np.ndarray,
) -> Tuple[float, np.ndarray, float]:
    """Step 2: unconstrained linear solve for (s, gw). Returns
    (scale, gravity, condition number) (reference src/LocalMapping.cc:356-390,
    condition number logged to tmp/condnum.txt)."""
    lams, betas, gammas = _triplet_system(p_c, r_wb, p_bc_w, dts, dp, dv)
    m = len(lams)
    A = np.zeros((3 * m, 4))
    b = np.zeros(3 * m)
    for i in range(m):
        A[3 * i : 3 * i + 3, 0] = lams[i]
        A[3 * i : 3 * i + 3, 1:4] = betas[i]
        b[3 * i : 3 * i + 3] = gammas[i]
    u, s, vt = np.linalg.svd(A, full_matrices=False)
    x = vt.T @ ((u.T @ b) / s)
    cond = s[0] / max(s[-1], 1e-12)
    return float(x[0]), x[1:4], float(cond)


def refine_scale_gravity_ba(
    p_c: np.ndarray,
    r_wb: np.ndarray,
    p_bc_w: np.ndarray,
    dts: np.ndarray,
    preints: PreintegratedImu,
    g_est: np.ndarray,
) -> Tuple[float, np.ndarray, np.ndarray]:
    """Step 3: fix |g| = 9.81, solve for (s, dtheta_xy, ba)
    (reference src/LocalMapping.cc:396-504). Returns (s, gw, ba)."""
    # gravity frame: R_wi aligns gI=(0,0,-1) to current estimate direction
    gI = np.array([0.0, 0.0, -1.0])
    gn = g_est / max(np.linalg.norm(g_est), 1e-12)
    v = np.cross(gI, gn)
    sv = np.linalg.norm(v)
    cv = float(gI @ gn)
    if sv < 1e-8:
        R_wi = np.eye(3)
    else:
        vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        R_wi = np.eye(3) + vx + vx @ vx * ((1 - cv) / (sv * sv))
    g0 = R_wi @ gI * GRAVITY_MAG

    dp = np.asarray(preints.delta_p, np.float64)
    dv = np.asarray(preints.delta_v, np.float64)
    jp_ba = np.asarray(preints.j_p_ba, np.float64)
    jv_ba = np.asarray(preints.j_v_ba, np.float64)

    n = len(p_c)
    m = n - 2
    A = np.zeros((3 * m, 6))
    b = np.zeros(3 * m)
    gIx = np.array([[0, -gI[2], gI[1]], [gI[2], 0, -gI[0]], [-gI[1], gI[0], 0]])
    for i in range(m):
        dt12, dt23 = dts[i], dts[i + 1]
        lam = (p_c[i + 2] - p_c[i + 1]) * dt12 - (p_c[i + 1] - p_c[i]) * dt23
        half = 0.5 * (dt12 * dt12 * dt23 + dt23 * dt23 * dt12)
        # equation: lam*s - half*g(dtheta) - zeta*ba = gamma0
        # g(dtheta) = R_wi Exp(dtheta) gI G ~= g0 - G R_wi hat(gI) dtheta
        # => -half*dg contributes +half*G*R_wi*hat(gI) dtheta on the LHS
        phi = half * GRAVITY_MAG * (R_wi @ gIx)
        # accel-bias columns
        zeta = (
            r_wb[i + 1] @ jp_ba[i + 1] * dt12
            - r_wb[i] @ jp_ba[i] * dt23
            + r_wb[i] @ jv_ba[i] * dt12 * dt23
        )
        gamma0 = (
            r_wb[i] @ dv[i] * dt12 * dt23
            + r_wb[i + 1] @ dp[i + 1] * dt12
            - r_wb[i] @ dp[i] * dt23
            - (
                (p_bc_w[i + 2] - p_bc_w[i + 1]) * dt12
                - (p_bc_w[i + 1] - p_bc_w[i]) * dt23
            )
        )
        A[3 * i : 3 * i + 3, 0] = lam
        A[3 * i : 3 * i + 3, 1:3] = phi[:, :2]
        A[3 * i : 3 * i + 3, 3:6] = -zeta
        b[3 * i : 3 * i + 3] = gamma0 + half * g0
    x = np.linalg.lstsq(A, b, rcond=None)[0]
    s = float(x[0])
    dtheta = np.array([x[1], x[2], 0.0])
    th = np.linalg.norm(dtheta)
    if th > 1e-12:
        k = dtheta / th
        kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        Rdt = np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * kx @ kx
    else:
        Rdt = np.eye(3)
    gw = R_wi @ Rdt @ gI * GRAVITY_MAG
    ba = x[3:6]
    return s, gw, ba


def solve_velocities(
    p_wb: np.ndarray,  # (N,3) SCALED body positions
    r_wb: np.ndarray,
    dts: np.ndarray,
    dp: np.ndarray,  # bias-corrected
    dv: np.ndarray,
    gw: np.ndarray,
) -> np.ndarray:
    """Velocities from P_{i+1} = P_i + V_i dt + 1/2 g dt^2 + R_i dP; the
    last from V_j = V_i + g dt + R_i dV (reference src/LocalMapping.cc:620-688)."""
    n = len(p_wb)
    v = np.zeros((n, 3))
    for i in range(n - 1):
        dt = dts[i]
        v[i] = (
            p_wb[i + 1] - p_wb[i] - 0.5 * gw * dt * dt - r_wb[i] @ dp[i]
        ) / dt
    v[n - 1] = v[n - 2] + gw * dts[n - 2] + r_wb[n - 2] @ dv[n - 2]
    return v


def try_vi_init(
    p_c: np.ndarray,  # (N,3) camera centers (unscaled mono map)
    r_wc: np.ndarray,  # (N,3,3) camera-to-world rotations
    timestamps: np.ndarray,  # (N,)
    imu_batches,  # stacked ImuBatch with leading dim N-1
    r_bc: np.ndarray = np.eye(3),  # extrinsics Tbc
    p_bc: np.ndarray = np.zeros(3),
    noise=None,
    min_cond: float = 0.0,
) -> Optional[ViInitResult]:
    """Full VI initialization over a keyframe chain. Returns None if the
    system is degenerate (reference gates on 15s of data + condition
    number; callers apply the time gate)."""
    from viorb_tpu.imu.preintegration import preintegrate_batch
    from viorb_tpu.imu.types import ImuNoise

    noise = noise or ImuNoise()
    n = len(p_c)
    if n < 4:
        return None
    # x_b = r_bc x_c + p_bc  =>  x_c = r_bc^T (x_b - p_bc)
    # x_w = Rwc x_c  =>  Rwb = Rwc @ r_bc^T
    r_wb = np.einsum("nij,kj->nik", r_wc, r_bc)
    # body-from-camera world offset: Pwb = s*p_wc + Rwc @ p_cb where
    # p_cb = -r_bc^T p_bc expressed in camera frame
    p_cb = -(r_bc.T @ p_bc)
    p_bc_w = np.einsum("nij,j->ni", r_wc, p_cb)

    dts = np.diff(timestamps).astype(np.float64)
    t0 = jnp.asarray(timestamps[:-1], jnp.float32)
    t1 = jnp.asarray(timestamps[1:], jnp.float32)

    # step 1: gyro bias (preintegrate at zero bias first)
    pre0 = preintegrate_batch(
        imu_batches, jnp.zeros(3), jnp.zeros(3), t0, t1, noise
    )
    bg = estimate_gyro_bias(r_wb, pre0)

    # re-preintegrate with bg (one batched launch)
    pre = preintegrate_batch(
        imu_batches, jnp.asarray(bg), jnp.zeros(3), t0, t1, noise
    )
    dp = np.asarray(pre.delta_p, np.float64)
    dv = np.asarray(pre.delta_v, np.float64)

    # step 2: linear scale + gravity
    s2, gw2, cond = estimate_scale_gravity(p_c, r_wb, p_bc_w, dts, dp, dv)
    if s2 <= 0:
        return None

    # step 3: refine with |g| constraint + accel bias
    s3, gw3, ba = refine_scale_gravity_ba(p_c, r_wb, p_bc_w, dts, pre, gw2)
    if s3 <= 0:
        return None

    # step 4: velocities (with bias-corrected deltas at ba)
    dp_c, dv_c, _ = jax.tree.map(np.asarray, pre.corrected_deltas(
        jnp.zeros(3), jnp.asarray(ba, dtype=jnp.float32)
    ))
    p_wb = s3 * p_c + p_bc_w
    vels = solve_velocities(p_wb, r_wb, dts, np.asarray(dp_c), np.asarray(dv_c), gw3)

    return ViInitResult(
        success=True,
        scale=s3,
        gravity_w=gw3,
        bias_g=bg,
        bias_a=ba,
        velocities=vels,
        condition_number=cond,
    )
