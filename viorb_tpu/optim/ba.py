"""Batched Levenberg-Marquardt bundle adjustment with explicit Schur
complement over landmarks.

This replaces the reference's g2o stack — BlockSolver Schur elimination
(Thirdparty/g2o/g2o/core/block_solver.hpp:51-90), LM damping
(g2o/core/optimization_algorithm_levenberg.cpp:46-52) and the graph
construction in Optimizer::LocalBundleAdjustment / ...NavState
(src/Optimizer.cc:3980, :1690-2243) — with a fully batched design:

  * observations live in a LANDMARK-MAJOR grid (M landmarks x R obs slots,
    validity-masked): every per-landmark quantity (Hll, its inverse, the
    Schur outer products) is one batched einsum instead of g2o's pointer
    graph walk;
  * pose-pose coupling (IMU preintegration chains, and the Schur fill-in)
    is accumulated into a dense (K*D, K*D) reduced camera matrix — windows
    are small (10-20 KFs), so the reduced solve is a tiny Cholesky;
  * Jacobians are forward-mode autodiff of the residuals at zero local
    increment, vmapped over the observation grid;
  * robust Huber weights + chi2 outlier gating between optimization phases
    reproduce the reference's two-round scheme (src/Optimizer.cc:600-692).

All functions are jit-safe with static capacities (K, M, R).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from viorb_tpu.geometry.camera import PinholeCamera
from viorb_tpu.imu.navstate import NavState
from viorb_tpu.imu.preintegration import PreintegratedImu
from viorb_tpu.optim.imu_factors import (
    bias_walk_residual,
    preint_residual,
    whitener_from_cov,
)
from viorb_tpu.optim.reprojection import (
    Extrinsics,
    reproj_residual_navstate,
    reproj_residual_tcw,
)
from viorb_tpu.optim.robust import CHI2_MONO_2DOF, CHI2_VI_9DOF, huber_weight


class BAObservations(NamedTuple):
    """Landmark-major observation grid.

    kf_idx: (M,R) i32 observing keyframe slot; uv: (M,R,2) undistorted
    pixels; inv_sigma2: (M,R) per-obs information scale (1/sigma^2 from the
    pyramid level, reference Frame::mvInvLevelSigma2); valid: (M,R) bool.

    Stereo (optional, both set together): ur (M,R) right-image u coordinate
    and ur_valid (M,R) bool — observations with ur_valid get the 3-dim
    stereo residual (reference EdgeStereoSE3ProjectXYZ).
    """

    kf_idx: jax.Array
    uv: jax.Array
    inv_sigma2: jax.Array
    valid: jax.Array
    ur: Optional[jax.Array] = None
    ur_valid: Optional[jax.Array] = None

    def chi2_delta2(self):
        """Per-obs outlier threshold: 5.991 mono / 7.815 stereo."""
        from viorb_tpu.optim.robust import CHI2_STEREO_3DOF

        if self.ur_valid is None:
            return CHI2_MONO_2DOF
        return jnp.where(self.ur_valid, CHI2_STEREO_3DOF, CHI2_MONO_2DOF)

    @property
    def m(self) -> int:
        return self.kf_idx.shape[0]

    @property
    def r(self) -> int:
        return self.kf_idx.shape[1]


class VisionBAState(NamedTuple):
    r_cw: jax.Array  # (K,3,3)
    t_cw: jax.Array  # (K,3)
    points: jax.Array  # (M,3)


class ViBAState(NamedTuple):
    nav: NavState  # leading dim K
    points: jax.Array  # (M,3)


# ---------------------------------------------------------------------------
# reprojection blocks (shared by both BA flavours)
# ---------------------------------------------------------------------------


def _vision_blocks(
    state: VisionBAState,
    obs: BAObservations,
    cam: PinholeCamera,
    bf: Optional[jax.Array] = None,
):
    """Residuals + Jacobians on the (M,R) grid for Tcw poses.

    Returns r (M,R,C), Jp (M,R,C,6), Jl (M,R,C,3) with C=2 (mono) or
    C=3 (stereo problems: third component is the u_r residual, zeroed for
    observations without a stereo match)."""
    r_cw = state.r_cw[obs.kf_idx]  # (M,R,3,3)
    t_cw = state.t_cw[obs.kf_idx]

    z6 = jnp.zeros(6, jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)

    if obs.ur is None:

        def res(dp, dl, R, t, pw, uv):
            return reproj_residual_tcw(dp, R, t, pw + dl, uv, cam)

        def per_obs(R, t, pw, uv):
            r = res(z6, z3, R, t, pw, uv)
            Jp = jax.jacfwd(res, argnums=0)(z6, z3, R, t, pw, uv)
            Jl = jax.jacfwd(res, argnums=1)(z6, z3, R, t, pw, uv)
            return r, Jp, Jl

        f = jax.vmap(
            jax.vmap(per_obs, in_axes=(0, 0, None, 0)), in_axes=(0, 0, 0, 0)
        )
        return f(r_cw, t_cw, state.points, obs.uv)

    from viorb_tpu.optim.reprojection import reproj_residual_stereo_tcw

    bf = jnp.float32(0.0) if bf is None else bf
    uvr = jnp.concatenate([obs.uv, obs.ur[..., None]], axis=-1)

    def res_s(dp, dl, R, t, pw, uvr, smask):
        r = reproj_residual_stereo_tcw(dp, R, t, pw + dl, uvr, cam, bf)
        # mask the u_r component where there is no stereo match: constant
        # wrt delta, so residual and Jacobian stay consistent
        return r * jnp.array([1.0, 1.0, 0.0]) + r * jnp.array([0.0, 0.0, 1.0]) * smask

    def per_obs_s(R, t, pw, uvr, smask):
        r = res_s(z6, z3, R, t, pw, uvr, smask)
        Jp = jax.jacfwd(res_s, argnums=0)(z6, z3, R, t, pw, uvr, smask)
        Jl = jax.jacfwd(res_s, argnums=1)(z6, z3, R, t, pw, uvr, smask)
        return r, Jp, Jl

    smask = obs.ur_valid.astype(jnp.float32)
    f = jax.vmap(
        jax.vmap(per_obs_s, in_axes=(0, 0, None, 0, 0)), in_axes=(0, 0, 0, 0, 0)
    )
    return f(r_cw, t_cw, state.points, uvr, smask)


def _vi_blocks(
    state: ViBAState, obs: BAObservations, cam: PinholeCamera, ext: Extrinsics
):
    """Same, for NavState poses. Jp is (M,R,2,15) with zero V/bias columns
    (matches the reference PVR edge's structure)."""
    p_wb = state.nav.p[obs.kf_idx]
    r_wb = state.nav.r[obs.kf_idx]

    def res(dp, dl, p, R, pw, uv):
        return reproj_residual_navstate(dp, dl, p, R, pw, uv, cam, ext)

    z9 = jnp.zeros(9, jnp.float32)
    z3 = jnp.zeros(3, jnp.float32)

    def per_obs(p, R, pw, uv):
        r = res(z9, z3, p, R, pw, uv)
        Jp9 = jax.jacfwd(res, argnums=0)(z9, z3, p, R, pw, uv)
        Jl = jax.jacfwd(res, argnums=1)(z9, z3, p, R, pw, uv)
        Jp = jnp.concatenate([Jp9, jnp.zeros((2, 6), jnp.float32)], axis=-1)
        return r, Jp, Jl

    f = jax.vmap(jax.vmap(per_obs, in_axes=(0, 0, None, 0)), in_axes=(0, 0, 0, 0))
    return f(p_wb, r_wb, state.points, obs.uv)


# ---------------------------------------------------------------------------
# Schur-complement normal equations
# ---------------------------------------------------------------------------


def _inv3x3(A):
    """Closed-form batched 3x3 inverse (adjugate / det).

    XLA's batched jnp.linalg.inv on (M,3,3) runs a general LU path that
    costs ~2 ms at M=2048 on v5e — as much as the rest of the Schur build
    combined. The damped SPD landmark blocks are well-conditioned, so the
    cofactor formula (what Eigen uses for fixed-size 3x3 in g2o's
    block_solver) is exact enough and fuses into the surrounding math."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = e * i - f * h
    c01 = c * h - b * i
    c02 = b * f - c * e
    c10 = f * g - d * i
    c11 = a * i - c * g
    c12 = c * d - a * f
    c20 = d * h - e * g
    c21 = b * g - a * h
    c22 = a * e - b * d
    det = a * c00 + b * c10 + c * c20
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def _schur_system(
    r, Jp, Jl, w, obs: BAObservations, k: int, d: int, lm_lambda
):
    """Build the reduced camera system.

    r: (M,R,2), Jp: (M,R,2,D), Jl: (M,R,2,3), w: (M,R) combined weights
    (inv_sigma2 * huber * valid). Returns (S (K*D,K*D), b (K*D,), plus the
    landmark back-substitution operators Hll_inv (M,3,3), b_l (M,3),
    U (M,R,D,3)).

    The Schur fill-in is factorized per landmark: the all-pairs sum
    sum_{r,s} Y_r U_s^T equals (sum_r Y_r)(sum_s U_s)^T with the sums
    bucketed by observing keyframe, so the whole fill-in is one
    (K*D, M*3) x (M*3, K*D) MXU matmul. The previous design materialized
    the (M,R,R,D,D) pair tensor (19-472 MB) and scatter-added 131k blocks
    with duplicate indices — TPU scatters serialize on duplicates, which
    pinned local BA at ~77 LM iters/s for three rounds. Every keyframe
    bucketing below is a one-hot contraction (matmul), no scatters."""
    m, R = obs.kf_idx.shape
    wJp = Jp * w[..., None, None]
    wJl = Jl * w[..., None, None]

    # landmark blocks, multiplicatively damped like the poses
    Hll = jnp.einsum("mrci,mrcj->mij", wJl, Jl)
    dmp = lm_lambda * jnp.maximum(jnp.einsum("mii->mi", Hll), 1e-6)  # (M,3)
    Hll = Hll + jax.vmap(jnp.diag)(dmp)
    b_l = -jnp.einsum("mrci,mrc->mi", wJl, r)
    Hll_inv = _inv3x3(Hll + 1e-8 * jnp.eye(3, dtype=r.dtype))

    # one-hot keyframe assignment (invalid obs have w=0, so whatever slot
    # their kf_idx names contributes zeros)
    onehot = (obs.kf_idx[..., None] == jnp.arange(k)).astype(r.dtype)  # (M,R,K)

    # pose diag blocks and rhs
    Hpp_blocks = jnp.einsum("mrci,mrcj->mrij", wJp, Jp)  # (M,R,D,D)
    b_p_blocks = -jnp.einsum("mrci,mrc->mri", wJp, r)  # (M,R,D)
    s_diag = jnp.einsum("mrk,mrij->kij", onehot, Hpp_blocks)  # (K,D,D)
    b = jnp.einsum("mrk,mri->ki", onehot, b_p_blocks)  # (K,D)

    # pose-landmark coupling
    U = jnp.einsum("mrci,mrcj->mrij", wJp, Jl)  # (M,R,D,3)
    Y = jnp.einsum("mrij,mjk->mrik", U, Hll_inv)  # (M,R,D,3)

    # Schur fill-in: bucket Y and U by keyframe, contract over (m, 3).
    # Chunk the landmark axis so the (Mc,K,D,3) buckets stay ~<=16 MB even
    # at GBA sizes (M=8192, K~64, D=15 would be 94 MB unchunked).
    budget = 4 * 1024 * 1024  # f32 elements per bucket buffer
    mc = m
    while mc > 1 and mc * k * d * 3 > budget:
        mc //= 2
    if m % mc:
        mc = m  # non-power-of-two M: fall back to one shot

    def fill_chunk(acc, sl):
        oh_c, y_c, u_c = sl
        wb = jnp.einsum("mrk,mric->mkic", oh_c, y_c)
        vb = jnp.einsum("mrk,mric->mkic", oh_c, u_c)
        return acc + jnp.einsum("maic,mbjc->abij", wb, vb), None

    acc0 = jnp.zeros((k, k, d, d), r.dtype)
    if mc == m:
        fill, _ = fill_chunk(acc0, (onehot, Y, U))
    else:
        n = m // mc
        fill, _ = jax.lax.scan(
            fill_chunk,
            acc0,
            (
                onehot.reshape(n, mc, R, k),
                Y.reshape(n, mc, R, d, 3),
                U.reshape(n, mc, R, d, 3),
            ),
        )

    S = -fill
    S = S.at[jnp.arange(k), jnp.arange(k)].add(s_diag)

    # b_red[a] -= sum_{obs of a} Y b_l
    yb = jnp.einsum("mrik,mk->mri", Y, b_l)
    b = b - jnp.einsum("mrk,mri->ki", onehot, yb)

    S = S.transpose(0, 2, 1, 3).reshape(k * d, k * d)
    b = b.reshape(k * d)
    return S, b, Hll_inv, b_l, U


def _solve_reduced(S, b, fixed_mask_kd, pose_lambda):
    """Damped solve with fixed poses masked out (unit rows/cols).

    Jacobi-preconditioned Cholesky + one iterative-refinement step: the
    reduced camera system mixes huge vision information (fx^2-scaled)
    with tiny IMU-only curvature along the global-scale direction; in
    f32 an unscaled factorization loses that near-null direction and the
    GBA stalls (SURVEY.md hard-part 6 — f64 normal equations on CPU,
    compensated f32 on TPU)."""
    n = S.shape[0]
    diag = jnp.diagonal(S)
    S = S + jnp.diag(pose_lambda * jnp.maximum(diag, 1e-6))
    free = ~fixed_mask_kd
    Sm = jnp.where(free[:, None] & free[None, :], S, 0.0)
    Sm = Sm + jnp.diag(jnp.where(fixed_mask_kd, 1.0, 0.0))
    bm = jnp.where(free, b, 0.0)
    # Jacobi scaling: unit diagonal
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(Sm), 1e-12))
    Sn = Sm / d[:, None] / d[None, :]
    bn = bm / d
    L = jnp.linalg.cholesky(Sn + 1e-7 * jnp.eye(n, dtype=S.dtype))
    y = jax.scipy.linalg.cho_solve((L, True), bn)
    # one refinement step on the scaled system
    r = bn - Sn @ y
    y = y + jax.scipy.linalg.cho_solve((L, True), r)
    dx = y / d
    return jnp.where(free, dx, 0.0)


def _back_substitute(Hll_inv, b_l, U, dx_pose, obs: BAObservations, d: int):
    """delta_lm = Hll^{-1} (b_l - sum_r U_r^T dx[kf_r])."""
    dxp = dx_pose.reshape(-1, d)[obs.kf_idx]  # (M,R,D)
    rhs = b_l - jnp.einsum("mrij,mri->mj", U, dxp)
    return jnp.einsum("mij,mj->mi", Hll_inv, rhs)


# ---------------------------------------------------------------------------
# vision-only BA
# ---------------------------------------------------------------------------


def _vision_cost_and_chi2(state, obs, cam, delta2, bf=None):
    r, _, _ = _vision_blocks(state, obs, cam, bf)
    chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
    w = huber_weight(chi2, delta2)
    cost = jnp.sum(jnp.where(obs.valid, chi2 * w, 0.0))
    return cost, chi2


def _apply_vision_update(state: VisionBAState, dx, dl, k, fixed_lm=None):
    from viorb_tpu.geometry.so3 import exp_so3

    dx = dx.reshape(k, 6)
    dR = exp_so3(dx[:, 3:6])
    r_new = dR @ state.r_cw
    t_new = (dR @ state.t_cw[..., None])[..., 0] + dx[:, :3]
    pts = state.points + dl
    if fixed_lm is not None:
        pts = jnp.where(fixed_lm[:, None], state.points, pts)
    return VisionBAState(r_new, t_new, pts)


@partial(jax.jit, static_argnames=("iters",))
def vision_ba(
    state: VisionBAState,
    obs: BAObservations,
    cam: PinholeCamera,
    fixed_kf: jax.Array,  # (K,) bool
    iters: int = 10,
    fixed_lm: Optional[jax.Array] = None,  # (M,) bool
    bf: Optional[jax.Array] = None,  # () fx*baseline for stereo problems
) -> Tuple[VisionBAState, jax.Array]:
    """Levenberg-Marquardt vision bundle adjustment (counterpart of
    Optimizer::LocalBundleAdjustment / BundleAdjustment,
    src/Optimizer.cc:3980/:3559). Returns (state, final per-obs chi2).
    With stereo observations (obs.ur set), pass bf = fx * baseline."""
    k = state.r_cw.shape[0]
    d = 6
    delta2 = obs.chi2_delta2()
    fixed_kd = jnp.repeat(fixed_kf, d)

    def step(carry, _):
        state, lam = carry
        r, Jp, Jl = _vision_blocks(state, obs, cam, bf)
        chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
        hw = huber_weight(chi2, delta2)
        w = obs.inv_sigma2 * hw * obs.valid.astype(r.dtype)
        cost0 = jnp.sum(jnp.where(obs.valid, chi2 * jnp.minimum(hw, 1.0), 0.0))
        S, b, Hll_inv, b_l, U = _schur_system(r, Jp, Jl, w, obs, k, d, lam)
        dx = _solve_reduced(S, b, fixed_kd, lam)
        dl = _back_substitute(Hll_inv, b_l, U, dx, obs, d)
        cand = _apply_vision_update(state, dx, dl, k, fixed_lm)
        cost1, _ = _vision_cost_and_chi2(cand, obs, cam, delta2, bf)
        accept = cost1 < cost0
        state = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), cand, state
        )
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-6), jnp.minimum(lam * 4.0, 1e4))
        return (state, lam), cost1

    (state, _), _ = jax.lax.scan(step, (state, jnp.float32(1e-4)), None, length=iters)
    _, chi2 = _vision_cost_and_chi2(state, obs, cam, delta2, bf)
    return state, chi2


def vision_ba_two_phase(
    state: VisionBAState,
    obs: BAObservations,
    cam: PinholeCamera,
    fixed_kf: jax.Array,
    iters1: int = 5,
    iters2: int = 5,
    fixed_lm: Optional[jax.Array] = None,
    bf: Optional[jax.Array] = None,
) -> Tuple[VisionBAState, BAObservations]:
    """The reference's two-round scheme: optimize, drop chi2 outliers
    (5.991 mono / 7.815 stereo), optimize again (src/Optimizer.cc
    LocalBundleAdjustment)."""
    delta2 = obs.chi2_delta2()
    state, chi2 = vision_ba(state, obs, cam, fixed_kf, iters1, fixed_lm, bf)
    obs = obs._replace(valid=obs.valid & (chi2 <= delta2 * 1.5))
    state, chi2 = vision_ba(state, obs, cam, fixed_kf, iters2, fixed_lm, bf)
    obs = obs._replace(valid=obs.valid & (chi2 <= delta2))
    return state, obs


# ---------------------------------------------------------------------------
# visual-inertial BA
# ---------------------------------------------------------------------------


class ImuChain(NamedTuple):
    """Preintegrated IMU edges between keyframe slots.

    Default (idx_i/idx_j None): K-1 consecutive segments i -> i+1 (chain
    edges as the reference attaches between prev/next KFs,
    src/LocalMapping.cc window logic).

    With explicit idx_i/idx_j (E,): arbitrary edges, e.g. MULTI-STRIDE
    composed preintegrations i -> i+s. Long edges carry the scale signal
    (~accel * dt^2 against noise ~dt^1.5) that consecutive 0.5 s edges
    barely see — the global VI BA uses them to repair mono scale drift
    (no reference counterpart; built on compose_preint). Bias random-walk
    edges apply only on stride-1 pairs."""

    pre: PreintegratedImu  # leading dim E (or K-1)
    valid: jax.Array  # (E,)
    bias_cov_inv_diag: jax.Array  # (6,) information diag of bias walk / dt
    idx_i: Optional[jax.Array] = None  # (E,) i32
    idx_j: Optional[jax.Array] = None  # (E,) i32

    def edges(self, k: int):
        if self.idx_i is None:
            i = jnp.arange(k - 1)
            return i, i + 1
        return self.idx_i, self.idx_j


def _vi_imu_system(nav: NavState, chain: ImuChain, gravity, k: int):
    """Dense (K,K,15,15) contributions from preintegration + bias edges via
    autodiff of the whitened residuals."""
    d = 15
    idx_i, idx_j = chain.edges(k)

    ns_i = jax.tree.map(lambda x: x[idx_i], nav)
    ns_j = jax.tree.map(lambda x: x[idx_j], nav)

    # padded (invalid) edges carry zero covariance: replace by I so the
    # whitener stays finite; their contributions are masked below anyway
    cov_safe = jnp.where(
        chain.valid[:, None, None], chain.pre.cov, jnp.eye(9, dtype=jnp.float32)
    )
    Lt = whitener_from_cov(cov_safe)  # (K-1,9,9)

    z15 = jnp.zeros(15, jnp.float32)
    z9 = jnp.zeros(9, jnp.float32)

    def edge(ns_i, ns_j, pre, Lt):
        def wres(di, dj9):
            return Lt @ preint_residual(di, dj9, ns_i, ns_j, pre, gravity)

        r = wres(z15, z9)
        Ji = jax.jacfwd(wres, argnums=0)(z15, z9)  # (9,15)
        Jj9 = jax.jacfwd(wres, argnums=1)(z15, z9)  # (9,9)
        Jj = jnp.concatenate([Jj9, jnp.zeros((9, 6), jnp.float32)], axis=-1)
        return r, Ji, Jj

    r, Ji, Jj = jax.vmap(edge)(ns_i, ns_j, chain.pre, Lt)

    chi2 = jnp.sum(r * r, axis=-1)
    hw = huber_weight(chi2, CHI2_VI_9DOF)
    w = (hw * chain.valid.astype(r.dtype))[:, None]

    wJi = Ji * w[..., None]
    wJj = Jj * w[..., None]

    # bias random-walk edges
    def bedge(ns_i, ns_j):
        def bres(di, dj):
            return bias_walk_residual(di, dj, ns_i, ns_j)

        rb = bres(z15, z15)
        Bi = jax.jacfwd(bres, argnums=0)(z15, z15)
        Bj = jax.jacfwd(bres, argnums=1)(z15, z15)
        return rb, Bi, Bj

    rb, Bi, Bj = jax.vmap(bedge)(ns_i, ns_j)
    # bias random walk only couples consecutive keyframes
    consec = ((idx_j - idx_i) == 1).astype(r.dtype)
    binfo = (
        chain.bias_cov_inv_diag[None, :]
        * (chain.valid.astype(r.dtype) * consec)[:, None]
    )

    H = jnp.zeros((k, k, d, d), jnp.float32)
    g = jnp.zeros((k, d), jnp.float32)

    # preint: (i,i),(i,j),(j,i),(j,j)
    H = H.at[idx_i, idx_i].add(jnp.einsum("eci,ecj->eij", wJi, Ji))
    H = H.at[idx_i, idx_j].add(jnp.einsum("eci,ecj->eij", wJi, Jj))
    H = H.at[idx_j, idx_i].add(jnp.einsum("eci,ecj->eij", wJj, Ji))
    H = H.at[idx_j, idx_j].add(jnp.einsum("eci,ecj->eij", wJj, Jj))
    g = g.at[idx_i].add(-jnp.einsum("eci,ec->ei", wJi, r))
    g = g.at[idx_j].add(-jnp.einsum("eci,ec->ei", wJj, r))

    # bias walk (diagonal info)
    H = H.at[idx_i, idx_i].add(jnp.einsum("eci,ec,ecj->eij", Bi, binfo, Bi))
    H = H.at[idx_i, idx_j].add(jnp.einsum("eci,ec,ecj->eij", Bi, binfo, Bj))
    H = H.at[idx_j, idx_i].add(jnp.einsum("eci,ec,ecj->eij", Bj, binfo, Bi))
    H = H.at[idx_j, idx_j].add(jnp.einsum("eci,ec,ecj->eij", Bj, binfo, Bj))
    g = g.at[idx_i].add(-jnp.einsum("eci,ec,ec->ei", Bi, binfo, rb))
    g = g.at[idx_j].add(-jnp.einsum("eci,ec,ec->ei", Bj, binfo, rb))

    imu_cost = jnp.sum(
        jnp.where(chain.valid, chi2 * jnp.minimum(hw, 1.0), 0.0)
    ) + jnp.sum(binfo * rb * rb)
    return H, g, imu_cost


def _vi_cost(state: ViBAState, obs, cam, ext, chain, gravity, delta2):
    r, _, _ = _vi_blocks(state, obs, cam, ext)
    chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
    hw = huber_weight(chi2, delta2)
    vis_cost = jnp.sum(jnp.where(obs.valid, chi2 * jnp.minimum(hw, 1.0), 0.0))

    cov_safe = jnp.where(
        chain.valid[:, None, None], chain.pre.cov, jnp.eye(9, dtype=jnp.float32)
    )
    Lt = whitener_from_cov(cov_safe)
    z15 = jnp.zeros(15, jnp.float32)
    z9 = jnp.zeros(9, jnp.float32)
    k_ = state.nav.p.shape[0]
    eidx_i, eidx_j = chain.edges(k_)
    ns_i = jax.tree.map(lambda x: x[eidx_i], state.nav)
    ns_j = jax.tree.map(lambda x: x[eidx_j], state.nav)
    ri = jax.vmap(
        lambda a, b, p, L: L @ preint_residual(z15, z9, a, b, p, gravity)
    )(ns_i, ns_j, chain.pre, Lt)
    ichi2 = jnp.sum(ri * ri, axis=-1)
    ihw = huber_weight(ichi2, CHI2_VI_9DOF)
    rb = jax.vmap(lambda a, b: bias_walk_residual(z15, z15, a, b))(ns_i, ns_j)
    consec_ = ((eidx_j - eidx_i) == 1).astype(ri.dtype)
    binfo = (
        chain.bias_cov_inv_diag[None, :]
        * (chain.valid.astype(ri.dtype) * consec_)[:, None]
    )
    imu_cost = jnp.sum(
        jnp.where(chain.valid, ichi2 * jnp.minimum(ihw, 1.0), 0.0)
    ) + jnp.sum(binfo * rb * rb)
    return vis_cost + imu_cost, chi2


def _apply_vi_update(state: ViBAState, dx, dl, k, fixed_lm=None):
    dx = dx.reshape(k, 15)
    nav = state.nav.inc_small(dx)
    pts = state.points + dl
    if fixed_lm is not None:
        pts = jnp.where(fixed_lm[:, None], state.points, pts)
    return ViBAState(nav, pts)


@partial(jax.jit, static_argnames=("iters",))
def vi_ba(
    state: ViBAState,
    obs: BAObservations,
    cam: PinholeCamera,
    ext: Extrinsics,
    chain: ImuChain,
    gravity: jax.Array,
    fixed_kf: jax.Array,
    iters: int = 10,
    fixed_lm: Optional[jax.Array] = None,
) -> Tuple[ViBAState, jax.Array]:
    """Visual-inertial windowed/global BA (counterpart of
    Optimizer::LocalBundleAdjustmentNavState / GlobalBundleAdjustmentNavState,
    src/Optimizer.cc:1690-2243/:50)."""
    k = state.nav.p.shape[0]
    d = 15
    delta2 = CHI2_MONO_2DOF
    fixed_kd = jnp.repeat(fixed_kf, d)

    def step(carry, _):
        state, lam = carry
        r, Jp, Jl = _vi_blocks(state, obs, cam, ext)
        chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
        hw = huber_weight(chi2, delta2)
        w = obs.inv_sigma2 * hw * obs.valid.astype(r.dtype)
        S, b, Hll_inv, b_l, U = _schur_system(r, Jp, Jl, w, obs, k, d, lam)
        Himu, gimu, imu_cost0 = _vi_imu_system(state.nav, chain, gravity, k)
        S = S + Himu.transpose(0, 2, 1, 3).reshape(k * d, k * d)
        b = b + gimu.reshape(k * d)
        # cost0 from the blocks already in hand (matches _vi_cost exactly)
        cost0 = (
            jnp.sum(jnp.where(obs.valid, chi2 * jnp.minimum(hw, 1.0), 0.0))
            + imu_cost0
        )
        dx = _solve_reduced(S, b, fixed_kd, lam)
        dl = _back_substitute(Hll_inv, b_l, U, dx, obs, d)
        cand = _apply_vi_update(state, dx, dl, k, fixed_lm)
        cost1, _ = _vi_cost(cand, obs, cam, ext, chain, gravity, delta2)
        accept = cost1 < cost0
        state = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, state)
        lam = jnp.where(
            accept, jnp.maximum(lam * 0.5, 1e-6), jnp.minimum(lam * 4.0, 1e4)
        )
        return (state, lam), cost1

    (state, _), _ = jax.lax.scan(step, (state, jnp.float32(1e-4)), None, length=iters)
    _, chi2 = _vi_cost(state, obs, cam, ext, chain, gravity, delta2)
    return state, chi2


def vi_ba_two_phase(
    state: ViBAState,
    obs: BAObservations,
    cam: PinholeCamera,
    ext: Extrinsics,
    chain: ImuChain,
    gravity: jax.Array,
    fixed_kf: jax.Array,
    iters1: int = 5,
    iters2: int = 5,
    fixed_lm: Optional[jax.Array] = None,
) -> Tuple[ViBAState, BAObservations]:
    state, chi2 = vi_ba(
        state, obs, cam, ext, chain, gravity, fixed_kf, iters1, fixed_lm
    )
    obs = obs._replace(valid=obs.valid & (chi2 <= CHI2_MONO_2DOF * 1.5))
    state, chi2 = vi_ba(
        state, obs, cam, ext, chain, gravity, fixed_kf, iters2, fixed_lm
    )
    obs = obs._replace(valid=obs.valid & (chi2 <= CHI2_MONO_2DOF))
    return state, obs


# ---------------------------------------------------------------------------
# visual-inertial BA with free gravity direction (the post-init global BA)
# ---------------------------------------------------------------------------


def _gravity_basis(g: jax.Array) -> jax.Array:
    """(3,2) orthonormal basis perpendicular to g: rotating g about these
    axes spans the 2-DoF direction manifold while |g| stays fixed (the
    reference's VertexGravityW, src/IMU/g2otypes.h:358-393)."""
    gn = g / jnp.maximum(jnp.linalg.norm(g), 1e-12)
    # pick the coordinate axis least aligned with g to seed the basis
    seed = jnp.eye(3, dtype=g.dtype)[jnp.argmin(jnp.abs(gn))]
    b1 = jnp.cross(gn, seed)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-12)
    b2 = jnp.cross(gn, b1)
    return jnp.stack([b1, b2], axis=-1)


def _vi_imu_system_gw(nav: NavState, chain: ImuChain, gravity, basis, k: int):
    """Like _vi_imu_system but the preintegration residual is also a
    function of a 2-DoF gravity-direction increment dg:
    g(dg) = Exp(basis @ dg) g. Returns (H (k,k,15,15), g_rhs (k,15),
    C (k,15,2) pose-gravity coupling, Hgg (2,2), g_g (2,))."""
    d = 15
    idx_i, idx_j = chain.edges(k)

    ns_i = jax.tree.map(lambda x: x[idx_i], nav)
    ns_j = jax.tree.map(lambda x: x[idx_j], nav)

    cov_safe = jnp.where(
        chain.valid[:, None, None], chain.pre.cov, jnp.eye(9, dtype=jnp.float32)
    )
    Lt = whitener_from_cov(cov_safe)

    z15 = jnp.zeros(15, jnp.float32)
    z9 = jnp.zeros(9, jnp.float32)
    z2 = jnp.zeros(2, jnp.float32)

    from viorb_tpu.geometry.so3 import exp_so3

    def edge(ns_i, ns_j, pre, Lt):
        def wres(di, dj9, dg):
            gvec = exp_so3(basis @ dg) @ gravity
            return Lt @ preint_residual(di, dj9, ns_i, ns_j, pre, gvec)

        r = wres(z15, z9, z2)
        Ji = jax.jacfwd(wres, argnums=0)(z15, z9, z2)  # (9,15)
        Jj9 = jax.jacfwd(wres, argnums=1)(z15, z9, z2)  # (9,9)
        Jg = jax.jacfwd(wres, argnums=2)(z15, z9, z2)  # (9,2)
        Jj = jnp.concatenate([Jj9, jnp.zeros((9, 6), jnp.float32)], axis=-1)
        return r, Ji, Jj, Jg

    r, Ji, Jj, Jg = jax.vmap(edge)(ns_i, ns_j, chain.pre, Lt)

    chi2 = jnp.sum(r * r, axis=-1)
    hw = huber_weight(chi2, CHI2_VI_9DOF)
    w = (hw * chain.valid.astype(r.dtype))[:, None]
    wJi = Ji * w[..., None]
    wJj = Jj * w[..., None]
    wJg = Jg * w[..., None]

    # bias random-walk edges (gravity-independent)
    def bedge(ns_i, ns_j):
        def bres(di, dj):
            return bias_walk_residual(di, dj, ns_i, ns_j)

        rb = bres(z15, z15)
        Bi = jax.jacfwd(bres, argnums=0)(z15, z15)
        Bj = jax.jacfwd(bres, argnums=1)(z15, z15)
        return rb, Bi, Bj

    rb, Bi, Bj = jax.vmap(bedge)(ns_i, ns_j)
    consec = ((idx_j - idx_i) == 1).astype(r.dtype)
    binfo = (
        chain.bias_cov_inv_diag[None, :]
        * (chain.valid.astype(r.dtype) * consec)[:, None]
    )

    H = jnp.zeros((k, k, d, d), jnp.float32)
    g_rhs = jnp.zeros((k, d), jnp.float32)
    C = jnp.zeros((k, d, 2), jnp.float32)

    H = H.at[idx_i, idx_i].add(jnp.einsum("eci,ecj->eij", wJi, Ji))
    H = H.at[idx_i, idx_j].add(jnp.einsum("eci,ecj->eij", wJi, Jj))
    H = H.at[idx_j, idx_i].add(jnp.einsum("eci,ecj->eij", wJj, Ji))
    H = H.at[idx_j, idx_j].add(jnp.einsum("eci,ecj->eij", wJj, Jj))
    g_rhs = g_rhs.at[idx_i].add(-jnp.einsum("eci,ec->ei", wJi, r))
    g_rhs = g_rhs.at[idx_j].add(-jnp.einsum("eci,ec->ei", wJj, r))

    C = C.at[idx_i].add(jnp.einsum("eci,ecg->eig", wJi, Jg))
    C = C.at[idx_j].add(jnp.einsum("eci,ecg->eig", wJj, Jg))
    Hgg = jnp.einsum("ecg,ech->gh", wJg, Jg)
    g_g = -jnp.einsum("ecg,ec->g", wJg, r)

    H = H.at[idx_i, idx_i].add(jnp.einsum("eci,ec,ecj->eij", Bi, binfo, Bi))
    H = H.at[idx_i, idx_j].add(jnp.einsum("eci,ec,ecj->eij", Bi, binfo, Bj))
    H = H.at[idx_j, idx_i].add(jnp.einsum("eci,ec,ecj->eij", Bj, binfo, Bi))
    H = H.at[idx_j, idx_j].add(jnp.einsum("eci,ec,ecj->eij", Bj, binfo, Bj))
    g_rhs = g_rhs.at[idx_i].add(-jnp.einsum("eci,ec,ec->ei", Bi, binfo, rb))
    g_rhs = g_rhs.at[idx_j].add(-jnp.einsum("eci,ec,ec->ei", Bj, binfo, rb))

    imu_cost = jnp.sum(
        jnp.where(chain.valid, chi2 * jnp.minimum(hw, 1.0), 0.0)
    ) + jnp.sum(binfo * rb * rb)
    return H, g_rhs, C, Hgg, g_g, imu_cost


@partial(jax.jit, static_argnames=("iters",))
def vi_ba_gw(
    state: ViBAState,
    obs: BAObservations,
    cam: PinholeCamera,
    ext: Extrinsics,
    chain: ImuChain,
    gravity: jax.Array,
    fixed_kf: jax.Array,
    iters: int = 15,
    fixed_lm: Optional[jax.Array] = None,
) -> Tuple[ViBAState, jax.Array, jax.Array]:
    """Visual-inertial global BA with a FREE 2-DoF gravity-direction vertex
    (counterpart of Optimizer::GlobalBundleAdjustmentNavStateWithGw,
    src/Optimizer.cc:2702-2760 + VertexGravityW src/IMU/g2otypes.h:358-393).

    Run as the post-init GBA: it jointly repairs the residual scale error
    (IMU edges anchor metric scale while landmarks follow the poses) and the
    gravity-direction error left by the closed-form VI init.

    Returns (state, refined gravity (3,), final per-obs chi2)."""
    k = state.nav.p.shape[0]
    d = 15
    n = k * d + 2
    delta2 = CHI2_MONO_2DOF
    # gauge-fix only P and R of the fixed KFs; their V and biases stay free
    # (the init's velocity estimate must not be baked into the GBA)
    pose_dofs = jnp.array([1, 1, 1, 0, 0, 0, 1, 1, 1, 0, 0, 0, 0, 0, 0], bool)
    fixed_ext = jnp.concatenate(
        [
            (jnp.repeat(fixed_kf, d) & jnp.tile(pose_dofs, k)),
            jnp.zeros(2, bool),
        ]
    )

    def step(carry, _):
        state, gravity, lam = carry
        basis = _gravity_basis(gravity)
        r, Jp, Jl = _vi_blocks(state, obs, cam, ext)
        chi2 = jnp.sum(r * r, axis=-1) * obs.inv_sigma2
        hw = huber_weight(chi2, delta2)
        w = obs.inv_sigma2 * hw * obs.valid.astype(r.dtype)
        S, b, Hll_inv, b_l, U = _schur_system(r, Jp, Jl, w, obs, k, d, lam)
        Himu, gimu, Cg, Hgg, gg, imu_cost0 = _vi_imu_system_gw(
            state.nav, chain, gravity, basis, k
        )
        S = S + Himu.transpose(0, 2, 1, 3).reshape(k * d, k * d)
        b = b + gimu.reshape(k * d)
        # augmented system [[S, C], [C^T, Hgg]]
        Cflat = Cg.reshape(k * d, 2)
        A = jnp.zeros((n, n), jnp.float32)
        A = A.at[: k * d, : k * d].set(S)
        A = A.at[: k * d, k * d :].set(Cflat)
        A = A.at[k * d :, : k * d].set(Cflat.T)
        A = A.at[k * d :, k * d :].set(Hgg)
        rhs = jnp.concatenate([b, gg])
        cost0 = (
            jnp.sum(jnp.where(obs.valid, chi2 * jnp.minimum(hw, 1.0), 0.0))
            + imu_cost0
        )
        dx = _solve_reduced(A, rhs, fixed_ext, lam)
        dx_pose, dg = dx[: k * d], dx[k * d :]
        dl = _back_substitute(Hll_inv, b_l, U, dx_pose, obs, d)
        cand = _apply_vi_update(state, dx_pose, dl, k, fixed_lm)
        from viorb_tpu.geometry.so3 import exp_so3

        g_cand = exp_so3(basis @ dg) @ gravity
        cost1, _ = _vi_cost(cand, obs, cam, ext, chain, g_cand, delta2)
        accept = cost1 < cost0
        state = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, state)
        gravity = jnp.where(accept, g_cand, gravity)
        lam = jnp.where(
            accept, jnp.maximum(lam * 0.5, 1e-6), jnp.minimum(lam * 4.0, 1e4)
        )
        return (state, gravity, lam), cost1

    (state, gravity, _), _ = jax.lax.scan(
        step, (state, gravity, jnp.float32(1e-4)), None, length=iters
    )
    _, chi2 = _vi_cost(state, obs, cam, ext, chain, gravity, delta2)
    return state, gravity, chi2


def vi_ba_gw_two_phase(
    state: ViBAState,
    obs: BAObservations,
    cam: PinholeCamera,
    ext: Extrinsics,
    chain: ImuChain,
    gravity: jax.Array,
    fixed_kf: jax.Array,
    iters1: int = 12,
    iters2: int = 8,
    fixed_lm: Optional[jax.Array] = None,
) -> Tuple[ViBAState, jax.Array, BAObservations]:
    state, gravity, chi2 = vi_ba_gw(
        state, obs, cam, ext, chain, gravity, fixed_kf, iters1, fixed_lm
    )
    obs = obs._replace(valid=obs.valid & (chi2 <= CHI2_MONO_2DOF * 1.5))
    state, gravity, chi2 = vi_ba_gw(
        state, obs, cam, ext, chain, gravity, fixed_kf, iters2, fixed_lm
    )
    obs = obs._replace(valid=obs.valid & (chi2 <= CHI2_MONO_2DOF))
    return state, gravity, obs
