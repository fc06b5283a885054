"""Two-view monocular initialization: batched H/F RANSAC + reconstruction.

Replaces the reference's Initializer (reference: src/Initializer.cc —
parallel H/F RANSAC threads at :104-109, model selection RH=SH/(SH+SF)>0.40
at :112-115, ReconstructH Faugeras / ReconstructF cheirality). The two
CPU threads become one vmap: all H and all F hypotheses are scored in a
single batched launch; reconstruction tests all motion candidates at once.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from viorb_tpu.geometry.camera import PinholeCamera
from viorb_tpu.solvers.triangulation import parallax_cos, triangulate_two_view

SIGMA = 1.0
TH_F = 3.841 * SIGMA**2  # chi2 0.95 1-dof
TH_H = 5.991 * SIGMA**2  # chi2 0.95 2-dof
TH_SCORE = 5.991 * SIGMA**2


def _normalize_points(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Hartley normalization; returns (xn, T) with xn = T(x)."""
    mean = jnp.mean(x, axis=0)
    d = jnp.mean(jnp.abs(x - mean), axis=0)
    s = 1.0 / jnp.maximum(d, 1e-8)
    T = jnp.array(
        [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]], x.dtype
    )
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    xn = (x - mean) * s
    return xn, T


def _fit_fundamental(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """8-point algorithm on (8,2)+(8,2) -> F (3,3) with rank-2 projection."""
    a = jnp.concatenate(
        [
            x2[:, 0:1] * x1,
            x2[:, 0:1],
            x2[:, 1:2] * x1,
            x2[:, 1:2],
            x1,
            jnp.ones((x1.shape[0], 1), x1.dtype),
        ],
        axis=1,
    )  # (8,9): [x2x1, x2y1, x2, y2x1, y2y1, y2, x1, y1, 1]
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    F = vt[8].reshape(3, 3)
    u, s, vt2 = jnp.linalg.svd(F)
    s = s.at[2].set(0.0)
    return u @ jnp.diag(s) @ vt2


def _fit_homography(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """4-point DLT on (4,2)+(4,2) -> H (3,3) with x2 ~ H x1."""
    n = x1.shape[0]
    zeros = jnp.zeros((n, 3), x1.dtype)
    ones = jnp.ones((n, 1), x1.dtype)
    p1 = jnp.concatenate([x1, ones], axis=1)  # (n,3)
    r1 = jnp.concatenate([zeros, -p1, x2[:, 1:2] * p1], axis=1)
    r2 = jnp.concatenate([p1, zeros, -x2[:, 0:1] * p1], axis=1)
    a = jnp.concatenate([r1, r2], axis=0)  # (2n,9)
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    return vt[8].reshape(3, 3)


def _f_score(F: jax.Array, x1: jax.Array, x2: jax.Array, valid) -> Tuple[jax.Array, jax.Array]:
    """Symmetric epipolar chi2 score, reference CheckFundamental."""
    p1 = jnp.concatenate([x1, jnp.ones((x1.shape[0], 1), x1.dtype)], axis=1)
    p2 = jnp.concatenate([x2, jnp.ones((x2.shape[0], 1), x2.dtype)], axis=1)
    Fx1 = p1 @ F.T  # (N,3) = F @ p1
    Ftx2 = p2 @ F  # (N,3) = F^T @ p2
    x2tFx1 = jnp.sum(p2 * Fx1, axis=1)
    d1 = x2tFx1**2 / jnp.maximum(Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2, 1e-12)
    d2 = x2tFx1**2 / jnp.maximum(Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2, 1e-12)
    ok = (d1 < TH_F) & (d2 < TH_F) & valid
    score = jnp.sum(
        jnp.where(ok, (TH_SCORE - d1) + (TH_SCORE - d2), 0.0)
    )
    return score, ok


def _h_score(H: jax.Array, x1: jax.Array, x2: jax.Array, valid) -> Tuple[jax.Array, jax.Array]:
    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3, dtype=H.dtype))

    def transfer(M, xa, xb):
        p = jnp.concatenate([xa, jnp.ones((xa.shape[0], 1), xa.dtype)], axis=1) @ M.T
        w = jnp.where(jnp.abs(p[:, 2]) < 1e-10, 1e-10, p[:, 2])
        return jnp.sum((p[:, :2] / w[:, None] - xb) ** 2, axis=1)

    d12 = transfer(H, x1, x2)
    d21 = transfer(Hinv, x2, x1)
    ok = (d12 < TH_H) & (d21 < TH_H) & valid
    score = jnp.sum(jnp.where(ok, (TH_SCORE - d12) + (TH_SCORE - d21), 0.0))
    return score, ok


class TwoViewResult(NamedTuple):
    success: jax.Array  # () bool
    r_cw2: jax.Array  # (3,3) pose of view 2 (view 1 = identity)
    t_cw2: jax.Array  # (3,) unit-ish translation (scale-free)
    points: jax.Array  # (N,3) triangulated (garbage where ~inlier)
    is_inlier: jax.Array  # (N,) bool triangulated inliers
    used_h: jax.Array  # () bool


def _motion_candidates_from_e(E: jax.Array):
    """E -> 4 (R,t) candidates (reference DecomposeE)."""
    u, _, vt = jnp.linalg.svd(E)
    # enforce det(U), det(V) = +1
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _motion_candidates_from_h(A: jax.Array):
    """Faugeras decomposition of calibrated homography A = K^-1 H K ->
    8 (R,t,n) candidates (reference ReconstructH, src/Initializer.cc)."""
    u, s, vt = jnp.linalg.svd(A)
    V = vt.T
    detUV = jnp.linalg.det(u) * jnp.linalg.det(V)
    d1, d2, d3 = s[0], s[1], s[2]

    # normalized by d2
    a2 = (d1 / d2) ** 2
    c2 = (d3 / d2) ** 2
    x1 = jnp.sqrt(jnp.maximum((a2 - 1.0) / (a2 - c2), 0.0))
    x3 = jnp.sqrt(jnp.maximum((1.0 - c2) / (a2 - c2), 0.0))

    d1n, d3n = d1 / d2, d3 / d2

    def build(eps1, eps3, dprime_pos):
        # dprime_pos: d' = +d2 case (rotation about x2 axis)
        if dprime_pos:
            sin_t = (d1n - d3n) * x1 * x3  # actually (d1-d3)/d2 * x1*x3
            cos_t = (d1n * x3 * x3 + d3n * x1 * x1)
            # normalize (cos,sin) since d1n*x3^2 + d3n*x1^2 may not be unit
            nrm = jnp.sqrt(sin_t**2 * 0 + 1.0)  # cos^2+sin^2=1 analytically
            Rp = jnp.array(
                [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], A.dtype
            )
            st = eps1 * eps3 * sin_t
            Rp = Rp.at[0, 0].set(cos_t).at[0, 2].set(-st)
            Rp = Rp.at[2, 0].set(st).at[2, 2].set(cos_t)
            tp = jnp.array([eps1 * x1, 0.0, -eps3 * x3], A.dtype) * (d1n - d3n)
            np_ = jnp.array([eps1 * x1, 0.0, eps3 * x3], A.dtype)
            R = detUV * u @ Rp @ vt
            t = u @ tp
            n = V @ np_
        else:
            # d' = -d2 case (rotation by pi about x2 + reflection)
            sin_p = (d1n + d3n) * x1 * x3
            cos_p = (d3n * x1 * x1 - d1n * x3 * x3)
            sp = eps1 * eps3 * sin_p
            Rp = jnp.array(
                [[1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, -1.0]], A.dtype
            )
            Rp = Rp.at[0, 0].set(cos_p).at[0, 2].set(sp)
            Rp = Rp.at[2, 0].set(sp).at[2, 2].set(-cos_p)
            tp = jnp.array([eps1 * x1, 0.0, eps3 * x3], A.dtype) * (d1n + d3n)
            np_ = jnp.array([eps1 * x1, 0.0, eps3 * x3], A.dtype)
            R = detUV * u @ Rp @ vt
            t = u @ tp
            n = V @ np_
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        return R, t

    Rs, ts = [], []
    for dp in (True, False):
        for e1 in (1.0, -1.0):
            for e3 in (1.0, -1.0):
                R, t = build(e1, e3, dp)
                Rs.append(R)
                ts.append(t)
    return jnp.stack(Rs), jnp.stack(ts)


def _check_motion(
    R: jax.Array,
    t: jax.Array,
    x1n: jax.Array,  # (N,2) normalized (K^-1) coords view1
    x2n: jax.Array,
    inlier: jax.Array,
    cam_sigma2: float = 1.0,
):
    """Triangulate with (I|0),(R|t) in normalized coords; count points with
    positive depth in both views, bounded reprojection error, and parallax
    (reference CheckRT)."""
    P1 = jnp.concatenate([jnp.eye(3, dtype=R.dtype), jnp.zeros((3, 1), R.dtype)], 1)
    P2 = jnp.concatenate([R, t[:, None]], 1)
    X = triangulate_two_view(P1[None], P2[None], x1n, x2n)  # (N,3)
    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]
    c1 = jnp.zeros(3, R.dtype)
    c2 = -R.T @ t
    cosp = parallax_cos(c1, c2, X)
    # reprojection in normalized coords; scale threshold ~ (2px/f)^2
    e1 = jnp.sum((X[:, :2] / jnp.maximum(z1, 1e-9)[:, None] - x1n) ** 2, axis=1)
    e2 = jnp.sum(
        (Xc2[:, :2] / jnp.maximum(z2, 1e-9)[:, None] - x2n) ** 2, axis=1
    )
    th = 4.0 * cam_sigma2
    good = (
        inlier
        & (z1 > 0)
        & (z2 > 0)
        & (cosp < 0.99998)
        & (e1 < th)
        & (e2 < th)
    )
    return good, X, cosp


@partial(jax.jit, static_argnames=("n_hypotheses",))
def two_view_init(
    x1: jax.Array,  # (N,2) undistorted pixel matches in frame 1
    x2: jax.Array,  # (N,2) matches in frame 2
    valid: jax.Array,  # (N,) bool
    cam: PinholeCamera,
    key: jax.Array,
    n_hypotheses: int = 256,
) -> TwoViewResult:
    """Full monocular initialization (reference Initializer::Initialize,
    src/Initializer.cc:44): batched RANSAC of H and F, RH model selection,
    motion reconstruction with cheirality voting."""
    n = x1.shape[0]
    dtype = x1.dtype
    x1n_, T1 = _normalize_points(x1)
    x2n_, T2 = _normalize_points(x2)

    # --- hypotheses ---
    keys = jax.random.split(key, n_hypotheses)
    # weighted sampling of valid indices: sample uniformly from all, padded
    # rows contribute degenerate models that simply score poorly
    p = valid.astype(dtype)
    p = p / jnp.maximum(jnp.sum(p), 1.0)

    def sample_idx(k, m):
        return jax.random.choice(k, n, shape=(m,), replace=False, p=p)

    def h_hypo(k):
        idx = sample_idx(k, 4)
        H = _fit_homography(x1n_[idx], x2n_[idx])
        Hp = jnp.linalg.inv(T2) @ H @ T1  # denormalize: x2 = T2^-1 H T1 x1
        return _h_score(Hp, x1, x2, valid)[0], Hp

    def f_hypo(k):
        idx = sample_idx(k, 8)
        F = _fit_fundamental(x1n_[idx], x2n_[idx])
        Fp = T2.T @ F @ T1
        return _f_score(Fp, x1, x2, valid)[0], Fp

    h_scores, Hs = jax.vmap(h_hypo)(keys)
    f_scores, Fs = jax.vmap(f_hypo)(keys)
    bh = jnp.argmax(h_scores)
    bf = jnp.argmax(f_scores)
    SH, H = h_scores[bh], Hs[bh]
    SF, F = f_scores[bf], Fs[bf]
    _, h_inl = _h_score(H, x1, x2, valid)
    _, f_inl = _f_score(F, x1, x2, valid)

    RH = SH / jnp.maximum(SH + SF, 1e-9)
    use_h = RH > 0.40

    # --- reconstruction ---
    K = cam.K.astype(dtype)
    Kinv = jnp.linalg.inv(K)
    # normalized image coords
    x1n = (jnp.concatenate([x1, jnp.ones((n, 1), dtype)], 1) @ Kinv.T)[:, :2]
    x2n = (jnp.concatenate([x2, jnp.ones((n, 1), dtype)], 1) @ Kinv.T)[:, :2]

    E = K.T @ F @ K
    Rs_f, ts_f = _motion_candidates_from_e(E)  # (4,..)
    A = Kinv @ H @ K
    Rs_h, ts_h = _motion_candidates_from_h(A)  # (8,..)
    # evaluate all 12 candidates; gate by which model was selected
    Rs_all = jnp.concatenate([Rs_f, Rs_h])  # (12,3,3)
    ts_all = jnp.concatenate([ts_f, ts_h])
    model_mask = jnp.concatenate(
        [jnp.full(4, True), jnp.full(8, False)]
    )  # True = from F
    inl = jnp.where(use_h, h_inl, f_inl)
    sigma_n = (SIGMA / cam.fx) ** 2

    goods, Xs, cosps = jax.vmap(
        lambda R, t: _check_motion(R, t, x1n, x2n, inl, sigma_n)
    )(Rs_all, ts_all)
    counts = jnp.sum(goods, axis=1)  # (12,)
    # keep only candidates of the selected model (model_mask True = from F)
    counts = jnp.where(model_mask == use_h, -1, counts)
    best = jnp.argmax(counts)
    n_good = counts[best]
    n_inl = jnp.sum(inl)

    # acceptance like the reference: enough points, clear winner, parallax
    second = jnp.max(jnp.where(jnp.arange(12) == best, -1, counts))
    ok = (
        (n_good >= 30)
        & (n_good > 0.8 * n_inl)
        & (second < 0.75 * n_good)
    )

    return TwoViewResult(
        success=ok,
        r_cw2=Rs_all[best],
        t_cw2=ts_all[best],
        points=Xs[best],
        is_inlier=goods[best],
        used_h=use_h,
    )
