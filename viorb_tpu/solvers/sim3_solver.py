"""Batched Sim3 RANSAC (Horn closed form), for loop-closure verification.

Replaces the reference's Sim3Solver (reference: src/Sim3Solver.cc,
Horn's absolute-orientation from 3 correspondences inside RANSAC at
include/Sim3Solver.h:45-56). All hypotheses run in one vmap.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from viorb_tpu.geometry.so3 import matrix_to_quat, quat_to_matrix


class Sim3Result(NamedTuple):
    success: jax.Array
    s: jax.Array
    r: jax.Array  # (3,3) maps frame-2 coords into frame-1
    t: jax.Array
    inliers: jax.Array


def horn_sim3(p1: jax.Array, p2: jax.Array, fix_scale: bool = False):
    """Closed-form Sim3 aligning p2 -> p1, both (M,3), M>=3 (Horn 1987,
    quaternion method — same algorithm as the reference's ComputeSim3)."""
    c1 = jnp.mean(p1, axis=0)
    c2 = jnp.mean(p2, axis=0)
    q1 = p1 - c1
    q2 = p2 - c2
    M = q2.T @ q1  # (3,3) correlation (aligning 2 into 1)
    # quaternion from the 4x4 N matrix (max eigenvector)
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ],
        p1.dtype,
    )
    w, v = jnp.linalg.eigh(N)
    q = v[:, 3]  # largest eigenvalue
    R = quat_to_matrix(q)
    if fix_scale:
        s = jnp.float32(1.0)
    else:
        num = jnp.sum(q1 * (q2 @ R.T))
        den = jnp.sum(q2 * q2)
        s = num / jnp.maximum(den, 1e-12)
    t = c1 - s * (R @ c2)
    return s, R, t


@partial(jax.jit, static_argnames=("n_hypotheses", "fix_scale"))
def sim3_ransac(
    p1: jax.Array,  # (N,3) points in frame-1 camera coords
    p2: jax.Array,  # (N,3) corresponding points in frame-2 camera coords
    valid: jax.Array,
    key: jax.Array,
    n_hypotheses: int = 128,
    inlier_th: float = 0.05,
    fix_scale: bool = False,
    min_inliers: int = 20,
) -> Sim3Result:
    n = p1.shape[0]
    p = valid.astype(p1.dtype)
    p = p / jnp.maximum(jnp.sum(p), 1.0)

    def hypo(k):
        idx = jax.random.choice(k, n, shape=(3,), replace=False, p=p)
        s, R, t = horn_sim3(p1[idx], p2[idx], fix_scale)
        pred = s * (p2 @ R.T) + t
        # relative error gate (the reference gates by reprojection chi2;
        # in 3D we use distance relative to depth)
        err = jnp.linalg.norm(pred - p1, axis=1)
        scale_ref = jnp.maximum(jnp.linalg.norm(p1, axis=1), 1e-6)
        inl = valid & (err < inlier_th * scale_ref)
        return jnp.sum(inl), s, R, t, inl

    keys = jax.random.split(key, n_hypotheses)
    counts, ss, Rs, ts, inls = jax.vmap(hypo)(keys)
    best = jnp.argmax(counts)
    # refine with all inliers of the best hypothesis
    inl = inls[best]
    w = inl.astype(p1.dtype)[:, None]
    cnt = jnp.maximum(jnp.sum(inl), 3)
    # weighted Horn on inliers (masked by replicating centroid for outliers)
    c1 = jnp.sum(p1 * w, axis=0) / cnt
    c2 = jnp.sum(p2 * w, axis=0) / cnt
    s_r, R_r, t_r = horn_sim3(
        jnp.where(inl[:, None], p1, c1), jnp.where(inl[:, None], p2, c2), fix_scale
    )
    return Sim3Result(
        success=counts[best] >= min_inliers,
        s=s_r,
        r=R_r,
        t=t_r,
        inliers=inl,
    )
