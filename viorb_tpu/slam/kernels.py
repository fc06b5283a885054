"""Jitted device kernels for the SLAM front end.

These are the per-frame hot paths of the reference's Tracking thread
(SearchByProjection / SearchForTriangulation / isInFrustum; reference:
src/ORBmatcher.cc, src/Frame.cc:449 isInFrustum) as fixed-shape batched
programs: project-all, gate-all, one MXU Hamming matmul, masked argmin.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from viorb_tpu.features.matching import (
    hamming_matrix,
    match_with_mask,
    valid_gate,
)
from viorb_tpu.geometry.camera import PinholeCamera, in_image_mask, project


class ProjectionMatches(NamedTuple):
    point_for_feat: jax.Array  # (Nf,) best point row per frame feature (-1)
    dist: jax.Array  # (Nf,)
    n_matches: jax.Array  # ()


@partial(jax.jit, static_argnames=("max_dist",))
def match_by_projection(
    pts_xyz: jax.Array,  # (Np,3) world
    pts_desc: jax.Array,  # (Np,256) {-1,1} bf16
    pts_valid: jax.Array,  # (Np,)
    pts_normal: jax.Array,  # (Np,3)
    pts_min_dist: jax.Array,  # (Np,)
    pts_max_dist: jax.Array,  # (Np,)
    r_cw: jax.Array,
    t_cw: jax.Array,
    feat_xy: jax.Array,  # (Nf,2)
    feat_desc: jax.Array,  # (Nf,256)
    feat_valid: jax.Array,
    cam: PinholeCamera,
    radius: jax.Array,  # () search window px
    max_dist: float = 50.0,
):
    """The reference's Tracking::SearchLocalPoints + SearchByProjection in
    one launch: frustum-check all points, project, window-gate against all
    features, Hamming-match, mutual best."""
    pc = pts_xyz @ r_cw.T + t_cw
    depth = pc[:, 2]
    uv = project(cam, pc)
    c_w = -r_cw.T @ t_cw
    view_dir = pts_xyz - c_w
    dist = jnp.linalg.norm(view_dir, axis=1)
    # viewing angle vs normal < 60 deg (reference isInFrustum)
    cos_view = jnp.sum(view_dir * pts_normal, axis=1) / jnp.maximum(dist, 1e-9)
    frustum = (
        pts_valid
        & (depth > 0.05)
        & in_image_mask(cam, uv, margin=1.0)
        & (cos_view > 0.5)
        & (dist >= 0.8 * pts_min_dist)
        & (dist <= 1.2 * pts_max_dist)
    )
    # distance matrix points x features
    d = hamming_matrix(pts_desc, feat_desc)
    d2 = jnp.sum((uv[:, None, :] - feat_xy[None, :, :]) ** 2, axis=-1)
    gate = (
        frustum[:, None]
        & feat_valid[None, :]
        & (d2 <= radius * radius)
    )
    res = match_with_mask(d, gate, max_dist=max_dist, ratio=0.9, mutual=True)
    # invert: per-feature point index
    nf = feat_xy.shape[0]
    np_ = pts_xyz.shape[0]
    point_for_feat = jnp.full((nf,), -1, jnp.int32)
    rows = jnp.arange(np_, dtype=jnp.int32)
    ok = res.idx >= 0
    point_for_feat = point_for_feat.at[jnp.where(ok, res.idx, nf)].set(
        jnp.where(ok, rows, -1), mode="drop"
    )
    n = jnp.sum(ok)
    visible = frustum
    return point_for_feat, res, n, visible


def unpack_desc_bits(bits: jax.Array) -> jax.Array:
    """(N,32) uint8 packed bits (numpy packbits bitorder='little') ->
    (N,256) uint8 {0,1}. Descriptor uploads over a remote-attached chip
    ship 8x fewer bytes and unpack on device."""
    b = (
        bits[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)[None, None, :]
    ) & jnp.uint8(1)
    return b.reshape(bits.shape[0], 256)


@jax.jit
def unpack_local_map(
    packed: jax.Array,  # (M,8) f32: xyz | normal | dmin | dmax
    desc_bits: jax.Array,  # (M,32) uint8 packed descriptor bits
    valid: jax.Array,  # (M,)
):
    """Split the packed local-map upload into the argument tuple the
    fused tracking cores take (xyz, desc_pm1, valid, normal, dmin, dmax).
    Three small host->device transfers instead of six (one of them 1 MB)
    per map epoch."""
    desc01 = unpack_desc_bits(desc_bits)
    desc_pm1 = (desc01.astype(jnp.bfloat16) * 2 - 1) * valid[:, None].astype(
        jnp.bfloat16
    )
    return (
        packed[:, 0:3], desc_pm1, valid, packed[:, 3:6], packed[:, 6],
        packed[:, 7],
    )


@jax.jit
def fuse_match_gathered(
    pt_packed: jax.Array,  # (U,8) f32 union payload: xyz|normal|dmin|dmax
    pt_desc_bits: jax.Array,  # (U,32) uint8 packed bits
    pt_valid: jax.Array,  # (U,)
    sel: jax.Array,  # (S,) int32 rows of the union for THIS pair, -1 pad
    r_cw: jax.Array,
    t_cw: jax.Array,
    kf_xy: jax.Array,
    kf_desc_pm1: jax.Array,
    kf_valid: jax.Array,
    cam: PinholeCamera,
    radius: jax.Array,
):
    """Fuse-projection matching where the (mutable) point payload is the
    per-JOB union, uploaded once, and each pair selects its subset on
    device — per-pair transfer cost collapses to one tiny index vector."""
    ok = sel >= 0
    s = jnp.maximum(sel, 0)
    packed = pt_packed[s]
    desc01 = unpack_desc_bits(pt_desc_bits[s])
    valid = pt_valid[s] & ok
    desc_pm1 = (desc01.astype(jnp.bfloat16) * 2 - 1) * valid[:, None].astype(
        jnp.bfloat16
    )
    return match_by_projection(
        packed[:, 0:3], desc_pm1, valid, packed[:, 3:6], packed[:, 6],
        packed[:, 7], r_cw, t_cw, kf_xy, kf_desc_pm1, kf_valid, cam, radius,
    )


@jax.jit
def fundamental_from_poses(
    r1: jax.Array, t1: jax.Array, r2: jax.Array, t2: jax.Array, K: jax.Array
):
    """F12 such that x2^T F x1 = 0 for pixel coords (reference
    LocalMapping::ComputeF12)."""
    # relative pose: cam1 <- world <- cam2
    R12 = r1 @ r2.T
    t12 = -R12 @ t2 + t1
    tx = jnp.array(
        [
            [0.0, -t12[2], t12[1]],
            [t12[2], 0.0, -t12[0]],
            [-t12[1], t12[0], 0.0],
        ],
        r1.dtype,
    )
    Kinv = jnp.linalg.inv(K)
    E = tx @ R12  # x1_c^T E x2_c
    return Kinv.T @ E @ Kinv  # x1^T F x2 ... note orientation below


@partial(jax.jit, static_argnames=("max_dist",))
def match_for_triangulation(
    xy1: jax.Array,  # (N,2) features of KF1 (no map point)
    desc1: jax.Array,
    free1: jax.Array,  # (N,) bool: valid & unmatched
    xy2: jax.Array,
    desc2: jax.Array,
    free2: jax.Array,
    F12: jax.Array,  # x1^T F12 x2 = 0
    max_dist: float = 50.0,
    epi_th: float = 3.84,
):
    """Epipolar-gated Hamming matching (reference
    ORBmatcher::SearchForTriangulation)."""
    n1 = xy1.shape[0]
    n2 = xy2.shape[0]
    p1 = jnp.concatenate([xy1, jnp.ones((n1, 1), xy1.dtype)], 1)
    p2 = jnp.concatenate([xy2, jnp.ones((n2, 1), xy2.dtype)], 1)
    # epipolar line of x2 in image 1: l1 = F12 @ x2; distance of x1 to l1
    l1 = p2 @ F12.T  # (N2,3)
    num = (p1 @ l1.T) ** 2  # (N1,N2)
    den = jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)[None, :]
    epi2 = num / den
    gate = valid_gate(free1, free2) & (epi2 < epi_th**2 * 1.0)
    d = hamming_matrix(desc1, desc2)
    return match_with_mask(d, gate, max_dist=max_dist, ratio=0.8, mutual=True)


@jax.jit
def project_depth(r_cw, t_cw, xyz, cam: PinholeCamera):
    pc = xyz @ r_cw.T + t_cw
    return project(cam, pc), pc[:, 2]


@jax.jit
def triangulate_between(
    r1: jax.Array,  # (3,3) pose of KF1
    t1: jax.Array,
    xy1: jax.Array,  # (N1,2) undistorted keypoints
    lv1: jax.Array,  # (N1,) pyramid level
    desc1_01: jax.Array,  # (N1,256) uint8 {0,1}
    free1: jax.Array,  # (N1,) valid & unbound
    r2: jax.Array,
    t2: jax.Array,
    xy2: jax.Array,
    lv2: jax.Array,
    desc2_01: jax.Array,
    free2: jax.Array,
    cam: PinholeCamera,
    sigma2: jax.Array,  # (L,) per-level variance factors
):
    """The whole CreateNewMapPoints compute for one keyframe pair as ONE
    static-shape program: epipolar-gated Hamming matching, batched DLT
    triangulation of EVERY feature slot (masked), and the acceptance
    checks (depth / chi2 reprojection / parallax) — reference
    LocalMapping::CreateNewMapPoints, src/LocalMapping.cc:1235.

    Static shapes matter doubly on TPU: the previous host-stepped version
    triangulated `len(matches)` rows, which recompiled the XLA program for
    every distinct match count (seconds each over a remote-attached chip);
    this one compiles once per feature capacity and needs a single
    device->host pull of (idx, X, good).
    """
    from viorb_tpu.solvers import projection_matrix, triangulate_two_view

    d1 = desc1_01.astype(jnp.bfloat16) * 2 - 1
    d2 = desc2_01.astype(jnp.bfloat16) * 2 - 1
    F12 = fundamental_from_poses(r1, t1, r2, t2, cam.K)
    res = match_for_triangulation(xy1, d1, free1, xy2, d2, free2, F12)
    idx = res.idx  # (N1,) match in KF2 or -1
    j = jnp.maximum(idx, 0)
    n1 = xy1.shape[0]
    P1 = projection_matrix(cam.K, r1, t1)
    P2 = projection_matrix(cam.K, r2, t2)
    X = triangulate_two_view(
        jnp.broadcast_to(P1, (n1, 3, 4)),
        jnp.broadcast_to(P2, (n1, 3, 4)),
        xy1,
        xy2[j],
    )
    pc1 = X @ r1.T + t1
    pc2 = X @ r2.T + t2
    uv1 = project(cam, pc1)
    uv2 = project(cam, pc2)
    e1 = jnp.sum((uv1 - xy1) ** 2, axis=-1)
    e2 = jnp.sum((uv2 - xy2[j]) ** 2, axis=-1)
    th1 = 5.991 * sigma2[lv1]
    th2 = 5.991 * sigma2[lv2[j]]
    c1 = -r1.T @ t1
    c2 = -r2.T @ t2
    ray1 = X - c1
    ray2 = X - c2
    cosp = jnp.sum(ray1 * ray2, axis=-1) / jnp.maximum(
        jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1), 1e-12
    )
    good = (
        (idx >= 0)
        & (pc1[:, 2] > 0.05)
        & (pc2[:, 2] > 0.05)
        & (e1 < th1)
        & (e2 < th2)
        & (cosp < 0.9998)
    )
    return idx, X, good


@partial(jax.jit, static_argnames=("max_dist",))
def match_stereo(
    xy_l: jax.Array,  # (Nl,2) left keypoints (undistorted/rectified)
    desc_l: jax.Array,  # (Nl,256) {-1,1} bf16
    valid_l: jax.Array,
    level_l: jax.Array,  # (Nl,)
    xy_r: jax.Array,  # (Nr,2) right keypoints
    desc_r: jax.Array,
    valid_r: jax.Array,
    level_r: jax.Array,
    min_disp: jax.Array,  # ()
    max_disp: jax.Array,  # ()
    max_dist: float = 50.0,
):
    """Rectified stereo matching: one masked Hamming matmul over all
    left x right pairs, gated to the same scan line (row window grows with
    pyramid level) and a disparity range (the TPU reshape of
    Frame::ComputeStereoMatches, reference src/Frame.cc:646 — which walks
    per-row candidate lists; here the full gate matrix is one fused op).

    Returns (ur (Nl,) f32 right u per left feature, matched (Nl,) bool)."""
    row_tol = 2.0 * jnp.power(1.2, level_l.astype(jnp.float32))  # (Nl,)
    dv = jnp.abs(xy_l[:, None, 1] - xy_r[None, :, 1])
    disp = xy_l[:, None, 0] - xy_r[None, :, 0]
    dlev = jnp.abs(level_l[:, None] - level_r[None, :])
    gate = (
        valid_l[:, None]
        & valid_r[None, :]
        & (dv <= row_tol[:, None])
        & (disp >= min_disp)
        & (disp <= max_disp)
        & (dlev <= 1)
    )
    d = hamming_matrix(desc_l, desc_r)
    res = match_with_mask(d, gate, max_dist=max_dist, ratio=0.9, mutual=True)
    matched = res.idx >= 0
    ur = jnp.where(matched, xy_r[jnp.maximum(res.idx, 0), 0], -1.0)
    return ur, matched


_SUBPIX_HALF = 5  # 11x11 SAD window
_SUBPIX_SEARCH = 3  # +-3 px around the descriptor match


@jax.jit
def refine_stereo_subpixel(
    img_l: jax.Array,  # (H,W) f32 left image (rectified)
    img_r: jax.Array,  # (H,W) f32 right image
    xy_l: jax.Array,  # (N,2) left keypoints
    ur0: jax.Array,  # (N,) integer-keypoint right u from match_stereo
    matched: jax.Array,  # (N,) bool
):
    """Subpixel disparity: SAD of an 11x11 patch over +-3 px around the
    matched right column, parabola fit on the minimum (the reference's
    correlation refinement inside Frame::ComputeStereoMatches,
    src/Frame.cc:646 — there SAD runs on pyramid level patches with a
    +-5 window and parabola interpolation).

    Keypoint disparities are integer-quantized (~0.5 px) which is 5-10%
    depth error at far range; this brings it to ~0.1 px. Per-keypoint
    dynamic-slice patches keep the op K*patch-sized (TPU-friendly; see
    features/orb.py extract_patches note).

    Returns refined ur (N,) f32 (-1 where unmatched)."""
    h = _SUBPIX_HALF
    s = _SUBPIX_SEARCH
    win = 2 * h + 1
    pad = h + s + 1
    pl = jnp.pad(img_l, pad, mode="edge")
    pr = jnp.pad(img_r, pad, mode="edge")

    yy = jnp.round(xy_l[:, 1]).astype(jnp.int32) + pad
    xl = jnp.round(xy_l[:, 0]).astype(jnp.int32) + pad
    xr = jnp.round(ur0).astype(jnp.int32) + pad

    def one(y, xl_i, xr_i):
        patch_l = jax.lax.dynamic_slice(pl, (y - h, xl_i - h), (win, win))
        wide_r = jax.lax.dynamic_slice(
            pr, (y - h, xr_i - h - s), (win, win + 2 * s)
        )
        # 2s+1 shifted views of the wide right patch -> SAD profile
        sads = jnp.stack(
            [
                jnp.sum(jnp.abs(patch_l - wide_r[:, d : d + win]))
                for d in range(2 * s + 1)
            ]
        )
        return sads

    sads = jax.vmap(one)(yy, xl, xr)  # (N, 2s+1)
    best = jnp.argmin(sads, axis=1)
    interior = (best > 0) & (best < 2 * s)
    bi = jnp.clip(best, 1, 2 * s - 1)
    idx = jnp.arange(sads.shape[0])
    s0 = sads[idx, bi]
    sm = sads[idx, bi - 1]
    sp = sads[idx, bi + 1]
    denom = sm - 2.0 * s0 + sp
    frac = jnp.where(
        jnp.abs(denom) > 1e-6, 0.5 * (sm - sp) / jnp.maximum(denom, 1e-6), 0.0
    )
    frac = jnp.clip(frac, -1.0, 1.0)
    off = jnp.where(interior, bi.astype(jnp.float32) - s + frac, 0.0)
    ur = jnp.round(ur0) + off
    return jnp.where(matched, ur, -1.0)
