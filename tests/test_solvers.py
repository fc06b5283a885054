"""Solver tests: triangulation, two-view init (general + planar scenes),
PnP RANSAC with outliers, Sim3 Horn + RANSAC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viorb_tpu.geometry.camera import PinholeCamera, project
from viorb_tpu.geometry.so3 import exp_so3
from viorb_tpu.solvers import (
    horn_sim3,
    pnp_ransac,
    projection_matrix,
    sim3_ransac,
    triangulate_two_view,
    two_view_init,
)

CAM = PinholeCamera(fx=450.0, fy=450.0, cx=376.0, cy=240.0, width=752, height=480)


def world_points(rng, n, depth=(4.0, 10.0), planar=False):
    if planar:
        z = np.full(n, 6.0)
    else:
        z = rng.uniform(*depth, n)
    return np.stack(
        [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), z], axis=1
    ).astype(np.float32)


def test_triangulation_exact(rng):
    pts = world_points(rng, 50)
    R2 = np.asarray(exp_so3(jnp.asarray([0.02, -0.05, 0.01])))
    t2 = np.array([-0.5, 0.05, 0.0], np.float32)
    K = np.asarray(CAM.K)
    P1 = np.asarray(projection_matrix(jnp.asarray(K), jnp.eye(3), jnp.zeros(3)))
    P2 = np.asarray(projection_matrix(jnp.asarray(K), jnp.asarray(R2), jnp.asarray(t2)))
    uv1 = np.asarray(project(CAM, jnp.asarray(pts)))
    uv2 = np.asarray(project(CAM, jnp.asarray(pts @ R2.T + t2)))
    X = triangulate_two_view(
        jnp.broadcast_to(jnp.asarray(P1), (50, 3, 4)),
        jnp.broadcast_to(jnp.asarray(P2), (50, 3, 4)),
        jnp.asarray(uv1),
        jnp.asarray(uv2),
    )
    np.testing.assert_allclose(np.asarray(X), pts, atol=1e-2)


@pytest.mark.parametrize("planar", [False, True])
def test_two_view_init(rng, planar):
    n = 200
    pts = world_points(rng, n, planar=planar)
    R2 = np.asarray(exp_so3(jnp.asarray([0.02, -0.04, 0.01])))
    t2 = np.array([-0.6, 0.05, 0.02], np.float32)
    uv1 = np.asarray(project(CAM, jnp.asarray(pts))).copy()
    uv2 = np.asarray(project(CAM, jnp.asarray(pts @ R2.T + t2))).copy()
    uv1 += rng.normal(size=uv1.shape) * 0.3
    uv2 += rng.normal(size=uv2.shape) * 0.3
    valid = np.ones(n, bool)
    res = two_view_init(
        jnp.asarray(uv1.astype(np.float32)),
        jnp.asarray(uv2.astype(np.float32)),
        jnp.asarray(valid),
        CAM,
        jax.random.PRNGKey(0),
    )
    assert bool(res.success), f"init failed (planar={planar})"
    if planar:
        assert bool(res.used_h)
    # rotation recovered; translation up to scale
    np.testing.assert_allclose(np.asarray(res.r_cw2), R2, atol=2e-2)
    t_est = np.asarray(res.t_cw2)
    t_dir = t2 / np.linalg.norm(t2)
    cos = np.abs(np.dot(t_est / np.linalg.norm(t_est), t_dir))
    assert cos > 0.995, f"translation direction off: {cos}"
    # triangulated structure matches up to scale
    X = np.asarray(res.points)
    inl = np.asarray(res.is_inlier)
    assert inl.sum() > 0.7 * n
    scale = np.median(X[inl, 2] / pts[inl, 2])
    np.testing.assert_allclose(X[inl] / scale, pts[inl], atol=0.3, rtol=0.1)


def test_pnp_ransac_with_outliers(rng):
    n = 100
    pts = world_points(rng, n)
    R = np.asarray(exp_so3(jnp.asarray([0.1, -0.2, 0.05])))
    t = np.array([0.3, -0.1, 0.4], np.float32)
    uv = np.asarray(project(CAM, jnp.asarray(pts @ R.T + t))).copy()
    uv += rng.normal(size=uv.shape) * 0.5
    # 30% outliers
    n_out = 30
    uv[:n_out] = rng.uniform(0, 480, size=(n_out, 2))
    res = pnp_ransac(
        jnp.asarray(pts),
        jnp.asarray(uv.astype(np.float32)),
        jnp.ones(n, bool),
        CAM,
        jax.random.PRNGKey(1),
    )
    assert bool(res.success)
    np.testing.assert_allclose(np.asarray(res.r_cw), R, atol=3e-2)
    np.testing.assert_allclose(np.asarray(res.t_cw), t, atol=1e-1)
    inl = np.asarray(res.inliers)
    assert inl[n_out:].mean() > 0.8
    assert inl[:n_out].mean() < 0.2
    # refine with pose-only LM on inliers (the real reloc flow,
    # reference: Relocalization -> PoseOptimization)
    from viorb_tpu.optim import PoseObs, pose_optimization_tcw

    obs = PoseObs(
        points=jnp.asarray(pts),
        uv=jnp.asarray(uv.astype(np.float32)),
        inv_sigma2=jnp.ones(n),
        valid=res.inliers,
    )
    R_ref, t_ref, _ = pose_optimization_tcw(res.r_cw, res.t_cw, obs, CAM)
    np.testing.assert_allclose(np.asarray(R_ref), R, atol=5e-3)
    np.testing.assert_allclose(np.asarray(t_ref), t, atol=2e-2)


def test_horn_sim3_exact(rng):
    p2 = world_points(rng, 30)
    R_gt = np.asarray(exp_so3(jnp.asarray([0.3, -0.2, 0.5])))
    s_gt = 1.7
    t_gt = np.array([0.5, -1.0, 2.0], np.float32)
    p1 = s_gt * p2 @ R_gt.T + t_gt
    s, R, t = horn_sim3(jnp.asarray(p1), jnp.asarray(p2))
    np.testing.assert_allclose(float(s), s_gt, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(R), R_gt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-3)


def test_sim3_ransac_with_outliers(rng):
    n = 80
    p2 = world_points(rng, n)
    R_gt = np.asarray(exp_so3(jnp.asarray([0.1, 0.2, -0.3])))
    s_gt = 0.8
    t_gt = np.array([1.0, 0.5, -0.5], np.float32)
    p1 = (s_gt * p2 @ R_gt.T + t_gt).astype(np.float32)
    p1[:20] += rng.uniform(1, 3, size=(20, 3)).astype(np.float32)
    res = sim3_ransac(
        jnp.asarray(p1), jnp.asarray(p2), jnp.ones(n, bool), jax.random.PRNGKey(2)
    )
    assert bool(res.success)
    np.testing.assert_allclose(float(res.s), s_gt, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(res.r), R_gt, atol=2e-2)
