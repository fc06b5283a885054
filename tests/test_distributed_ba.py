"""Distributed (landmark-sharded) BA on a virtual 8-device CPU mesh must
match the single-device solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from viorb_tpu.geometry.camera import PinholeCamera, project
from viorb_tpu.geometry.so3 import exp_so3
from viorb_tpu.optim import BAObservations, VisionBAState, vision_ba
from viorb_tpu.parallel import distributed_vision_ba, shard_observations

CAM = PinholeCamera(fx=450.0, fy=450.0, cx=376.0, cy=240.0)


def _problem(rng, k=6, m=256, noise=0.3):
    pts = np.stack(
        [rng.uniform(-4, 4, m), rng.uniform(-3, 3, m), rng.uniform(4, 10, m)], 1
    ).astype(np.float32)
    Rs, ts, uvs = [], [], []
    for i in range(k):
        Rk = np.asarray(exp_so3(jnp.asarray(rng.normal(size=3) * 0.02)))
        tk = np.array([-0.25 * i, 0.01 * i, 0.0], np.float32)
        pc = pts @ Rk.T + tk
        uv = np.asarray(project(CAM, jnp.asarray(pc))).copy()
        uv += rng.normal(size=uv.shape) * noise
        Rs.append(Rk), ts.append(tk), uvs.append(uv.astype(np.float32))
    obs = BAObservations(
        kf_idx=jnp.asarray(np.tile(np.arange(k, dtype=np.int32), (m, 1))),
        uv=jnp.asarray(np.stack(uvs, 1)),
        inv_sigma2=jnp.ones((m, k)),
        valid=jnp.ones((m, k), bool),
    )
    return pts, np.stack(Rs), np.stack(ts), obs


def test_distributed_matches_single(rng):
    devices = jax.devices()
    assert len(devices) == 8, "conftest should provide 8 virtual devices"
    mesh = Mesh(np.array(devices), ("lm",))
    k, m = 6, 256
    pts, Rs, ts, obs = _problem(rng, k, m)
    R0, t0 = Rs.copy(), ts.copy()
    for i in range(1, k):
        R0[i] = np.asarray(exp_so3(jnp.asarray(rng.normal(size=3) * 0.01))) @ Rs[i]
        t0[i] = ts[i] + rng.normal(size=3).astype(np.float32) * 0.05
    p0 = pts + rng.normal(size=pts.shape).astype(np.float32) * 0.05
    state = VisionBAState(jnp.asarray(R0), jnp.asarray(t0), jnp.asarray(p0))
    fixed = jnp.zeros(k, bool).at[0].set(True)

    out_s, chi2_s = vision_ba(state, obs, CAM, fixed, iters=10)
    obs_sharded = shard_observations(obs, mesh)
    state_d = VisionBAState(
        state.r_cw, state.t_cw, jax.device_put(state.points, obs_sharded.uv.sharding)
    )
    out_d, chi2_d = distributed_vision_ba(state_d, obs_sharded, CAM, fixed, mesh, iters=10)

    # both must converge to the same solution (same arithmetic up to
    # reduction order)
    np.testing.assert_allclose(np.asarray(out_d.r_cw), np.asarray(out_s.r_cw), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_d.t_cw), np.asarray(out_s.t_cw), atol=1e-3)
    rms_s = float(jnp.sqrt(chi2_s.mean()))
    rms_d = float(jnp.sqrt(chi2_d.mean()))
    assert abs(rms_s - rms_d) < 0.05, (rms_s, rms_d)
    assert rms_d < 1.0


def test_distributed_vi_matches_single(rng):
    """Landmark-sharded VISUAL-INERTIAL BA must match the single-device
    solver (IMU system is replicated; one psum per iteration)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_ba import _simulate_vi_trajectory, make_world

    from viorb_tpu.imu import ImuNoise, NavState
    from viorb_tpu.optim import Extrinsics, ImuChain, ViBAState, vi_ba
    from viorb_tpu.parallel import distributed_vi_ba

    devices = jax.devices()
    mesh = Mesh(np.array(devices), ("lm",))
    k = 6
    navs, pres, g_w = _simulate_vi_trajectory(k)
    m = 128
    pts = make_world(rng, m, depth=(5.0, 12.0))
    ext = Extrinsics.identity()
    uvs = []
    for p, v, R in navs:
        pc = (pts - p) @ R
        uv = np.asarray(project(CAM, jnp.asarray(pc))).copy()
        uv += rng.normal(size=uv.shape) * 0.3
        uvs.append(uv.astype(np.float32))
    obs = BAObservations(
        kf_idx=jnp.asarray(np.tile(np.arange(k, dtype=np.int32), (m, 1))),
        uv=jnp.asarray(np.stack(uvs, 1)),
        inv_sigma2=jnp.ones((m, k)),
        valid=jnp.ones((m, k), bool),
    )
    ps = np.stack([n[0] for n in navs])
    vs = np.stack([n[1] for n in navs])
    Rs = np.stack([n[2] for n in navs])
    z = np.zeros((k, 3), np.float32)
    ps_n = ps + rng.normal(size=ps.shape).astype(np.float32) * 0.05
    vs_n = vs + rng.normal(size=vs.shape).astype(np.float32) * 0.1
    ps_n[0], vs_n[0] = ps[0], vs[0]
    nav0 = NavState(
        jnp.asarray(ps_n), jnp.asarray(vs_n), jnp.asarray(Rs),
        jnp.asarray(z), jnp.asarray(z), jnp.asarray(z), jnp.asarray(z),
    )
    pts0 = pts + rng.normal(size=pts.shape).astype(np.float32) * 0.05
    chain = ImuChain(
        pre=jax.tree.map(lambda *xs: jnp.stack(xs), *pres),
        valid=jnp.ones(k - 1, bool),
        bias_cov_inv_diag=jnp.concatenate(
            [jnp.full(3, 1.0 / ImuNoise().gyro_bias_rw_var),
             jnp.full(3, 1.0 / ImuNoise().acc_bias_rw_var)]
        ) * 0.005,
    )
    state = ViBAState(nav0, jnp.asarray(pts0))
    fixed = jnp.zeros(k, bool).at[0].set(True)

    out_s, chi2_s = vi_ba(
        state, obs, CAM, ext, chain, jnp.asarray(g_w), fixed, iters=10
    )
    from viorb_tpu.parallel import shard_observations

    obs_d = shard_observations(obs, mesh)
    state_d = ViBAState(
        nav0, jax.device_put(state.points, obs_d.uv.sharding)
    )
    out_d, chi2_d = distributed_vi_ba(
        state_d, obs_d, CAM, ext, chain, jnp.asarray(g_w), fixed, mesh,
        iters=10,
    )
    np.testing.assert_allclose(
        np.asarray(out_d.nav.p), np.asarray(out_s.nav.p), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_d.nav.v), np.asarray(out_s.nav.v), atol=1e-2
    )
    rms_s = float(jnp.sqrt(chi2_s.mean()))
    rms_d = float(jnp.sqrt(chi2_d.mean()))
    assert abs(rms_s - rms_d) < 0.05, (rms_s, rms_d)
    assert rms_d < 1.0


def test_multihost_helpers_single_process():
    """landmark_mesh ordering + host_local_slice on the virtual CPU mesh
    (single process: the full range; ordering must be host-major)."""
    from viorb_tpu.parallel import host_local_slice, initialize, landmark_mesh

    assert initialize() is False  # no coordinator configured: no-op
    mesh = landmark_mesh()
    devs = list(mesh.devices.ravel())
    assert len(devs) == len(jax.devices())
    procs = [d.process_index for d in devs]
    assert procs == sorted(procs)  # host-major order
    sl = host_local_slice(len(devs) * 4, mesh)
    assert (sl.start, sl.stop) == (0, len(devs) * 4)
