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
