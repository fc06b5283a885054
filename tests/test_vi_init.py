"""VI initialization tests on analytic trajectories: gyro bias recovery,
scale/gravity/accel-bias estimation, velocity solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viorb_tpu.imu import ImuBatch, ImuNoise
from viorb_tpu.io.synthetic import GRAVITY_W, make_imu, make_trajectory
from viorb_tpu.slam.vi_init import try_vi_init


def build_chain(n_kf=12, frame_dt=0.25, bias_g=None, bias_a=None, noise_g=0.0,
                noise_a=0.0, scale=2.5, cap=128):
    """Keyframe chain with unscaled 'vision' poses + per-gap IMU batches."""
    imu = make_imu(
        n_kf, frame_dt, hz=200.0, bias_g=bias_g, bias_a=bias_a,
        noise_g=noise_g, noise_a=noise_a,
    )
    r_wc, c_w = make_trajectory(n_kf, frame_dt)
    ts = np.arange(n_kf) * frame_dt
    p_c = c_w / scale  # mono map is scale-ambiguous: vision sees c/s
    batches = []
    for i in range(n_kf - 1):
        sel = (imu.t >= ts[i]) & (imu.t < ts[i + 1])
        batches.append(
            ImuBatch.from_arrays(imu.gyro[sel], imu.acc[sel], imu.t[sel], capacity=cap)
        )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    return p_c, r_wc, ts, stacked, imu


def test_vi_init_clean():
    scale = 2.5
    p_c, r_wc, ts, batches, imu = build_chain(scale=scale)
    res = try_vi_init(p_c, r_wc, ts, batches)
    assert res is not None and res.success
    assert abs(res.scale - scale) / scale < 0.02, res.scale
    np.testing.assert_allclose(res.gravity_w, GRAVITY_W, atol=0.15)
    np.testing.assert_allclose(res.bias_g, 0.0, atol=5e-3)
    np.testing.assert_allclose(res.bias_a, 0.0, atol=0.15)


def test_vi_init_with_biases():
    bg = np.array([0.02, -0.015, 0.03])
    ba = np.array([0.15, -0.1, 0.2])
    scale = 1.8
    p_c, r_wc, ts, batches, imu = build_chain(
        bias_g=bg, bias_a=ba, scale=scale, n_kf=16
    )
    res = try_vi_init(p_c, r_wc, ts, batches)
    assert res is not None and res.success
    np.testing.assert_allclose(res.bias_g, bg, atol=5e-3)
    assert abs(res.scale - scale) / scale < 0.05, res.scale
    np.testing.assert_allclose(res.gravity_w, GRAVITY_W, atol=0.3)
    # accel bias is weakly observable on short windows; direction-level check
    np.testing.assert_allclose(res.bias_a, ba, atol=0.3)


def test_vi_init_velocities_match_gt():
    scale = 2.0
    p_c, r_wc, ts, batches, imu = build_chain(scale=scale, n_kf=12)
    res = try_vi_init(p_c, r_wc, ts, batches)
    assert res is not None
    # ground-truth velocities at KF times
    idx = [int(np.argmin(np.abs(imu.t - t))) for t in ts]
    v_gt = imu.velocity[idx]
    np.testing.assert_allclose(res.velocities, v_gt, atol=0.12)


def test_vi_init_with_noise():
    p_c, r_wc, ts, batches, imu = build_chain(
        noise_g=2e-3, noise_a=8e-3, scale=3.0, n_kf=16
    )
    res = try_vi_init(p_c, r_wc, ts, batches)
    assert res is not None and res.success
    assert abs(res.scale - 3.0) / 3.0 < 0.05
    np.testing.assert_allclose(res.gravity_w, GRAVITY_W, atol=0.3)


def test_eiv_scale_solve_removes_attenuation():
    """OLS on an errors-in-variables system shrinks the scale by the
    noise-to-signal ratio of the noisy column; the Fuller-corrected solve
    (vi_init._eiv_scale_solve) must recover the true scale (the round-2/3
    ±12% scale-gate root cause)."""
    from viorb_tpu.slam.vi_init import _eiv_scale_solve

    rng = np.random.default_rng(0)
    n, d = 600, 5
    s_true = 4.0
    theta_true = rng.normal(0, 1, d)
    a_true = rng.normal(0, 1.0, n)
    B = rng.normal(0, 1.0, (n, d))
    sigma_a, sigma_b = 0.35, 0.02
    b = a_true * s_true + B @ theta_true + rng.normal(0, sigma_b, n)
    a = a_true + rng.normal(0, sigma_a, n)

    # plain OLS attenuates by ~ var_a/(var_a+sigma_a^2) = 1/1.1225
    x_ols = np.linalg.lstsq(np.column_stack([a, B]), b, rcond=None)[0]
    assert x_ols[0] < 0.95 * s_true, f"OLS not attenuated? {x_ols[0]}"

    s_hat, theta = _eiv_scale_solve(
        a, B, b,
        sigma_b2=np.full(n, sigma_b**2),
        c_rows=np.ones(n),  # Var(a_i) = sigma_p^2 * 1
    )
    # the corrected estimator is unbiased; its standard error at this
    # noise level is ~0.06 (1.5%), so gate at ~2.5 sigma and require it
    # to beat the OLS bias by a wide margin
    assert abs(s_hat - s_true) / s_true < 0.04, f"EIV scale {s_hat}"
    assert abs(s_hat - s_true) < 0.5 * abs(x_ols[0] - s_true)
    np.testing.assert_allclose(theta, theta_true, atol=0.15)
