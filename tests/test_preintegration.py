"""Preintegration vs closed-form constant-rate integrals (SURVEY.md §4:
'unit tests against closed-form cases (preintegration vs analytic
constant-rate integrals)')."""

import jax
import jax.numpy as jnp
import numpy as np

from viorb_tpu.geometry.so3 import exp_so3
from viorb_tpu.imu import (
    ImuBatch,
    ImuNoise,
    NavState,
    preintegrate,
    preintegrate_batch,
    propagate_navstate,
)

NOISE = ImuNoise()


def make_batch(gyro_fn, acc_fn, t0, t1, hz=200.0, cap=1024):
    ts = np.arange(t0, t1, 1.0 / hz)
    gyro = np.stack([gyro_fn(t) for t in ts])
    acc = np.stack([acc_fn(t) for t in ts])
    return ImuBatch.from_arrays(gyro, acc, ts, capacity=cap), ts


def test_static_free_fall():
    """Zero gyro, zero acc: dP = dV = 0, dR = I; dt accumulates."""
    batch, _ = make_batch(
        lambda t: np.zeros(3), lambda t: np.zeros(3), 0.0, 0.5
    )
    out = preintegrate(batch, jnp.zeros(3), jnp.zeros(3), 0.0, 0.5, NOISE)
    np.testing.assert_allclose(out.dt, 0.5, atol=1e-4)
    np.testing.assert_allclose(out.delta_p, 0.0, atol=1e-6)
    np.testing.assert_allclose(out.delta_v, 0.0, atol=1e-6)
    np.testing.assert_allclose(out.delta_r, np.eye(3), atol=1e-6)


def test_constant_acceleration():
    """Constant body acc a, no rotation: dV = a T, dP = 1/2 a T^2."""
    a = np.array([1.0, -2.0, 0.5])
    T = 1.0
    batch, _ = make_batch(lambda t: np.zeros(3), lambda t: a, 0.0, T, hz=400.0)
    out = preintegrate(batch, jnp.zeros(3), jnp.zeros(3), 0.0, T, NOISE)
    np.testing.assert_allclose(out.dt, T, atol=1e-4)
    np.testing.assert_allclose(out.delta_v, a * T, rtol=1e-3)
    np.testing.assert_allclose(out.delta_p, 0.5 * a * T * T, rtol=5e-3)


def test_constant_rotation_rate():
    """Constant omega: dR = Exp(omega T)."""
    w = np.array([0.3, -0.5, 0.8])
    T = 1.0
    batch, _ = make_batch(lambda t: w, lambda t: np.zeros(3), 0.0, T, hz=800.0)
    out = preintegrate(batch, jnp.zeros(3), jnp.zeros(3), 0.0, T, NOISE)
    expected = exp_so3(jnp.asarray(w, jnp.float32) * T)
    np.testing.assert_allclose(out.delta_r, expected, atol=2e-3)


def test_bias_jacobian_first_order():
    """corrected_deltas(dbg,dba) must match re-preintegrating with shifted
    bias, to first order (this is the linearization BA relies on,
    reference src/IMU/g2otypes.cpp:8-75)."""
    rng = np.random.default_rng(0)
    batch, _ = make_batch(
        lambda t: np.array([0.4 * np.sin(t * 5), 0.2, -0.3 * np.cos(t * 3)]),
        lambda t: np.array([1.0, 0.5 * np.sin(t * 4), -0.8]),
        0.0,
        0.5,
        hz=200.0,
    )
    bg = jnp.zeros(3)
    ba = jnp.zeros(3)
    out0 = preintegrate(batch, bg, ba, 0.0, 0.5, NOISE)
    dbg = jnp.asarray(rng.normal(size=3).astype(np.float32) * 1e-3)
    dba = jnp.asarray(rng.normal(size=3).astype(np.float32) * 1e-3)
    # exact: re-preintegrate with bias + delta
    out1 = preintegrate(batch, bg + dbg, ba + dba, 0.0, 0.5, NOISE)
    dp, dv, dr = out0.corrected_deltas(dbg, dba)
    np.testing.assert_allclose(dp, out1.delta_p, atol=5e-6)
    np.testing.assert_allclose(dv, out1.delta_v, atol=5e-6)
    np.testing.assert_allclose(dr, out1.delta_r, atol=5e-5)


def test_covariance_psd_and_growth():
    batch, _ = make_batch(
        lambda t: np.array([0.1, 0.2, -0.1]),
        lambda t: np.array([0.5, -0.3, 9.8]),
        0.0,
        1.0,
    )
    out = preintegrate(batch, jnp.zeros(3), jnp.zeros(3), 0.0, 1.0, NOISE)
    cov = np.asarray(out.cov)
    np.testing.assert_allclose(cov, cov.T, atol=1e-10)
    eigs = np.linalg.eigvalsh(cov)
    assert eigs.min() > -1e-9
    assert eigs.max() > 0  # noise actually accumulated


def test_padding_mask_invariance():
    """Extra padded rows must not change the result."""
    batch_small, ts = make_batch(
        lambda t: np.array([0.1, -0.2, 0.3]),
        lambda t: np.array([1.0, 0.0, -0.5]),
        0.0,
        0.3,
        cap=64,
    )
    batch_big, _ = make_batch(
        lambda t: np.array([0.1, -0.2, 0.3]),
        lambda t: np.array([1.0, 0.0, -0.5]),
        0.0,
        0.3,
        cap=512,
    )
    o1 = preintegrate(batch_small, jnp.zeros(3), jnp.zeros(3), 0.0, 0.3, NOISE)
    o2 = preintegrate(batch_big, jnp.zeros(3), jnp.zeros(3), 0.0, 0.3, NOISE)
    np.testing.assert_allclose(o1.delta_p, o2.delta_p, atol=1e-7)
    np.testing.assert_allclose(o1.cov, o2.cov, atol=1e-10)


def test_gap_before_first_sample():
    """First-sample gap integration (reference src/Frame.cc:50-60)."""
    a = np.array([2.0, 0.0, 0.0])
    # samples start at t=0.1 but segment starts at t=0.0
    batch, _ = make_batch(lambda t: np.zeros(3), lambda t: a, 0.1, 0.5, hz=400.0)
    out = preintegrate(batch, jnp.zeros(3), jnp.zeros(3), 0.0, 0.5, NOISE)
    np.testing.assert_allclose(out.dt, 0.5, atol=1e-4)
    np.testing.assert_allclose(out.delta_v, a * 0.5, rtol=1e-3)


def test_navstate_propagation_free_fall():
    """With zero IMU (free fall), propagation must produce pure gravity
    kinematics (reference: Converter::updateNS)."""
    batch, _ = make_batch(lambda t: np.zeros(3), lambda t: np.zeros(3), 0.0, 1.0)
    pre = preintegrate(batch, jnp.zeros(3), jnp.zeros(3), 0.0, 1.0, NOISE)
    ns = NavState.identity()
    ns = ns._replace(v=jnp.array([1.0, 0.0, 0.0]))
    out = propagate_navstate(ns, pre)
    g = np.array([0.0, 0.0, -9.81])
    np.testing.assert_allclose(out.p, np.array([1.0, 0, 0]) + 0.5 * g, rtol=1e-3)
    np.testing.assert_allclose(out.v, np.array([1.0, 0, 0]) + g, rtol=1e-3)


def test_vmapped_batch_matches_single():
    batches = []
    for i in range(4):
        b, _ = make_batch(
            lambda t: np.array([0.1 * (i + 1), 0.0, -0.05]),
            lambda t: np.array([0.5, 0.1 * i, 9.8]),
            0.0,
            0.4,
            cap=128,
        )
        batches.append(b)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
    ts = jnp.zeros(4)
    te = jnp.full((4,), 0.4)
    out = preintegrate_batch(stacked, jnp.zeros(3), jnp.zeros(3), ts, te, NOISE)
    for i in range(4):
        single = preintegrate(batches[i], jnp.zeros(3), jnp.zeros(3), 0.0, 0.4, NOISE)
        np.testing.assert_allclose(out.delta_p[i], single.delta_p, atol=1e-6)
        np.testing.assert_allclose(out.delta_r[i], single.delta_r, atol=1e-6)


def test_preintegration_jit_compiles_once():
    batch, _ = make_batch(
        lambda t: np.zeros(3), lambda t: np.array([1.0, 0, 0]), 0.0, 0.2, cap=64
    )
    f = jax.jit(lambda b, ts, te: preintegrate(b, jnp.zeros(3), jnp.zeros(3), ts, te, NOISE))
    o1 = f(batch, 0.0, 0.2)
    o2 = f(batch, 0.0, 0.2)
    np.testing.assert_allclose(o1.delta_v, o2.delta_v)
