"""Closed-form unit tests for SO3/SE3/Sim3 (the test layer the reference
lacks — SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viorb_tpu.geometry import (
    exp_so3,
    log_so3,
    hat,
    vee,
    right_jacobian,
    right_jacobian_inv,
    left_jacobian,
    left_jacobian_inv,
    normalize_rotation,
    quat_to_matrix,
    matrix_to_quat,
    se3_compose,
    se3_inverse,
    se3_apply,
    exp_se3,
    log_se3,
    sim3_compose,
    sim3_inverse,
    sim3_apply,
    exp_sim3,
    log_sim3,
)


def random_w(rng, n=64, scale=2.0):
    return jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * scale)


def test_hat_vee_roundtrip(rng):
    w = random_w(rng)
    np.testing.assert_allclose(vee(hat(w)), w, rtol=1e-6)


def test_exp_log_roundtrip(rng):
    w = random_w(rng, scale=1.0)
    R = exp_so3(w)
    # orthonormality
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
    # log returns the principal value: direct comparison only where |w| < pi
    norms = np.linalg.norm(np.asarray(w), axis=-1)
    inside = norms < np.pi - 1e-3
    np.testing.assert_allclose(
        np.asarray(log_so3(R))[inside], np.asarray(w)[inside], atol=2e-5
    )
    # everywhere: recovered rotation must match
    np.testing.assert_allclose(exp_so3(log_so3(R)), R, atol=1e-4)


def test_exp_log_small_angles(rng):
    w = random_w(rng, scale=1e-7)
    np.testing.assert_allclose(log_so3(exp_so3(w)), w, atol=1e-9)


def test_log_near_pi(rng):
    axis = rng.normal(size=(32, 3)).astype(np.float32)
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    for ang in [np.pi - 1e-4, np.pi - 1e-2, 3.10]:
        w = jnp.asarray(axis * ang)
        w2 = log_so3(exp_so3(w))
        # log may return the equivalent rotation; compare rotations
        np.testing.assert_allclose(exp_so3(w2), exp_so3(w), atol=2e-4)


def test_right_jacobian_definition(rng):
    """Exp(w + dw) ~= Exp(w) Exp(Jr(w) dw)."""
    w = random_w(rng, n=16, scale=1.0)
    dw = random_w(rng, n=16, scale=1e-4)
    lhs = exp_so3(w + dw)
    rhs = exp_so3(w) @ exp_so3((right_jacobian(w) @ dw[..., None])[..., 0])
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_jacobian_inverses(rng):
    w = random_w(rng, n=16, scale=1.5)
    eye = jnp.broadcast_to(jnp.eye(3), (16, 3, 3))
    np.testing.assert_allclose(right_jacobian(w) @ right_jacobian_inv(w), eye, atol=1e-4)
    np.testing.assert_allclose(left_jacobian(w) @ left_jacobian_inv(w), eye, atol=1e-4)


def test_left_right_relation(rng):
    w = random_w(rng, n=16, scale=1.5)
    # Jl(w) = R(w) Jr(w)
    np.testing.assert_allclose(
        left_jacobian(w), exp_so3(w) @ right_jacobian(w), atol=1e-5
    )


def test_quat_roundtrip(rng):
    w = random_w(rng, scale=1.5)
    R = exp_so3(w)
    np.testing.assert_allclose(quat_to_matrix(matrix_to_quat(R)), R, atol=1e-5)


def test_normalize_rotation(rng):
    w = random_w(rng, n=8, scale=1.0)
    R = exp_so3(w) + 1e-3 * jnp.asarray(rng.normal(size=(8, 3, 3)).astype(np.float32))
    Rn = normalize_rotation(R)
    eye = jnp.broadcast_to(jnp.eye(3), Rn.shape)
    np.testing.assert_allclose(Rn @ jnp.swapaxes(Rn, -1, -2), eye, atol=1e-5)


def test_se3_group_ops(rng):
    w = random_w(rng, n=8, scale=1.0)
    R = exp_so3(w)
    t = random_w(rng, n=8, scale=3.0)
    Ri, ti = se3_inverse(R, t)
    Rc, tc = se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(Rc, jnp.broadcast_to(jnp.eye(3), Rc.shape), atol=1e-5)
    np.testing.assert_allclose(tc, 0.0, atol=1e-5)
    x = random_w(rng, n=8)
    np.testing.assert_allclose(se3_apply(Ri, ti, se3_apply(R, t, x)), x, atol=1e-4)


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(16, 6)).astype(np.float32))
    R, t = exp_se3(xi)
    np.testing.assert_allclose(log_se3(R, t), xi, atol=1e-4)


def test_sim3_group_ops(rng):
    w = random_w(rng, n=8, scale=1.0)
    R = exp_so3(w)
    t = random_w(rng, n=8, scale=2.0)
    s = jnp.asarray(np.exp(rng.normal(size=8)).astype(np.float32))
    si, Ri, ti = sim3_inverse(s, R, t)
    sc, Rc, tc = sim3_compose(s, R, t, si, Ri, ti)
    np.testing.assert_allclose(sc, 1.0, rtol=1e-5)
    np.testing.assert_allclose(Rc, jnp.broadcast_to(jnp.eye(3), Rc.shape), atol=1e-5)
    np.testing.assert_allclose(tc, 0.0, atol=1e-4)
    x = random_w(rng, n=8)
    np.testing.assert_allclose(
        sim3_apply(si, Ri, ti, sim3_apply(s, R, t, x)), x, atol=1e-4
    )


def test_sim3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(16, 7)).astype(np.float32) * 0.5)
    s, R, t = exp_sim3(xi)
    np.testing.assert_allclose(log_sim3(s, R, t), xi, atol=2e-4)


def test_sim3_exp_sigma_zero_matches_se3(rng):
    xi6 = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    xi7 = jnp.concatenate([xi6, jnp.zeros((8, 1))], axis=-1)
    s, R, t = exp_sim3(xi7)
    R2, t2 = exp_se3(xi6)
    np.testing.assert_allclose(s, 1.0, rtol=1e-6)
    np.testing.assert_allclose(R, R2, atol=1e-5)
    np.testing.assert_allclose(t, t2, atol=1e-4)


def test_jit_and_grad():
    """Everything must be jit/grad-safe."""
    w = jnp.array([[0.1, -0.2, 0.3]], jnp.float32)

    @jax.jit
    def f(w):
        return jnp.sum(exp_so3(w))

    f(w)
    g = jax.grad(lambda w: jnp.sum(exp_so3(w)))(w[0])
    assert jnp.all(jnp.isfinite(g))
    g2 = jax.grad(lambda R: jnp.sum(log_so3(R)))(exp_so3(w[0]))
    assert jnp.all(jnp.isfinite(g2))
