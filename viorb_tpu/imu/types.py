"""IMU sample containers and noise model.

Replaces the reference's IMUData (reference: src/IMU/imudata.{h,cpp}) —
but instead of one C++ object per sample, samples live in fixed-capacity
struct-of-arrays batches (gyro (N,3), acc (N,3), t (N,), mask (N,)) so the
preintegration scan has static shapes under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ImuNoise(NamedTuple):
    """Discrete-time measurement / bias-random-walk covariances (isotropic).

    Matches the reference's convention (src/IMU/imudata.cpp:31-41):
    measurement cov = sigma^2 * rate (i.e. sigma^2/dt), bias RW cov = sigma_rw^2.
    Defaults are the reference's EuRoC-tuned values.
    """

    gyro_meas_var: float = 2.0e-3 ** 2 * 200.0
    acc_meas_var: float = 8.0e-3 ** 2 * 200.0
    gyro_bias_rw_var: float = 2.0e-5 ** 2
    acc_bias_rw_var: float = 5.0e-3 ** 2

    @property
    def gyr_cov(self):
        return jnp.eye(3, dtype=jnp.float32) * self.gyro_meas_var

    @property
    def acc_cov(self):
        return jnp.eye(3, dtype=jnp.float32) * self.acc_meas_var


class ImuBatch(NamedTuple):
    """Fixed-capacity batch of IMU samples.

    gyro: (N,3) rad/s; acc: (N,3) m/s^2; t: (N,) seconds; mask: (N,) bool —
    True for valid samples. Padding rows must have mask=False; their values
    are ignored by the preintegration scan.
    """

    gyro: jax.Array
    acc: jax.Array
    t: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.gyro.shape[-2]

    @staticmethod
    def empty(capacity: int) -> "ImuBatch":
        return ImuBatch(
            gyro=jnp.zeros((capacity, 3), jnp.float32),
            acc=jnp.zeros((capacity, 3), jnp.float32),
            t=jnp.zeros((capacity,), jnp.float32),
            mask=jnp.zeros((capacity,), bool),
        )

    @staticmethod
    def from_arrays(gyro, acc, t, capacity: int | None = None) -> "ImuBatch":
        import numpy as np

        gyro = np.asarray(gyro, np.float32).reshape(-1, 3)
        acc = np.asarray(acc, np.float32).reshape(-1, 3)
        t = np.asarray(t, np.float32).reshape(-1)
        n = gyro.shape[0]
        cap = capacity if capacity is not None else n
        assert n <= cap, f"{n} samples exceed capacity {cap}"
        g = np.zeros((cap, 3), np.float32)
        a = np.zeros((cap, 3), np.float32)
        tt = np.zeros((cap,), np.float32)
        m = np.zeros((cap,), bool)
        g[:n], a[:n], tt[:n], m[:n] = gyro, acc, t, True
        return ImuBatch(jnp.asarray(g), jnp.asarray(a), jnp.asarray(tt), jnp.asarray(m))
