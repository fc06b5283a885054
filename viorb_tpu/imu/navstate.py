"""NavState: the 15-DoF VI state {P, V, R, bg, ba, dbg, dba}.

Replaces the reference's NavState class (reference: src/IMU/NavState.{h,cpp},
NavState.h:20-90) and the kinematic propagation in Converter::updateNS
(reference: src/Converter.cc):

  P += V dt + 1/2 g dt^2 + R dP ;  V += g dt + R dV ;  R = R dR

As everywhere in this framework the state is a pytree of arrays batched over
leading dims, so a whole keyframe window propagates in one op.

Bias convention (same split as the reference): `bg`/`ba` hold the
linearization-point biases used for preintegration; `dbg`/`dba` are the
current estimated increments on top (optimized by BA; see reference
src/IMU/NavState.h bias members and g2o bias vertices).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from viorb_tpu.geometry.so3 import exp_so3
from viorb_tpu.imu.preintegration import PreintegratedImu

GRAVITY_W = jnp.array([0.0, 0.0, -9.810], jnp.float32)


class NavState(NamedTuple):
    p: jax.Array  # (...,3) world position of body
    v: jax.Array  # (...,3) world velocity
    r: jax.Array  # (...,3,3) Rwb body->world rotation
    bg: jax.Array  # (...,3) gyro bias (linearization point)
    ba: jax.Array  # (...,3) acc bias (linearization point)
    dbg: jax.Array  # (...,3) gyro bias increment
    dba: jax.Array  # (...,3) acc bias increment

    @staticmethod
    def identity(batch_shape=()) -> "NavState":
        z = jnp.zeros((*batch_shape, 3), jnp.float32)
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (*batch_shape, 3, 3))
        return NavState(z, z, eye, z, z, z, z)

    @property
    def bias_g(self):
        return self.bg + self.dbg

    @property
    def bias_a(self):
        return self.ba + self.dba

    def inc_pvr(self, dpvr: jax.Array) -> "NavState":
        """Manifold increment on (P,V,phi) — 9-dim (reference:
        NavState::IncSmallPVR, src/IMU/NavState.cpp)."""
        dp, dv, dphi = dpvr[..., 0:3], dpvr[..., 3:6], dpvr[..., 6:9]
        return self._replace(
            p=self.p + dp, v=self.v + dv, r=self.r @ exp_so3(dphi)
        )

    def inc_bias(self, dbias: jax.Array) -> "NavState":
        """6-dim bias increment (reference: NavState::IncSmallBias)."""
        return self._replace(
            dbg=self.dbg + dbias[..., 0:3], dba=self.dba + dbias[..., 3:6]
        )

    def inc_small(self, dx: jax.Array) -> "NavState":
        """15-dim increment (P,V,phi,dbg,dba)."""
        return self.inc_pvr(dx[..., :9]).inc_bias(dx[..., 9:15])


def propagate_navstate(
    ns: NavState,
    preint: PreintegratedImu,
    gravity_w: jax.Array = GRAVITY_W,
) -> NavState:
    """Kinematic propagation over a preintegrated segment, with first-order
    bias correction of the deltas (reference: Converter::updateNS,
    src/Converter.cc; used by Tracking::PredictNavStateByIMU,
    src/Tracking.cc:348-410)."""
    dp, dv, dr = preint.corrected_deltas(ns.dbg, ns.dba)
    dt = preint.dt[..., None]
    p = ns.p + ns.v * dt + 0.5 * gravity_w * dt * dt + (ns.r @ dp[..., None])[..., 0]
    v = ns.v + gravity_w * dt + (ns.r @ dv[..., None])[..., 0]
    r = ns.r @ dr
    return ns._replace(p=p, v=v, r=r)
