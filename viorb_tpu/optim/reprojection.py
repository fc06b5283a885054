"""Reprojection residuals for the two pose parameterizations.

Counterparts of the reference's g2o edge types:
  * vision Tcw 6-DoF: EdgeSE3ProjectXYZ(OnlyPose)
    (Thirdparty/g2o/g2o/types/types_six_dof_expmap.cpp)
  * VI NavState 9/15-DoF with body-camera extrinsics:
    EdgeNavStatePVRPointXYZ(OnlyPose) (src/IMU/g2otypes.h:129-281,
    body-frame projection Pc = Rcb*Rwb^T*(Pw-Pwb) - Rcb*Pbc at :162)

Every residual is written as a function of a LOCAL increment delta around
the current state, so `jax.jacfwd` at delta=0 yields the manifold Jacobian
blocks the normal equations need. No hand-derived Jacobians: XLA compiles
the forward-mode derivative of the 10-line residual to the same arithmetic
g2o's linearizeOplus hand-codes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from viorb_tpu.geometry.camera import PinholeCamera, project
from viorb_tpu.geometry.so3 import exp_so3


class Extrinsics(NamedTuple):
    """Tbc: camera pose in the body (IMU) frame — x_b = r_bc @ x_c + p_bc
    (reference: ConfigParam Tbc, src/IMU/configparam.cpp:40-68)."""

    r_bc: jax.Array  # (3,3)
    p_bc: jax.Array  # (3,)

    @staticmethod
    def identity() -> "Extrinsics":
        return Extrinsics(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))


def reproj_residual_tcw(
    delta: jax.Array,  # (6,) local increment (rho, phi), T <- Exp(delta) T
    r_cw: jax.Array,
    t_cw: jax.Array,
    p_w: jax.Array,  # (3,) landmark
    uv: jax.Array,  # (2,) observation (undistorted pixels)
    cam: PinholeCamera,
) -> jax.Array:
    rho, phi = delta[:3], delta[3:]
    dR = exp_so3(phi)
    R = dR @ r_cw
    t = (dR @ t_cw) + rho
    pc = R @ p_w + t
    return project(cam, pc) - uv


def reproj_residual_navstate(
    delta_pose: jax.Array,  # (9,) (dP, dV, dPhi) increment on NavState PVR
    delta_lm: jax.Array,  # (3,) landmark increment
    p_wb: jax.Array,
    r_wb: jax.Array,
    p_w: jax.Array,
    uv: jax.Array,
    cam: PinholeCamera,
    ext: Extrinsics,
) -> jax.Array:
    """Body-frame projection; velocity part of delta unused (zero columns),
    exactly like the reference's PVR edge which has zero V Jacobian."""
    p = p_wb + delta_pose[0:3]
    R = r_wb @ exp_so3(delta_pose[6:9])
    lm = p_w + delta_lm
    pb = R.T @ (lm - p)
    pc = ext.r_bc.T @ (pb - ext.p_bc)
    return project(cam, pc) - uv


def reproj_residual_stereo_tcw(
    delta: jax.Array,  # (6,) local increment (rho, phi)
    r_cw: jax.Array,
    t_cw: jax.Array,
    p_w: jax.Array,  # (3,) landmark
    uvr: jax.Array,  # (3,) observation (u_left, v_left, u_right)
    cam: PinholeCamera,
    bf: jax.Array,  # () fx * baseline
) -> jax.Array:
    """3-dim stereo residual (u_l, v_l, u_r) with u_r = u_l - bf/z
    (reference: EdgeStereoSE3ProjectXYZ,
    Thirdparty/g2o/g2o/types/types_six_dof_expmap.cpp cam_project with bf)."""
    rho, phi = delta[:3], delta[3:]
    dR = exp_so3(phi)
    R = dR @ r_cw
    t = (dR @ t_cw) + rho
    pc = R @ p_w + t
    uv = project(cam, pc)
    ur = uv[0] - bf / jnp.maximum(pc[2], 1e-6)
    return jnp.concatenate([uv - uvr[:2], (ur - uvr[2])[None]])


def point_depth_tcw(r_cw, t_cw, p_w) -> jax.Array:
    return (r_cw @ p_w + t_cw)[..., 2]


def point_cam_navstate(p_wb, r_wb, p_w, ext: Extrinsics) -> jax.Array:
    pb = r_wb.T @ (p_w - p_wb)
    return ext.r_bc.T @ (pb - ext.p_bc)
