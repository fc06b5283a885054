"""Batched Lie-group geometry kernels (SO3/SE3/Sim3).

TPU-native replacement for the reference's Sophus copy (reference:
src/IMU/so3.{h,cpp}) and g2o SE3Quat/Sim3 (Thirdparty/g2o/g2o/types/
{se3quat.h,sim3.h}): every op is a pure jnp function batched over leading
dimensions, so whole windows of poses are transformed in one fused XLA op.
"""

from viorb_tpu.geometry.so3 import (
    hat,
    vee,
    exp_so3,
    log_so3,
    right_jacobian,
    right_jacobian_inv,
    left_jacobian,
    left_jacobian_inv,
    normalize_rotation,
    quat_to_matrix,
    matrix_to_quat,
)
from viorb_tpu.geometry.se3 import (
    se3_compose,
    se3_inverse,
    se3_apply,
    exp_se3,
    log_se3,
    make_se3,
)
from viorb_tpu.geometry.sim3 import (
    sim3_compose,
    sim3_inverse,
    sim3_apply,
    exp_sim3,
    log_sim3,
)
