"""IMU subsystem: sample batches, noise model, preintegration, NavState.

TPU-native replacement for the reference's src/IMU/ directory
(IMUPreintegrator, NavState, imudata, configparam): preintegration is a
masked `lax.scan` over fixed-capacity sample buffers so a whole window of
keyframe gaps preintegrates as one batched jitted op.
"""

from viorb_tpu.imu.types import ImuNoise, ImuBatch
from viorb_tpu.imu.preintegration import PreintegratedImu, preintegrate, preintegrate_batch
from viorb_tpu.imu.navstate import NavState, propagate_navstate
