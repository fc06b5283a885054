"""End-to-end monocular-INERTIAL SLAM on a rendered sequence: the system
must recover METRIC scale (ATE evaluated with SE3-only alignment, no Sim3
scale correction) and the gravity direction."""

import numpy as np
import pytest

from viorb_tpu.eval.ate import ate_rmse
from viorb_tpu.io.synthetic import GRAVITY_W, make_imu, make_sequence
from viorb_tpu.slam.mono_vi import MonoViSlam


@pytest.fixture(scope="module")
def vi_sequence():
    seq = make_sequence(n_frames=60, seed=0, dt=0.1)
    imu = make_imu(60, 0.1, hz=200.0)
    return seq, imu


def test_mono_vi_slam(vi_sequence):
    seq, imu = vi_sequence
    slam = MonoViSlam(
        seq.cam,
        n_features=800,
        vi_init_min_time=2.5,
        vi_init_min_kfs=8,
        kf_max_interval=5,
    )
    states = []
    prev_t = -np.inf
    for i, (img, ts) in enumerate(zip(seq.images, seq.timestamps)):
        sel = (imu.t > prev_t) & (imu.t <= ts)
        samples = [(float(t), g, a) for t, g, a in zip(imu.t[sel], imu.gyro[sel], imu.acc[sel])]
        info = slam.process_frame_vi(img, float(ts), samples)
        states.append(info)
        prev_t = ts

    assert slam.vi_ready, "VI init never succeeded"
    assert states[-1]["state"] in ("OK", "IMU_ONLY"), states[-1]
    n_ok = sum(1 for s in states if s["state"] == "OK")
    assert n_ok > len(states) * 0.6, f"only {n_ok} tracked"

    # gravity direction within a few degrees
    g_est = slam.gravity
    cos = float(
        g_est @ GRAVITY_W / (np.linalg.norm(g_est) * np.linalg.norm(GRAVITY_W))
    )
    assert cos > 0.996, f"gravity direction off: cos={cos}"

    # METRIC ATE: SE3 alignment only (scale must come from the IMU).
    # The post-init gravity-vertex GBA (vi_ba_gw) repairs the closed-form
    # init's scale/gravity error, so the whole trajectory is tight.
    traj = slam.trajectory_tum()
    rmse = ate_rmse(
        traj[:, 0], traj[:, 1:4], seq.timestamps, seq.c_w, with_scale=False
    )
    assert rmse < 0.05, f"metric ATE RMSE {rmse:.3f} m"

    # post-init steady-state tracking must be tight both metrically and
    # in shape
    m = traj[:, 0] >= 4.5
    rmse_post = ate_rmse(
        traj[m, 0], traj[m, 1:4], seq.timestamps, seq.c_w, with_scale=False
    )
    assert rmse_post < 0.02, f"post-init metric ATE {rmse_post:.3f} m"
    rmse_shape = ate_rmse(
        traj[m, 0], traj[m, 1:4], seq.timestamps, seq.c_w, with_scale=True
    )
    assert rmse_shape < 0.02, f"post-init sim3 ATE {rmse_shape:.3f} m"

    # scale: +-5% class (the round-2/3 +-12% gate was rooted in two since
    # fixed defects: gauge-free pre-init window BAs rotating the world
    # every job, and errors-in-variables attenuation in the closed-form
    # triplet solve — see vi_init._eiv_scale_solve; measured 0.96)
    est_span = np.ptp(traj[:, 1:4], axis=0)
    gt_span = np.ptp(seq.c_w, axis=0)
    ratio = np.linalg.norm(est_span) / np.linalg.norm(gt_span)
    assert 0.94 < ratio < 1.06, f"scale ratio {ratio}"
