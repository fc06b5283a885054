"""Async mapping in VI mode: the flagship TrackMonoVI path with the
mapping worker on its own thread (reference: LocalMapping + VI-init
threads, src/System.cc:240-271). The VI init rescale is an epoch-gated
atomic swap — the worker rescales map+keyframes under the lock and bumps
the rebase epoch; the tracker re-bases its NavState once at the next
frame entry (mono_vi._drain_tracker_rebase)."""

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


def _feed(slam, seq, imu):
    states = []
    prev_t = -np.inf
    for img, ts in zip(seq.images, seq.timestamps):
        sel = (imu.t > prev_t) & (imu.t <= ts)
        samples = [
            (float(t), g, a)
            for t, g, a in zip(imu.t[sel], imu.gyro[sel], imu.acc[sel])
        ]
        states.append(slam.process_frame_vi(img, float(ts), samples))
        prev_t = ts
    return states


def test_async_vi_matches_lockstep(vi_sequence):
    seq, imu = vi_sequence
    slam = MonoViSlam(
        seq.cam,
        n_features=800,
        vi_init_min_time=2.5,
        vi_init_min_kfs=8,
        kf_max_interval=5,
        async_mapping=True,
    )
    try:
        states = _feed(slam, seq, imu)
        slam.wait_mapping_idle()
        # one final drain so the asserted state reflects the last BA
        slam._drain_tracker_rebase()
        assert slam.vi_ready, "VI init never succeeded (async)"
        n_ok = sum(1 for s in states if s["state"] == "OK")
        assert n_ok > len(states) * 0.6, f"only {n_ok} tracked"
        g_est = slam.gravity
        cos = float(
            g_est @ GRAVITY_W / (np.linalg.norm(g_est) * np.linalg.norm(GRAVITY_W))
        )
        assert cos > 0.99, f"gravity direction off: cos={cos}"
        # metric ATE within 1.5x of the lock-step gate (test_e2e_vi: 0.08)
        traj = slam.trajectory_tum()
        rmse = ate_rmse(
            traj[:, 0], traj[:, 1:4], seq.timestamps, seq.c_w, with_scale=False
        )
        assert rmse < 0.12, f"async VI metric ATE {rmse:.3f} m"
    finally:
        slam.shutdown()
