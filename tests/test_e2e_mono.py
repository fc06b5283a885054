"""End-to-end monocular SLAM on a rendered synthetic sequence with exact
ground truth — the integration-test layer the reference exercises via
dataset replay (SURVEY.md §4.1)."""

import numpy as np
import pytest

from viorb_tpu.eval.ate import ate_rmse
from viorb_tpu.geometry.camera import PinholeCamera
from viorb_tpu.io.synthetic import make_sequence
from viorb_tpu.slam.mono import MonoSlam


@pytest.fixture(scope="module")
def sequence():
    return make_sequence(n_frames=40, seed=0, dt=0.1)


def test_mono_slam_tracks_sequence(sequence):
    seq = sequence
    slam = MonoSlam(seq.cam, n_features=800)
    states = []
    for img, ts in zip(seq.images, seq.timestamps):
        info = slam.process_frame(img, float(ts))
        states.append(info)
    # initialized and stayed tracking
    assert states[-1]["state"] == "OK", states[-1]
    n_ok = sum(1 for s in states if s["state"] == "OK")
    assert n_ok > len(states) * 0.7, f"only {n_ok} tracked frames"
    assert states[-1]["n_kfs"] >= 3
    assert states[-1]["n_points"] > 100

    # ATE after Sim3 alignment (mono scale is free)
    traj = slam.trajectory_tum()
    assert len(traj) > 20
    est_t = traj[:, 0]
    est_xyz = traj[:, 1:4]
    rmse = ate_rmse(est_t, est_xyz, seq.timestamps, seq.c_w, with_scale=True)
    # trajectory span is ~1.5m; few-cm ATE expected
    assert rmse < 0.05, f"ATE RMSE {rmse:.4f} m"
