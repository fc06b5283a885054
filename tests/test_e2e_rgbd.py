"""End-to-end RGB-D SLAM: metric from the first frame (SE3-aligned ATE,
no scale correction allowed)."""

import numpy as np
import pytest

from viorb_tpu.eval.ate import ate_rmse
from viorb_tpu.io.synthetic import make_sequence
from viorb_tpu.slam.rgbd import RgbdSlam


def test_rgbd_slam_metric():
    seq, depths = make_sequence(n_frames=40, seed=0, dt=0.1, with_depth=True)
    slam = RgbdSlam(seq.cam, n_features=800)
    states = []
    for img, dep, ts in zip(seq.images, depths, seq.timestamps):
        info = slam.process_frame_rgbd(img, dep, float(ts))
        states.append(info)
    assert states[0]["state"] == "OK", "depth init must succeed on frame 0"
    n_ok = sum(1 for s in states if s["state"] == "OK")
    assert n_ok > len(states) * 0.9, f"only {n_ok} tracked"
    assert states[-1]["n_points"] > 300

    traj = slam.trajectory_tum()
    rmse = ate_rmse(
        traj[:, 0], traj[:, 1:4], seq.timestamps, seq.c_w, with_scale=False
    )
    assert rmse < 0.05, f"metric ATE {rmse:.4f} m"
