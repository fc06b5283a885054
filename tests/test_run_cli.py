"""CLI runner smoke test: synthetic VI replay through the MsgSynchronizer
stream path (reference ros_vio.cc lock-step replay + MsgSync queues)."""

import os

import numpy as np

from viorb_tpu import run


def test_run_vi_stream_lockstep(tmp_path):
    out = str(tmp_path / "traj.txt")
    out_kf = str(tmp_path / "kf.txt")
    run.main([
        "--dataset", "synthetic", "--vi", "--frames", "60",
        "--stream", "lockstep", "--out", out, "--out-kf", out_kf,
    ])
    traj = np.loadtxt(out)
    assert traj.shape[0] >= 50, traj.shape  # trajectory entry per tracked frame
    assert np.isfinite(traj).all()
    kf = np.loadtxt(out_kf)
    assert kf.ndim == 2 and kf.shape[0] >= 5
    assert os.path.getsize(out) > 0
