"""IO tests: OpenCV-YAML config parsing against the reference's own
settings file, trajectory save/roundtrip, CLI runner smoke test."""

import os
import subprocess
import sys

import numpy as np
import pytest

from viorb_tpu.io.config import SlamConfig, parse_opencv_yaml

REF_YAML = "/root/reference/Examples/ROS/ORB_VIO/launch/euroc.yaml"


@pytest.mark.skipif(not os.path.exists(REF_YAML), reason="reference absent")
def test_parse_reference_euroc_yaml():
    cfg = SlamConfig.from_yaml(REF_YAML)
    # values from the reference settings (launch/euroc.yaml)
    assert abs(cfg.camera.fx - 458.654) < 1e-3
    assert abs(cfg.camera.fy - 457.296) < 1e-3
    assert cfg.n_features == 1000
    assert cfg.n_levels == 8
    assert abs(cfg.scale_factor - 1.2) < 1e-9
    assert cfg.local_window == 10
    assert cfg.camera.width == 752
    # Tbc parsed and orthonormal
    R = cfg.r_bc
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_trajectory_save(tmp_path):
    from viorb_tpu.io.synthetic import make_sequence
    from viorb_tpu.slam.mono import MonoSlam
    from viorb_tpu.io.trajectory import save_trajectory_tum, save_keyframe_trajectory_tum

    seq = make_sequence(n_frames=14, seed=0, dt=0.1)
    slam = MonoSlam(seq.cam, n_features=600)
    for img, ts in zip(seq.images, seq.timestamps):
        slam.process_frame(img, float(ts))
    p = str(tmp_path / "traj.txt")
    save_trajectory_tum(slam, p)
    data = np.loadtxt(p)
    assert data.shape[1] == 8
    assert len(data) > 5
    # quaternions normalized
    np.testing.assert_allclose(
        np.linalg.norm(data[:, 4:8], axis=1), 1.0, atol=1e-5
    )
    pk = str(tmp_path / "kf.txt")
    save_keyframe_trajectory_tum(slam, pk)
    assert len(np.loadtxt(pk)) >= 2


def test_gravity_eval(tmp_path):
    """eval.gravity: angle of dumped gw estimates vs true gravity
    (reference evaluate_viorb/evaluate_gravity.py:1-40)."""
    from viorb_tpu.eval.gravity import gravity_angle_deg, main, quat_to_rot

    # quat_to_rot sanity: 90 deg about z maps x->y
    r = quat_to_rot(np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]))
    assert np.allclose(r @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-6)

    g_true = np.array([0.0, 0.0, -9.81])
    tilt = quat_to_rot(np.array([np.cos(0.05), np.sin(0.05), 0, 0]))
    g_est = tilt @ g_true
    ang = gravity_angle_deg(g_est, g_true)
    assert abs(ang - np.degrees(2 * 0.05)) < 1e-3

    p = tmp_path / "gw.txt"
    rows = np.column_stack([np.arange(3.0), np.tile(g_est, (3, 1))])
    np.savetxt(p, rows)
    final = main([str(p)])
    assert abs(final - ang) < 1e-3
