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
