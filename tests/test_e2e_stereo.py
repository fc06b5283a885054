"""End-to-end stereo SLAM on a rendered rectified pair sequence: metric
scale comes from the baseline, so ATE is evaluated with SE3-only
alignment (no scale correction), mirroring test_e2e_rgbd."""

import numpy as np
import pytest

from viorb_tpu.eval.ate import ate_rmse
from viorb_tpu.io.synthetic import make_stereo_sequence
from viorb_tpu.slam.stereo import StereoSlam

BASELINE = 0.11


@pytest.fixture(scope="module")
def stereo_sequence():
    return make_stereo_sequence(n_frames=40, seed=0, dt=0.1, baseline=BASELINE)


def test_stereo_matching_depth(stereo_sequence):
    """Stereo row matching must recover metric depth on the first frame."""
    from viorb_tpu.io.synthetic import default_room, depth_at

    seq, right = stereo_sequence
    slam = StereoSlam(seq.cam, baseline=BASELINE, n_features=800)
    fr = slam._make_stereo_frame(seq.images[0], right[0], 0.0)
    ok = fr.depth > 0
    assert ok.sum() > 200, f"only {ok.sum()} stereo matches"
    planes = default_room(0)
    z_gt = depth_at(seq.cam, seq.r_wc[0], seq.c_w[0], planes, fr.xy[ok])
    rel = np.abs(fr.depth[ok] - z_gt) / z_gt
    # median relative depth error under 3% (1 px disparity quantization at
    # the far wall is ~2%)
    assert np.median(rel) < 0.03, f"median depth err {np.median(rel):.3f}"


def test_stereo_slam(stereo_sequence):
    seq, right = stereo_sequence
    slam = StereoSlam(
        seq.cam, baseline=BASELINE, n_features=800, kf_max_interval=5
    )
    states = []
    for img_l, img_r, ts in zip(seq.images, right, seq.timestamps):
        info = slam.process_frame_stereo(img_l, img_r, float(ts))
        states.append(info)

    assert states[-1]["state"] == "OK", states[-1]
    n_ok = sum(1 for s in states if s["state"] == "OK")
    assert n_ok > len(states) * 0.9, f"only {n_ok} tracked"

    # METRIC ATE, SE3 alignment only: scale must come from the baseline.
    # The first ~2 s are a depth-noise-dominated transient (the single
    # -frame init's quantized disparities anchor the first keyframes;
    # window BAs refine them but the residual is ~0.09 m) — bound the
    # whole clip loosely and the steady state tightly (measured 0.068
    # whole / 0.0045 steady).
    traj = slam.trajectory_tum()
    rmse = ate_rmse(
        traj[:, 0], traj[:, 1:4], seq.timestamps, seq.c_w, with_scale=False
    )
    assert rmse < 0.09, f"metric ATE RMSE {rmse:.3f} m"
    m = traj[:, 0] >= 2.0
    rmse_ss = ate_rmse(
        traj[m, 0], traj[m, 1:4], seq.timestamps, seq.c_w, with_scale=False
    )
    assert rmse_ss < 0.02, f"steady-state metric ATE {rmse_ss:.3f} m"

    # scale sanity vs ground truth span
    est_span = np.ptp(traj[:, 1:4], axis=0)
    gt_span = np.ptp(seq.c_w, axis=0)
    ratio = np.linalg.norm(est_span) / np.linalg.norm(gt_span)
    assert 0.97 < ratio < 1.03, f"scale ratio {ratio}"
