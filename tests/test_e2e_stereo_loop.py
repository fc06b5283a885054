"""Stereo loop closure end-to-end on a rendered circuit: the loop must
fire with the Sim3 scale PINNED at 1 (stereo observes metric scale —
reference Sim3Solver bFixScale, include/Sim3Solver.h:45), correct the
graph SE3-only, and leave the metric (SE3-aligned) ATE within the stereo
accuracy envelope (BASELINE.md north-star config: KITTI-00-like stereo +
loop closure + pose graph)."""

import numpy as np
import pytest

from viorb_tpu.bow import train_vocabulary
from viorb_tpu.eval.ate import ate_rmse
from viorb_tpu.features import OrbExtractor
from viorb_tpu.io.synthetic import make_stereo_sequence
from viorb_tpu.slam.stereo import StereoSlam

N_FRAMES = 100
BASELINE = 0.11


@pytest.fixture(scope="module")
def stereo_circuit():
    seq, right = make_stereo_sequence(
        n_frames=N_FRAMES, seed=0, dt=0.1, baseline=BASELINE,
        kind="circuit", noise_std=4.0,
    )
    ex = OrbExtractor(n_features=600)
    descs = []
    for i in range(0, N_FRAMES, 12):
        f = ex.extract(seq.images[i])
        descs.append(np.asarray(f.desc01)[np.asarray(f.valid)])
    vocab = train_vocabulary(np.concatenate(descs), k=8, depth=3)
    return seq, right, vocab


def test_stereo_loop_closure_fixed_scale(stereo_circuit):
    seq, right, vocab = stereo_circuit
    slam = StereoSlam(
        seq.cam, baseline=BASELINE, n_features=800, kf_max_interval=5,
        vocabulary=vocab, enable_loop_closing=True,
    )
    assert slam.loop_closer.fix_scale, "stereo must pin the loop Sim3 scale"
    for img_l, img_r, ts in zip(seq.images, right, seq.timestamps):
        slam.process_frame_stereo(img_l, img_r, float(ts))

    assert slam.loop_closer.loops_closed >= 1, "no loop closed on circuit"

    # METRIC ATE, SE3 alignment only — the SE3-pinned correction must not
    # disturb the baseline-anchored scale
    traj = slam.trajectory_tum()
    rmse = ate_rmse(
        traj[:, 0], traj[:, 1:4], seq.timestamps, seq.c_w, with_scale=False
    )
    assert rmse < 0.05, f"metric ATE RMSE {rmse:.3f} m"
    est_span = np.ptp(traj[:, 1:4], axis=0)
    gt_span = np.ptp(seq.c_w, axis=0)
    ratio = np.linalg.norm(est_span) / np.linalg.norm(gt_span)
    assert 0.97 < ratio < 1.03, f"scale ratio {ratio}"
