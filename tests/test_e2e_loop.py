"""Image-level loop closure end-to-end: a rendered closed-circuit
trajectory accumulates drift; the loop closer must detect the revisit on
real frames, verify it geometrically (Sim3 RANSAC + reprojection refine +
guided-projection confirm >= 40 matches), correct the graph, and run the
post-loop global BA. Success = loop fires and the corrected run is at
least as accurate as the uncorrected one, with the loop-end error clearly
reduced (reference: the full LoopClosing::Run path,
src/LoopClosing.cc:75-819)."""

import numpy as np
import pytest

from viorb_tpu.bow import train_vocabulary
from viorb_tpu.eval.ate import ate_rmse
from viorb_tpu.features import OrbExtractor
from viorb_tpu.io.synthetic import make_sequence
from viorb_tpu.slam.mono import MonoSlam

N_FRAMES = 100


@pytest.fixture(scope="module")
def circuit():
    # pixel noise matters: noise-free ray-cast frames localize keypoints so
    # precisely that a 100-frame circuit barely drifts, leaving a loop
    # closure nothing to repair (and its own measurement noise dominating)
    seq = make_sequence(
        n_frames=N_FRAMES, seed=0, dt=0.1, kind="circuit", noise_std=4.0
    )
    ex = OrbExtractor(n_features=600)
    descs = []
    for i in range(0, N_FRAMES, 12):
        f = ex.extract(seq.images[i])
        descs.append(np.asarray(f.desc01)[np.asarray(f.valid)])
    vocab = train_vocabulary(np.concatenate(descs), k=8, depth=3)
    return seq, vocab


def _run(seq, vocab, close_loops: bool):
    slam = MonoSlam(
        seq.cam,
        n_features=800,
        kf_max_interval=5,
        vocabulary=vocab,
        enable_loop_closing=close_loops,
    )
    for img, ts in zip(seq.images, seq.timestamps):
        slam.process_frame(img, float(ts))
    return slam


def _tail_rmse_globally_aligned(traj, gt_t, gt_xyz, t_close):
    """Tail RMSE under the WHOLE-trajectory Sim3 alignment. Aligning the
    tail segment by itself would hide exactly the error a loop closure
    repairs (an internally-consistent but globally drifted tail scores
    ~zero); one global alignment exposes the end-of-circuit drift."""
    from viorb_tpu.eval.ate import associate, umeyama_alignment

    ia, ib = associate(traj[:, 0], gt_t)
    x, y = traj[ia, 1:4], gt_xyz[ib]
    s, R, t = umeyama_alignment(x, y, with_scale=True)
    err2 = ((y - (s * (x @ R.T) + t)) ** 2).sum(1)
    m = traj[ia, 0] >= t_close
    return float(np.sqrt(err2[m].mean()))


def test_loop_closure_on_rendered_circuit(circuit):
    seq, vocab = circuit
    slam = _run(seq, vocab, close_loops=True)
    base = _run(seq, vocab, close_loops=False)

    assert slam.loop_closer.loops_closed >= 1, "no loop closed on circuit"

    traj = slam.trajectory_tum()
    traj_b = base.trajectory_tum()
    rmse = ate_rmse(
        traj[:, 0], traj[:, 1:4], seq.timestamps, seq.c_w, with_scale=True
    )
    rmse_b = ate_rmse(
        traj_b[:, 0], traj_b[:, 1:4], seq.timestamps, seq.c_w, with_scale=True
    )
    # the corrected run must be strictly better overall, and must CLEARLY
    # beat the no-loop run on the revisited segment (the last 20% of
    # frames, past the circuit closure) under the global alignment
    # (measured with seam fusion: overall 0.027 vs 0.045, tail 0.020 vs
    # 0.054 — margins ~2x the bounds)
    assert rmse <= rmse_b, f"loop {rmse:.4f} vs none {rmse_b:.4f}"
    t_close = seq.timestamps[int(0.8 * N_FRAMES)]
    rmse_tail = _tail_rmse_globally_aligned(
        traj, seq.timestamps, seq.c_w, t_close
    )
    rmse_tail_b = _tail_rmse_globally_aligned(
        traj_b, seq.timestamps, seq.c_w, t_close
    )
    assert rmse_tail <= 0.8 * rmse_tail_b, (
        f"tail: loop {rmse_tail:.4f} vs none {rmse_tail_b:.4f}"
    )
