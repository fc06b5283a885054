"""Degraded-imaging robustness (VERDICT r2 weak #10: thresholds tuned on
clean ray-cast frames may not transfer): the mono pipeline must keep
tracking through motion blur and exposure changes — the FAST arc-score
ranking and the {0,1}-test BRIEF descriptors are nominally robust to both
(monotonic intensity maps preserve sign tests; blur shrinks scores but
the per-cell top-K keeps selecting maxima), and this pins that down."""

import numpy as np
import pytest

from viorb_tpu.eval.ate import ate_rmse
from viorb_tpu.io.synthetic import make_sequence
from viorb_tpu.slam.mono import MonoSlam


def _blur(img: np.ndarray, k: int = 5) -> np.ndarray:
    """Separable box blur (cheap motion-blur stand-in)."""
    out = img.astype(np.float32)
    kernel = np.ones(k, np.float32) / k
    out = np.apply_along_axis(
        lambda r: np.convolve(r, kernel, mode="same"), 1, out
    )
    out = np.apply_along_axis(
        lambda c: np.convolve(c, kernel, mode="same"), 0, out
    )
    return out


@pytest.fixture(scope="module")
def seq():
    return make_sequence(n_frames=40, seed=0, dt=0.1)


def test_tracks_through_blur_and_exposure(seq):
    """Middle of the clip gets blurred and exposure-ramped; the run must
    stay tracked for most frames and keep a bounded trajectory error."""
    slam = MonoSlam(seq.cam, n_features=800, kf_max_interval=5)
    states = []
    for i, (img, ts) in enumerate(zip(seq.images, seq.timestamps)):
        im = np.asarray(img).astype(np.float32)
        if 12 <= i < 20:
            im = _blur(im, k=5)  # camera shake segment
        if 20 <= i < 30:
            gain = 0.55 + 0.05 * (i - 20)  # exposure ramp 0.55x -> 1.0x
            im = im * gain
        states.append(slam.process_frame(im, float(ts)))
    n_ok = sum(1 for s in states if s["state"] == "OK")
    assert n_ok >= len(states) * 0.8, f"only {n_ok}/{len(states)} tracked"
    traj = slam.trajectory_tum()
    rmse = ate_rmse(
        traj[:, 0], traj[:, 1:4], seq.timestamps, seq.c_w, with_scale=True
    )
    assert rmse < 0.10, f"degraded-imaging ATE {rmse:.4f}"


def test_descriptors_invariant_to_exposure(seq):
    """BRIEF sign tests must be (near-)invariant to a global gain: the
    same frame at 0.6x exposure must yield nearly identical descriptors
    on the surviving keypoints."""
    from viorb_tpu.features import OrbExtractor

    ex = OrbExtractor(n_features=600)
    f1 = ex.extract(np.asarray(seq.images[5]).astype(np.float32))
    f2 = ex.extract(np.asarray(seq.images[5]).astype(np.float32) * 0.6)
    xy1 = np.asarray(f1.xy)[np.asarray(f1.valid)]
    xy2 = np.asarray(f2.xy)[np.asarray(f2.valid)]
    d1 = np.asarray(f1.desc01)[np.asarray(f1.valid)]
    d2 = np.asarray(f2.desc01)[np.asarray(f2.valid)]
    # match keypoints by position (same detector on a gain-scaled image)
    dist = np.linalg.norm(xy1[:, None] - xy2[None], axis=-1)
    j = dist.argmin(1)
    close = dist[np.arange(len(xy1)), j] < 1.0
    assert close.sum() > 0.7 * len(xy1), "keypoint set unstable under gain"
    ham = (d1[close] != d2[j[close]]).sum(1)
    assert np.median(ham) <= 8, f"descriptors unstable: median Hamming {np.median(ham)}"
