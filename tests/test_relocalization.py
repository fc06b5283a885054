"""Relocalization test: blank frames mid-sequence force tracking loss
(the reference's test.DiscardTime fault injection, SURVEY.md §4.5); the
system must relocalize via BoW + PnP and continue."""

import numpy as np
import pytest

from viorb_tpu.bow import train_vocabulary
from viorb_tpu.eval.ate import ate_rmse
from viorb_tpu.io.synthetic import make_sequence
from viorb_tpu.slam.mono import MonoSlam


def test_relocalization_after_blackout():
    seq = make_sequence(n_frames=40, seed=0, dt=0.1)
    # vocabulary trained on descriptors from the sequence itself
    from viorb_tpu.features import OrbExtractor

    ex = OrbExtractor(n_features=600)
    descs = []
    for i in (0, 10, 20):
        f = ex.extract(seq.images[i])
        descs.append(np.asarray(f.desc01)[np.asarray(f.valid)])
    vocab = train_vocabulary(np.concatenate(descs), k=8, depth=3)

    slam = MonoSlam(seq.cam, n_features=800, vocabulary=vocab)
    blank = np.zeros_like(seq.images[0])
    states = []
    lost_seen = False
    reloc_seen = False
    for i, (img, ts) in enumerate(zip(seq.images, seq.timestamps)):
        if 20 <= i < 24:
            img = blank  # blackout
        info = slam.process_frame(img, float(ts))
        states.append(info["state"])
        if info["state"] == "LOST":
            lost_seen = True
        if lost_seen and info["state"] == "OK":
            reloc_seen = True
    assert lost_seen, "blackout did not cause loss"
    assert reloc_seen, f"never relocalized: {states}"
    # tracking continues to the end
    assert states[-1] == "OK"
    n_ok_after = sum(1 for s in states[24:] if s == "OK")
    assert n_ok_after >= 12, states[24:]
