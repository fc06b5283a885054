"""Build the STANDING vocabulary artifact (assets/vocab.npz).

The reference ships a general pre-trained ORB vocabulary and a binary
loader (reference: Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:241-259,
tools/bin_vocabulary.cc:6-30) so place recognition works on scenes never
seen at training time. This is its counterpart: train the k-medians tree
on descriptors harvested from several HELD-OUT synthetic worlds (seeds
disjoint from every test/bench seed), save once, load everywhere.

Usage:  python -m viorb_tpu.bow.build_asset [out.npz]
"""

from __future__ import annotations

import os
import sys

import numpy as np

ASSET_PATH = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "assets", "vocab.npz"
)
# held-out worlds: test/bench clips use seeds 0-9
TRAIN_SEEDS = (101, 202, 303, 404)


def build(out_path: str = ASSET_PATH, frames_per_world: int = 8) -> str:
    from viorb_tpu.bow.vocabulary import train_vocabulary
    from viorb_tpu.features import OrbExtractor
    from viorb_tpu.io.synthetic import make_sequence

    extractor = OrbExtractor(n_features=800)
    descs = []
    for seed in TRAIN_SEEDS:
        seq = make_sequence(n_frames=frames_per_world, seed=seed, dt=0.15)
        for img in seq.images:
            f = extractor.extract(np.asarray(img))
            d = np.asarray(f.desc01)[np.asarray(f.valid)]
            descs.append(d)
    data = np.concatenate(descs)
    vocab = train_vocabulary(data, k=10, depth=3, seed=7)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    vocab.save(out_path)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else ASSET_PATH
    path = build(out)
    print(f"wrote {path}")
