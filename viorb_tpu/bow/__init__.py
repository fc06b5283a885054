"""Binary bag-of-words place recognition (DBoW2 replacement).

Reference counterparts: Thirdparty/DBoW2 TemplatedVocabulary (k-branch
tree, tf-idf BoW + direct index, SURVEY.md C20) and KeyFrameDatabase's
inverted file (C12).
"""

from viorb_tpu.bow.vocabulary import BinaryVocabulary, train_vocabulary
from viorb_tpu.bow.database import KeyframeDatabase


def default_vocabulary() -> BinaryVocabulary:
    """The shipped general-purpose vocabulary (assets/vocab.npz, built by
    bow.build_asset from held-out worlds) — the counterpart of the
    reference's stock ORBvoc (tools/bin_vocabulary.cc:6-30)."""
    from viorb_tpu.bow.build_asset import ASSET_PATH

    return BinaryVocabulary.load(ASSET_PATH)
