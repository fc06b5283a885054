"""Binary bag-of-words place recognition (DBoW2 replacement).

Reference counterparts: Thirdparty/DBoW2 TemplatedVocabulary (k-branch
tree, tf-idf BoW + direct index, SURVEY.md C20) and KeyFrameDatabase's
inverted file (C12).
"""

from viorb_tpu.bow.vocabulary import BinaryVocabulary, train_vocabulary
from viorb_tpu.bow.database import KeyframeDatabase
