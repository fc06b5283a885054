"""Feature engine: ORB pyramid extraction + MXU Hamming matching.

Per-frame hot kernels #1 and #2 of the reference (src/ORBextractor.cc,
src/ORBmatcher.cc), re-designed as whole-image batched XLA programs.
"""

from viorb_tpu.features.extractor import FrameFeatures, OrbExtractor
from viorb_tpu.features.matching import (
    hamming_matrix,
    match_with_mask,
    rotation_consistency_mask,
    window_gate,
    valid_gate,
    MatchResult,
    TH_LOW,
    TH_HIGH,
)
