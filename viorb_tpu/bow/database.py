"""Keyframe database: inverted file over vocabulary words.

Replaces the reference's KeyFrameDatabase (reference:
src/KeyFrameDatabase.cc — DetectLoopCandidates at :76-190 with shared-word
counting, min-score gate, covisibility-group score accumulation;
DetectRelocalizationCandidates analogous).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from viorb_tpu.bow.vocabulary import BinaryVocabulary


class KeyframeDatabase:
    def __init__(self, vocab: BinaryVocabulary):
        self.vocab = vocab
        self.inverted: Dict[int, Set[int]] = defaultdict(set)
        self.bows: Dict[int, Dict[int, float]] = {}

    def add(self, kf_id: int, bow: Dict[int, float]):
        self.bows[kf_id] = bow
        for w in bow:
            self.inverted[w].add(kf_id)

    def remove(self, kf_id: int):
        bow = self.bows.pop(kf_id, None)
        if bow:
            for w in bow:
                self.inverted[w].discard(kf_id)

    def query(
        self,
        bow: Dict[int, float],
        exclude: Set[int] = frozenset(),
        min_score: float = 0.0,
        max_results: int = 10,
    ) -> List[Tuple[int, float]]:
        """Candidates sharing words, scored L1, above min_score (the
        reference additionally requires >= 0.8*max shared words — applied
        here too)."""
        shared: Dict[int, int] = defaultdict(int)
        for w in bow:
            for kf in self.inverted[w]:
                if kf not in exclude:
                    shared[kf] += 1
        if not shared:
            return []
        max_common = max(shared.values())
        min_common = max(int(0.8 * max_common), 1)
        out = []
        for kf, c in shared.items():
            if c < min_common:
                continue
            s = BinaryVocabulary.score(bow, self.bows[kf])
            if s >= min_score:
                out.append((kf, s))
        out.sort(key=lambda x: -x[1])
        return out[:max_results]

    def detect_loop_candidates(
        self,
        kf_id: int,
        bow: Dict[int, float],
        covisible: Set[int],
        min_score: float,
        max_results: int = 10,
    ) -> List[Tuple[int, float]]:
        """Loop candidates: connected keyframes excluded; min_score
        typically the minimum BoW score among the query KF's covisible
        neighbours (reference src/LoopClosing.cc:127-180)."""
        return self.query(
            bow,
            exclude=covisible | {kf_id},
            min_score=min_score,
            max_results=max_results,
        )
