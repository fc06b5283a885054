"""Binary BoW vocabulary: k-branch tree over 256-bit descriptors.

Replaces DBoW2's TemplatedVocabulary<FORB> (reference:
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h — transform at
:135-153/:1063-1079, L1 scoring via ScoringObject.cpp, binary save/load
at :241-259 used by tools/bin_vocabulary.cc).

TPU-native design: the tree descent is BATCHED MATMUL — each level's
candidate children are gathered as {-1,+1} rows and compared to all query
descriptors with one dot product per level, so transforming a whole
frame's 1000 descriptors costs L (depth) small matmuls. Training is
host-side k-medians on binary descriptors (the reference ships a
pre-trained vocabulary; we train on-domain in seconds).
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class BinaryVocabulary(NamedTuple):
    """Complete k-ary tree, array form.

    children: (n_nodes, k) int32 node ids (-1 = none);
    centers_pm1: (n_nodes, 256) f32 in {-1,+1} (root row unused);
    is_leaf: (n_nodes,) bool; word_id: (n_nodes,) int32 (-1 for non-leaf);
    idf: (n_words,) f32 weights.
    """

    children: np.ndarray
    centers_pm1: np.ndarray
    is_leaf: np.ndarray
    word_id: np.ndarray
    idf: np.ndarray

    @property
    def k(self) -> int:
        return self.children.shape[1]

    @property
    def n_words(self) -> int:
        return len(self.idf)

    def save(self, path: str):
        np.savez_compressed(
            path,
            children=self.children,
            centers=(self.centers_pm1 > 0).astype(np.uint8),
            is_leaf=self.is_leaf,
            word_id=self.word_id,
            idf=self.idf,
        )

    @staticmethod
    def load(path: str) -> "BinaryVocabulary":
        d = np.load(path)
        return BinaryVocabulary(
            children=d["children"],
            centers_pm1=d["centers"].astype(np.float32) * 2 - 1,
            is_leaf=d["is_leaf"],
            word_id=d["word_id"],
            idf=d["idf"],
        )

    # -- transform --------------------------------------------------------

    def transform(self, desc01: np.ndarray, valid: np.ndarray | None = None):
        """(N,256) {0,1} descriptors -> (word_ids (N,), bow dict word->weight).

        Host-side numpy descent (vectorized over N); transform_device is
        the jitted on-device version for the per-keyframe path.
        """
        d = desc01.astype(np.float32) * 2 - 1
        n = len(d)
        node = np.zeros(n, np.int64)
        if valid is None:
            valid = np.ones(n, bool)
        active = valid.copy()
        for _ in range(64):  # depth bound
            leaf = self.is_leaf[node]
            work = active & ~leaf
            if not work.any():
                break
            ch = self.children[node[work]]  # (M,k)
            cent = self.centers_pm1[np.maximum(ch, 0)]  # (M,k,256)
            sim = np.einsum("mkd,md->mk", cent, d[work])
            sim[ch < 0] = -1e9
            best = np.argmax(sim, axis=1)
            node[work] = ch[np.arange(len(best)), best]
        words = np.where(valid, self.word_id[node], -1)
        bow: Dict[int, float] = {}
        for w in words[words >= 0]:
            bow[int(w)] = bow.get(int(w), 0.0) + float(self.idf[w])
        # L1 normalize
        s = sum(bow.values())
        if s > 0:
            bow = {k: v / s for k, v in bow.items()}
        return words, bow

    def transform_device(self, desc_pm1, valid):
        """Jitted batched tree descent: every level is one gathered
        (N,k,256)x(N,256) contraction — the whole frame descends in L
        matmuls (the docstring's 'batched matmul' path, replacing DBoW2's
        per-descriptor recursive transform).

        desc_pm1: (N,256) {-1,+1} device array; valid: (N,) bool.
        Returns (word_ids (N,) i32 device, bow dict word->weight host)."""
        arrs = _device_cache.get(id(self))
        if arrs is None:
            arrs = (
                jnp.asarray(self.children),
                jnp.asarray(self.centers_pm1),
                jnp.asarray(self.is_leaf),
                jnp.asarray(self.word_id),
                jnp.asarray(self.idf),
            )
            _device_cache[id(self)] = arrs
        words, weights = _descend_device(
            *arrs, jnp.asarray(desc_pm1, jnp.float32), jnp.asarray(valid)
        )
        words_np = np.asarray(words)
        weights_np = np.asarray(weights)
        bow: Dict[int, float] = {}
        for w in np.unique(words_np[words_np >= 0]):
            bow[int(w)] = float(weights_np[w])
        return words_np, bow

    @staticmethod
    def score(bow_a: Dict[int, float], bow_b: Dict[int, float]) -> float:
        """L1 score in [0,1] (reference DBoW2::L1Scoring):
        s = 1 - 1/2 |va - vb|_1 over the union = sum over common words of
        (|a|+|b|-|a-b|)/2."""
        s = 0.0
        for w, va in bow_a.items():
            vb = bow_b.get(w)
            if vb is not None:
                s += abs(va) + abs(vb) - abs(va - vb)
        return 0.5 * s


_device_cache: Dict[int, tuple] = {}


@jax.jit
def _descend_device(children, centers_pm1, is_leaf, word_id, idf, desc_pm1, valid):
    """Batched descent to leaves + tf-idf word histogram (L1-normalized)."""
    n = desc_pm1.shape[0]
    node = jnp.zeros(n, jnp.int32)

    def body(_, node):
        ch = children[node]  # (N,k)
        cent = centers_pm1[jnp.maximum(ch, 0)]  # (N,k,256)
        sim = jnp.einsum("nkd,nd->nk", cent, desc_pm1)
        sim = jnp.where(ch >= 0, sim, -1e9)
        best = jnp.take_along_axis(
            ch, jnp.argmax(sim, axis=1)[:, None], axis=1
        )[:, 0]
        return jnp.where(is_leaf[node], node, best)

    # depth bound: vocabulary trees are shallow (depth<=8)
    node = jax.lax.fori_loop(0, 8, body, node)
    words = jnp.where(valid, word_id[node], -1)
    n_words = idf.shape[0]
    hist = jnp.zeros(n_words, jnp.float32).at[
        jnp.where(words >= 0, words, n_words)
    ].add(jnp.where(words >= 0, idf[jnp.maximum(words, 0)], 0.0), mode="drop")
    hist = hist / jnp.maximum(jnp.sum(hist), 1e-12)
    return words, hist


def train_vocabulary(
    descriptors01: np.ndarray,  # (N,256) {0,1}
    k: int = 8,
    depth: int = 4,
    seed: int = 0,
    kmeans_iters: int = 8,
) -> BinaryVocabulary:
    """Hierarchical k-medians with Hamming distance (same construction as
    DBoW2's create(); the reference ships ORBvoc trained offline)."""
    rng = np.random.default_rng(seed)
    d = descriptors01.astype(np.uint8)

    children_rows: List[np.ndarray] = []
    centers_rows: List[np.ndarray] = [np.zeros(256, np.float32)]  # root center unused
    children_rows.append(np.full(k, -1, np.int32))  # root, filled later
    is_leaf: List[bool] = [False]
    word_of: List[int] = [-1]
    n_words = 0
    word_counts: List[int] = []

    def kmedians(data: np.ndarray):
        m = len(data)
        kk = min(k, m)
        centers = data[rng.choice(m, kk, replace=False)].astype(np.float32)
        for _ in range(kmeans_iters):
            # Hamming distances via +-1 dot
            dpm = data.astype(np.float32) * 2 - 1
            cpm = centers * 2 - 1
            sim = dpm @ cpm.T
            assign = np.argmax(sim, axis=1)
            for c in range(kk):
                sel = data[assign == c]
                if len(sel) == 0:
                    centers[c] = data[rng.integers(m)]
                else:
                    centers[c] = (sel.mean(0) > 0.5).astype(np.float32)
        return centers.astype(np.uint8), assign

    def build(node_id: int, data: np.ndarray, level: int):
        nonlocal n_words
        if level == depth or len(data) <= k:
            is_leaf[node_id] = True
            word_of[node_id] = n_words
            word_counts.append(len(data))
            n_words += 1
            return
        centers, assign = kmedians(data)
        ch_ids = []
        for c in range(len(centers)):
            cid = len(children_rows)
            children_rows.append(np.full(k, -1, np.int32))
            centers_rows.append(centers[c].astype(np.float32))
            is_leaf.append(False)
            word_of.append(-1)
            ch_ids.append(cid)
        row = np.full(k, -1, np.int32)
        row[: len(ch_ids)] = ch_ids
        children_rows[node_id] = row
        for c, cid in enumerate(ch_ids):
            sel = data[assign == c]
            if len(sel) == 0:
                is_leaf[cid] = True
                word_of[cid] = n_words
                word_counts.append(0)
                n_words += 1
            else:
                build(cid, sel, level + 1)

    build(0, d, 0)
    total = max(len(d), 1)
    idf = np.array(
        [np.log(total / max(c, 1)) for c in word_counts], np.float32
    )
    return BinaryVocabulary(
        children=np.stack(children_rows),
        centers_pm1=np.stack(centers_rows) * 2 - 1,
        is_leaf=np.array(is_leaf),
        word_id=np.array(word_of, np.int32),
        idf=idf,
    )
