"""Descriptor matching: Hamming distance as an MXU matmul.

Replaces the reference's ORBmatcher (reference: src/ORBmatcher.cc, popcount
DescriptorDistance at include/ORBmatcher.h:44, thresholds TH_LOW=50 /
TH_HIGH=100 at src/ORBmatcher.cc:37-39) with the TPU-native trick:

  for descriptors recoded to {-1,+1}^256,  <a, b> = 256 - 2*Hamming(a,b)
  =>  Hamming = (256 - A @ B^T) / 2

One bf16 matmul computes the full N x M distance matrix (1024x1024x256
~ 0.5 GFLOP — microseconds on the MXU); every gating strategy of the
reference's Search* family (projection window, epipolar line, BoW node,
rotation histogram) becomes a MASK added to the distance matrix before the
row-wise argmin, instead of per-feature candidate lists.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

N_BITS = 256
TH_LOW = 50.0
TH_HIGH = 100.0
HISTO_BINS = 30
BIG = 1e9


def hamming_matrix(desc_a: jax.Array, desc_b: jax.Array) -> jax.Array:
    """desc_{a,b}: (N,256)/(M,256) in {-1,+1} (bf16 recommended) ->
    (N,M) f32 Hamming distances. Invalid (all-zero) rows produce 128 —
    mask separately."""
    sim = jax.lax.dot_general(
        desc_a,
        desc_b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    return 0.5 * (N_BITS - sim)


class MatchResult(NamedTuple):
    """idx: (N,) best column per row (-1 if no match); dist: (N,) distance."""

    idx: jax.Array
    dist: jax.Array


def match_with_mask(
    dist: jax.Array,
    allowed: jax.Array,
    max_dist: float = TH_LOW,
    ratio: float = 1.0,
    mutual: bool = True,
) -> MatchResult:
    """Row-wise best match under a boolean gate matrix.

    allowed: (N,M) bool. Applies: distance threshold, best/second-best
    ratio test (the reference's mfNNratio), and mutual-best (the
    reference's cross-check via Fuse/duplicate suppression).
    """
    d = jnp.where(allowed, dist, BIG)
    # top-2 smallest per row via top_k on negated values
    neg = -d
    vals, idxs = jax.lax.top_k(neg, 2)
    best = -vals[:, 0]
    second = -vals[:, 1]
    best_idx = idxs[:, 0]
    ok = (best <= max_dist) & (best <= ratio * second)
    if mutual:
        col_best = jnp.argmin(d, axis=0)  # (M,)
        ok &= col_best[best_idx] == jnp.arange(d.shape[0])
    return MatchResult(jnp.where(ok, best_idx, -1), jnp.where(ok, best, BIG))


def rotation_consistency_mask(
    angle_a: jax.Array,
    angle_b: jax.Array,
    idx: jax.Array,
    n_bins: int = HISTO_BINS,
    keep_bins: int = 3,
) -> jax.Array:
    """The reference's rotation-histogram filter (src/ORBmatcher.cc
    ComputeThreeMaxima): histogram the per-match angle deltas, keep only
    matches in the `keep_bins` most popular bins. Returns (N,) bool."""
    valid = idx >= 0
    da = angle_a - angle_b[jnp.clip(idx, 0)]
    da = jnp.mod(da, 2 * jnp.pi)
    bins = jnp.clip(
        (da * (n_bins / (2 * jnp.pi))).astype(jnp.int32), 0, n_bins - 1
    )
    counts = jnp.zeros(n_bins, jnp.int32).at[bins].add(valid.astype(jnp.int32))
    top_counts, top_bins = jax.lax.top_k(counts, keep_bins)
    # like the reference's ComputeThreeMaxima: a lower-max bin only counts
    # if it holds >= 10% of the best bin
    keep = top_counts >= jnp.maximum(
        (0.1 * top_counts[0]).astype(jnp.int32), 1
    )
    in_top = ((bins[:, None] == top_bins[None, :]) & keep[None, :]).any(axis=1)
    return valid & in_top


def window_gate(
    xy_a: jax.Array,
    xy_b: jax.Array,
    radius: jax.Array | float,
    level_a: jax.Array | None = None,
    level_b: jax.Array | None = None,
    max_level_diff: int = 1,
) -> jax.Array:
    """(N,2),(M,2) -> (N,M) bool: |xy_a - xy_b| within radius (optionally
    per-row radius) and pyramid-level agreement — the projection-window
    gate of SearchByProjection (reference src/ORBmatcher.cc)."""
    d2 = jnp.sum((xy_a[:, None, :] - xy_b[None, :, :]) ** 2, axis=-1)
    if jnp.ndim(radius) == 1:
        r2 = (radius**2)[:, None]
    else:
        r2 = radius**2
    gate = d2 <= r2
    if level_a is not None and level_b is not None:
        gate &= jnp.abs(level_a[:, None] - level_b[None, :]) <= max_level_diff
    return gate


def valid_gate(valid_a: jax.Array, valid_b: jax.Array) -> jax.Array:
    return valid_a[:, None] & valid_b[None, :]
