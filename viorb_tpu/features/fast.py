"""FAST corner detection, fully vectorized over the image plane.

Replaces the reference's per-cell OpenCV FAST calls (reference:
src/ORBextractor.cc:765-853 ComputeKeyPointsOctTree, thresholds 20 with
7 fallback) with a branch-free whole-image formulation:

  * the 16 Bresenham-circle neighbours are materialised with jnp.roll —
    16 shifted views, pure VPU work;
  * the segment test ("9 contiguous brighter/darker") is evaluated for
    ALL window positions at once via iterative rolled min/max reductions;
  * the returned score map is the exact arc strength
        s(p) = max(max_w min_{i in w}(p_i - c), max_w min_{i in w}(c - p_i))
    i.e. the largest threshold at which p is still a corner — the same
    quantity OpenCV's FAST score computes by bisection.

Corner-ness at threshold t is then simply `score > t`, so the reference's
20 -> 7 fallback becomes a ranking rule instead of a second detector pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (dy, dx), clockwise from 12 o'clock —
# standard FAST-16 geometry.
CIRCLE_OFFSETS = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)

ARC_LEN = 9  # contiguous run length for FAST-9/16


def fast_score_map(image: jax.Array) -> jax.Array:
    """(H,W) f32 -> (H,W) f32 corner score (0 where not a corner at t=0).

    Border of 3 px is zeroed. On the TPU backend this dispatches to the
    Pallas kernel (features/fast_pallas.py — image resident in VMEM, one
    HBM read + one write instead of the (16,H,W) intermediate stack);
    both paths produce identical scores (tests/test_fast_pallas.py).
    """
    if jax.default_backend() == "tpu":
        from viorb_tpu.features.fast_pallas import fast_score_map_pallas

        return fast_score_map_pallas(image)
    return _fast_score_map_jnp(image)


def _fast_score_map_jnp(image: jax.Array) -> jax.Array:
    c = image
    # neighbours: (16,H,W)
    neigh = jnp.stack(
        [jnp.roll(image, (-dy, -dx), axis=(0, 1)) for dy, dx in CIRCLE_OFFSETS]
    )
    bright = neigh - c[None]  # p_i - c
    dark = -bright

    def arc_strength(d):
        # max over 16 circular windows of the min over ARC_LEN entries.
        # min over window via log-step rolled mins would need power-of-two;
        # ARC_LEN=9 = 8+1: m8 = min over 8 consecutive, then min(m8, roll 8).
        m = d
        m2 = jnp.minimum(m, jnp.roll(m, -1, axis=0))
        m4 = jnp.minimum(m2, jnp.roll(m2, -2, axis=0))
        m8 = jnp.minimum(m4, jnp.roll(m4, -4, axis=0))
        m9 = jnp.minimum(m8, jnp.roll(d, -8, axis=0))
        return jnp.max(m9, axis=0)

    score = jnp.maximum(arc_strength(bright), arc_strength(dark))
    score = jnp.maximum(score, 0.0)
    # zero the 3px border (rolled values wrap around there)
    h, w = image.shape
    score = score.at[:3, :].set(0.0).at[-3:, :].set(0.0)
    score = score.at[:, :3].set(0.0).at[:, -3:].set(0.0)
    return score


def grid_topk_keypoints(
    score: jax.Array,
    n_target: int,
    cell: int = 16,
    min_score: float = 7.0,
    border: int = 19,
):
    """Spatially-distributed keypoint selection with static shapes.

    Replaces the reference's quadtree DistributeOctTree (reference:
    src/ORBextractor.cc:539) with: per-cell argmax (enforces spacing), then
    top-n_target cells by score. Returns (ys, xs, scores, valid) each
    (n_target,). Cells whose best corner is below `min_score` (the
    reference's fallback threshold) are invalid.
    """
    h, w = score.shape
    # mask the descriptor border
    score = jnp.where(
        (jnp.arange(h)[:, None] >= border)
        & (jnp.arange(h)[:, None] < h - border)
        & (jnp.arange(w)[None, :] >= border)
        & (jnp.arange(w)[None, :] < w - border),
        score,
        0.0,
    )
    hc, wc = h // cell, w // cell
    s = score[: hc * cell, : wc * cell].reshape(hc, cell, wc, cell)
    s = s.transpose(0, 2, 1, 3).reshape(hc, wc, cell * cell)
    cell_best = jnp.max(s, axis=-1)  # (hc,wc)
    cell_arg = jnp.argmax(s, axis=-1)  # (hc,wc) in-cell flat index

    flat_best = cell_best.reshape(-1)
    k = min(n_target, flat_best.shape[0])
    top_scores, top_cells = jax.lax.top_k(flat_best, k)
    cy = top_cells // wc
    cx = top_cells % wc
    inner = cell_arg.reshape(-1)[top_cells]
    ys = cy * cell + inner // cell
    xs = cx * cell + inner % cell
    valid = top_scores > min_score
    if k < n_target:  # pad
        pad = n_target - k
        ys = jnp.concatenate([ys, jnp.zeros(pad, ys.dtype)])
        xs = jnp.concatenate([xs, jnp.zeros(pad, xs.dtype)])
        top_scores = jnp.concatenate([top_scores, jnp.zeros(pad, top_scores.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
    return ys, xs, top_scores, valid
