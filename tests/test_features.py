"""Feature-engine tests: FAST correctness on synthetic corners, extractor
invariances (rotation repeatability of descriptors), matcher equivalence
with numpy popcount Hamming."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viorb_tpu.features import (
    FrameFeatures,
    OrbExtractor,
    hamming_matrix,
    match_with_mask,
    rotation_consistency_mask,
    window_gate,
)
from viorb_tpu.features.fast import fast_score_map


def checkerboard(h=240, w=320, sq=24, lo=40.0, hi=220.0):
    ys, xs = np.mgrid[0:h, 0:w]
    img = np.where(((ys // sq) + (xs // sq)) % 2 == 0, lo, hi)
    return img.astype(np.float32)


def textured_image(h=240, w=320, seed=0):
    """Random blobby texture with corners at many scales."""
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, size=(h // 8, w // 8)).astype(np.float32)
    img = np.kron(img, np.ones((8, 8), np.float32))
    img += rng.uniform(0, 30, size=(h, w)).astype(np.float32)
    return np.clip(img, 0, 255)


def test_fast_detects_square_corners():
    """L-corners of a solid square pass the FAST-9 segment test (an ideal
    checkerboard X-junction does not — 8/8 split)."""
    img = np.full((120, 120), 40.0, np.float32)
    img[40:80, 40:80] = 220.0
    score = np.asarray(fast_score_map(jnp.asarray(img)))
    strong = score > 20
    ys, xs = np.nonzero(strong)
    assert len(ys) >= 4
    # all detections near the 4 square corners
    corners = np.array([[40, 40], [40, 79], [79, 40], [79, 79]])
    for y, x in zip(ys, xs):
        assert np.abs(corners - [y, x]).sum(axis=1).min() <= 4
    # flat regions have zero score
    assert score[50:70, 50:70].max() == 0.0
    assert score[5:30, 5:30].max() == 0.0


def test_fast_no_corners_on_flat():
    img = np.full((100, 100), 128.0, np.float32)
    score = np.asarray(fast_score_map(jnp.asarray(img)))
    assert score.max() == 0.0


def test_extractor_basic():
    ex = OrbExtractor(n_features=500)
    img = textured_image()
    feats = ex.extract(img)
    n_valid = int(np.asarray(feats.valid).sum())
    assert n_valid > 200, f"only {n_valid} features"
    xy = np.asarray(feats.xy)[np.asarray(feats.valid)]
    assert xy[:, 0].max() < 320 and xy[:, 1].max() < 240
    assert xy[:, 0].min() >= 0 and xy[:, 1].min() >= 0
    # multiple pyramid levels represented
    lv = np.asarray(feats.level)[np.asarray(feats.valid)]
    assert len(np.unique(lv)) >= 3
    # descriptors are not degenerate
    d = np.asarray(feats.desc01)[np.asarray(feats.valid)]
    means = d.mean(axis=0)
    assert 0.1 < means.mean() < 0.9


def test_extractor_deterministic():
    ex = OrbExtractor(n_features=300)
    img = textured_image(seed=3)
    f1 = ex.extract(img)
    f2 = ex.extract(img)
    np.testing.assert_array_equal(np.asarray(f1.xy), np.asarray(f2.xy))
    np.testing.assert_array_equal(np.asarray(f1.desc01), np.asarray(f2.desc01))


def test_descriptor_translation_repeatability():
    """Shifting the image must shift keypoints and keep descriptors close."""
    ex = OrbExtractor(n_features=400)
    img = textured_image(seed=1, h=256, w=320)
    shift = 8
    img2 = np.roll(img, shift, axis=1)
    f1 = ex.extract(img)
    f2 = ex.extract(img2)
    d1 = f1.descriptors_pm1()
    d2 = f2.descriptors_pm1()
    dist = np.asarray(hamming_matrix(d1, d2))
    v1 = np.asarray(f1.valid)
    v2 = np.asarray(f2.valid)
    xy1 = np.asarray(f1.xy)
    xy2 = np.asarray(f2.xy)
    # for each valid f1 feature away from borders, there should be an f2
    # feature at +shift with a small hamming distance
    matched = 0
    total = 0
    for i in np.nonzero(v1)[0]:
        if not (20 < xy1[i, 0] < 320 - 20 - shift):
            continue
        expected = xy1[i] + np.array([shift, 0])
        dd = np.linalg.norm(xy2 - expected, axis=1)
        cand = np.nonzero((dd < 3.0) & v2)[0]
        if len(cand) == 0:
            continue
        total += 1
        if dist[i, cand].min() < 60:
            matched += 1
    assert total > 30
    assert matched / total > 0.7, f"{matched}/{total}"


def test_hamming_matrix_vs_numpy():
    rng = np.random.default_rng(7)
    a01 = rng.integers(0, 2, size=(64, 256)).astype(np.uint8)
    b01 = rng.integers(0, 2, size=(80, 256)).astype(np.uint8)
    a = jnp.asarray(a01, jnp.float32) * 2 - 1
    b = jnp.asarray(b01, jnp.float32) * 2 - 1
    d = np.asarray(hamming_matrix(a, b))
    ref = (a01[:, None, :] != b01[None, :, :]).sum(-1)
    np.testing.assert_allclose(d, ref, atol=0.5)


def test_match_with_mask_mutual_and_threshold():
    rng = np.random.default_rng(8)
    base = rng.integers(0, 2, size=(32, 256)).astype(np.uint8)
    # b = a with 10 flipped bits (dist 10), plus distractors at dist ~128
    noise_idx = rng.permutation(256)[:10]
    b01 = base.copy()
    b01[:, noise_idx] ^= 1
    distract = rng.integers(0, 2, size=(32, 256)).astype(np.uint8)
    ball = np.concatenate([distract, b01])
    a = jnp.asarray(base, jnp.float32) * 2 - 1
    b = jnp.asarray(ball, jnp.float32) * 2 - 1
    dist = hamming_matrix(a, b)
    allowed = jnp.ones(dist.shape, bool)
    res = match_with_mask(dist, allowed, max_dist=50.0)
    idx = np.asarray(res.idx)
    assert (idx == np.arange(32) + 32).all()
    # with tight threshold nothing matches
    res2 = match_with_mask(dist, allowed, max_dist=5.0)
    assert (np.asarray(res2.idx) == -1).all()


def test_window_gate():
    xa = jnp.asarray([[0.0, 0.0], [10.0, 10.0]])
    xb = jnp.asarray([[1.0, 0.0], [50.0, 50.0]])
    g = np.asarray(window_gate(xa, xb, 5.0))
    assert g[0, 0] and not g[0, 1] and not g[1, 0] and not g[1, 1]


def test_rotation_consistency():
    idx = jnp.asarray(np.arange(64))
    ang_a = jnp.zeros(64)
    # 60 matches rotated by 0.5 rad, 4 outliers scattered
    ang_b = np.full(64, -0.5, np.float32)
    ang_b[:4] = [2.0, -2.0, 1.0, 3.0]
    mask = np.asarray(
        rotation_consistency_mask(ang_a, jnp.asarray(ang_b), idx)
    )
    assert mask[4:].all()
    assert not mask[:4].any()
