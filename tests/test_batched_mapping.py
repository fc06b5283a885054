"""Unit coverage for the round-4 batched mapping-path machinery: the
fuse dispatch/apply split must be equivalent to the one-pair call, and
the streaming carry re-anchor delta must preserve relative pose under a
published map-update (the lock-step post-BA resync, expressed as a
right-composition)."""

import jax.numpy as jnp
import numpy as np
import pytest

from viorb_tpu.io.synthetic import make_sequence
from viorb_tpu.slam.mono import MonoSlam


@pytest.fixture(scope="module")
def small_map():
    """A tiny initialized map with two keyframes + points."""
    seq = make_sequence(n_frames=6, seed=0, dt=0.1)
    slam = MonoSlam(seq.cam, n_features=400, kf_max_interval=3)
    for img, ts in zip(seq.images, seq.timestamps):
        slam.process_frame(np.asarray(img), float(ts))
    assert slam.state == "OK"
    return slam


def test_fuse_dispatch_apply_matches_single_call(small_map):
    """_fuse_dispatch + _fuse_apply (the batched path) must produce the
    same match assignments as the one-pair _fuse_points_into_kf."""
    slam = small_map
    kf_ids = sorted(slam.map.keyframes.keys())
    kf_id = kf_ids[-1]
    kf = slam.map.keyframes[kf_id]
    own = kf.point_idx[kf.point_idx >= 0]
    assert len(own) > 50

    out = slam._fuse_dispatch(own, kf_id, 3.0)
    assert out is not None
    ids, pf_dev = out
    pf = np.asarray(pf_dev)
    # projecting a keyframe's own points back into it must re-find a
    # large fraction of them at their own features (sanity that the
    # dispatch phase carries the right arrays)
    matched = pf >= 0
    assert matched.sum() > 0.5 * len(own)
    hit_own_feature = 0
    for f in np.nonzero(matched)[0]:
        if kf.point_idx[f] == ids[pf[f]]:
            hit_own_feature += 1
    assert hit_own_feature > 0.8 * matched.sum()
    # apply is a no-op here (every match is already the bound point)
    fused = slam._fuse_apply(ids, pf, kf_id)
    assert fused == 0


def test_carry_reanchor_preserves_relative_pose():
    """T_f' = T_f ∘ (T_kf_old^{-1} ∘ T_kf_new): after the re-anchor the
    frame-to-keyframe relative transform must be unchanged, and velocity
    (a cam-to-cam relative) must be invariant (mono._process_frame_
    streaming's published-map-update correction)."""
    rng = np.random.default_rng(1)

    def rand_pose():
        w = rng.normal(0, 0.3, 3)
        th = np.linalg.norm(w)
        k = w / th
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        return R.astype(np.float32), rng.normal(0, 1, 3).astype(np.float32)

    r_kf_old, t_kf_old = rand_pose()
    r_kf_new, t_kf_new = rand_pose()
    r_f, t_f = rand_pose()

    # the code's delta (mono.py streaming re-anchor)
    d_r = r_kf_old.T @ r_kf_new
    d_t = r_kf_old.T @ (t_kf_new - t_kf_old)
    r_f2 = r_f @ d_r
    t_f2 = r_f @ d_t + t_f

    # relative transform frame<-kf before and after must match
    def rel(r_a, t_a, r_b, t_b):  # T_a ∘ T_b^{-1}
        r = r_a @ r_b.T
        return r, t_a - r @ t_b

    r1, t1 = rel(r_f, t_f, r_kf_old, t_kf_old)
    r2, t2 = rel(r_f2, t_f2, r_kf_new, t_kf_new)
    np.testing.assert_allclose(r1, r2, atol=1e-5)
    np.testing.assert_allclose(t1, t2, atol=1e-5)

    # velocity (T_f ∘ T_prev^{-1}) is invariant when both poses re-anchor
    r_p, t_p = rand_pose()
    r_p2 = r_p @ d_r
    t_p2 = r_p @ d_t + t_p
    rv1, tv1 = rel(r_f, t_f, r_p, t_p)
    rv2, tv2 = rel(r_f2, t_f2, r_p2, t_p2)
    np.testing.assert_allclose(rv1, rv2, atol=1e-5)
    np.testing.assert_allclose(tv1, tv2, atol=1e-5)
