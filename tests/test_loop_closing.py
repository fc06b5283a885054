"""Loop-closing test on a constructed drifted map: a keyframe chain whose
tail revisits the start with accumulated Sim3 drift and duplicated map
points; the loop closer must detect, verify, and pull the tail back."""

import jax.numpy as jnp
import numpy as np
import pytest

from viorb_tpu.bow import train_vocabulary
from viorb_tpu.geometry.so3 import exp_so3
from viorb_tpu.mapping.map import KeyFrameData, MapStore
from viorb_tpu.slam.loop_closing import LoopCloser


def make_kf(kf_id, ts, r_cw, t_cw, xy, desc, n_feat=256):
    valid = np.zeros(n_feat, bool)
    valid[: len(xy)] = True
    xy_p = np.zeros((n_feat, 2), np.float32)
    xy_p[: len(xy)] = xy
    d = np.zeros((n_feat, 256), np.uint8)
    d[: len(desc)] = desc
    return KeyFrameData(
        kf_id=kf_id,
        timestamp=ts,
        r_cw=r_cw.astype(np.float32),
        t_cw=t_cw.astype(np.float32),
        xy=xy_p,
        level=np.zeros(n_feat, np.int32),
        angle=np.zeros(n_feat, np.float32),
        desc01=d,
        valid=valid,
        point_idx=np.full(n_feat, -1, np.int32),
    )


def test_loop_closing_corrects_drift(rng):
    n_places = 12  # ring of places; place i seen by KF i
    pts_per_place = 40
    # physical world: each place has points at distinct locations with
    # distinct descriptors
    place_pts = [
        np.stack(
            [
                rng.uniform(-2, 2, pts_per_place),
                rng.uniform(-2, 2, pts_per_place),
                rng.uniform(5, 8, pts_per_place),
            ],
            1,
        ).astype(np.float32)
        + np.array([4.0 * i, 0, 0], np.float32)
        for i in range(n_places)
    ]
    place_desc = [
        rng.integers(0, 2, size=(pts_per_place, 256)).astype(np.uint8)
        for i in range(n_places)
    ]
    vocab = train_vocabulary(np.concatenate(place_desc), k=8, depth=3)

    # keyframe trajectory: visits places 0..11, then REVISITS places 0,1,2
    # with drift (sim3: small scale + translation error)
    store = MapStore()
    lc = LoopCloser(store, vocab, min_matches=15, covis_consistency=2)

    visits = list(range(n_places)) + [0, 1, 2]
    # drift accumulates GRADUALLY (like real odometry): per-visit scale
    # factor and translation error compound along the trajectory
    n_v = len(visits)
    step_s = 1.08 ** (1.0 / (n_v - 1))
    step_t = np.array([0.8, 0.5, -0.4], np.float32) / (n_v - 1)

    kf_of_visit = []
    gt_poses = []
    closed_at = None
    for v_idx, place in enumerate(visits):
        drift_s = step_s**v_idx
        drift_t = step_t * v_idx
        # ground-truth pose: looking at place (identity rot, shifted x)
        r_cw = np.eye(3, dtype=np.float32)
        c_w = np.array([4.0 * place, 0.0, 0.0], np.float32)
        t_cw = -r_cw @ c_w
        gt_poses.append((r_cw.copy(), t_cw.copy()))
        pts = place_pts[place]
        desc = place_desc[place]
        if v_idx > 0:
            # drifted pose and (for revisits) drifted duplicate points
            c_w_d = c_w * drift_s + drift_t
            t_cw = -r_cw @ c_w_d
            pts = (pts * drift_s + drift_t).astype(np.float32)
        # observations: project roughly (uv unused by loop closer)
        uv = rng.uniform(0, 400, size=(pts_per_place, 2)).astype(np.float32)
        kf = make_kf(0, float(v_idx), r_cw, t_cw, uv, desc)
        kf_id = store.add_keyframe(kf)
        kf_of_visit.append(kf_id)
        # map points: first visit creates; drifted revisit creates
        # DUPLICATES (as real drifted tracking would)
        for f in range(pts_per_place):
            p = store.add_point(pts[f], desc[f], kf_id, f)
        # covisibility edge to previous KF: share a few points
        if v_idx > 0:
            prev = kf_of_visit[v_idx - 1]
            # add cross observations for ~16 points to build covisibility
            for f in range(16):
                store.add_observation(
                    int(store.keyframes[prev].point_idx[f + 16]), kf_id,
                    int(pts_per_place + f) % 256,
                )
        closed = lc.process(kf_id)
        if closed:
            closed_at = v_idx
            break  # a real tracker continues from corrected state; the
            # scripted drifted poses beyond this point would be stale

    assert lc.loops_closed >= 1, "no loop closed"
    assert closed_at is not None and closed_at >= n_places

    # the triggering (revisit) keyframe must be pulled near its gt pose
    kf = store.keyframes[kf_of_visit[closed_at]]
    r_gt, t_gt = gt_poses[closed_at]
    c_gt = -r_gt.T @ t_gt
    err_after = np.linalg.norm(kf.center() - c_gt)
    drift_before = np.linalg.norm(
        (np.array([4.0 * visits[closed_at], 0, 0]) * (step_s**closed_at)
         + step_t * closed_at)
        - c_gt
    )
    assert err_after < 0.3, f"center err {err_after:.3f} (drift was {drift_before:.3f})"
    # mid-chain keyframes absorb the distributed correction: the far end
    # of the chain (place 11) must have moved toward consistency with gt
    kf_far = store.keyframes[kf_of_visit[n_places - 1]]
    c_far_gt = np.array([4.0 * (n_places - 1), 0, 0])
    err_far = np.linalg.norm(kf_far.center() - c_far_gt)
    drift_far = np.linalg.norm(
        (c_far_gt * (step_s ** (n_places - 1)) + step_t * (n_places - 1))
        - c_far_gt
    )
    assert err_far < drift_far, (err_far, drift_far)
