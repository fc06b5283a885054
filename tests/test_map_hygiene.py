"""Map hygiene: point fusion (SearchInNeighbors/Fuse), MapPoint::Replace
semantics, and duplicate-landmark control on a revisit sequence."""

import numpy as np
import pytest

from viorb_tpu.geometry.camera import PinholeCamera
from viorb_tpu.mapping.map import KeyFrameData, MapStore
from viorb_tpu.slam.mono import MonoSlam

CAM = PinholeCamera(fx=450.0, fy=450.0, cx=376.0, cy=240.0, width=752, height=480)


def _kf_at(t_cw, xy, desc01, kf_id_unused=0, ts=0.0):
    n = len(xy)
    return KeyFrameData(
        kf_id=-1,
        timestamp=ts,
        r_cw=np.eye(3, dtype=np.float32),
        t_cw=np.asarray(t_cw, np.float32),
        xy=np.asarray(xy, np.float32),
        level=np.zeros(n, np.int32),
        angle=np.zeros(n, np.float32),
        desc01=np.asarray(desc01, np.uint8),
        valid=np.ones(n, bool),
        point_idx=np.full(n, -1, np.int32),
    )


def test_replace_point_merges_observations():
    store = MapStore()
    rng = np.random.default_rng(0)
    desc = rng.integers(0, 2, (4, 256)).astype(np.uint8)
    kf_a = _kf_at([0, 0, 0], [[100, 100], [200, 200]], desc[:2])
    kf_b = _kf_at([0.1, 0, 0], [[105, 100], [205, 200]], desc[2:])
    ia = store.add_keyframe(kf_a)
    ib = store.add_keyframe(kf_b)
    p = store.add_point([0, 0, 5.0], desc[0], ia, 0)
    q = store.add_point([0.01, 0, 5.0], desc[2], ib, 0)
    store.add_observation(p, ib, 1)  # p seen in B too
    store.replace_point(q, p)
    assert not store.pt_active[q]
    # q's observation (B, feat 0) moved to p unless B already observed p
    assert (store.obs_kf[p] == ib).sum() >= 1
    assert kf_b.point_idx[0] in (p, -1)
    assert store.pt_found[p] >= 2


def test_fusion_merges_duplicates_on_revisit():
    """Two keyframes see the same 3D points through duplicate map entries;
    fusion must merge them (reference SearchInNeighbors,
    src/LocalMapping.cc:1487)."""
    rng = np.random.default_rng(1)
    slam = MonoSlam(CAM, n_features=200)
    n = 40
    pts3d = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 8, n)],
        axis=1,
    ).astype(np.float32)
    desc = rng.integers(0, 2, (n, 256)).astype(np.uint8)

    def project(t_cw):
        pc = pts3d + t_cw
        uv = np.stack(
            [
                CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx,
                CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy,
            ],
            axis=1,
        ).astype(np.float32)
        return uv

    kf1 = _kf_at([0, 0, 0], project(np.zeros(3)), desc, ts=0.0)
    kf2 = _kf_at([0.2, 0, 0], project(np.array([0.2, 0, 0])), desc, ts=1.0)
    i1 = slam.map.add_keyframe(kf1)
    i2 = slam.map.add_keyframe(kf2)
    # duplicate landmarks: each keyframe got its own copy of every point
    for f in range(n):
        slam.map.add_point(pts3d[f], desc[f], i1, f)
    for f in range(n):
        slam.map.add_point(pts3d[f], desc[f], i2, f)
    assert len(slam.map.active_point_ids()) == 2 * n

    slam._search_in_neighbors(i2, [i1])
    n_after = len(slam.map.active_point_ids())
    assert n_after <= 1.2 * n, f"{n_after} points left after fusion (want ~{n})"
    # every surviving point observed by both keyframes
    pts = slam.map.active_point_ids()
    both = sum(
        1
        for p in pts
        if {i1, i2} <= set(slam.map.obs_kf[p][slam.map.obs_kf[p] >= 0].tolist())
    )
    assert both > 0.8 * len(pts)


def test_spanning_tree_valid_and_persisted(tmp_path):
    """Every non-root keyframe gets a spanning-tree parent (the older KF
    sharing the most observations, reference KeyFrame::mpParent); parent
    walks terminate at a root; culling re-parents orphans; the tree
    survives a save/load round trip."""
    from viorb_tpu.io.synthetic import make_sequence
    from viorb_tpu.mapping.serialize import load_map, save_map

    seq = make_sequence(n_frames=30, seed=0, dt=0.1)
    slam = MonoSlam(seq.cam, n_features=800, kf_max_interval=3)
    for img, ts in zip(seq.images, seq.timestamps):
        slam.process_frame(img, float(ts))
    ids = sorted(slam.map.keyframes)
    assert len(ids) >= 5
    roots = [k for k in ids if slam.map.keyframes[k].parent_kf < 0]
    assert roots == [ids[0]], f"exactly the first KF is the root: {roots}"
    for k in ids[1:]:
        p = slam.map.keyframes[k].parent_kf
        assert p in slam.map.keyframes, f"kf {k} parent {p} culled but not re-parented"
        assert p < k, f"kf {k} parent {p} not older"
        # walk to the root without cycles
        seen = set()
        cur = k
        while cur >= 0:
            assert cur not in seen, f"cycle at {cur}"
            seen.add(cur)
            cur = slam.map.keyframes[cur].parent_kf
        assert ids[0] in seen

    path = str(tmp_path / "map.npz")
    save_map(slam.map, path)
    loaded = load_map(path)
    for k in ids:
        assert loaded.keyframes[k].parent_kf == slam.map.keyframes[k].parent_kf


def test_point_store_grows_past_initial_capacity(rng):
    """The SoA store must grow geometrically instead of raising at the
    initial capacity (reference maps are unbounded, src/Map.cc; VERDICT
    r4 Missing #5). Data written before the growth must survive it."""
    store = MapStore(max_points=64)
    kf = _kf_at([0, 0, 0], rng.uniform(0, 400, (300, 2)),
                (rng.random((300, 256)) > 0.5).astype(np.uint8))
    store.add_keyframe(kf)
    first = store.add_point(
        np.array([1.0, 2.0, 3.0], np.float32), kf.desc01[0], 0, 0
    )
    for f in range(1, 200):
        store.add_point(
            rng.normal(size=3).astype(np.float32), kf.desc01[f], 0, f
        )
    assert store.max_points >= 200
    assert store.pt_active[:200].all()
    np.testing.assert_allclose(store.pt_xyz[first], [1.0, 2.0, 3.0])
    assert store.obs_kf[first, 0] == 0
    # batch growth too
    kf2 = _kf_at([0, 0, 1], rng.uniform(0, 400, (600, 2)),
                 (rng.random((600, 256)) > 0.5).astype(np.uint8))
    store.add_keyframe(kf2)
    ids = store.add_points_batch(
        rng.normal(size=(300, 3)).astype(np.float32),
        (rng.random((300, 256)) > 0.5).astype(np.uint8),
        1, np.arange(300, dtype=np.int32),
        1, np.arange(300, 600, dtype=np.int32),
    )
    assert len(ids) == 300 and store.pt_active[ids].all()
    assert store.max_points >= 500
