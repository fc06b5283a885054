"""Native C++ map-index kernels vs numpy fallbacks."""

import numpy as np
import pytest

from viorb_tpu import native


@pytest.fixture(autouse=True)
def ensure_lib():
    assert native.get_lib() is not None, "native lib failed to build"


def test_covis_count_matches_numpy(rng):
    max_points, slots, max_kf = 500, 8, 20
    obs_kf = rng.integers(-1, max_kf, size=(max_points, slots)).astype(np.int32)
    pts = rng.choice(max_points, 100, replace=False).astype(np.int64)
    out = native.covis_count(pts, obs_kf, exclude_kf=3, max_kf=max_kf)
    ref = np.zeros(max_kf, np.int32)
    for p in pts:
        for k in obs_kf[p]:
            if 0 <= k < max_kf and k != 3:
                ref[k] += 1
    np.testing.assert_array_equal(out, ref)


def test_union_points(rng):
    n = 1000
    active = rng.random(n) > 0.3
    idx = rng.integers(-1, n, size=5000).astype(np.int32)
    out = native.union_points(idx, active)
    ref = np.zeros(n, np.uint8)
    sel = idx[idx >= 0]
    sel = sel[active[sel]]
    ref[sel] = 1
    np.testing.assert_array_equal(out, ref)


def _random_map(rng, n_kf=6, n_feat=80, n_pts=120):
    from viorb_tpu.mapping.map import KeyFrameData, MapStore

    store = MapStore()
    for k in range(n_kf):
        r = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
        kf = KeyFrameData(
            kf_id=-1,
            timestamp=0.1 * k,
            r_cw=r,
            t_cw=rng.normal(size=3).astype(np.float32),
            xy=rng.uniform(0, 400, size=(n_feat, 2)).astype(np.float32),
            level=rng.integers(0, 8, n_feat).astype(np.int32),
            angle=np.zeros(n_feat, np.float32),
            desc01=(rng.random((n_feat, 256)) > 0.5).astype(np.uint8),
            valid=np.ones(n_feat, bool),
            point_idx=np.full(n_feat, -1, np.int32),
        )
        store.add_keyframe(kf)
    used = {k: set() for k in range(n_kf)}
    for _ in range(n_pts):
        k0 = int(rng.integers(0, n_kf))
        free = [f for f in range(n_feat) if f not in used[k0]]
        if not free:
            continue
        f0 = int(rng.choice(free))
        used[k0].add(f0)
        p = store.add_point(
            rng.normal(size=3).astype(np.float32) * 3,
            store.keyframes[k0].desc01[f0], k0, f0,
        )
        for k1 in range(n_kf):
            if k1 == k0 or rng.random() > 0.5:
                continue
            free1 = [f for f in range(n_feat) if f not in used[k1]]
            if not free1:
                continue
            f1 = int(rng.choice(free1))
            used[k1].add(f1)
            store.add_observation(p, k1, f1)
    return store


def test_update_point_stats_native_matches_fallback(rng, monkeypatch):
    import copy

    store = _random_map(rng)
    pts = store.active_point_ids()
    ref = copy.deepcopy(store)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    ref.update_point_stats(pts)  # numpy fallback path (the spec)
    monkeypatch.undo()
    assert native.get_lib() is not None
    store.update_point_stats(pts)  # native path
    np.testing.assert_array_equal(store.pt_desc01[pts], ref.pt_desc01[pts])
    np.testing.assert_allclose(
        store.pt_normal[pts], ref.pt_normal[pts], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        store.pt_max_dist[pts], ref.pt_max_dist[pts], rtol=1e-5
    )
    np.testing.assert_allclose(
        store.pt_min_dist[pts], ref.pt_min_dist[pts], rtol=1e-5
    )


def test_build_ba_grid(rng):
    max_points, slots, max_kf, n_feat = 200, 8, 10, 64
    obs_kf = rng.integers(-1, max_kf, size=(max_points, slots)).astype(np.int32)
    obs_feat = rng.integers(0, n_feat, size=(max_points, slots)).astype(np.int32)
    slot_of_kf = np.full(max_kf, -1, np.int32)
    for i, k in enumerate([2, 5, 7]):
        slot_of_kf[k] = i
    xy_all = rng.uniform(0, 400, size=(3, n_feat, 2)).astype(np.float32)
    level_all = rng.integers(0, 8, size=(3, n_feat)).astype(np.int32)
    inv_s2_lv = (1.0 / 1.2 ** (2 * np.arange(16))).astype(np.float32)
    pts = rng.choice(max_points, 50, replace=False).astype(np.int64)
    kf_idx, uv, inv_s2, valid = native.build_ba_grid(
        pts, obs_kf, obs_feat, slot_of_kf, xy_all, level_all, inv_s2_lv
    )
    # spot-check against python loop
    for row in range(50):
        p = pts[row]
        for s in range(slots):
            k = obs_kf[p, s]
            if k < 0 or slot_of_kf[k] < 0:
                assert not valid[row, s]
                continue
            assert valid[row, s]
            sl = slot_of_kf[k]
            assert kf_idx[row, s] == sl
            f = obs_feat[p, s]
            np.testing.assert_allclose(uv[row, s], xy_all[sl, f])
            np.testing.assert_allclose(inv_s2[row, s], inv_s2_lv[level_all[sl, f]])
