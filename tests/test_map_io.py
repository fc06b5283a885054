"""Map checkpoint/resume + localization-only mode (the reference left
SaveMap/LoadMap as a TODO, include/System.h:132-134; localization-only is
System::ActivateLocalizationMode, src/Tracking.cc:908-1010)."""

import numpy as np

from viorb_tpu.bow import train_vocabulary
from viorb_tpu.features import OrbExtractor
from viorb_tpu.io.synthetic import make_sequence
from viorb_tpu.mapping.serialize import load_map, save_map
from viorb_tpu.slam.mono import MonoSlam


def _vocab(seq):
    ex = OrbExtractor(n_features=600)
    descs = []
    for i in (0, 10, 20):
        f = ex.extract(seq.images[i])
        descs.append(np.asarray(f.desc01)[np.asarray(f.valid)])
    return train_vocabulary(np.concatenate(descs), k=8, depth=3)


def test_map_roundtrip(tmp_path):
    seq = make_sequence(n_frames=30, seed=0, dt=0.1)
    slam = MonoSlam(seq.cam, n_features=800)
    for img, ts in zip(seq.images[:25], seq.timestamps[:25]):
        slam.process_frame(img, float(ts))
    assert len(slam.map.kf_ids()) >= 2
    path = str(tmp_path / "map.npz")
    save_map(slam.map, path)
    m2 = load_map(path)
    assert sorted(m2.keyframes) == sorted(slam.map.keyframes)
    np.testing.assert_array_equal(m2.pt_active, slam.map.pt_active)
    ids = slam.map.active_point_ids()
    np.testing.assert_allclose(m2.pt_xyz[ids], slam.map.pt_xyz[ids])
    np.testing.assert_array_equal(m2.obs_kf, slam.map.obs_kf)
    for k, kf in slam.map.keyframes.items():
        kf2 = m2.keyframes[k]
        np.testing.assert_allclose(kf2.r_cw, kf.r_cw)
        np.testing.assert_allclose(kf2.t_cw, kf.t_cw)
        np.testing.assert_array_equal(kf2.point_idx, kf.point_idx)
        assert kf2.prev_kf == kf.prev_kf and kf2.next_kf == kf.next_kf
    # internal allocator state survives: a new point lands in a slot that
    # is free in the original map too (no clobbering of live points)
    pid = m2.add_point(
        np.array([0.0, 0.0, 5.0], np.float32),
        np.zeros(256, np.uint8), kf_id=min(m2.keyframes), feat_idx=0,
    )
    assert not slam.map.pt_active[pid]


def test_vi_map_roundtrip_and_resume(tmp_path):
    """VI checkpoint: NavStates, IMU buffers, chain, gravity and biases
    round-trip; a fresh system resumes by relocalizing and re-entering VI
    tracking through the 20-frame bias re-solve (the reference's
    mbRelocBiasPrepare path)."""
    from viorb_tpu.io.synthetic import make_imu
    from viorb_tpu.slam.mono_vi import MonoViSlam

    seq = make_sequence(n_frames=60, seed=0, dt=0.1)
    imu = make_imu(60, 0.1, hz=200.0)
    vocab = _vocab(seq)

    def feed(slam, lo, hi):
        prev_t = seq.timestamps[lo] - 0.1
        infos = []
        for img, ts in zip(seq.images[lo:hi], seq.timestamps[lo:hi]):
            sel = (imu.t > prev_t) & (imu.t <= ts)
            samples = [
                (float(t), g, a)
                for t, g, a in zip(imu.t[sel], imu.gyro[sel], imu.acc[sel])
            ]
            infos.append(slam.process_frame_vi(img, float(ts), samples))
            prev_t = ts
        return infos

    slam = MonoViSlam(
        seq.cam, n_features=800, vi_init_min_time=2.5, vi_init_min_kfs=8,
        kf_max_interval=5, vocabulary=vocab,
    )
    feed(slam, 0, 45)
    assert slam.vi_ready
    path = str(tmp_path / "vimap.npz")
    slam.save_map(path)

    slam2 = MonoViSlam(
        seq.cam, n_features=800, vocabulary=vocab,
    )
    slam2.load_map(path, localization_only=False)
    # pipeline-level VI state round-trips
    assert slam2.vi_ready
    np.testing.assert_allclose(slam2.gravity, slam.gravity)
    np.testing.assert_allclose(slam2.bias_g, slam.bias_g)
    assert slam2.kf_chain == [
        k for k in slam.kf_chain if k in slam.map.keyframes
    ]
    # keyframe NavStates round-trip
    for k, kf in slam.map.keyframes.items():
        if kf.nav and "state" in kf.nav:
            ns1 = kf.nav["state"]
            ns2 = slam2.map.keyframes[k].nav["state"]
            np.testing.assert_allclose(np.asarray(ns2.p), np.asarray(ns1.p))
            np.testing.assert_allclose(np.asarray(ns2.v), np.asarray(ns1.v))
    # resume: relocalize into the loaded map, run the 20-frame bias
    # re-solve, and return to VI tracking
    infos = feed(slam2, 30, 58)
    states = [i["state"] for i in infos]
    assert "OK" in states, states
    assert not slam2.reloc_bias_prepare, "bias re-solve never completed"
    assert slam2.nav_cur is not None, "VI tracking never resumed"
    assert states[-1] == "OK", states


def test_stereo_map_roundtrip(tmp_path):
    """Stereo checkpoint: right-u observations round-trip so the 3-dim
    stereo BA residual survives a resume."""
    from viorb_tpu.io.synthetic import make_stereo_sequence
    from viorb_tpu.slam.stereo import StereoSlam

    seq, right = make_stereo_sequence(n_frames=20, seed=0, dt=0.1, baseline=0.11)
    slam = StereoSlam(seq.cam, baseline=0.11, n_features=800, kf_max_interval=5)
    for img_l, img_r, ts in zip(seq.images, right, seq.timestamps):
        slam.process_frame_stereo(img_l, img_r, float(ts))
    assert len(slam.map.kf_ids()) >= 2
    path = str(tmp_path / "smap.npz")
    slam.save_map(path)
    m2 = load_map(path)
    for k, kf in slam.map.keyframes.items():
        kf2 = m2.keyframes[k]
        assert kf.ur is not None and kf2.ur is not None
        np.testing.assert_allclose(kf2.ur, kf.ur)


def test_localization_only_from_loaded_map(tmp_path):
    seq = make_sequence(n_frames=60, seed=0, dt=0.1)
    vocab = _vocab(seq)
    slam = MonoSlam(seq.cam, n_features=800, vocabulary=vocab)
    poses1 = {}
    for i, (img, ts) in enumerate(zip(seq.images[:45], seq.timestamps[:45])):
        slam.process_frame(img, float(ts))
        if slam.last_frame.r_cw is not None:
            poses1[i] = (
                slam.last_frame.r_cw.copy(), slam.last_frame.t_cw.copy()
            )
    assert slam.state == "OK"
    path = str(tmp_path / "map.npz")
    slam.save_map(path)

    # fresh system: load the map, localization-only
    slam2 = MonoSlam(seq.cam, n_features=800, vocabulary=vocab)
    slam2.load_map(path, localization_only=True)
    n_kfs = len(slam2.map.kf_ids())
    n_pts = len(slam2.map.active_point_ids())
    states = []
    for i, (img, ts) in enumerate(
        zip(seq.images[20:45], seq.timestamps[20:45]), start=20
    ):
        info = slam2.process_frame(img, float(ts))
        states.append(info["state"])
    assert "OK" in states, states
    assert states[-1] == "OK", states
    # frozen map: no new keyframes, no new points
    assert len(slam2.map.kf_ids()) == n_kfs
    assert len(slam2.map.active_point_ids()) == n_pts
    # tracked pose agrees with the mapping run's pose of the SAME frame
    # (same map, same scale)
    fr = slam2.last_frame
    r1, t1 = poses1[44]
    c2 = -fr.r_cw.T @ fr.t_cw
    c1 = -r1.T @ t1
    assert np.linalg.norm(c2 - c1) < 0.1, (c2, c1)


def test_stock_vocabulary_cross_scene_relocalization(tmp_path):
    """The SHIPPED vocabulary (assets/vocab.npz, trained on held-out
    worlds by bow.build_asset — counterpart of the reference's stock
    ORBvoc + binary loader, TemplatedVocabulary.h:241-259) must support
    BoW relocalization in a scene it never saw: map scene A with the
    stock vocab, save, reopen in a fresh session with the SAME stock
    vocab, and relocalize after --load-map."""
    from viorb_tpu.bow import default_vocabulary

    vocab = default_vocabulary()
    assert vocab.n_words >= 200  # a real tree, not a toy
    seq = make_sequence(n_frames=45, seed=0, dt=0.1)  # scene A: unseen
    slam = MonoSlam(seq.cam, n_features=800, vocabulary=vocab)
    for img, ts in zip(seq.images[:45], seq.timestamps[:45]):
        slam.process_frame(img, float(ts))
    assert slam.state == "OK"
    path = str(tmp_path / "map.npz")
    slam.save_map(path)
    slam.shutdown()

    slam2 = MonoSlam(seq.cam, n_features=800, vocabulary=vocab)
    slam2.load_map(path, localization_only=True)
    states = []
    for img, ts in zip(seq.images[25:40], seq.timestamps[25:40]):
        states.append(slam2.process_frame(img, float(ts))["state"])
    assert "OK" in states, states
    assert states[-1] == "OK", states
    slam2.shutdown()
