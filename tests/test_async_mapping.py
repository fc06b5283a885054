"""Async mapping: tracking must not block on keyframe insertion, results
must stay close to lock-step, and the worker must shut down cleanly
(reference: the LocalMapping thread, src/System.cc:240-271, with BA abort
on new-keyframe arrival, src/LocalMapping.cc:1137-1142)."""

import numpy as np
import pytest

from viorb_tpu.eval.ate import ate_rmse
from viorb_tpu.io.synthetic import make_sequence
from viorb_tpu.slam.mono import MonoSlam


@pytest.fixture(scope="module")
def sequence():
    return make_sequence(n_frames=40, seed=0, dt=0.1)


def test_async_mapping_matches_lockstep(sequence):
    seq = sequence
    slam = MonoSlam(
        seq.cam, n_features=800, kf_max_interval=5, async_mapping=True
    )
    try:
        for img, ts in zip(seq.images, seq.timestamps):
            info = slam.process_frame(img, float(ts))
        slam.wait_mapping_idle()
        assert info["state"] == "OK", info
        assert slam.map.version > 0, "mapping worker never ran"
        traj = slam.trajectory_tum()
        rmse = ate_rmse(
            traj[:, 0], traj[:, 1:4], seq.timestamps, seq.c_w, with_scale=True
        )
        # async trades some refinement for latency: the worker skips BA
        # while newer keyframes are pending (reference mbAbortBA), so on a
        # CPU-bound host fewer window solves land than in lock-step
        # (the reference's realtime mode differs from lock-step the same
        # way) — bound is 2x the lock-step one
        assert rmse < 0.06, f"sim3 ATE RMSE {rmse:.4f}"
    finally:
        slam.shutdown()


def test_tracking_latency_and_kf_gating_under_slow_mapping(sequence):
    """With the mapping job artificially slowed, (a) tracking frames must
    not serialize with the worker — keyframe insertion only queues — and
    (b) the queue-depth gate in NeedNewKeyFrame must stop KF production
    from outrunning the worker (VERDICT r2 items 2 and 9)."""
    import time

    seq = sequence
    slam = MonoSlam(
        seq.cam, n_features=800, kf_max_interval=5, async_mapping=True
    )
    delay = 1.0
    orig_job = slam._mapping_job

    def slow_job(kf_id):
        time.sleep(delay)
        orig_job(kf_id)

    slam._mapping_job = slow_job
    try:
        lat = []
        kf_events = []
        for img, ts in zip(seq.images, seq.timestamps):
            n_before = len(slam.map.keyframes)
            t0 = time.perf_counter()
            slam.process_frame(img, float(ts))
            lat.append(time.perf_counter() - t0)
            kf_events.append(len(slam.map.keyframes) > n_before)
        # frames that inserted a keyframe only QUEUE the job: their
        # latency must not include the worker's delay
        kf_lat = [l for l, e in zip(lat, kf_events) if e]
        assert kf_lat, "no keyframes inserted"
        assert np.median(kf_lat) < delay, (
            f"KF-inserting frames serialized with mapping: {np.median(kf_lat):.2f}s"
        )
        # KF production bounded by the interval cap + queue gate: with the
        # gate the ratio trigger cannot fire while the worker is behind
        n_kf = sum(kf_events)
        assert n_kf <= len(seq.images) / slam.kf_max_interval + 3, (
            f"KF blowup under slow mapping: {n_kf}"
        )
    finally:
        slam.shutdown()


def test_async_worker_clean_shutdown(sequence):
    seq = sequence
    slam = MonoSlam(seq.cam, n_features=800, async_mapping=True)
    for img, ts in list(zip(seq.images, seq.timestamps))[:10]:
        slam.process_frame(img, float(ts))
    slam.wait_mapping_idle()
    slam.shutdown()
    assert slam._worker is None
