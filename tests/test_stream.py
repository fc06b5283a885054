"""Stream ingestion tests: MsgSynchronizer alignment/discontinuity logic
and the realtime runner's lockstep/drop-when-behind modes (reference
Examples/ROS/ORB_VIO/src/MsgSync/MsgSynchronizer.cpp, ros_vio.cc:263-276,
ros_vio_realtime.cc)."""

import threading
import time

import numpy as np

from viorb_tpu.io.stream import MsgSynchronizer, RealtimeRunner


def _img(v=0):
    return np.full((4, 4), v, np.uint8)


def test_sync_waits_for_imu():
    s = MsgSynchronizer()
    s.add_image(0.10, _img())
    # no IMU yet: not ready
    assert s.get_synced(timeout=0.05) is None
    for t in np.arange(0.0, 0.09, 0.01):
        s.add_imu(float(t), np.zeros(3), np.zeros(3))
    assert s.get_synced(timeout=0.05) is None  # IMU still behind image
    s.add_imu(0.11, np.zeros(3), np.zeros(3))
    out = s.get_synced(timeout=0.5)
    assert out is not None
    ts, img, samples = out
    assert ts == 0.10
    # all samples <= image stamp delivered (0.11 stays queued)
    assert [round(t, 2) for t, _, _ in samples] == [
        round(t, 2) for t in np.arange(0.0, 0.09, 0.01)
    ]


def test_sync_image_delay():
    s = MsgSynchronizer(image_delay=0.05)
    s.add_image(0.10, _img())
    s.add_imu(0.12, np.zeros(3), np.zeros(3))
    assert s.get_synced(timeout=0.05) is None  # needs imu >= 0.15
    s.add_imu(0.16, np.zeros(3), np.zeros(3))
    out = s.get_synced(timeout=0.5)
    assert out is not None
    _, _, samples = out
    assert [t for t, _, _ in samples] == [0.12]  # <= 0.15 cutoff


def test_sync_discontinuity_resets():
    s = MsgSynchronizer(discontinuity_s=3.0)
    s.add_image(0.0, _img())
    s.add_imu(0.1, np.zeros(3), np.zeros(3))
    s.add_image(10.0, _img())  # 10 s jump: reset; 10.0 starts the new epoch
    assert s.n_discontinuities == 1
    assert s.get_synced(timeout=0.05) is None  # old queues cleared, no IMU yet
    s.add_image(10.1, _img())
    s.add_imu(10.2, np.zeros(3), np.zeros(3))  # must NOT re-trigger a reset
    assert s.n_discontinuities == 1
    out = s.get_synced(timeout=0.5)
    assert out is not None and out[0] == 10.0 and out[2] == []
    out = s.get_synced(timeout=0.5)
    assert out is not None and out[0] == 10.1


def test_runner_lockstep_processes_all():
    s = MsgSynchronizer()
    seen = []
    runner = RealtimeRunner(
        s, lambda ts, img, samples: {"ts": ts, "n_imu": len(samples)},
        mode="lockstep", on_result=lambda ts, info: seen.append(ts),
    ).start()

    def feed():
        for i in range(20):
            for j in range(5):
                s.add_imu(0.1 * i + 0.02 * j, np.zeros(3), np.zeros(3))
            s.add_image(0.1 * i, _img(i))
            time.sleep(0.002)
        s.add_imu(2.05, np.zeros(3), np.zeros(3))
        s.close()

    t = threading.Thread(target=feed)
    t.start()
    t.join()
    n = runner.join(timeout=10)
    assert n == 20
    assert seen == sorted(seen) and len(seen) == 20


def test_runner_realtime_drops_when_behind():
    s = MsgSynchronizer()
    seen = []

    def slow_process(ts, img, samples):
        time.sleep(0.05)  # pipeline slower than the 100 Hz feed
        return {"ts": ts}

    runner = RealtimeRunner(
        s, slow_process, mode="realtime",
        on_result=lambda ts, info: seen.append(ts),
    ).start()
    for i in range(30):
        s.add_imu(0.01 * i + 0.005, np.zeros(3), np.zeros(3))
        s.add_image(0.01 * i, _img(i))
        time.sleep(0.005)
    s.close()
    runner.join(timeout=10)
    assert s.n_dropped_images > 0
    # in-order, latest frame processed
    assert seen == sorted(seen)
    assert len(seen) < 30
    assert seen[-1] >= 0.2


def test_images_only_stream():
    """with_imu=False releases frames immediately (the reference's
    vision-only ROS nodes have no IMU catch-up wait)."""
    sync = MsgSynchronizer(with_imu=False)
    sync.add_image(0.1, np.zeros((4, 4), np.float32))
    sync.add_image(0.2, np.ones((4, 4), np.float32))
    ts1, img1, samples1 = sync.get_synced(timeout=1.0)
    assert ts1 == 0.1 and samples1 == []
    ts2, _, _ = sync.get_synced(timeout=1.0)
    assert ts2 == 0.2
    sync.close()
    assert sync.get_synced(timeout=1.0) is None


def test_ate_cli(tmp_path, capsys):
    """eval.ate CLI reports the reference evaluate_ate_scale.py fields."""
    from viorb_tpu.eval.ate import main as ate_main

    t = np.arange(10) * 0.1
    xyz = np.stack([np.sin(t), np.cos(t), t], 1)
    est = np.column_stack([t, 2.0 * xyz, np.zeros((10, 3)), np.ones(10)])
    gt = np.column_stack([t, xyz, np.zeros((10, 3)), np.ones(10)])
    pe, pg = str(tmp_path / "e.txt"), str(tmp_path / "g.txt")
    np.savetxt(pe, est)
    np.savetxt(pg, gt)
    ate_main([pe, pg, "--scale"])
    out = capsys.readouterr().out
    assert "absolute_translational_error.rmse 0.000000" in out
    assert "alignment_scale 0.5" in out
