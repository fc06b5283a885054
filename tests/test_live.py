"""Live TCP transport (the reference RealTimeDataHandle analogue): a
publisher streams image+IMU messages over localhost, LiveSource feeds the
standard MsgSynchronizer, and the synced bundles match what was sent."""

import threading

import numpy as np

from viorb_tpu.io.live import LivePublisher, LiveSource
from viorb_tpu.io.stream import MsgSynchronizer, RealtimeRunner


def test_live_tcp_roundtrip():
    pub = LivePublisher()
    host, port = pub.address
    sync = MsgSynchronizer()
    src_box = {}

    def connect():
        src_box["src"] = LiveSource(host, port, sync).start()

    t = threading.Thread(target=connect)
    t.start()
    pub.wait_subscriber()
    t.join()
    src = src_box["src"]

    rng = np.random.default_rng(0)
    imgs = [rng.uniform(0, 255, (24, 32)).astype(np.float32) for _ in range(3)]
    k = 0
    for i, img in enumerate(imgs):
        ts = 0.1 * (i + 1)
        pub.send_image(ts, img)
        # IMU strictly past the frame stamp so the synchronizer releases
        # (a sample at exactly img_ts float-compares short of 0.1*(i+1))
        for _ in range(5):
            k += 1
            pub.send_imu(0.02 * k + 0.001, [0.01, 0, 0], [0, 0, 9.81])

    got = []
    for _ in range(3):
        out = sync.get_synced(timeout=10.0)
        assert out is not None, "synchronizer starved"
        got.append(out)
    for i, (ts, img, samples) in enumerate(got):
        assert abs(ts - 0.1 * (i + 1)) < 1e-9
        np.testing.assert_array_equal(img, imgs[i])
        assert all(s[0] <= ts for s in samples)
        assert samples, "no IMU delivered with the frame"
        np.testing.assert_allclose(samples[0][2], [0, 0, 9.81])

    pub.close()
    src.join(timeout=10.0)
    assert src.n_images == 3 and src.n_imu == 15
    # stream closed -> get_synced unblocks with None
    assert sync.get_synced(timeout=5.0) is None


def test_live_feeds_realtime_runner():
    pub = LivePublisher()
    host, port = pub.address
    sync = MsgSynchronizer()
    src_box = {}
    t = threading.Thread(
        target=lambda: src_box.setdefault(
            "src", LiveSource(host, port, sync).start()
        )
    )
    t.start()
    pub.wait_subscriber()
    t.join()

    seen = []

    def process(ts, image, samples):
        seen.append((ts, image.shape, len(samples)))
        return {"state": "OK"}

    runner = RealtimeRunner(sync, process, mode="lockstep").start()
    rng = np.random.default_rng(1)
    k = 0
    for i in range(4):
        pub.send_image(0.1 * (i + 1), rng.uniform(0, 255, (16, 16)).astype(np.float32))
        for _ in range(4):
            k += 1
            pub.send_imu(0.025 * k + 0.001, [0, 0, 0], [0, 0, 9.81])
    pub.close()
    n = runner.join(timeout=20.0)
    assert n == 4, f"processed {n}"
    assert [round(s[0], 3) for s in seen] == [0.1, 0.2, 0.3, 0.4]
