"""Headless viewer tests (reference Viewer/FrameDrawer/MapDrawer parity,
src/Viewer.cc:54-120 / src/FrameDrawer.cc / src/MapDrawer.cc — ours renders
PNG dumps instead of a Pangolin window)."""

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from viorb_tpu.mapping.map import KeyFrameData, MapStore
from viorb_tpu.viz import FrameDrawer, MapDrawer, Viewer


def _tiny_map():
    m = MapStore(max_points=64)
    rng = np.random.default_rng(0)
    for i in range(3):
        kf = KeyFrameData(
            kf_id=-1, timestamp=0.1 * i,
            r_cw=np.eye(3, dtype=np.float32),
            t_cw=np.array([0.1 * i, 0, 0], np.float32),
            xy=rng.uniform(0, 100, (8, 2)).astype(np.float32),
            level=np.zeros(8, np.int32), angle=np.zeros(8, np.float32),
            desc01=np.zeros((8, 256), np.uint8), valid=np.ones(8, bool),
            point_idx=np.full(8, -1, np.int32),
        )
        m.add_keyframe(kf)
    for _ in range(10):
        m.add_point(
            rng.uniform(-2, 2, 3).astype(np.float32),
            np.zeros(256, np.uint8), kf_id=0, feat_idx=0,
        )
    return m


@dataclass
class _FakeFrame:
    xy: np.ndarray
    valid: np.ndarray
    point_idx: Optional[np.ndarray]
    r_cw: np.ndarray
    t_cw: np.ndarray


class _FakeSlam:
    def __init__(self):
        self.map = _tiny_map()
        rng = np.random.default_rng(1)
        self.last_frame = _FakeFrame(
            xy=rng.uniform(5, 90, (20, 2)).astype(np.float32),
            valid=np.ones(20, bool),
            point_idx=np.where(np.arange(20) % 2 == 0, 1, -1).astype(np.int32),
            r_cw=np.eye(3, dtype=np.float32),
            t_cw=np.zeros(3, np.float32),
        )


def test_frame_drawer_overlay():
    fd = FrameDrawer()
    img = np.full((96, 128), 120, np.uint8)
    xy = np.array([[10, 10], [60, 40], [120, 90]], np.float32)
    out = fd.draw(img, xy, np.array([True, False, True]),
                  np.ones(3, bool), "OK", 42, 3, 10)
    assert out.shape == (96 + 12, 128, 3)
    # tracked keypoint stamped green, untracked blue
    assert (out[10 + 12 - 2, 10 - 2 : 10 + 3] == [60, 220, 60]).all(axis=-1).any()
    assert (out[40 + 12 - 1, 59:62] == [80, 140, 255]).all(axis=-1).any()
    # LOST adds a red border
    lost = fd.draw(img, None, None, None, "LOST", 0, 3, 10)
    assert (lost[0] == [230, 60, 60]).all()


def test_map_drawer_writes_png(tmp_path):
    m = _tiny_map()
    path = str(tmp_path / "map.png")
    MapDrawer().draw(m, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), path)
    assert os.path.exists(path) and os.path.getsize(path) > 1000


def test_viewer_orchestration(tmp_path):
    v = Viewer(str(tmp_path), every=2, map_every=4)
    slam = _FakeSlam()
    img = np.full((96, 128), 100, np.uint8)
    for i in range(6):
        v.on_frame(slam, img, {"state": "OK", "n_tracked": 10, "ts": 0.1 * i})
    v.finalize(slam)
    files = sorted(os.listdir(tmp_path))
    frames = [f for f in files if f.startswith("frame_")]
    maps = [f for f in files if f.startswith("map_")]
    assert len(frames) == 3  # frames 0,2,4
    assert "map_final.png" in maps and len(maps) >= 2
