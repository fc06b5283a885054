"""Dataset loaders: TUM RGB-D, EuRoC MAV, KITTI odometry.

Counterparts of the reference's example mains' loaders (reference:
Examples/Monocular/mono_tum.cc LoadImages, mono_euroc.cc:33-130 with
EuRoC_TimeStamps, mono_kitti.cc; RGB-D associations files). Images load
lazily as float32 grayscale via a minimal PGM/PNG reader.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np


def _load_gray(path: str) -> np.ndarray:
    """Grayscale f32 image loader. PNG via matplotlib if available, PGM
    natively (datasets ship PNG; the synthetic pipeline uses npz)."""
    if path.endswith((".pgm", ".PGM")):
        with open(path, "rb") as f:
            assert f.readline().strip() in (b"P5", b"P2")
            ln = f.readline()
            while ln.startswith(b"#"):
                ln = f.readline()
            w, h = map(int, ln.split())
            maxv = int(f.readline())
            data = np.frombuffer(f.read(), np.uint8 if maxv < 256 else ">u2")
            return data.reshape(h, w).astype(np.float32) * (255.0 / maxv)
    try:
        import matplotlib.image as mpimg

        img = mpimg.imread(path)
        if img.ndim == 3:
            img = img[..., :3].mean(-1)
        if img.max() <= 1.0:
            img = img * 255.0
        return img.astype(np.float32)
    except Exception as e:  # pragma: no cover
        raise RuntimeError(f"cannot load image {path}: {e}")


@dataclass
class MonoFrameStream:
    timestamps: np.ndarray
    image_paths: List[str]

    def __len__(self):
        return len(self.image_paths)

    def __iter__(self) -> Iterator[Tuple[float, np.ndarray]]:
        for t, p in zip(self.timestamps, self.image_paths):
            yield float(t), _load_gray(p)


def load_tum_mono(seq_dir: str) -> MonoFrameStream:
    """TUM RGB-D rgb.txt format: '# comments' then 'timestamp filename'."""
    ts, paths = [], []
    with open(os.path.join(seq_dir, "rgb.txt")) as f:
        for ln in f:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            t, rel = ln.split()[:2]
            ts.append(float(t))
            paths.append(os.path.join(seq_dir, rel))
    return MonoFrameStream(np.array(ts), paths)


def load_tum_rgbd(seq_dir: str, associations: str):
    """TUM RGB-D with an associations file: 't_rgb rgb t_depth depth'."""
    ts, rgb, depth = [], [], []
    with open(associations) as f:
        for ln in f:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            parts = ln.split()
            ts.append(float(parts[0]))
            rgb.append(os.path.join(seq_dir, parts[1]))
            depth.append(os.path.join(seq_dir, parts[3]))
    return MonoFrameStream(np.array(ts), rgb), depth


def load_depth(path: str, depth_map_factor: float = 5000.0) -> np.ndarray:
    """Depth image -> meters (reference Examples/RGB-D/rgbd_tum.cc reads
    16-bit PNGs scaled by DepthMapFactor=5000). Supports .npy (synthetic
    dumps), 16-bit PGM, and PNG via matplotlib."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if path.endswith((".pgm", ".PGM")):
        with open(path, "rb") as f:
            assert f.readline().strip() in (b"P5", b"P2")
            ln = f.readline()
            while ln.startswith(b"#"):
                ln = f.readline()
            w, h = map(int, ln.split())
            maxv = int(f.readline())
            data = np.frombuffer(f.read(), np.uint8 if maxv < 256 else ">u2")
            return data.reshape(h, w).astype(np.float32) / depth_map_factor
    import matplotlib.image as mpimg

    img = mpimg.imread(path)
    if img.ndim == 3:
        img = img[..., 0]
    if img.dtype.kind == "f":
        # matplotlib normalizes PNG to [0,1] (16-bit loses nothing)
        img = img * 65535.0
    return img.astype(np.float32) / depth_map_factor


def load_euroc_mono(seq_dir: str, timestamp_file: Optional[str] = None) -> MonoFrameStream:
    """EuRoC mav0/cam0/data + data.csv (ns timestamps)."""
    cam_dir = os.path.join(seq_dir, "mav0", "cam0")
    ts, paths = [], []
    with open(os.path.join(cam_dir, "data.csv")) as f:
        for ln in f:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            t_ns, name = ln.split(",")[:2]
            ts.append(int(t_ns) * 1e-9)
            paths.append(os.path.join(cam_dir, "data", name.strip()))
    return MonoFrameStream(np.array(ts), paths)


def load_euroc_imu(seq_dir: str):
    """EuRoC mav0/imu0/data.csv: t_ns, wx, wy, wz, ax, ay, az.
    Returns (t (S,), gyro (S,3), acc (S,3))."""
    rows = []
    with open(os.path.join(seq_dir, "mav0", "imu0", "data.csv")) as f:
        for ln in f:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            vals = [float(x) for x in ln.split(",")]
            rows.append(vals)
    arr = np.array(rows)
    return arr[:, 0] * 1e-9, arr[:, 1:4], arr[:, 4:7]


def load_kitti_mono(seq_dir: str, cam: int = 0) -> MonoFrameStream:
    """KITTI odometry: image_0/ + times.txt."""
    with open(os.path.join(seq_dir, "times.txt")) as f:
        ts = np.array([float(x) for x in f.read().split()])
    img_dir = os.path.join(seq_dir, f"image_{cam}")
    paths = [
        os.path.join(img_dir, f"{i:06d}.png") for i in range(len(ts))
    ]
    return MonoFrameStream(ts, paths)


def load_euroc_stereo(seq_dir: str):
    """EuRoC cam0 (left) + cam1 (right). Returns (left MonoFrameStream,
    right image paths aligned to left timestamps)."""
    left = load_euroc_mono(seq_dir)
    cam1 = os.path.join(seq_dir, "mav0", "cam1", "data")
    right = [os.path.join(cam1, os.path.basename(p)) for p in left.image_paths]
    return left, right


def load_kitti_stereo(seq_dir: str):
    """KITTI odometry gray stereo: image_0 (left) + image_1 (right)."""
    left = load_kitti_mono(seq_dir, cam=0)
    img1 = os.path.join(seq_dir, "image_1")
    right = [
        os.path.join(img1, os.path.basename(p)) for p in left.image_paths
    ]
    return left, right


def load_euroc_groundtruth(seq_dir: str):
    """EuRoC state_groundtruth_estimate0/data.csv -> (t, xyz, quat wxyz)
    (the format evaluate_viorb/euroc_to_tum.py converts)."""
    path = os.path.join(
        seq_dir, "mav0", "state_groundtruth_estimate0", "data.csv"
    )
    rows = []
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            vals = [float(x) for x in ln.split(",")]
            rows.append(vals)
    arr = np.array(rows)
    return arr[:, 0] * 1e-9, arr[:, 1:4], arr[:, 4:8]
