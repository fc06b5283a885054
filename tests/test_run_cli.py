"""CLI runner smoke test: synthetic VI replay through the MsgSynchronizer
stream path (reference ros_vio.cc lock-step replay + MsgSync queues)."""

import os

import numpy as np

from viorb_tpu import run


def test_run_vi_stream_lockstep(tmp_path):
    out = str(tmp_path / "traj.txt")
    out_kf = str(tmp_path / "kf.txt")
    run.main([
        "--dataset", "synthetic", "--vi", "--frames", "60",
        "--stream", "lockstep", "--out", out, "--out-kf", out_kf,
    ])
    traj = np.loadtxt(out)
    assert traj.shape[0] >= 50, traj.shape  # trajectory entry per tracked frame
    assert np.isfinite(traj).all()
    kf = np.loadtxt(out_kf)
    assert kf.ndim == 2 and kf.shape[0] >= 5
    assert os.path.getsize(out) > 0


def _write_pgm16(path, arr_u16):
    h, w = arr_u16.shape
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n65535\n" % (w, h))
        f.write(arr_u16.astype(">u2").tobytes())


def _write_pgm8(path, arr_u8):
    h, w = arr_u8.shape
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (w, h))
        f.write(arr_u8.astype(np.uint8).tobytes())


def test_run_rgbd_synthetic(tmp_path):
    """--rgbd on the synthetic depth sequence: single-frame metric init,
    trajectory out (reference Examples/RGB-D/rgbd_tum.cc shape)."""
    out = str(tmp_path / "traj.txt")
    run.main([
        "--dataset", "synthetic", "--rgbd", "--frames", "25", "--out", out,
    ])
    traj = np.loadtxt(out)
    assert traj.shape[0] >= 20
    assert np.isfinite(traj).all()


def test_run_rgbd_tum_dump(tmp_path):
    """--dataset tum --rgbd over an on-disk TUM-format dump (rgb/ +
    depth/ + associations.txt), exercising the load-associate-loop-save
    path of the reference's rgbd_tum.cc."""
    from viorb_tpu.io.synthetic import make_sequence

    seq, depths = make_sequence(n_frames=20, seed=0, dt=0.1, with_depth=True)
    seq_dir = tmp_path / "seq"
    (seq_dir / "rgb").mkdir(parents=True)
    (seq_dir / "depth").mkdir()
    lines = []
    factor = 5000.0
    for i, (img, dep, ts) in enumerate(
        zip(seq.images, depths, seq.timestamps)
    ):
        rgb_rel = f"rgb/{i:04d}.pgm"
        dep_rel = f"depth/{i:04d}.pgm"
        _write_pgm8(str(seq_dir / rgb_rel), np.asarray(img).astype(np.uint8))
        d = np.clip(np.asarray(dep) * factor, 0, 65535).astype(np.uint16)
        _write_pgm16(str(seq_dir / dep_rel), d)
        lines.append(f"{ts:.6f} {rgb_rel} {ts:.6f} {dep_rel}")
    (seq_dir / "associations.txt").write_text("\n".join(lines) + "\n")
    # config matching the synthetic camera, with the TUM depth factor
    cfg = seq.cam
    yaml = tmp_path / "cfg.yaml"
    yaml.write_text(
        "%YAML:1.0\n"
        f"Camera.fx: {cfg.fx}\nCamera.fy: {cfg.fy}\n"
        f"Camera.cx: {cfg.cx}\nCamera.cy: {cfg.cy}\n"
        "Camera.k1: 0.0\nCamera.k2: 0.0\nCamera.p1: 0.0\nCamera.p2: 0.0\n"
        f"Camera.width: {cfg.width}\nCamera.height: {cfg.height}\n"
        "Camera.fps: 10.0\nCamera.RGB: 0\n"
        f"DepthMapFactor: {factor}\n"
        "ORBextractor.nFeatures: 800\n"
    )
    out = str(tmp_path / "traj.txt")
    run.main([
        "--dataset", "tum", "--rgbd", "--path", str(seq_dir),
        "--config", str(yaml), "--out", out,
    ])
    traj = np.loadtxt(out)
    assert traj.shape[0] >= 15
    assert np.isfinite(traj).all()
