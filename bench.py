"""Benchmark: monocular tracking throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the steady-state per-frame tracking path — ORB pyramid
extraction (1000 features, 8 levels), projection matching against a
4096-point local map (MXU Hamming matmul), and pose-only LM — as a
device-resident loop with zero host synchronization per frame (one
dispatch per frame; blocking once at the end). This corresponds to the
reference's tracking-thread throughput, which its 20 fps EuRoC real-time
claim is about (BASELINE.md; reference launch/euroc.yaml:73) — mapping
runs on a separate thread there and asynchronously here.

The localization map is built ON DEVICE from frame 0 + ground-truth
scene geometry (map quality is covered by tests/test_e2e_mono.py; the
bench measures throughput). Total host<->device traffic: the staged
images and one 232-byte sanity pull — the TPU tunnel in this environment
has multi-second sync latency, so the bench avoids pulls entirely.

vs_baseline = fps / 20 (the reference's processed camera rate).
"""

import json
import os
import subprocess
import sys
import time


def main():
    """Watchdog wrapper: the remote-TPU tunnel in this environment
    INTERMITTENTLY wedges at client startup (the process burns no CPU and
    never progresses — observed ~2 in 5 launches). Run the real bench in
    a subprocess with a timeout and retry, so one wedge cannot turn the
    whole benchmark run into silence. `VIORB_BENCH_INNER=1` marks the
    inner process."""
    if os.environ.get("VIORB_BENCH_INNER") == "1":
        return _run()
    env = dict(os.environ, VIORB_BENCH_INNER="1")
    last_err = ""
    for attempt in range(3):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=1500,
            )
        except subprocess.TimeoutExpired:
            print(
                f"[bench] attempt {attempt + 1} timed out (tunnel wedge?), "
                "retrying",
                file=sys.stderr,
            )
            continue
        lines = [
            l for l in out.stdout.splitlines() if l.startswith('{"metric"')
        ]
        if out.returncode == 0 and lines:
            print(lines[-1])
            return
        last_err = out.stderr[-2000:]
        print(
            f"[bench] attempt {attempt + 1} failed rc={out.returncode}, retrying",
            file=sys.stderr,
        )
    print(f"[bench] all attempts failed; last stderr:\n{last_err}", file=sys.stderr)
    sys.exit(1)


def _run():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viorb_tpu.io.synthetic import default_room, make_sequence, _stack_planes
    from viorb_tpu.slam.tracking_loop import (
        DeviceMap,
        TrackCarry,
        make_tracking_step,
    )
    from viorb_tpu.features.extractor import OrbExtractor
    from viorb_tpu.geometry.camera import undistort_points

    n_frames = 200
    seq = make_sequence(n_frames=60, seed=0, dt=0.1)
    cam = seq.cam
    extractor = OrbExtractor(n_features=1000)
    planes = default_room(0)
    plane_arrays = _stack_planes(planes)

    m = 4096

    @jax.jit
    def build_map(image0, r_wc, c_w, plane_arrays):
        """Extract frame-0 features and lift them with ground-truth
        ray-plane depth, entirely on device."""
        origins, ax_u, ax_v, sizes, _tex = plane_arrays
        feats = extractor._extract(image0)
        xy = undistort_points(cam, feats.xy)
        rays = jnp.stack(
            [
                (xy[:, 0] - cam.cx) / cam.fx,
                (xy[:, 1] - cam.cy) / cam.fy,
                jnp.ones(xy.shape[0], jnp.float32),
            ],
            axis=-1,
        )
        d_w = rays @ r_wc.T

        def plane_t(origin, au, av, size):
            n = jnp.cross(au, av)
            n = n / jnp.linalg.norm(n)
            denom = d_w @ n
            denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
            t = jnp.dot(origin - c_w, n) / denom
            hit = c_w + t[:, None] * d_w
            rel = hit - origin
            u = rel @ au
            v = rel @ av
            ok = (t > 0.05) & (jnp.abs(u) < size[0] / 2) & (jnp.abs(v) < size[1] / 2)
            return jnp.where(ok, t, jnp.inf)

        ts = jax.vmap(plane_t)(origins, ax_u, ax_v, sizes)  # (P,N)
        depth = jnp.min(ts, axis=0)
        ok = feats.valid & jnp.isfinite(depth)
        pts_w = (rays * depth[:, None]) @ r_wc.T + c_w
        pts_w = jnp.where(ok[:, None], pts_w, 0.0)
        dirs = pts_w - c_w
        norm = jnp.linalg.norm(dirs, axis=1, keepdims=True)
        normal = dirs / jnp.maximum(norm, 1e-9)
        nf = xy.shape[0]
        pad = m - nf
        return DeviceMap(
            xyz=jnp.concatenate([pts_w, jnp.zeros((pad, 3), jnp.float32)]),
            desc_pm1=jnp.concatenate(
                [feats.descriptors_pm1(), jnp.zeros((pad, 256), jnp.bfloat16)]
            ),
            valid=jnp.concatenate([ok, jnp.zeros(pad, bool)]),
            normal=jnp.concatenate([normal, jnp.zeros((pad, 3), jnp.float32)]),
            dmin=jnp.zeros(m, jnp.float32),
            dmax=jnp.full(m, 1e9, jnp.float32),
        )

    images = [jnp.asarray(im) for im in seq.images]
    dmap = build_map(
        images[0], jnp.asarray(seq.r_wc[0]), jnp.asarray(seq.c_w[0]), plane_arrays
    )

    step = make_tracking_step(cam, extractor)
    carry = TrackCarry(
        jnp.asarray(seq.r_wc[0].T),
        jnp.asarray(-seq.r_wc[0].T @ seq.c_w[0]),
        jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32),
    )

    # warmup/compile. NOTE: on this environment's TPU tunnel,
    # block_until_ready does NOT fence execution — only a data pull does.
    c, out = step(carry, images[1], dmap)
    _ = np.asarray(out.n_inliers)

    # replay the forward segment near the mapped viewpoint each cycle (a
    # single-keyframe map only covers part of the trajectory; KF insertion
    # is the SLAM pipeline's job, not this throughput bench's)
    order = list(range(1, 16))
    frame_ids = [order[i % len(order)] for i in range(n_frames)]

    # timed: one dispatch per frame; the fence is a 4-byte pull of the
    # last frame's inlier count (forces completion of the whole chain).
    # The carry resets at each ping-pong cycle so pose-only drift cannot
    # accumulate across cycles (there is no mapping in this bench).
    t0 = time.perf_counter()
    c = carry
    outs = []
    for j, i in enumerate(frame_ids):
        if j % len(order) == 0:
            c = carry
        c, out = step(c, images[i], dmap)
        outs.append(out.n_inliers)
    last_inl = int(np.asarray(outs[-1]))
    dt = time.perf_counter() - t0
    fps = n_frames / dt

    # sanity: tracking must actually work across the clip (one small pull)
    inl = np.asarray(jnp.stack(outs[: len(order)]))
    assert inl.min() > 30, f"tracking degenerate: min inliers {inl.min()}"

    # ---- kernel-level breakdown: DEVICE time, measured by scan-length
    # differencing — the kernel runs inside jitted lax.scan loops of two
    # lengths in ONE dispatch each, so the per-iteration delta contains
    # zero host/tunnel overhead (the old per-dispatch timings conflated
    # the tunnel's ~6 ms enqueue cost with ~1 ms kernels). Every heavy
    # input is perturbed by the scan carry to defeat loop-invariant code
    # motion. (The reference's per-stage timers: src/LocalMapping.cc
    # :1067-1078 and the example mains' track-time stats.) ----
    extra = {}
    L1, L2 = 8, 32

    def dev_time(fn):
        """fn(c) -> scalar with ALL heavy work dependent on c; returns
        median per-iteration ms over 3 length-differenced runs."""

        def make(length):
            @jax.jit
            def loop(x):
                def body(c, _):
                    return c + fn(c) * 1e-20, None

                c, _ = jax.lax.scan(body, x, None, length=length)
                return c

            return loop

        lo, hi = make(L1), make(L2)
        x0 = jnp.float32(0.0)
        _ = np.asarray(lo(x0))
        _ = np.asarray(hi(x0))
        vals = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(lo(x0))
            t1 = time.perf_counter()
            _ = np.asarray(hi(x0))
            t2 = time.perf_counter()
            vals.append(((t2 - t1) - (t1 - t0)) / (L2 - L1) * 1000.0)
        return float(np.median(vals))

    img = images[1]

    def do_extract(c):
        # consume EVERY output: summing only one lets XLA dead-code the
        # rest (a response-only probe measured 0.6 ms for a 2.7 ms kernel)
        f = extractor._extract(img + c)
        return (
            jnp.sum(f.desc01.astype(jnp.float32))
            + jnp.sum(f.xy)
            + jnp.sum(f.angle)
            + jnp.sum(f.response)
        )

    extra["extract_ms"] = round(dev_time(do_extract), 3)

    from viorb_tpu.slam.kernels import match_by_projection

    feats1 = extractor.extract(img)
    xy_f = undistort_points(cam, feats1.xy)
    fd = feats1.descriptors_pm1()

    def do_match(c):
        pf, _res, n, _vis = match_by_projection(
            dmap.xyz + c, dmap.desc_pm1, dmap.valid, dmap.normal, dmap.dmin,
            dmap.dmax, carry.r_cw, carry.t_cw + c, xy_f + c,
            fd + (c * 0).astype(fd.dtype), feats1.valid, cam,
            jnp.float32(15.0),
        )
        return n.astype(jnp.float32)

    extra["match_ms"] = round(dev_time(do_match), 3)

    from viorb_tpu.optim import PoseObs, pose_optimization_tcw

    pf0 = match_by_projection(
        dmap.xyz, dmap.desc_pm1, dmap.valid, dmap.normal, dmap.dmin,
        dmap.dmax, carry.r_cw, carry.t_cw, xy_f, fd, feats1.valid, cam,
        jnp.float32(15.0),
    )[0]
    n_feat = xy_f.shape[0]
    obs = PoseObs(
        points=dmap.xyz[jnp.maximum(pf0, 0)],
        uv=xy_f,
        inv_sigma2=jnp.ones(n_feat),
        valid=(pf0 >= 0) & feats1.valid,
    )

    def do_pose(c):
        obs2 = obs._replace(points=obs.points + c, uv=obs.uv + c)
        r, t, _inl = pose_optimization_tcw(carry.r_cw, carry.t_cw + c, obs2, cam)
        return t[0]

    extra["pose_lm_ms"] = round(dev_time(do_pose), 3)

    # ---- speed-of-light accounting (v5e: ~197 bf16 TFLOP/s MXU, ~819
    # GB/s HBM). sol_ms is the analytic floor assuming perfect fusion
    # (each byte moves once, matmuls at MXU peak); frac = sol/achieved.
    # At SLAM-native sizes the kernels are LATENCY-bound (sequential LM
    # iterations, small matmuls), not roofline-bound — the batch8 extract
    # number shows the per-chip throughput headroom directly. ----
    HBM_BPS = 819e9
    MXU_FLOPS = 197e12
    h, w = cam.height, cam.width
    pyr_px = sum(
        int(h * (1 / 1.2) ** l) * int(w * (1 / 1.2) ** l) for l in range(8)
    )
    # extract: pyramid write + FAST read/score write + 1000 patch gathers
    # (45x45 f32) + descriptor sampling
    extract_bytes = 4 * (2 * pyr_px + 2 * pyr_px) + 1000 * 45 * 45 * 4 * 2
    # match: (4096x256)x(256x1000) bf16 matmul + masks/argmax traffic
    match_flops = 2 * 4096 * 1000 * 256
    match_bytes = 2 * (4096 * 256 + 1000 * 256 + 4096 * 1000)
    sol = {
        "extract_sol_ms": round(extract_bytes / HBM_BPS * 1e3, 4),
        "match_sol_ms": round(
            max(match_flops / MXU_FLOPS, match_bytes / HBM_BPS) * 1e3, 4
        ),
    }
    sol["extract_frac"] = round(
        sol["extract_sol_ms"] / max(extra["extract_ms"], 1e-9), 4
    )
    sol["match_frac"] = round(
        sol["match_sol_ms"] / max(extra["match_ms"], 1e-9), 4
    )
    extra["sol"] = sol

    # ---- VI tracking throughput: the fused single-dispatch VI core
    # (preintegration + NavState propagation + projection matching +
    # 15-DoF VI pose LM, tracking_loop.make_vi_pipeline_core) streamed
    # one dispatch per frame with no per-frame pull — the device cost of
    # the reference's TrackMonoVI headline path (src/Tracking.cc:598). ----
    from viorb_tpu.imu import ImuBatch, ImuNoise, NavState
    from viorb_tpu.optim import Extrinsics
    from viorb_tpu.slam.tracking_loop import make_vi_pipeline_core

    ext_id = Extrinsics.identity()
    noise = ImuNoise()
    vi_core = make_vi_pipeline_core(cam, extractor, ext_id, noise)
    rng_vi = np.random.default_rng(3)
    nsamp = 20
    t_imu = np.linspace(0.005, 0.095, nsamp).astype(np.float32)
    batch_fr = ImuBatch.from_arrays(
        rng_vi.normal(0, 0.02, (nsamp, 3)).astype(np.float32),
        (np.array([0, 0, 9.81], np.float32) + rng_vi.normal(0, 0.05, (nsamp, 3))).astype(np.float32),
        t_imu, capacity=256,
    )
    ns0 = NavState.identity()
    # body +z = camera +z faces the scene; gravity along -z so the
    # specific force above cancels it (bench cares about cost, not ATE)
    grav = jnp.asarray(np.array([0, 0, -9.81], np.float32))
    zinfo = jnp.zeros((15, 15), jnp.float32)

    vi_args = lambda im: (
        im, ns0, ns0, batch_fr, batch_fr,
        jnp.float32(0.0), jnp.float32(0.1), jnp.float32(0.0),
        jnp.zeros(3), jnp.zeros(3), grav, ns0, zinfo,
        dmap.xyz, dmap.desc_pm1, dmap.valid, dmap.normal, dmap.dmin,
        dmap.dmax,
    )
    out_vi = vi_core(*vi_args(images[1]), use_prior=False)
    _ = np.asarray(out_vi[5])  # compile + fence
    n_vi = 100

    def timed_vi_loop():
        t0 = time.perf_counter()
        for j in range(n_vi):
            o = vi_core(*vi_args(images[1 + (j % 15)]), use_prior=False)
        _ = np.asarray(o[5])
        return n_vi / (time.perf_counter() - t0)

    # median-of-5 with spread: this dispatch-per-frame loop's rate is set
    # by the tunnel's enqueue rate, which drifts >2x between runs on
    # identical code (r3 measured 169.9 fps, r4 80.0) — one run is a
    # sample, not a number. The spread makes drift visible; the scan-based
    # vi_device_fps below is the tunnel-free device truth.
    vi_runs = sorted(timed_vi_loop() for _ in range(5))
    vi_fps = vi_runs[2]
    extra["vi_tracking_fps"] = round(vi_fps, 2)
    extra["vi_tracking_fps_spread"] = [
        round(vi_runs[0], 2), round(vi_runs[-1], 2)
    ]
    extra["vi_vs_baseline"] = round(vi_fps / 20.0, 2)

    # device-resident VI loop (whole clip in one program, NavState carried
    # frame to frame): the per-frame DEVICE cost without the tunnel's
    # per-dispatch enqueue overhead — what a host-attached chip sustains
    clip_vi = jnp.stack([np.asarray(images[1 + (i % 15)]) for i in range(15)])

    @jax.jit
    def run_clip(nav, clip):
        def body(ns, im):
            args = vi_args(im)
            out = vi_core(args[0], ns, *args[2:], use_prior=False)
            return out[7], out[5]
        return jax.lax.scan(body, nav, clip)

    _ = np.asarray(run_clip(ns0, clip_vi)[1])
    reps = 3

    def vi_scan_once():
        t0 = time.perf_counter()
        for _ in range(reps):
            _, ns_out = run_clip(ns0, clip_vi)
        _ = np.asarray(ns_out[-1:])
        d1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3 * reps):
            _, ns_out = run_clip(ns0, clip_vi)
        _ = np.asarray(ns_out[-1:])
        return d1, time.perf_counter() - t0

    # length-differenced timing REQUIRES d3 > d1 (3x the executions):
    # tunnel jitter can cross the two timings, and r4's bench printed the
    # floored delta as 9e10 fps. Collect monotone samples only, median
    # them, and surface a diagnostic instead of a number when the tunnel
    # never settles.
    scan_samples = []
    d1 = d3 = 0.0
    for _ in range(6):
        d1, d3 = vi_scan_once()
        if d3 > 1.2 * d1:
            scan_samples.append((d3 - d1) / (2 * reps * 15) * 1000.0)
        if len(scan_samples) >= 3:
            break
    if scan_samples:
        ms = float(np.median(scan_samples))
        extra["vi_device_fps"] = round(1000.0 / ms, 2)
    else:
        extra["vi_device_fps"] = None
        extra["vi_device_fps_error"] = (
            "non-monotone differenced timings after 6 tries "
            f"(last d1={d1:.3f}s d3={d3:.3f}s): tunnel jitter exceeded "
            "the measured device time; no reliable estimate"
        )

    # ---- full-pipeline fps: the real MonoSlam.process_frame loop
    # (fused tracking + host map bookkeeping + mapping jobs on keyframe
    # insertion) over the rendered clip, in three flavours:
    #   pipeline_fps         lock-step, uint8 frames over the wire (one
    #                        pull/frame; mapping inline)
    #   pipeline_stream_fps  streaming mode — device-resident carry,
    #                        collector thread with batched pulls, async
    #                        mapping worker; uint8 frames over the wire
    #   pipeline_staged_fps  streaming with pre-staged device frames: the
    #                        host-attached-deployment proxy (PCIe upload
    #                        ~0.04 ms vs this tunnel's ~28 ms/frame u8)
    # ----
    from viorb_tpu.slam.mono import MonoSlam

    imgs_u8 = [np.asarray(im).astype(np.uint8) for im in seq.images[:30]]
    imgs_dev = [jnp.asarray(im) for im in imgs_u8]

    def run_pipeline(streaming, frames):
        # depth 2: the accuracy/throughput sweet spot (deeper pipelines
        # drop frames under fast motion — the map lags the dispatches)
        slam = MonoSlam(
            cam, n_features=1000, kf_max_interval=5, streaming=streaming,
            streaming_depth=2,
        )
        t0 = time.perf_counter()
        for i, img_i in enumerate(frames):
            slam.process_frame(img_i, i * 0.1)
        slam.wait_mapping_idle()
        dt = time.perf_counter() - t0
        slam.shutdown()
        return len(frames) / dt

    run_pipeline(False, imgs_u8)  # warm: compile every pipeline program
    extra["pipeline_fps"] = round(run_pipeline(False, imgs_u8), 2)
    run_pipeline(True, imgs_u8)  # warm streaming core
    extra["pipeline_stream_fps"] = round(run_pipeline(True, imgs_u8), 2)
    extra["pipeline_staged_fps"] = round(run_pipeline(True, imgs_dev), 2)

    # local BA throughput: a K=10, M=2048 window solve (LM iterations/s)
    from viorb_tpu.optim import BAObservations, VisionBAState, vision_ba

    rngb = np.random.default_rng(0)
    kb, mb, rb = 10, 2048, 8
    pts_b = np.stack(
        [rngb.uniform(-4, 4, mb), rngb.uniform(-3, 3, mb), rngb.uniform(4, 10, mb)], 1
    ).astype(np.float32)
    r_b = np.broadcast_to(np.eye(3, dtype=np.float32), (kb, 3, 3)).copy()
    t_b = np.stack(
        [np.array([0.1 * i, 0, 0], np.float32) for i in range(kb)]
    )
    kf_idx_b = rngb.integers(0, kb, (mb, rb)).astype(np.int32)
    pc = pts_b[:, None, :] + t_b[kf_idx_b]
    uv_b = np.stack(
        [
            cam.fx * pc[..., 0] / pc[..., 2] + cam.cx,
            cam.fy * pc[..., 1] / pc[..., 2] + cam.cy,
        ],
        axis=-1,
    ).astype(np.float32)
    obs_b = BAObservations(
        kf_idx=jnp.asarray(kf_idx_b),
        uv=jnp.asarray(uv_b + rngb.normal(size=uv_b.shape).astype(np.float32) * 0.3),
        inv_sigma2=jnp.ones((mb, rb)),
        valid=jnp.ones((mb, rb), bool),
    )
    st_b = VisionBAState(
        jnp.asarray(r_b), jnp.asarray(t_b),
        jnp.asarray(pts_b + rngb.normal(size=pts_b.shape).astype(np.float32) * 0.03),
    )
    fixed_b = jnp.zeros(kb, bool).at[0].set(True)
    ba_iters = 10

    def do_ba(c):
        st_c = VisionBAState(st_b.r_cw, st_b.t_cw + c, st_b.points + c)
        out, chi2 = vision_ba(st_c, obs_b, cam, fixed_b, iters=ba_iters)
        return out.t_cw[1, 0]

    ba_ms = dev_time(do_ba)
    extra["local_ba_iters_per_s"] = round(ba_iters / (ba_ms / 1000.0), 1)

    print(
        json.dumps(
            {
                "metric": "mono_tracking_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 20.0, 2),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
