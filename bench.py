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
import time


def main():
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

    # ---- kernel-level breakdown (each fenced by a small pull; the
    # reference's per-stage timers: ORB extraction, matcher, pose LM,
    # local-BA its/s per src/LocalMapping.cc:1067-1078) ----
    extra = {}
    reps = 20

    def timeit(fn, pull):
        """Per-call ms via a two-length difference: each timed run ends
        with ONE small device->host pull (the only fence that works over
        the tunnel), whose 0.1-1 s cost would otherwise pollute ms-scale
        kernels; timing reps and 3*reps and differencing cancels it."""

        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                fn()
            _ = np.asarray(pull())
            return time.perf_counter() - t0

        fn()  # warm (compile)
        _ = np.asarray(pull())
        t_a = run(reps)
        t_b = run(3 * reps)
        return max(t_b - t_a, 1e-6) / (2 * reps) * 1000.0

    img = images[1]
    feats_box = {}

    def do_extract():
        feats_box["f"] = extractor.extract(img)

    extra["extract_ms"] = round(
        timeit(do_extract, lambda: feats_box["f"].valid[0:1]), 2
    )

    from viorb_tpu.slam.kernels import match_by_projection

    fr = feats_box["f"]
    xy_f = undistort_points(cam, fr.xy)
    out_box = {}

    def do_match():
        out_box["m"] = match_by_projection(
            dmap.xyz, dmap.desc_pm1, dmap.valid, dmap.normal, dmap.dmin,
            dmap.dmax, carry.r_cw, carry.t_cw, xy_f,
            fr.descriptors_pm1(), fr.valid, cam, jnp.float32(15.0),
        )

    extra["match_ms"] = round(timeit(do_match, lambda: out_box["m"][2]), 2)

    from viorb_tpu.optim import PoseObs, pose_optimization_tcw

    pf = out_box["m"][0]
    n_feat = xy_f.shape[0]
    obs = PoseObs(
        points=dmap.xyz[jnp.maximum(pf, 0)],
        uv=xy_f,
        inv_sigma2=jnp.ones(n_feat),
        valid=(pf >= 0) & fr.valid,
    )

    def do_pose():
        out_box["p"] = pose_optimization_tcw(carry.r_cw, carry.t_cw, obs, cam)

    extra["pose_lm_ms"] = round(timeit(do_pose, lambda: out_box["p"][1][:1]), 2)

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

    def do_ba():
        out_box["ba"] = vision_ba(st_b, obs_b, cam, fixed_b, iters=ba_iters)

    ba_ms = timeit(do_ba, lambda: out_box["ba"][0].t_cw[:1, :1])
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
