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

    print(
        json.dumps(
            {
                "metric": "mono_tracking_fps",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 20.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
