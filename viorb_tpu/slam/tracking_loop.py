"""Device-resident tracking loop: the whole per-frame tracking path as ONE
jitted step with carried state — zero host synchronization per frame.

This is the TPU-shaped version of the reference's tracking thread main
loop in localization mode (reference: Tracking with
mbOnlyTracking/ActivateLocalizationMode, src/Tracking.cc:908-1010): the
map is frozen (device arrays), per-frame work is extract -> predict ->
project-match -> pose LM, and the pose/velocity state is carried on
device. Frames can be streamed (async dispatch per frame, ~ms) or scanned
(a whole clip in one XLA program).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from viorb_tpu.features.extractor import OrbExtractor
from viorb_tpu.geometry.camera import PinholeCamera, undistort_points
from viorb_tpu.optim.pose_only import PoseObs, pose_optimization_tcw
from viorb_tpu.slam.kernels import match_by_projection


class DeviceMap(NamedTuple):
    """Frozen localization map resident on device."""

    xyz: jax.Array  # (M,3)
    desc_pm1: jax.Array  # (M,256) bf16
    valid: jax.Array  # (M,)
    normal: jax.Array  # (M,3)
    dmin: jax.Array  # (M,)
    dmax: jax.Array  # (M,)


class TrackCarry(NamedTuple):
    r_cw: jax.Array
    t_cw: jax.Array
    vel_r: jax.Array  # relative motion (constant-velocity model)
    vel_t: jax.Array


class TrackOut(NamedTuple):
    r_cw: jax.Array
    t_cw: jax.Array
    n_inliers: jax.Array


def make_tracking_step(cam: PinholeCamera, extractor: OrbExtractor):
    """Returns step(carry, image, dmap) -> (carry, TrackOut), jitted."""

    def step(carry: TrackCarry, image: jax.Array, dmap: DeviceMap):
        # constant-velocity prediction
        r_pred = carry.vel_r @ carry.r_cw
        t_pred = (carry.vel_r @ carry.t_cw) + carry.vel_t

        feats = extractor._extract(image)
        xy = undistort_points(cam, feats.xy)
        desc = feats.descriptors_pm1()

        point_for_feat, res, n, _ = match_by_projection(
            dmap.xyz, dmap.desc_pm1, dmap.valid, dmap.normal, dmap.dmin,
            dmap.dmax, r_pred, t_pred, xy, desc, feats.valid, cam,
            jnp.float32(15.0),
        )
        matched = point_for_feat >= 0
        sigma2 = jnp.asarray(extractor.level_sigma2())[feats.level]
        obs = PoseObs(
            points=dmap.xyz[jnp.clip(point_for_feat, 0)],
            uv=xy,
            inv_sigma2=1.0 / sigma2,
            valid=matched,
        )
        r_new, t_new, inlier = pose_optimization_tcw(
            r_pred, t_pred, obs, cam, rounds=2, iters_per_round=4
        )
        # velocity update: T_new * T_old^{-1}
        r_old_inv = carry.r_cw.T
        vel_r = r_new @ r_old_inv
        vel_t = t_new - (vel_r @ carry.t_cw)
        new_carry = TrackCarry(r_new, t_new, vel_r, vel_t)
        return new_carry, TrackOut(r_new, t_new, jnp.sum(inlier))

    return jax.jit(step)


def make_tracking_scan(cam: PinholeCamera, extractor: OrbExtractor):
    """Whole-clip variant: scan the step over a stacked (T,H,W) image
    batch inside one XLA program."""
    step = make_tracking_step(cam, extractor)

    @jax.jit
    def run(carry: TrackCarry, images: jax.Array, dmap: DeviceMap):
        def body(c, img):
            c, out = step(c, img, dmap)
            return c, out

        return jax.lax.scan(body, carry, images)

    return run


# process-wide core cache: cores are pure functions of (camera, extractor
# config[, extrinsics, noise]) — sharing them across SLAM instances means
# XLA compiles each fused program once per process, not once per instance
_CORE_CACHE: dict = {}


def _cached(key, build):
    core = _CORE_CACHE.get(key)
    if core is None:
        core = _CORE_CACHE[key] = build()
    return core


def make_pipeline_track_core(cam: PinholeCamera, extractor: OrbExtractor):
    """One-dispatch tracking core for the FULL SLAM pipeline (mutable
    map): extraction + undistortion + projection matching (with the
    wide-radius retry as a lax.cond instead of a host round trip) +
    pose-only LM, fused into a single jitted program.

    The host pulls the packed result ONCE per frame for map bookkeeping
    and the keyframe decision — versus the legacy path's four dispatch+
    sync phases (extract, match, maybe re-match, pose LM). This is the
    pipeline counterpart of the reference's tracking-thread frame loop
    (src/Tracking.cc GrabImageMonocular -> Track), restructured so the
    whole per-frame compute graph is one XLA program.

    Map arrays arrive padded to a static capacity (MonoSlam.
    _gather_local_points), so the program compiles once per
    (image, capacity) shape, not per map size.
    """
    return _cached(
        ("pipeline", cam, extractor.config_key()),
        lambda: _build_pipeline_track_core(cam, extractor),
    )


def _build_pipeline_track_core(cam: PinholeCamera, extractor: OrbExtractor):
    sigma2 = jnp.asarray(extractor.level_sigma2())

    @jax.jit
    def core(image, r_pred, t_pred, xyz, desc_pm1, valid, normal, dmin, dmax):
        feats = extractor._extract(image)
        xy = undistort_points(cam, feats.xy)
        fdesc = feats.descriptors_pm1()

        def run_match(radius):
            return match_by_projection(
                xyz, desc_pm1, valid, normal, dmin, dmax,
                r_pred, t_pred, xy, fdesc, feats.valid, cam,
                jnp.float32(radius),
            )

        out15 = run_match(15.0)
        pf, _res, nmatch, visible = jax.lax.cond(
            out15[2] < 20, lambda: run_match(30.0), lambda: out15
        )
        obs = PoseObs(
            points=xyz[jnp.clip(pf, 0)],
            uv=xy,
            inv_sigma2=1.0 / sigma2[feats.level],
            valid=pf >= 0,
        )
        r_new, t_new, inlier = pose_optimization_tcw(r_pred, t_pred, obs, cam)
        return feats, xy, fdesc, pf, r_new, t_new, inlier, visible, nmatch

    return core


def make_streaming_track_core(cam: PinholeCamera, extractor: OrbExtractor):
    """Carry-based fused tracking core for STREAMING mode: like
    make_pipeline_track_core, but the constant-velocity prediction is
    computed ON DEVICE from a TrackCarry, and the updated carry is
    returned as device arrays — so the host can dispatch frame after
    frame without pulling anything. A collector thread pulls the
    bookkeeping fields of many frames in one batched device_get (one
    interconnect round trip amortized over the whole batch).

    This is the TPU-native shape of the reference's free-running tracking
    thread (src/Tracking.cc main loop): the accelerator streams at
    dispatch rate; host bookkeeping (map stats, keyframe decision,
    trajectory) runs behind it with bounded lag.

    The carry freezes on failure frames (fewer than 10 matches or
    inliers): the pose/velocity state keeps the last good estimate so one
    blurry frame cannot poison the chain before the collector notices.
    """
    return _cached(
        ("streaming", cam, extractor.config_key()),
        lambda: _build_streaming_track_core(cam, extractor),
    )


def _build_streaming_track_core(cam: PinholeCamera, extractor: OrbExtractor):
    sigma2 = jnp.asarray(extractor.level_sigma2())

    @jax.jit
    def core(carry: TrackCarry, image, xyz, desc_pm1, valid, normal, dmin, dmax):
        r_pred = carry.vel_r @ carry.r_cw
        t_pred = (carry.vel_r @ carry.t_cw) + carry.vel_t

        feats = extractor._extract(image)
        xy = undistort_points(cam, feats.xy)
        fdesc = feats.descriptors_pm1()

        def run_match(radius):
            return match_by_projection(
                xyz, desc_pm1, valid, normal, dmin, dmax,
                r_pred, t_pred, xy, fdesc, feats.valid, cam,
                jnp.float32(radius),
            )

        out15 = run_match(15.0)
        pf, _res, nmatch, visible = jax.lax.cond(
            out15[2] < 20, lambda: run_match(30.0), lambda: out15
        )
        obs = PoseObs(
            points=xyz[jnp.clip(pf, 0)],
            uv=xy,
            inv_sigma2=1.0 / sigma2[feats.level],
            valid=pf >= 0,
        )
        r_new, t_new, inlier = pose_optimization_tcw(r_pred, t_pred, obs, cam)
        n_inl = jnp.sum(inlier)
        # same acceptance gate as the synchronous path (equivalence at
        # zero lag); the collector additionally watches for WEAK streaks
        # (low-inlier solutions that pass this gate but poison the carry)
        ok = (nmatch >= 10) & (n_inl >= 10)
        # re-orthonormalize the carried rotation: the LM composes dR
        # products frame after frame with no host resync, and the f32
        # drift compounds across the carry chain (the synchronous path
        # renormalizes at every prediction — without this the streamed
        # trajectory slides off the lock-step one within ~10 frames)
        from viorb_tpu.geometry.so3 import normalize_rotation

        r_new = normalize_rotation(r_new)
        # velocity update T_new * T_old^{-1}; freeze the carry on failure
        vel_r = r_new @ carry.r_cw.T
        vel_t = t_new - (vel_r @ carry.t_cw)
        new_carry = TrackCarry(
            jnp.where(ok, r_new, carry.r_cw),
            jnp.where(ok, t_new, carry.t_cw),
            jnp.where(ok, vel_r, carry.vel_r),
            jnp.where(ok, vel_t, carry.vel_t),
        )
        return new_carry, (feats, xy, fdesc, pf, r_new, t_new, inlier, visible, ok)

    return core


def tcw_from_nav(nav, ext):
    """Camera pose (r_cw, t_cw) from a body NavState, on device
    (reference Tracking::UpdatePoseFromNS / Frame::UpdatePoseFromNS)."""
    r_wc = nav.r @ ext.r_bc
    c_w = nav.p + nav.r @ ext.p_bc
    r_cw = r_wc.T
    t_cw = -(r_cw @ c_w)
    return r_cw, t_cw


def make_vi_pipeline_core(cam: PinholeCamera, extractor: OrbExtractor, ext, noise):
    """One-dispatch VI tracking core for the FULL VI pipeline: IMU
    preintegration (since-frame AND since-keyframe), NavState propagation,
    extraction, projection matching (wide-radius retry via lax.cond), and
    the 15-DoF VI pose optimization with the marginalized frame prior —
    fused into a single jitted program with ONE host pull per frame.

    Replaces the legacy ~6-dispatch _track_vi path with its mid-frame
    int(n) host sync. This is the device shape of the reference's
    TrackWithIMU frame loop (src/Tracking.cc:412-534: PredictNavStateByIMU
    -> SearchByProjection -> PoseOptimization with prior/marginal).

    use_prior selects the frame-to-frame (prior-carried, optimize_i=True)
    vs frame-to-KF (optimize_i=False) graph — a STATIC switch the host
    already knows, so it costs two compilations, not a device sync.
    """
    from functools import partial

    from viorb_tpu.imu import preintegrate, propagate_navstate
    from viorb_tpu.optim.pose_only import ViPosePrior, pose_optimization_vi

    sigma2 = jnp.asarray(extractor.level_sigma2())
    bias_rw = jnp.concatenate(
        [
            jnp.full(3, 1.0 / max(noise.gyro_bias_rw_var, 1e-12)),
            jnp.full(3, 1.0 / max(noise.acc_bias_rw_var, 1e-12)),
        ]
    )

    @partial(jax.jit, static_argnames=("use_prior",))
    def core(
        image,
        nav_cur,  # NavState of the last frame
        ns_i,  # anchor NavState (last frame if use_prior else last KF)
        batch_fr,  # ImuBatch since last frame
        batch_kf,  # ImuBatch since last keyframe
        t_last,
        t_now,
        t_kf,
        bias_g,
        bias_a,
        gravity,
        prior_state,  # NavState (ignored unless use_prior)
        prior_info,  # (15,15) (ignored unless use_prior)
        xyz,
        desc_pm1,
        valid,
        normal,
        dmin,
        dmax,
        use_prior: bool = False,
    ):
        pre_fr = preintegrate(batch_fr, bias_g, bias_a, t_last, t_now, noise)
        nav_pred = propagate_navstate(nav_cur, pre_fr, gravity)
        r_pred, t_pred = tcw_from_nav(nav_pred, ext)

        feats = extractor._extract(image)
        xy = undistort_points(cam, feats.xy)
        fdesc = feats.descriptors_pm1()

        def run_match(radius):
            return match_by_projection(
                xyz, desc_pm1, valid, normal, dmin, dmax,
                r_pred, t_pred, xy, fdesc, feats.valid, cam,
                jnp.float32(radius),
            )

        out15 = run_match(15.0)
        pf, _res, nmatch, visible = jax.lax.cond(
            out15[2] < 20, lambda: run_match(30.0), lambda: out15
        )
        obs = PoseObs(
            points=xyz[jnp.clip(pf, 0)],
            uv=xy,
            inv_sigma2=jnp.where(pf >= 0, 1.0 / sigma2[feats.level], 1.0),
            valid=pf >= 0,
        )
        pre_kf = preintegrate(batch_kf, bias_g, bias_a, t_kf, t_now, noise)
        if use_prior:
            bias_info = bias_rw / jnp.maximum(pre_fr.dt, 1e-3)
            prior = ViPosePrior(
                state=prior_state, info=prior_info, valid=jnp.asarray(True)
            )
            ns_j, _ns_i, inlier, marg = pose_optimization_vi(
                nav_pred, ns_i, obs, cam, ext, pre_fr, gravity, bias_info,
                prior=prior, rounds=2, iters_per_round=5, optimize_i=True,
            )
        else:
            bias_info = bias_rw / jnp.maximum(pre_kf.dt, 1e-3)
            ns_j, _ns_i, inlier, marg = pose_optimization_vi(
                nav_pred, ns_i, obs, cam, ext, pre_kf, gravity, bias_info,
                rounds=2, iters_per_round=5, optimize_i=False,
            )
        return (
            feats, xy, fdesc, pf, visible, nmatch, nav_pred, ns_j, inlier, marg
        )

    return core


def identity_carry() -> TrackCarry:
    return TrackCarry(
        jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32),
        jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32),
    )
