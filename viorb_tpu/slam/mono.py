"""Monocular vision-only SLAM pipeline (the minimum end-to-end slice,
SURVEY.md §7 step 5).

Host orchestration of the jitted kernels: plays the role of the
reference's Tracking + LocalMapping threads (reference: src/Tracking.cc
Track state machine at :883-1223, src/LocalMapping.cc:1019-1135).

Two execution modes:
  * lock-step (default): each frame is tracked and keyframe insertion
    runs the mapping step synchronously — the reference's deterministic
    non-realtime mode (Examples/ROS/ORB_VIO/src/ros_vio.cc:263-276);
  * async (async_mapping=True): mapping (triangulation + local BA +
    culling) runs on a worker thread so tracking never blocks on keyframe
    insertion — the reference's LocalMapping thread
    (src/System.cc:240-271). Tracking reads map SNAPSHOTS under a short
    lock; the expensive BA solve runs outside the lock on immutable
    arrays; a pending new keyframe aborts the BA refinement phase (the
    reference's mbAbortBA, src/LocalMapping.cc:1137-1142). The map-update
    epoch (map.version) replaces the reference's update flags.

The map lives in MapStore (host); per-frame compute — feature extraction,
projection matching, pose LM, triangulation matching, windowed BA — runs
as fixed-shape jitted device programs.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from viorb_tpu.features import OrbExtractor
from viorb_tpu.geometry.camera import PinholeCamera, undistort_points
from viorb_tpu.mapping.map import KeyFrameData, MapStore, MAX_OBS_PER_POINT
from viorb_tpu.optim import (
    BAObservations,
    PoseObs,
    VisionBAState,
    pose_optimization_tcw,
    vision_ba_two_phase,
)
from viorb_tpu.features.matching import (
    hamming_matrix,
    match_with_mask,
    rotation_consistency_mask,
    window_gate,
    valid_gate,
)
from viorb_tpu.slam.kernels import match_by_projection
from viorb_tpu.solvers import two_view_init


@dataclass
class FrameRecord:
    timestamp: float
    xy: np.ndarray  # undistorted (N,2)
    level: np.ndarray
    angle: np.ndarray
    desc01: Optional[np.ndarray]  # (N,256) uint8; None until host_desc01()
    valid: np.ndarray
    desc_pm1: jax.Array  # device (N,256) bf16
    r_cw: Optional[np.ndarray] = None
    t_cw: Optional[np.ndarray] = None
    point_idx: Optional[np.ndarray] = None  # (N,) map point per feature
    ur: Optional[np.ndarray] = None  # (N,) stereo right-u (-1 none)
    depth: Optional[np.ndarray] = None  # (N,) stereo/RGB-D depth (-1 none)
    # device-resident descriptor bits: the fused tracking paths keep the
    # 256 KB desc01 block OUT of the per-frame host pull (it is only
    # needed when the frame becomes a keyframe or relocalizes)
    desc01_dev: Optional[jax.Array] = None
    # device handles of the immutable per-frame payload (kept so a frame
    # promoted to keyframe seeds the device payload cache with ZERO
    # re-uploads — triangulation/fusion then never ship these again)
    xy_dev: Optional[jax.Array] = None
    level_dev: Optional[jax.Array] = None
    valid_dev: Optional[jax.Array] = None

    def host_desc01(self) -> np.ndarray:
        if self.desc01 is None:
            self.desc01 = np.asarray(self.desc01_dev)
        return self.desc01


class MonoSlam:
    """Vision-only monocular SLAM (System facade counterpart for the
    TrackMonocular path, reference include/System.h:91-93)."""

    # mono scale is free; stereo/RGB-D subclasses pin the loop Sim3 scale
    # (reference Sim3Solver bFixScale, include/Sim3Solver.h:45)
    loop_fix_scale = False

    def __init__(
        self,
        cam: PinholeCamera,
        n_features: int = 1000,
        local_window: int = 10,
        max_local_points: int = 4096,
        max_ba_landmarks: int = 2048,
        kf_max_interval: int = 10,
        seed: int = 0,
        vocabulary=None,
        enable_loop_closing: bool = False,
        async_mapping: bool = False,
        streaming: bool = False,
        streaming_depth: int = 2,
    ):
        self.cam = cam
        self.extractor = OrbExtractor(n_features=n_features)
        self.map = MapStore()
        self.state = "NOT_INITIALIZED"
        self.local_window = local_window
        self.max_local_points = max_local_points
        self.max_ba_landmarks = max_ba_landmarks
        self.kf_max_interval = kf_max_interval
        # ratio-trigger floor (reference mnMinFrames, 0 by default)
        self.kf_min_interval = 0
        self.ref_frame: Optional[FrameRecord] = None
        self.last_frame: Optional[FrameRecord] = None
        self.last_kf_id = -1
        self.frames_since_kf = 0
        self.velocity: Optional[Tuple[np.ndarray, np.ndarray]] = None
        # frame poses stored RELATIVE to their reference keyframe and
        # composed with the keyframe's CURRENT pose at export time, so BA /
        # loop / scale refinements propagate to the whole trajectory
        # (reference: mlRelativeFramePoses, src/System.cc SaveTrajectoryTUM)
        self.traj_entries: List[Tuple[float, int, np.ndarray, np.ndarray]] = []
        self.key = jax.random.PRNGKey(seed)
        self.n_tracked = 0
        self.sigma2 = self.extractor.level_sigma2()
        # optional place recognition: relocalization + loop closing
        # (reference: KeyFrameDatabase + LoopClosing thread)
        self.loop_closer = None
        self.vocabulary = vocabulary
        if vocabulary is not None:
            from viorb_tpu.slam.loop_closing import LoopCloser

            self.loop_closer = LoopCloser(
                self.map, vocabulary, cam=cam, fix_scale=self.loop_fix_scale
            )
            self.loop_closer.gba_fn = self._post_loop_gba
            self.loop_closer.fuse_fn = self._fuse_points_into_kf
            self.enable_loop_closing = enable_loop_closing
        self.lost_frames = 0
        # fused single-dispatch tracking core (built lazily) + a device
        # snapshot of the padded local map, cached per map epoch so the
        # steady-state frame loop re-uploads nothing but the image
        self._track_core = None
        self._lm_cache = None
        # kf_id -> device payload (immutable per-KF feature arrays)
        self._kf_dev: dict = {}
        # localization-only: track against the existing map, never insert
        # keyframes or modify the map (reference
        # System::ActivateLocalizationMode -> Tracking::mbOnlyTracking,
        # src/Tracking.cc:908-1010)
        self.localization_only = False
        # async mapping worker (reference LocalMapping thread)
        self.async_mapping = async_mapping or streaming
        self.map_lock = threading.RLock()
        self._abort_ba = False
        self._ba_skips = 0
        # post-loop GBA thread + abort epoch (reference spawns a killable
        # GBA thread per loop, src/LoopClosing.cc:606, :432-460)
        self._gba_thread: Optional[threading.Thread] = None
        self._gba_error: Optional[BaseException] = None
        self._loop_epoch = 0
        self._mapping_queue: "queue.Queue[Optional[int]]" = queue.Queue()
        # deferred local-BA write-back (async mode): the solve's device
        # handles, applied at the next mapping job / wait_mapping_idle
        self._pending_ba = None
        self._worker: Optional[threading.Thread] = None
        self._worker_error: Optional[BaseException] = None
        if self.async_mapping:
            self._worker = threading.Thread(
                target=self._mapping_worker, daemon=True
            )
            self._worker.start()
        # streaming (realtime) mode: the tracker thread
        # only DISPATCHES the fused core (device-resident pose/velocity
        # carry, zero per-frame pulls); a collector thread drains the
        # in-flight results with batched device_gets and runs the host
        # bookkeeping (map stats, trajectory, keyframe decision) with
        # bounded lag. This hides the host<->device round trip entirely —
        # the TPU-native shape of the reference's free-running tracking
        # thread + realtime mode, with the same trade the reference's
        # realtime node makes: under fast motion with mapping behind,
        # frames are sacrificed (fallback -> relocalization) rather than
        # corrupted. Tested contracts (tests/test_streaming.py): zero-lag
        # behavior is per-frame-equal to lock-step, and at the default
        # depth the un-flushed whole-clip run keeps >=80% of frames with
        # a bounded ATE envelope.
        self.streaming = streaming
        # streaming dispatch blocks while this many mapping jobs are
        # unfinished. 1 = the map is never more than the in-flight window
        # stale (tracking quality ~ lock-step; the streaming win is then
        # only overlapping the device round trips); 2 (default) also
        # overlaps a full mapping job with tracking — measured 2x
        # pipeline throughput — while the map stays at most one keyframe
        # interval behind (test_streaming covers accuracy at this depth)
        self.mapping_backlog_limit = 2
        # (anchor_kf_id, r_cw, t_cw, map_version) the carry is aligned to
        self._carry_anchor = None
        self._carry_delta_log: list = []  # applied re-anchor magnitudes
        # max in-flight frames: bounds both device memory and the
        # bookkeeping lag (keyframe decisions arrive at most this many
        # frames late). Collector speed, not queue growth, then governs
        # throughput — the tracker blocks when the window is full.
        self.streaming_depth = streaming_depth
        self._stream_core = None
        self._dev_carry = None
        self._stream_q: "list" = []  # in-flight (ts, outs, pts)
        self._stream_cv = threading.Condition()
        self._stream_stop = False
        self._stream_fail_count = 0
        self._stream_weak_count = 0
        self._stream_failed = False
        self._collector: Optional[threading.Thread] = None
        self._collector_error: Optional[BaseException] = None
        self._last_info = {
            "state": self.state, "n_tracked": 0, "n_kfs": 0, "n_points": 0,
        }
        if streaming:
            self._collector = threading.Thread(
                target=self._collector_loop, daemon=True
            )
            self._collector.start()

    # ------------------------------------------------------------------

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _make_frame(self, image, ts) -> FrameRecord:
        feats = self.extractor.extract(image)
        xy_und = undistort_points(self.cam, feats.xy)
        # one batched pull (each separate pull costs a tunnel round trip)
        xy, level, angle, desc01, valid = jax.device_get(
            (xy_und, feats.level, feats.angle, feats.desc01, feats.valid)
        )
        return FrameRecord(
            timestamp=ts,
            xy=xy,
            level=level,
            angle=angle,
            desc01=desc01,
            valid=valid,
            desc_pm1=feats.descriptors_pm1(),
            point_idx=np.full(feats.capacity, -1, np.int32),
            desc01_dev=feats.desc01,
            xy_dev=xy_und,
            level_dev=feats.level,
            valid_dev=feats.valid,
        )

    def process_frame(self, image, ts: float) -> dict:
        if self.streaming:
            return self._process_frame_streaming(image, ts)
        return self._process_frame_once(image, ts)

    def _process_frame_once(self, image, ts: float) -> dict:
        if (
            self.state != "NOT_INITIALIZED"
            and self.last_frame is not None
            and self.last_frame.r_cw is not None
        ):
            # steady-state: one fused dispatch + one host pull per frame
            fr = self._track_fused(image, ts)
        else:
            fr = self._make_frame(image, ts)
            if self.state == "NOT_INITIALIZED":
                self._try_initialize(fr)
            else:
                # no motion-model anchor (e.g. resumed from a loaded map):
                # relocalize into the existing map first
                if not self._relocalize(fr):
                    self.state = "LOST"
                    self.n_tracked = 0
        self._record_trajectory(fr, ts)
        self.last_frame = fr
        return {
            "state": self.state,
            "n_tracked": self.n_tracked,
            "n_kfs": len(self.map.kf_ids()),
            "n_points": len(self.map.active_point_ids()),
        }

    # -- streaming mode ---------------------------------------------------

    def _process_frame_streaming(self, image, ts: float) -> dict:
        """Dispatch-only frame entry: the fused core runs with a
        device-resident TrackCarry; host bookkeeping happens on the
        collector thread. Initialization / relocalization / persistent
        failure fall back to the synchronous path (stream flushed first,
        so host state is current)."""
        if self._collector_error is not None:
            raise RuntimeError("collector died") from self._collector_error
        steady = (
            self.state != "NOT_INITIALIZED"
            and not self._stream_failed
            and self._dev_carry is not None
        )
        if not steady:
            self.flush_stream()
            if self._stream_failed:
                # frames failed while in flight: the last good frame is
                # several frames old, so the per-frame velocity model no
                # longer applies (prediction falls back to the last pose
                # with the wide-radius retry)
                self.velocity = None
            self._stream_failed = False
            self._stream_fail_count = 0
            self._stream_weak_count = 0
            info = self._process_frame_once(image, ts)
            if (
                self.state == "OK"
                and self.last_frame is not None
                and self.last_frame.r_cw is not None
            ):
                self._seed_stream_carry()
            self._last_info = info
            return info
        if self._stream_core is None:
            from viorb_tpu.slam.tracking_loop import make_streaming_track_core

            self._stream_core = make_streaming_track_core(
                self.cam, self.extractor
            )
        # overload guard: when the mapping worker falls more than
        # `mapping_backlog_limit` jobs behind, the map is going stale
        # faster than it is being built — block (degrade toward lock-step)
        # instead of racing ahead of the map. On hardware where mapping
        # keeps up this never engages.
        import time as _time

        deadline = _time.monotonic() + 30.0
        while (
            self._mapping_queue.unfinished_tasks >= self.mapping_backlog_limit
            and self._worker_error is None
            and _time.monotonic() < deadline
        ):
            _time.sleep(0.002)
        pts, dev = self._device_local_map()
        # carry re-anchoring: every published map update (BA, fusion, loop
        # correction) moves the world slightly, but the device carry is
        # still in PRE-update coordinates — left alone, the mismatch
        # compounds per keyframe until projection matching falls off its
        # search radius (measured: tracked 274 -> 140 -> 12 within three
        # frames). Preserve the carry pose RELATIVE to its reference
        # keyframe across the update: T_f' = (T_f ∘ T_kf^{-1}) ∘ T_kf' =
        # T_f ∘ (T_kf^{-1} ∘ T_kf'). This is the streaming counterpart of
        # the reference's map-update re-bases (src/Tracking.cc:896-906)
        # and of the lock-step pipeline's post-BA frame resync.
        with self.map_lock:
            anchor = self._carry_anchor
            ver = self.map.version
            if anchor is not None and anchor[3] != ver:
                akf = self.map.keyframes.get(anchor[0])
                if akf is not None:
                    r_old, t_old = anchor[1], anchor[2]
                    # D = T_akf_old^{-1} ∘ T_akf_new
                    d_r = r_old.T @ akf.r_cw
                    d_t = r_old.T @ (akf.t_cw - t_old)
                    if (
                        np.abs(d_t).max() > 1e-7
                        or np.abs(d_r - np.eye(3)).max() > 1e-7
                    ):
                        self._carry_delta_log.append(
                            (float(np.linalg.norm(d_t)),
                             float(np.abs(d_r - np.eye(3)).max()))
                        )
                        del self._carry_delta_log[:-256]  # bounded diag
                        c = self._dev_carry
                        r_f = c.r_cw @ jnp.asarray(d_r.astype(np.float32))
                        t_f = c.r_cw @ jnp.asarray(
                            d_t.astype(np.float32)
                        ) + c.t_cw
                        from viorb_tpu.slam.tracking_loop import TrackCarry

                        self._dev_carry = TrackCarry(
                            r_f, t_f, c.vel_r, c.vel_t
                        )
            kf = self.map.keyframes.get(self.last_kf_id)
            if kf is not None:
                self._carry_anchor = (
                    self.last_kf_id, kf.r_cw.copy(), kf.t_cw.copy(), ver
                )
        carry, outs = self._stream_core(
            self._dev_carry, jnp.asarray(image), *dev
        )
        self._dev_carry = carry
        # start host copies of the bookkeeping fields NOW: by the time the
        # collector drains this frame the bytes are already host-side, so
        # its device_get costs ~0 instead of a tunnel round trip per batch
        for x in (
            outs[1], outs[0].level, outs[0].angle, outs[0].valid,
            outs[3], outs[4], outs[5], outs[6], outs[7], outs[8],
        ):
            try:
                x.copy_to_host_async()
            except Exception:
                pass
        # adaptive depth: when tracking confidence is low (map-coverage
        # boundary, fast motion) every lagged frame costs accuracy — drop
        # to depth 1 (lock-step-like) until confidence recovers; full
        # depth whenever tracking is solidly above the weak-streak
        # threshold (20; see _collect_batch)
        depth = self.streaming_depth if self.n_tracked >= 24 else 1
        with self._stream_cv:
            # backpressure: bound in-flight device memory + failure lag
            while (
                len(self._stream_q) >= depth
                and self._collector_error is None
            ):
                self._stream_cv.wait(timeout=1.0)
            self._stream_q.append((ts, outs, pts))
            self._stream_cv.notify_all()
        return dict(self._last_info, queued=len(self._stream_q))

    def _seed_stream_carry(self):
        from viorb_tpu.slam.tracking_loop import TrackCarry

        last = self.last_frame
        if self.velocity is not None:
            vr, vt = self.velocity
        else:
            vr, vt = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        self._dev_carry = TrackCarry(
            jnp.asarray(last.r_cw), jnp.asarray(last.t_cw),
            jnp.asarray(vr), jnp.asarray(vt),
        )
        with self.map_lock:
            kf = self.map.keyframes.get(self.last_kf_id)
            self._carry_anchor = (
                None
                if kf is None
                else (self.last_kf_id, kf.r_cw.copy(), kf.t_cw.copy(),
                      self.map.version)
            )

    def flush_stream(self):
        """Block until every in-flight streamed frame has been collected
        (no-op outside streaming mode)."""
        if self._collector is None:
            return
        with self._stream_cv:
            while self._stream_q and self._collector_error is None:
                self._stream_cv.wait(timeout=1.0)
        if self._collector_error is not None:
            raise RuntimeError("collector died") from self._collector_error

    def _collector_loop(self):
        while True:
            with self._stream_cv:
                while not self._stream_q and not self._stream_stop:
                    self._stream_cv.wait()
                if self._stream_stop and not self._stream_q:
                    return
                batch = list(self._stream_q)
            try:
                self._collect_batch(batch)
            except BaseException as e:
                self._collector_error = e
            with self._stream_cv:
                del self._stream_q[: len(batch)]
                self._stream_cv.notify_all()
            if self._collector_error is not None:
                return

    def _collect_batch(self, batch):
        """Pull many frames' bookkeeping fields in ONE device_get, then run
        the same per-frame host logic as the synchronous fused path."""
        pulled = jax.device_get(
            [
                (
                    o[1], o[0].level, o[0].angle, o[0].valid, o[3], o[4],
                    o[5], o[6], o[7], o[8],
                )
                for (_ts, o, _pts) in batch
            ]
        )
        for (ts, outs, pts), vals in zip(batch, pulled):
            feats, _xy_d, fdesc = outs[0], outs[1], outs[2]
            (xy, level, angle, fvalid, pf, r_new, t_new, inl, visible,
             ok) = vals
            nf = xy.shape[0]
            fr = FrameRecord(
                timestamp=ts,
                xy=xy,
                level=level,
                angle=angle,
                desc01=None,
                valid=fvalid,
                desc_pm1=fdesc,
                point_idx=np.full(nf, -1, np.int32),
                desc01_dev=feats.desc01,
                xy_dev=_xy_d,
                level_dev=feats.level,
                valid_dev=feats.valid,
            )
            if not bool(ok):
                # the device carry froze at the last good pose, so a
                # one-frame dropout (blur, occlusion) self-heals; a second
                # consecutive failure hands control back to the synchronous
                # fallback chain (reference-KF matching -> relocalization)
                # before more in-flight frames go to waste
                self._stream_fail_count += 1
                if self._stream_fail_count >= 2:
                    self._stream_failed = True
                    self.state = "LOST"
                self._last_info = dict(self._last_info, state=self.state)
                continue
            self._stream_fail_count = 0
            fr.r_cw = np.asarray(r_new)
            fr.t_cw = np.asarray(t_new)
            self.n_tracked = int(inl.sum())
            # weak streak: a run of low-inlier (but accepted) solutions
            # means the carry is sliding off the map — trigger the
            # synchronous fallback before it fully derails. An isolated
            # weak frame (blur) is accepted exactly like the lock-step
            # path accepts it.
            if self.n_tracked < 20:
                self._stream_weak_count += 1
                if self._stream_weak_count >= 3:
                    self._stream_failed = True
            else:
                self._stream_weak_count = 0
            self.state = "OK"
            ok_feats = np.nonzero((pf >= 0) & inl)[0]
            fr.point_idx[ok_feats] = pts[pf[ok_feats]]
            if len(pts):
                with self.map_lock:
                    vis = visible[: len(pts)]
                    alive = self.map.pt_active[pts]
                    self.map.pt_visible[pts[vis & alive[: len(vis)]]] += 1
                    ok_alive = ok_feats[
                        self.map.pt_active[fr.point_idx[ok_feats]]
                    ]
                    self.map.pt_found[fr.point_idx[ok_alive]] += 1
            self.frames_since_kf += 1
            if self._need_new_keyframe(ts):
                self._insert_keyframe(fr)
                self.frames_since_kf = 0
                # anchor the carry to the NEW keyframe at its insertion
                # pose: when its mapping job publishes (BA moves the KF),
                # the tracker's next dispatch re-anchors the carry by
                # exactly the insertion->BA delta — the streaming
                # counterpart of the lock-step post-BA frame resync
                # (_insert_keyframe's lock-step branch)
                with self.map_lock:
                    self._carry_anchor = (
                        self.last_kf_id, fr.r_cw.copy(), fr.t_cw.copy(),
                        self.map.version,
                    )
            self._record_trajectory(fr, ts)
            self.last_frame = fr
            self._last_info = {
                "state": self.state,
                "n_tracked": self.n_tracked,
                "n_kfs": len(self.map.kf_ids()),
                "n_points": len(self.map.active_point_ids()),
            }

    # -- initialization -------------------------------------------------

    def _try_initialize(self, fr: FrameRecord):
        if self.ref_frame is None or fr.timestamp - self.ref_frame.timestamp > 1.0:
            if fr.valid.sum() > 100:
                self.ref_frame = fr
            return
        ref = self.ref_frame
        # wide-window matching ref <-> cur (reference SearchForInitialization)
        d = hamming_matrix(ref.desc_pm1, fr.desc_pm1)
        gate = valid_gate(jnp.asarray(ref.valid), jnp.asarray(fr.valid))
        gate = gate & window_gate(
            jnp.asarray(ref.xy), jnp.asarray(fr.xy), 100.0
        )
        res = match_with_mask(d, gate, max_dist=50.0, ratio=0.9, mutual=True)
        rot_ok = rotation_consistency_mask(
            jnp.asarray(ref.angle), jnp.asarray(fr.angle), res.idx
        )
        idx = np.asarray(jnp.where(rot_ok, res.idx, -1))
        matched = np.nonzero(idx >= 0)[0]
        if len(matched) < 100:
            if fr.valid.sum() > 100:
                self.ref_frame = fr
            return
        n = ref.xy.shape[0]
        x1 = np.zeros((n, 2), np.float32)
        x2 = np.zeros((n, 2), np.float32)
        valid = np.zeros(n, bool)
        x1[matched] = ref.xy[matched]
        x2[matched] = fr.xy[idx[matched]]
        valid[matched] = True
        result = two_view_init(
            jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(valid),
            self.cam, self._next_key(),
        )
        if not bool(result.success):
            return
        # build initial map (reference CreateInitialMapMonocular)
        R2 = np.asarray(result.r_cw2)
        t2 = np.asarray(result.t_cw2)
        X = np.asarray(result.points)
        inl = np.asarray(result.is_inlier)
        med_depth = float(np.median(X[inl, 2]))
        if med_depth <= 0:
            return
        scale = 1.0 / med_depth
        X = X * scale
        t2 = t2 * scale

        ref.r_cw = np.eye(3, dtype=np.float32)
        ref.t_cw = np.zeros(3, np.float32)
        fr.r_cw, fr.t_cw = R2.astype(np.float32), t2.astype(np.float32)

        kf0 = self._kf_from_frame(ref)
        id0 = self.map.add_keyframe(kf0)
        kf1 = self._kf_from_frame(fr)
        id1 = self.map.add_keyframe(kf1)
        kf1.parent_kf = id0  # spanning-tree root edge
        for i in matched:
            if not inl[i]:
                continue
            j = idx[i]
            p = self.map.add_point(X[i], ref.desc01[i], id0, int(i))
            self.map.add_observation(p, id1, int(j))
            fr.point_idx[j] = p
            ref.point_idx = ref.point_idx if ref.point_idx is not None else None
        self.map.update_point_stats(self.map.active_point_ids())
        # full BA on the initial two-KF map
        self._local_ba([id0, id1], fixed=[id0])
        kf1_ = self.map.keyframes[id1]
        fr.r_cw, fr.t_cw = kf1_.r_cw.copy(), kf1_.t_cw.copy()
        self.last_kf_id = id1
        self.frames_since_kf = 0
        self.velocity = None
        self.state = "OK"
        self.n_tracked = int(inl.sum())

    def _kf_from_frame(self, fr: FrameRecord) -> KeyFrameData:
        # a streamed frame's descriptors live on device; DEFER the 256 KB
        # pull to the mapping job's batched pull (KeyFrameData.ensure_desc01)
        defer = fr.desc01 is None and fr.desc01_dev is not None
        kf = KeyFrameData(
            kf_id=-1,
            timestamp=fr.timestamp,
            r_cw=fr.r_cw.copy(),
            t_cw=fr.t_cw.copy(),
            xy=fr.xy.copy(),
            level=fr.level.copy(),
            angle=fr.angle.copy(),
            desc01=None if defer else fr.host_desc01().copy(),
            valid=fr.valid.copy(),
            point_idx=np.full(fr.xy.shape[0], -1, np.int32),
            ur=None if fr.ur is None else fr.ur.copy(),
            desc01_dev=fr.desc01_dev if defer else None,
        )
        return kf

    # -- tracking --------------------------------------------------------

    def _predict_pose(self, fr: FrameRecord):
        last = self.last_frame
        if self.velocity is not None and last.r_cw is not None:
            Rv, tv = self.velocity
            fr.r_cw = normalize_np(Rv @ last.r_cw)
            fr.t_cw = (Rv @ last.t_cw + tv).astype(np.float32)
        else:
            fr.r_cw = last.r_cw.copy()
            fr.t_cw = last.t_cw.copy()

    def _local_kf_ids(self) -> List[int]:
        if self.last_kf_id < 0:
            return []
        cov = self.map.covisibility_weights(self.last_kf_id)
        ids = sorted(cov, key=cov.get, reverse=True)[: self.local_window * 2]
        return [self.last_kf_id] + ids

    def _gather_local_points(self, kf_ids: List[int]):
        pts = self.map.local_map_points(kf_ids)
        cap = self.max_local_points
        if len(pts) > cap:
            pts = pts[:cap]
        xyz = np.zeros((cap, 3), np.float32)
        desc = np.zeros((cap, 256), np.uint8)
        normal = np.zeros((cap, 3), np.float32)
        dmin = np.zeros(cap, np.float32)
        dmax = np.full(cap, 1e9, np.float32)
        valid = np.zeros(cap, bool)
        m = len(pts)
        xyz[:m] = self.map.pt_xyz[pts]
        desc[:m] = self.map.pt_desc01[pts]
        normal[:m] = self.map.pt_normal[pts]
        dmin[:m] = self.map.pt_min_dist[pts]
        dmax[:m] = self.map.pt_max_dist[pts]
        valid[:m] = True
        return pts, xyz, desc, normal, dmin, dmax, valid

    def _gather_local_points_packed(self, kf_ids: List[int]):
        """Local-map payload gathered into ONE packed float block + the
        descriptor block + validity (3 uploads; transfers over a
        remote-attached chip are latency-bound)."""
        pts = self.map.local_map_points(kf_ids)
        cap = self.max_local_points
        if len(pts) > cap:
            pts = pts[:cap]
        m = len(pts)
        packed = np.zeros((cap, 8), np.float32)
        bits = np.zeros((cap, 32), np.uint8)
        valid = np.zeros(cap, bool)
        packed[:m, 0:3] = self.map.pt_xyz[pts]
        packed[:m, 3:6] = self.map.pt_normal[pts]
        packed[:m, 6] = self.map.pt_min_dist[pts]
        packed[m:, 7] = 1e9
        packed[:m, 7] = self.map.pt_max_dist[pts]
        bits[:m] = np.packbits(
            self.map.pt_desc01[pts], axis=1, bitorder="little"
        )
        valid[:m] = True
        return pts, packed, bits, valid

    def _device_local_map(self):
        """Padded local-map arrays as device buffers, cached per map epoch:
        re-gathered only when mapping publishes an update (map.version
        bump) or the reference keyframe changes, so the steady-state frame
        loop uploads nothing but the image."""
        from viorb_tpu.slam.kernels import unpack_local_map

        with self.map_lock:
            key = (id(self.map), self.map.version, self.last_kf_id)
            cache = self._lm_cache
            if cache is not None and cache[0] == key:
                return cache[1], cache[2]
            kf_ids = self._local_kf_ids()
            pts, packed, desc, valid = self._gather_local_points_packed(
                kf_ids
            )
        dev = unpack_local_map(
            jnp.asarray(packed), jnp.asarray(desc), jnp.asarray(valid)
        )
        self._lm_cache = (key, pts, dev)
        return pts, dev

    # -- per-keyframe device payload cache ---------------------------------

    _KF_DEV_CAP = 64  # payload entries kept resident (~0.8 MB each)

    def _seed_kf_payload(self, kf_id: int, fr: FrameRecord):
        """Register the (immutable) feature payload of a new keyframe with
        the device arrays the tracked frame already owns — triangulation
        and fusion then re-upload NOTHING per dispatch."""
        if fr.xy_dev is None or fr.level_dev is None or fr.valid_dev is None:
            return
        desc01 = fr.desc01_dev
        if desc01 is None:
            desc01 = jnp.asarray(fr.host_desc01())
        self._kf_dev[kf_id] = dict(
            xy=fr.xy_dev,
            level=fr.level_dev,
            valid=fr.valid_dev,
            desc01=desc01,
            desc_pm1=fr.desc_pm1,
        )
        self._trim_kf_payloads()

    def _kf_payload(self, kf_id: int) -> dict:
        """Device-resident immutable payload of a keyframe (xy, level,
        valid, desc01 u8, desc_pm1 bf16), uploaded once and cached."""
        ent = self._kf_dev.get(kf_id)
        if ent is None:
            kf = self.map.keyframes[kf_id]
            desc01 = (
                kf.desc01_dev
                if kf.desc01_dev is not None
                else jnp.asarray(kf.ensure_desc01())
            )
            valid = jnp.asarray(kf.valid)
            ent = dict(
                xy=jnp.asarray(kf.xy),
                level=jnp.asarray(kf.level),
                valid=valid,
                desc01=desc01,
                desc_pm1=(desc01.astype(jnp.bfloat16) * 2 - 1)
                * valid.astype(jnp.bfloat16)[:, None],
            )
            self._kf_dev[kf_id] = ent
            self._trim_kf_payloads()
        return ent

    def _trim_kf_payloads(self):
        while len(self._kf_dev) > self._KF_DEV_CAP:
            # dict preserves insertion order: drop the oldest entry (old
            # keyframes leave the active triangulation/fusion neighborhood)
            self._kf_dev.pop(next(iter(self._kf_dev)))

    def _track_fused(self, image, ts: float) -> FrameRecord:
        """Steady-state tracking as ONE device dispatch + ONE host pull:
        extraction, projection matching (wide-radius retry via lax.cond)
        and pose-only LM run fused (tracking_loop.make_pipeline_track_core);
        the host reads the packed result once for bookkeeping and the
        keyframe decision. The legacy multi-dispatch `_track` remains the
        fallback for the rare low-match / low-inlier frames (reference-KF
        matching -> relocalization -> LOST)."""
        if self._track_core is None:
            from viorb_tpu.slam.tracking_loop import make_pipeline_track_core

            self._track_core = make_pipeline_track_core(self.cam, self.extractor)
        last = self.last_frame
        if self.velocity is not None:
            Rv, tv = self.velocity
            r_pred = normalize_np(Rv @ last.r_cw)
            t_pred = (Rv @ last.t_cw + tv).astype(np.float32)
        else:
            r_pred, t_pred = last.r_cw.copy(), last.t_cw.copy()
        pts, dev = self._device_local_map()
        feats, xy_d, fdesc, pf_d, r_d, t_d, inl_d, vis_d, _n = self._track_core(
            jnp.asarray(image), jnp.asarray(r_pred), jnp.asarray(t_pred), *dev
        )
        # the frame's single host pull (desc01 stays on device: it is only
        # needed when the frame becomes a keyframe or relocalizes)
        xy, level, angle, fvalid, pf, r_new, t_new, inl, visible = (
            jax.device_get(
                (
                    xy_d,
                    feats.level,
                    feats.angle,
                    feats.valid,
                    pf_d,
                    r_d,
                    t_d,
                    inl_d,
                    vis_d,
                )
            )
        )
        nf = xy.shape[0]
        fr = FrameRecord(
            timestamp=ts,
            xy=xy,
            level=level,
            angle=angle,
            desc01=None,
            valid=fvalid,
            desc_pm1=fdesc,
            point_idx=np.full(nf, -1, np.int32),
            desc01_dev=feats.desc01,
            xy_dev=xy_d,
            level_dev=feats.level,
            valid_dev=feats.valid,
        )
        fr.r_cw, fr.t_cw = r_pred, t_pred
        matched_feats = np.nonzero(pf >= 0)[0]
        n_inl = int(inl.sum())
        if len(matched_feats) < 10 or n_inl < 10:
            self._track(fr)  # rare: full host-stepped fallback chain
            return fr
        fr.r_cw = np.asarray(r_new)
        fr.t_cw = np.asarray(t_new)
        self.n_tracked = n_inl
        self.state = "OK"
        ok_feats = np.nonzero((pf >= 0) & inl)[0]
        fr.point_idx[ok_feats] = pts[pf[ok_feats]]
        if len(pts):
            with self.map_lock:
                vis = visible[: len(pts)]
                alive = self.map.pt_active[pts]
                self.map.pt_visible[pts[vis & alive[: len(vis)]]] += 1
                ok_alive = ok_feats[self.map.pt_active[fr.point_idx[ok_feats]]]
                self.map.pt_found[fr.point_idx[ok_alive]] += 1
        self._track_epilogue(fr)
        return fr

    def _track(self, fr: FrameRecord):
        self._predict_pose(fr)
        with self.map_lock:
            kf_ids = self._local_kf_ids()
            pts, xyz, desc, normal, dmin, dmax, valid = self._gather_local_points(
                kf_ids
            )
        desc_pm1 = (jnp.asarray(desc, jnp.bfloat16) * 2 - 1) * jnp.asarray(
            valid, jnp.bfloat16
        )[:, None]

        def run_match(radius):
            return match_by_projection(
                jnp.asarray(xyz),
                desc_pm1,
                jnp.asarray(valid),
                jnp.asarray(normal),
                jnp.asarray(dmin),
                jnp.asarray(dmax),
                jnp.asarray(fr.r_cw),
                jnp.asarray(fr.t_cw),
                jnp.asarray(fr.xy),
                fr.desc_pm1,
                jnp.asarray(fr.valid),
                self.cam,
                jnp.float32(radius),
            )

        point_for_feat, res, n, visible = run_match(15.0)
        if int(n) < 20:
            point_for_feat, res, n, visible = run_match(30.0)
        pf = np.asarray(point_for_feat)
        matched_feats = np.nonzero(pf >= 0)[0]
        if len(matched_feats) < 10:
            # motion-model projection failed: fall back to descriptor
            # matching against the reference keyframe (reference
            # Tracking::TrackReferenceKeyFrame, src/Tracking.cc velocity-
            # model-empty / <20-matches branch), then relocalization.
            # On fallback success the corrected pose re-seeds the local-map
            # projection and tracking falls THROUGH to the normal pose-opt
            # + keyframe decision (the reference likewise follows
            # TrackReferenceKeyFrame with TrackLocalMap + NeedNewKeyFrame —
            # an early return here starves the map of keyframes and decays
            # into permanent fallback).
            recovered = self._track_reference_keyframe(fr)
            if recovered:
                point_for_feat, res, n, visible = run_match(15.0)
                pf = np.asarray(point_for_feat)
                matched_feats = np.nonzero(pf >= 0)[0]
            if len(matched_feats) < 10:
                if recovered:
                    # keep the fallback's reference-KF matches
                    self._track_epilogue(fr)
                    return
                if self._relocalize(fr):
                    return
                self.state = "LOST"
                self.n_tracked = 0
                return

        # pose-only optimization over the matches
        nf = fr.xy.shape[0]
        obs_pts = np.zeros((nf, 3), np.float32)
        obs_valid = np.zeros(nf, bool)
        inv_s2 = np.ones(nf, np.float32)
        obs_pts[matched_feats] = xyz[pf[matched_feats]]
        obs_valid[matched_feats] = True
        inv_s2[matched_feats] = 1.0 / self.sigma2[fr.level[matched_feats]]
        obs = PoseObs(
            points=jnp.asarray(obs_pts),
            uv=jnp.asarray(fr.xy),
            inv_sigma2=jnp.asarray(inv_s2),
            valid=jnp.asarray(obs_valid),
        )
        R_opt, t_opt, inlier = pose_optimization_tcw(
            jnp.asarray(fr.r_cw), jnp.asarray(fr.t_cw), obs, self.cam
        )
        fr.r_cw = np.asarray(R_opt)
        fr.t_cw = np.asarray(t_opt)
        inl = np.asarray(inlier)
        self.n_tracked = int(inl.sum())
        if self.n_tracked < 10:
            if self._track_reference_keyframe(fr):
                self._track_epilogue(fr)
                return
            if self._relocalize(fr):
                return
            self.state = "LOST"
            return
        self.state = "OK"

        # record matches on the frame; update found/visible counters
        fr.point_idx = np.full(nf, -1, np.int32)
        ok_feats = np.nonzero((pf >= 0) & inl)[0]
        fr.point_idx[ok_feats] = pts[pf[ok_feats]]
        if len(pts):
            with self.map_lock:
                vis = np.asarray(visible)[: len(pts)]
                alive = self.map.pt_active[pts]
                self.map.pt_visible[pts[vis & alive[: len(vis)]]] += 1
                ok_alive = ok_feats[self.map.pt_active[fr.point_idx[ok_feats]]]
                self.map.pt_found[fr.point_idx[ok_alive]] += 1

        self._track_epilogue(fr)

    def _track_epilogue(self, fr: FrameRecord):
        """Velocity-model update + keyframe decision; shared by the
        motion-model path and the reference-keyframe fallback."""
        last = self.last_frame
        if last is not None and last.r_cw is not None:
            Rl_inv = last.r_cw.T
            tl_inv = -Rl_inv @ last.t_cw
            self.velocity = (
                normalize_np(fr.r_cw @ Rl_inv),
                fr.r_cw @ tl_inv + fr.t_cw,
            )

        # keyframe decision (NeedNewKeyFrame, reference
        # src/Tracking.cc:1711-1814): interval cap (c1a), ratio trigger
        # gated by a min-frames floor (c1b/c2's mnMinFrames), and in async
        # mode a mapping-queue-depth gate — when the worker is behind, only
        # the interval cap may insert, so KF production can never outrun
        # the mapping thread (the reference gates on
        # mpLocalMapper->AcceptKeyFrames() + interrupts BA)
        self.frames_since_kf += 1
        if self._need_new_keyframe(fr.timestamp):
            self._insert_keyframe(fr)
            self.frames_since_kf = 0

    def _need_new_keyframe(self, ts: float) -> bool:
        if getattr(self, "suppress_keyframes", False) or self.localization_only:
            return False
        if self.n_tracked <= 15:
            return False
        ref_kf = self.map.keyframes[self.last_kf_id]
        ref_tracked = int((ref_kf.point_idx >= 0).sum())
        interval_hit = self.frames_since_kf >= self.kf_max_interval
        ratio_hit = (
            self.frames_since_kf >= self.kf_min_interval
            and self.n_tracked < 0.6 * max(ref_tracked, 1)
        )
        if not (interval_hit or ratio_hit):
            return False
        if (
            self.async_mapping
            and self._mapping_queue.unfinished_tasks >= 2
        ):
            # mapping saturated (>= 2 jobs queued or running): defer
            # unless the interval cap is 2x blown — keyframe production
            # must not outrun the mapping thread (the reference gates on
            # mpLocalMapper->AcceptKeyFrames())
            return self.frames_since_kf >= 2 * self.kf_max_interval
        return True

    def _track_reference_keyframe(self, fr: FrameRecord) -> bool:
        """Wide descriptor matching against the reference keyframe's
        map-point features, then pose-only optimization seeded from the
        predicted pose (reference Tracking::TrackReferenceKeyFrame — ours
        matches by raw descriptors on the MXU instead of BoW
        direct-index buckets, which a batched Hamming matmul makes
        unnecessary)."""
        if self.last_kf_id < 0:
            return False
        with self.map_lock:
            kf = self.map.keyframes.get(self.last_kf_id)
            if kf is None:
                return False
            has = (kf.point_idx >= 0) & kf.valid
            if has.sum() < 15:
                return False
            pt_ids = kf.point_idx.copy()
            pts_xyz = self.map.pt_xyz.copy()
        d_k = jnp.asarray(kf.ensure_desc01(), jnp.bfloat16) * 2 - 1
        dist = hamming_matrix(d_k, fr.desc_pm1)
        gate = valid_gate(jnp.asarray(has), jnp.asarray(fr.valid))
        res = match_with_mask(dist, gate, max_dist=50.0, ratio=0.85, mutual=True)
        rot_ok = rotation_consistency_mask(
            jnp.asarray(kf.angle), jnp.asarray(fr.angle), res.idx
        )
        idx = np.asarray(jnp.where(rot_ok, res.idx, -1))
        mk = np.nonzero(idx >= 0)[0]
        if len(mk) < 15:
            return False
        mf = idx[mk]
        nf = fr.xy.shape[0]
        pts = np.zeros((nf, 3), np.float32)
        valid = np.zeros(nf, bool)
        inv_s2 = np.ones(nf, np.float32)
        pts[mf] = pts_xyz[pt_ids[mk]]
        valid[mf] = True
        inv_s2[mf] = 1.0 / self.sigma2[fr.level[mf]]
        obs = PoseObs(
            points=jnp.asarray(pts), uv=jnp.asarray(fr.xy),
            inv_sigma2=jnp.asarray(inv_s2), valid=jnp.asarray(valid),
        )
        # seed from the last successfully tracked pose, not the (possibly
        # corrupted) motion-model prediction (reference seeds with
        # mLastFrame.mTcw)
        last = self.last_frame
        if last is not None and last.r_cw is not None:
            r_seed, t_seed = last.r_cw, last.t_cw
        else:
            r_seed, t_seed = kf.r_cw, kf.t_cw
        R_opt, t_opt, inlier = pose_optimization_tcw(
            jnp.asarray(r_seed), jnp.asarray(t_seed), obs, self.cam
        )
        inl = np.asarray(inlier)
        if int(inl.sum()) < 10:
            return False
        fr.r_cw = np.asarray(R_opt)
        fr.t_cw = np.asarray(t_opt)
        # map feature->point: mf[i] -> pt_ids[mk[i]]
        feat_to_pt = np.full(nf, -1, np.int32)
        feat_to_pt[mf] = pt_ids[mk]
        fr.point_idx = np.where(inl & (feat_to_pt >= 0), feat_to_pt, -1).astype(
            np.int32
        )
        self.n_tracked = int(inl.sum())
        self.state = "OK"
        return True

    def _relocalize(self, fr: FrameRecord) -> bool:
        """BoW candidates -> descriptor matching to candidate map points ->
        PnP RANSAC -> pose-only refinement (reference:
        Tracking::Relocalization, src/Tracking.cc:2127-2291).

        Without a vocabulary (e.g. resuming from a map checkpoint in a
        bare CLI run) candidates come from brute-force mutual descriptor
        matching against EVERY keyframe — one batched Hamming matmul per
        keyframe is affordable on the MXU where DBoW2's inverted file was
        the only viable option for the reference."""
        from viorb_tpu.solvers import pnp_ransac

        d_f = fr.desc_pm1
        if self.loop_closer is not None:
            _, qbow = self.vocabulary.transform(fr.host_desc01(), fr.valid)
            cands = self.loop_closer.db.query(qbow, max_results=5)
        else:
            scored = []
            for kid, kf_c in self.map.keyframes.items():
                has_c = (kf_c.point_idx >= 0) & kf_c.valid
                if has_c.sum() < 15:
                    continue
                d_c = jnp.asarray(kf_c.ensure_desc01(), jnp.bfloat16) * 2 - 1
                res_c = match_with_mask(
                    hamming_matrix(d_c, d_f),
                    valid_gate(jnp.asarray(has_c), jnp.asarray(fr.valid)),
                    max_dist=50.0, ratio=0.85, mutual=True,
                )
                scored.append((kid, int((np.asarray(res_c.idx) >= 0).sum())))
            cands = sorted(scored, key=lambda x: -x[1])[:5]
        for cand_id, score in cands:
            kf = self.map.keyframes.get(cand_id)
            if kf is None:
                continue
            has = (kf.point_idx >= 0) & kf.valid
            if has.sum() < 15:
                continue
            d_k = (jnp.asarray(kf.ensure_desc01(), jnp.bfloat16) * 2 - 1)
            dist = hamming_matrix(d_k, d_f)
            gate = valid_gate(jnp.asarray(has), jnp.asarray(fr.valid))
            res = match_with_mask(dist, gate, max_dist=50.0, ratio=0.85, mutual=True)
            idx = np.asarray(res.idx)  # per-kf-feature best frame feature
            mk = np.nonzero(idx >= 0)[0]
            if len(mk) < 15:
                continue
            mf = idx[mk]
            nf = fr.xy.shape[0]
            pts = np.zeros((nf, 3), np.float32)
            uv = fr.xy
            valid = np.zeros(nf, bool)
            pts[mf] = self.map.pt_xyz[kf.point_idx[mk]]
            valid[mf] = True
            out = pnp_ransac(
                jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(valid),
                self.cam, self._next_key(),
            )
            if not bool(out.success):
                continue
            obs = PoseObs(
                points=jnp.asarray(pts),
                uv=jnp.asarray(uv),
                inv_sigma2=jnp.ones(nf),
                valid=out.inliers,
            )
            R_ref, t_ref, inl = pose_optimization_tcw(
                out.r_cw, out.t_cw, obs, self.cam
            )
            if int(np.asarray(inl).sum()) < 15:
                continue
            fr.r_cw = np.asarray(R_ref)
            fr.t_cw = np.asarray(t_ref)
            self.state = "OK"
            self.velocity = None
            self.n_tracked = int(np.asarray(inl).sum())
            self.lost_frames = 0
            return True
        return False

    # -- mapping step ----------------------------------------------------

    def _insert_keyframe(self, fr: FrameRecord):
        """Sync part of keyframe insertion: create the KF and register its
        tracked observations, then either run the mapping job inline
        (lock-step) or hand it to the worker (async)."""
        kf = self._kf_from_frame(fr)
        with self.map_lock:
            kf_id = self.map.add_keyframe(kf)
            for f in np.nonzero(fr.point_idx >= 0)[0]:
                p = int(fr.point_idx[f])
                if self.map.pt_active[p]:
                    self.map.add_observation(p, kf_id, int(f))
        self._seed_kf_payload(kf_id, fr)
        self.last_kf_id = kf_id
        # subclass hook (VI: attach the IMU segment + chain links + NavState)
        # runs BEFORE the job can start — the worker reads what it attaches
        self._on_keyframe_created(fr, kf_id)
        if self.async_mapping:
            if self._worker_error is not None:
                raise RuntimeError("mapping worker died") from self._worker_error
            self._abort_ba = True  # reference mbAbortBA
            self._mapping_queue.put(kf_id)
        else:
            self._mapping_job(kf_id)
            with self.map_lock:
                kf_ = self.map.keyframes[kf_id]
                fr.r_cw, fr.t_cw = kf_.r_cw.copy(), kf_.t_cw.copy()

    def _on_keyframe_created(self, fr: FrameRecord, kf_id: int):
        """Hook between KF creation and mapping-job dispatch."""

    def _mapping_job(self, kf_id: int):
        """The LocalMapping step for one keyframe: triangulation + fusion
        (dispatched together, drained with ONE device pull), stats,
        windowed BA (skipped when a newer keyframe is already pending —
        the reference's BA abort; in async mode the BA WRITE-BACK is
        deferred to the next job so its device round trip overlaps
        tracking), culling, place recognition."""
        self._abort_ba = False
        self._flush_pending_ba()
        with self.map_lock:
            if kf_id not in self.map.keyframes:
                return
            cov = self.map.covisibility_weights(kf_id)
            # spanning-tree parent: older KF with max shared observations
            # (reference attaches mpParent at LocalMapping acceptance)
            older = {
                k: w for k, w in cov.items()
                if k < kf_id and k in self.map.keyframes
            }
            if older:
                self.map.keyframes[kf_id].parent_kf = max(older, key=older.get)
            else:
                prior = [k for k in self.map.keyframes if k < kf_id]
                self.map.keyframes[kf_id].parent_kf = max(prior, default=-1)
        neighbors = sorted(cov, key=cov.get, reverse=True)[:3]
        # triangulation (CreateNewMapPoints) and fusion (SearchInNeighbors)
        # dispatched back-to-back, ONE pull for both. Fusion runs on the
        # PRE-triangulation point sets: this job's brand-new points are
        # fused by the NEXT job's pass-1 instead (one-KF lag; the pull it
        # saves is a full interconnect round trip per keyframe).
        tri_launches = self._tri_dispatch(kf_id, neighbors)
        fuse_launches, own, nb_pts = self._fuse_batch_dispatch(
            kf_id, neighbors
        )
        kf = self.map.keyframes.get(kf_id)
        deferred = kf is not None and kf.desc01 is None
        pulls = [o for _, o in tri_launches] + [
            h for _, h, _ in fuse_launches
        ]
        if deferred:
            pulls.append(kf.desc01_dev)
        if pulls:
            pulled = jax.device_get(pulls)
            if deferred:
                kf.desc01 = pulled.pop()
                kf.desc01_dev = None
            nt = len(tri_launches)
            dsc1 = None if kf is None else kf.ensure_desc01()
            for (nb_id, _), (idx, X, good) in zip(tri_launches, pulled[:nt]):
                self._tri_merge_pair(kf_id, nb_id, idx, X, good, dsc1)
            with self.map_lock:
                for (ids, _, target), pf in zip(fuse_launches, pulled[nt:]):
                    self._fuse_apply(ids, pf, target)
        with self.map_lock:
            touched = self.map.local_map_points([kf_id])
            if len(nb_pts):
                touched = np.unique(np.concatenate([touched, nb_pts]))
            alive = touched[self.map.pt_active[touched]]
            self.map.update_point_stats(alive)
            window = [kf_id] + sorted(cov, key=cov.get, reverse=True)[
                : self.local_window - 1
            ]
        # local BA (subclass hook switches vision vs VI flavour, the
        # reference's VI-vs-vision switch at src/LocalMapping.cc:1055-1080)
        self._mapping_ba(kf_id, window)
        with self.map_lock:
            self._cull_points(kf_id)
            self._cull_keyframes(window)
        if self.loop_closer is not None:
            self._flush_pending_ba()
            with self.map_lock:
                self.loop_closer.add_keyframe(kf_id)
                if getattr(self, "enable_loop_closing", False):
                    self.loop_closer.try_close(kf_id)
        self.map.version += 1

    def _mapping_ba(self, kf_id: int, window: List[int]):
        """Windowed local BA with outside-window anchors fixed; skipped
        when a newer keyframe is already queued (the reference's BA abort,
        src/LocalMapping.cc:1137-1142). Subclasses switch the flavour."""
        with self.map_lock:
            # fixed anchors: KFs observing window points but outside window
            anchor = set()
            for p in self.map.local_map_points(window):
                for k in self.map.obs_kf[p]:
                    if k >= 0 and int(k) not in window:
                        anchor.add(int(k))
            fixed = sorted(anchor)[:8]
            if not fixed:
                # no outside-window anchors (early map): pin the oldest
                # window keyframe or the solve is GAUGE-FREE — each run
                # then rotates/translates the whole world a little
                # (measured up to 0.08 rad per job) and every consumer of
                # map coordinates has to chase it
                fixed = [min(window)]
        # BA abort on a pending newer keyframe (reference mbAbortBA) — but
        # bounded: under sustained backlog a naive skip starves BA
        # entirely, so at most 2 consecutive jobs may skip it
        if (
            self.async_mapping
            and not self._mapping_queue.empty()
            and self._ba_skips < 2
        ):
            self._ba_skips += 1
            return
        self._ba_skips = 0
        # async: dispatch now, write back at the next job (_flush_pending_ba)
        self._local_ba(window, fixed, defer=self.async_mapping)

    def _mapping_worker(self):
        while True:
            kf_id = self._mapping_queue.get()
            try:
                if kf_id is None:
                    return
                self._mapping_job(kf_id)
            except BaseException as e:  # surfaced on next insert
                self._worker_error = e
            finally:
                self._mapping_queue.task_done()
            # apply the job's deferred BA right away, AFTER task_done: the
            # backlog gate releases at the job boundary (tracking resumes)
            # while the BA round trip drains in this worker's idle gap —
            # fresh triangulations get refined within ~a frame, not a
            # whole keyframe interval later
            try:
                self._flush_pending_ba()
            except BaseException as e:
                self._worker_error = e

    def wait_mapping_idle(self):
        """Block until the stream and the mapping queue drain (lock-step
        no-op). The reference's bLocalMapAcceptKF lock-step wait
        (Examples/ROS/ORB_VIO/src/ros_vio.cc:263-276)."""
        self.flush_stream()
        if self.async_mapping:
            self._mapping_queue.join()
            self._flush_pending_ba()
            t = self._gba_thread
            if t is not None and t.is_alive():
                t.join(timeout=300)
            if self._worker_error is not None:
                raise RuntimeError("mapping worker died") from self._worker_error
            if self._gba_error is not None:
                raise RuntimeError(
                    "post-loop GBA thread died"
                ) from self._gba_error

    def shutdown(self):
        """Stop the collector and mapping worker (reference
        System::Shutdown)."""
        if self._collector is not None and self._collector.is_alive():
            with self._stream_cv:
                self._stream_stop = True
                self._stream_cv.notify_all()
            self._collector.join(timeout=30)
            self._collector = None
        if self._worker is not None and self._worker.is_alive():
            self._mapping_queue.put(None)
            self._worker.join(timeout=30)
            self._worker = None
        t = self._gba_thread
        if t is not None and t.is_alive():
            t.join(timeout=300)
        self._gba_thread = None

    def reset(self):
        """Full system reset on unrecoverable pre-map loss (reference
        Tracking/System::Reset, src/Tracking.cc:2293: clear map, keyframe
        database, re-initialize from scratch). Past trajectory entries are
        dropped with their keyframes."""
        self.wait_mapping_idle()
        with self.map_lock:
            self.map = MapStore()
            self.state = "NOT_INITIALIZED"
            self.ref_frame = None
            self.last_frame = None
            self.last_kf_id = -1
            self.frames_since_kf = 0
            self.velocity = None
            self._dev_carry = None
            self._carry_anchor = None
            self._stream_failed = False
            self._stream_fail_count = 0
            self._lm_cache = None
            self._kf_dev = {}
            self._pending_ba = None
            self.traj_entries = []
            self.n_tracked = 0
            self.lost_frames = 0
            if self.loop_closer is not None:
                from viorb_tpu.slam.loop_closing import LoopCloser

                self.loop_closer = LoopCloser(
                    self.map, self.vocabulary, cam=self.cam,
                    fix_scale=self.loop_fix_scale,
                )
                self.loop_closer.gba_fn = self._post_loop_gba
                self.loop_closer.fuse_fn = self._fuse_points_into_kf

    def set_localization_mode(self, enabled: bool):
        """Track against the frozen map without inserting keyframes
        (reference System::ActivateLocalizationMode /
        DeactivateLocalizationMode, include/System.h:99-104)."""
        self.wait_mapping_idle()
        self.localization_only = enabled

    def save_map(self, path: str):
        """Checkpoint the full map to one .npz (the reference left
        SaveMap/LoadMap as a TODO, include/System.h:132-134)."""
        from viorb_tpu.mapping.serialize import save_map

        self.wait_mapping_idle()
        with self.map_lock:
            save_map(self.map, path)

    def load_map(self, path: str, localization_only: bool = True):
        """Load a checkpointed map and resume from it. The next frame
        relocalizes into the loaded map (BoW + PnP); with
        localization_only the map stays frozen, otherwise mapping
        continues from the loaded keyframes."""
        from viorb_tpu.mapping.serialize import load_map

        self.wait_mapping_idle()
        with self.map_lock:
            self.map = load_map(path)
            active = self.map.kf_ids()
            self.last_kf_id = max(active) if active else -1
            self.state = "LOST" if active else "NOT_INITIALIZED"
            self.last_frame = None
            self.ref_frame = None
            self.velocity = None
            self.frames_since_kf = 0
            self.localization_only = localization_only
            self._dev_carry = None
            self._carry_anchor = None
            self._lm_cache = None
            self._kf_dev = {}
            self._pending_ba = None
            if self.loop_closer is not None:
                from viorb_tpu.slam.loop_closing import LoopCloser

                self.loop_closer = LoopCloser(
                    self.map, self.vocabulary, cam=self.cam,
                    fix_scale=self.loop_fix_scale,
                )
                self.loop_closer.gba_fn = self._post_loop_gba
                self.loop_closer.fuse_fn = self._fuse_points_into_kf
                for k in active:
                    self.loop_closer.add_keyframe(k)

    def _tri_dispatch(self, kf_id: int, nb_ids: List[int]):
        """Dispatch the triangulation kernel for every worthwhile pair;
        immutable feature payloads come from the device payload cache —
        only poses and free-masks ship per pair."""
        from viorb_tpu.slam.kernels import triangulate_between

        sigma2_dev = jnp.asarray(self.sigma2)
        launches = []
        for nb_id in nb_ids:
            snap = self._triangulation_snapshot(kf_id, nb_id)
            if snap is None:
                continue
            r1, t1, free1, r2, t2, free2 = snap
            p1 = self._kf_payload(kf_id)
            p2 = self._kf_payload(nb_id)
            out = triangulate_between(
                jnp.asarray(r1), jnp.asarray(t1), p1["xy"],
                p1["level"], p1["desc01"], jnp.asarray(free1),
                jnp.asarray(r2), jnp.asarray(t2), p2["xy"],
                p2["level"], p2["desc01"], jnp.asarray(free2),
                self.cam, sigma2_dev,
            )
            launches.append((nb_id, out))
        return launches

    def _tri_merge_pair(self, kf_id, nb_id, idx, X, good, dsc1):
        """Merge one pulled triangulation result into the map."""
        if not good.any() or dsc1 is None:
            return
        with self.map_lock:
            kf = self.map.keyframes.get(kf_id)
            nb = self.map.keyframes.get(nb_id)
            if kf is None or nb is None:
                return
            # features may have been bound meanwhile (fusion or an
            # earlier neighbour's triangulation); mutual matching
            # guarantees the surviving f1/f2 sets are duplicate-free
            f1s = np.nonzero(good)[0]
            f2s = idx[f1s]
            free = (kf.point_idx[f1s] < 0) & (nb.point_idx[f2s] < 0)
            f1s, f2s = f1s[free], f2s[free]
            self.map.add_points_batch(
                X[f1s], dsc1[f1s], kf_id, f1s.astype(np.int32),
                nb_id, f2s.astype(np.int32),
            )

    def _triangulate_batch(self, kf_id: int, nb_ids: List[int]):
        """Standalone dispatch+pull+merge triangulation (the mapping job
        uses _tri_dispatch/_tri_merge_pair to share its pull with
        fusion). The new keyframe's deferred descriptor block rides the
        same pull."""
        launches = self._tri_dispatch(kf_id, nb_ids)
        kf = self.map.keyframes.get(kf_id)
        deferred = kf is not None and kf.desc01 is None
        if not launches and not deferred:
            return
        pulls = [o for _, o in launches]
        if deferred:
            pulls.append(kf.desc01_dev)
        pulled = jax.device_get(pulls)
        if deferred:
            kf.desc01 = pulled.pop()
            kf.desc01_dev = None
        dsc1 = None if kf is None else kf.ensure_desc01()
        for (nb_id, _), (idx, X, good) in zip(launches, pulled):
            self._tri_merge_pair(kf_id, nb_id, idx, X, good, dsc1)

    def _triangulation_snapshot(self, kf_id: int, nb_id: int):
        """Lock-held snapshot of one keyframe pair's POSE + free-mask
        triangulation inputs (baseline gate included); None when the pair
        is not worth triangulating. Feature payloads come from the device
        cache (_kf_payload)."""
        with self.map_lock:
            kf = self.map.keyframes.get(kf_id)
            nb = self.map.keyframes.get(nb_id)
            if kf is None or nb is None:
                return None
            baseline = np.linalg.norm(kf.center() - nb.center())
            pts_nb = nb.point_idx[nb.point_idx >= 0]
            if len(pts_nb) > 0:
                depths = (self.map.pt_xyz[pts_nb] @ nb.r_cw.T + nb.t_cw)[:, 2]
                med = np.median(depths[depths > 0]) if (depths > 0).any() else 1.0
                if baseline / max(med, 1e-6) < 0.01:
                    return None
            free1 = kf.valid & (kf.point_idx < 0)
            free2 = nb.valid & (nb.point_idx < 0)
            if free1.sum() == 0 or free2.sum() == 0:
                return None
            return (
                kf.r_cw.copy(), kf.t_cw.copy(), free1,
                nb.r_cw.copy(), nb.t_cw.copy(), free2,
            )

    def _build_fuse_payload(self, pt_ids: np.ndarray):
        """Upload ONE point payload (packed floats + bit-packed
        descriptors + validity) shared by every fuse pair of a mapping
        job. One fixed launch shape — every distinct capacity bucket
        would be a fresh multi-second XLA compile."""
        cap = self.max_local_points
        pt_ids = pt_ids[:cap]
        m = len(pt_ids)
        packed = np.zeros((cap, 8), np.float32)
        bits = np.zeros((cap, 32), np.uint8)
        valid = np.zeros(cap, bool)
        packed[:m, 0:3] = self.map.pt_xyz[pt_ids]
        packed[:m, 3:6] = self.map.pt_normal[pt_ids]
        packed[:m, 6] = self.map.pt_min_dist[pt_ids]
        packed[m:, 7] = 1e9
        packed[:m, 7] = self.map.pt_max_dist[pt_ids]
        bits[:m] = np.packbits(
            self.map.pt_desc01[pt_ids], axis=1, bitorder="little"
        )
        valid[:m] = self.map.pt_active[pt_ids]
        payload = (jnp.asarray(packed), jnp.asarray(bits), jnp.asarray(valid))
        return pt_ids, payload

    def _fuse_dispatch(
        self,
        pt_ids: np.ndarray,
        target_id: int,
        radius: float,
        payload=None,
        row_of: Optional[np.ndarray] = None,
    ):
        """Dispatch phase of Fuse: launch the projection-match kernel for
        one (points, keyframe) pair; returns (pt_ids, device handle).
        With a prebuilt union payload (batch callers) the per-pair
        transfer is ONE small index vector; otherwise the payload is
        built from pt_ids directly. The keyframe side always comes from
        the device payload cache."""
        from viorb_tpu.slam.kernels import fuse_match_gathered

        kf = self.map.keyframes.get(target_id)
        if kf is None or len(pt_ids) == 0:
            return None
        cap = self.max_local_points
        pt_ids = pt_ids[:cap]
        sel = np.full(cap, -1, np.int32)
        if payload is None:
            pt_ids, payload = self._build_fuse_payload(pt_ids)
            sel[: len(pt_ids)] = np.arange(len(pt_ids), dtype=np.int32)
        else:
            sel[: len(pt_ids)] = row_of[pt_ids]
        pay = self._kf_payload(target_id)
        point_for_feat, _, _n, _ = fuse_match_gathered(
            *payload, jnp.asarray(sel),
            jnp.asarray(kf.r_cw), jnp.asarray(kf.t_cw),
            pay["xy"], pay["desc_pm1"], pay["valid"],
            self.cam, jnp.float32(radius),
        )
        return pt_ids, point_for_feat

    def _fuse_apply(self, pt_ids: np.ndarray, pf: np.ndarray, target_id: int) -> int:
        """Merge phase of Fuse (host, under the caller's lock): a match on
        a free feature becomes an observation; a match on a feature bound
        to a DIFFERENT point merges the two (fewer-observations one dies).
        Alive-gated: points may have died in an earlier apply of the same
        batch."""
        kf = self.map.keyframes.get(target_id)
        if kf is None:
            return 0
        fused = 0
        for f in np.nonzero(pf >= 0)[0]:
            p = int(pt_ids[pf[f]])
            if not self.map.pt_active[p]:
                continue
            q = int(kf.point_idx[f])
            if q < 0:
                if self.map.add_observation(p, target_id, int(f)):
                    fused += 1
            elif q != p and self.map.pt_active[q]:
                # keep the better-observed point (reference Fuse->Replace)
                if self.map.n_obs(q) >= self.map.n_obs(p):
                    self.map.replace_point(p, q)
                else:
                    self.map.replace_point(q, p)
                fused += 1
        return fused

    def _fuse_points_into_kf(
        self, pt_ids: np.ndarray, target_id: int, radius: float = 3.0
    ) -> int:
        """One-pair Fuse: dispatch + pull + merge (the TPU reshape of
        ORBmatcher::Fuse, reference src/ORBmatcher.cc; batch callers use
        _fuse_dispatch/_fuse_apply to share one device pull across
        pairs)."""
        out = self._fuse_dispatch(pt_ids, target_id, radius)
        if out is None:
            return 0
        ids, pf_dev = out
        return self._fuse_apply(ids, np.asarray(pf_dev), target_id)

    def _fuse_batch_dispatch(self, kf_id: int, neighbors: List[int]):
        """Dispatch phase of SearchInNeighbors: one shared union payload
        upload, then one gather-dispatch per pair (new KF's points into
        each neighbor + all neighbor points into the new KF, reference
        src/LocalMapping.cc:1487). The lock is held only for the
        snapshot — never across a device round trip."""
        empty = np.zeros(0, np.int64)
        with self.map_lock:
            kf = self.map.keyframes.get(kf_id)
            if kf is None:
                return [], empty, empty
            own = kf.point_idx[kf.point_idx >= 0]
            nb_pts = self.map.local_map_points(neighbors)
            union = (
                np.unique(np.concatenate([own, nb_pts]))
                if len(nb_pts)
                else own
            )
            union, payload = self._build_fuse_payload(union)
            row_of = np.full(self.map.max_points, -1, np.int32)
            row_of[union] = np.arange(len(union), dtype=np.int32)
            launches = []
            for nb in neighbors:
                out = self._fuse_dispatch(own, nb, 3.0, payload, row_of)
                if out is not None:
                    launches.append((out[0], out[1], nb))
            out = self._fuse_dispatch(nb_pts, kf_id, 3.0, payload, row_of)
            if out is not None:
                launches.append((out[0], out[1], kf_id))
        return launches, own, nb_pts

    def _search_in_neighbors(self, kf_id: int, neighbors: List[int]):
        """Standalone two-pass fusion: dispatch, ONE pull, sequential
        alive-gated merges, stats refresh (the mapping job shares the
        pull with triangulation instead)."""
        launches, own, nb_pts = self._fuse_batch_dispatch(kf_id, neighbors)
        if launches:
            pulled = jax.device_get([h for _, h, _ in launches])
            with self.map_lock:
                for (ids, _, target), pf in zip(launches, pulled):
                    self._fuse_apply(ids, pf, target)
        with self.map_lock:
            touched = np.unique(
                np.concatenate([own, nb_pts]) if len(nb_pts) else own
            )
            alive = touched[self.map.pt_active[touched]]
            self.map.update_point_stats(alive)

    def _project_np(self, pc):
        z = np.maximum(pc[:, 2:3], 1e-6)
        xn = pc[:, :2] / z
        return np.stack(
            [
                self.cam.fx * xn[:, 0] + self.cam.cx,
                self.cam.fy * xn[:, 1] + self.cam.cy,
            ],
            1,
        )

    def _local_ba(
        self,
        window: List[int],
        fixed: List[int],
        max_landmarks: int = 0,
        abort_check=None,
        defer: bool = False,
    ):
        max_landmarks = max_landmarks or self.max_ba_landmarks
        with self.map_lock:
            window = [k for k in window if k in self.map.keyframes]
            fixed = [k for k in fixed if k in self.map.keyframes]
            if len(window) < 2:
                return
            kf_list, pt_ids, kf_idx, uv, inv_s2, valid = self.map.build_ba_problem(
                window, fixed, max_landmarks
            )
            if len(pt_ids) == 0:
                return
            # pad the pose block to a bucketed count: the BA program
            # compiles per (K, M, R) shape, and K tracking the window +
            # anchor count would recompile nearly every call (padded slots
            # are fixed identity poses with no observations)
            k = _pose_bucket(len(kf_list))
            r_cw = np.broadcast_to(np.eye(3, dtype=np.float32), (k, 3, 3)).copy()
            t_cw = np.zeros((k, 3), np.float32)
            for s, i in enumerate(kf_list):
                r_cw[s] = self.map.keyframes[i].r_cw
                t_cw[s] = self.map.keyframes[i].t_cw
            points = np.zeros((max_landmarks, 3), np.float32)
            points[: len(pt_ids)] = self.map.pt_xyz[pt_ids]
            fixed_mask = np.ones(k, bool)
            for s, i in enumerate(kf_list):
                fixed_mask[s] = i in fixed
        state = VisionBAState(
            jnp.asarray(r_cw), jnp.asarray(t_cw), jnp.asarray(points)
        )
        obs = BAObservations(
            kf_idx=jnp.asarray(kf_idx),
            uv=jnp.asarray(uv),
            inv_sigma2=jnp.asarray(inv_s2),
            valid=jnp.asarray(valid),
        )
        bf = getattr(self, "bf", None)  # set by StereoSlam
        if bf is not None:
            ur, urv = self.map.build_stereo_ur_grid(
                pt_ids, kf_list, max_landmarks
            )
            obs = obs._replace(ur=jnp.asarray(ur), ur_valid=jnp.asarray(urv))
        out, obs2 = vision_ba_two_phase(
            state, obs, self.cam, jnp.asarray(fixed_mask),
            bf=None if bf is None else jnp.float32(bf),
        )
        with self.map_lock:
            # snapshot for the deferred write-back: keyframes created
            # between this solve and its application must be corrected
            # through their reference (the newest solved KF) or the BA
            # moves the world out from under them
            next_kf_at_solve = self.map._next_kf
            ref_id = max(
                (
                    i
                    for s, i in enumerate(kf_list)
                    if not fixed_mask[s] and i in self.map.keyframes
                ),
                default=-1,
            )
            ref_pre = (
                None
                if ref_id < 0
                else (
                    self.map.keyframes[ref_id].r_cw.copy(),
                    self.map.keyframes[ref_id].t_cw.copy(),
                )
            )
        job = (
            kf_list, pt_ids, kf_idx, valid, fixed_mask, out, obs2,
            abort_check, self._loop_epoch, next_kf_at_solve, ref_id, ref_pre,
        )
        if defer:
            # async mode: hand the in-flight solve to the NEXT mapping
            # job (or wait_mapping_idle), overlapping the device round
            # trip + write-back with tracking
            self._pending_ba = job
            return
        self._apply_ba_result(*job)

    def _flush_pending_ba(self):
        job, self._pending_ba = self._pending_ba, None
        if job is not None:
            self._apply_ba_result(*job)

    def _apply_ba_result(
        self, kf_list, pt_ids, kf_idx, valid, fixed_mask, out, obs2,
        abort_check, epoch0, next_kf_at_solve, ref_id, ref_pre,
    ):
        # write back (under the lock; the solve ran on snapshots); one
        # batched pull for the whole result set
        r_new, t_new, p_new, valid_new = jax.device_get(
            (out.r_cw, out.t_cw, out.points, obs2.valid)
        )
        with self.map_lock:
            if abort_check is not None and abort_check():
                # a newer loop correction superseded this solve while it
                # was in flight (reference kills the GBA thread,
                # src/LoopClosing.cc:432-460) — discard it
                return
            if epoch0 != self._loop_epoch:
                # a loop correction rewrote the map between this solve's
                # snapshot and its (possibly deferred) write-back —
                # applying a pre-correction solution would undo it
                return
            for s, i in enumerate(kf_list):
                if not fixed_mask[s] and i in self.map.keyframes:
                    self.map.keyframes[i].r_cw = r_new[s]
                    self.map.keyframes[i].t_cw = t_new[s]
            # keyframes created AFTER this solve's snapshot (deferred
            # write-back overlaps tracking) ride the correction through
            # their reference — the newest solved keyframe — exactly like
            # the reference's post-GBA spanning-tree pass
            # (src/LoopClosing.cc:700-819). Without this, the solve moves
            # the window and points out from under the new keyframe (and
            # the streaming carry anchored to it) and tracking collapses.
            if ref_pre is not None and ref_id in self.map.keyframes:
                r_old, t_old = ref_pre
                rk = self.map.keyframes[ref_id]
                for i in sorted(self.map.keyframes):
                    if i < next_kf_at_solve or i in kf_list:
                        continue
                    kf = self.map.keyframes[i]
                    r_rel = kf.r_cw @ r_old.T
                    t_rel = kf.t_cw - r_rel @ t_old
                    kf.r_cw = normalize_np(r_rel @ rk.r_cw)
                    kf.t_cw = (r_rel @ rk.t_cw + t_rel).astype(np.float32)
            alive = self.map.pt_active[pt_ids]
            self.map.pt_xyz[pt_ids[alive]] = p_new[: len(pt_ids)][alive]
            # remove observations BA marked as outliers
            was_valid = valid
            dropped = was_valid & ~valid_new
            for row in np.nonzero(dropped.any(axis=1))[0]:
                p = int(pt_ids[row])
                if not self.map.pt_active[p]:
                    continue
                for s in np.nonzero(dropped[row])[0]:
                    self.map.remove_observation(p, int(kf_list[kf_idx[row, s]]))
            # publish: every consumer keyed on map.version (device
            # local-map cache, streaming carry re-anchor) must see BA
            # pose/point movement — the async GBA thread in particular has
            # no other version bump (the mapping job's bump fires before
            # the GBA completes)
            self.map.version += 1

    def _post_loop_gba(self, anchor_kf: int, scale_by_kf=None):
        """Full-map BA after a loop correction, anchored at the loop
        (old-side) keyframe (reference RunGlobalBundleAdjustment,
        src/LoopClosing.cc:674-819 — vision flavour). scale_by_kf maps
        kf_id -> local world-scale factor of the correction (used by the
        VI override to rescale velocities; unused for vision).

        In async mode the solve runs in its OWN thread (the reference
        spawns a GBA thread per loop, src/LoopClosing.cc:606): mapping and
        tracking continue; a newer loop correction arriving mid-solve
        aborts the stale write-back (reference :432-460); keyframes and
        points created while the GBA ran are corrected afterwards through
        their parent/reference keyframe, like the reference's
        spanning-tree pass (:700-819)."""
        if not self.async_mapping:
            return self._post_loop_gba_impl(anchor_kf, scale_by_kf, None)
        with self.map_lock:
            self._loop_epoch += 1
            epoch = self._loop_epoch
        t = threading.Thread(
            target=self._gba_thread_main,
            args=(anchor_kf, scale_by_kf, epoch),
            daemon=True,
        )
        self._gba_thread = t
        t.start()

    def _gba_thread_main(self, anchor_kf, scale_by_kf, epoch):
        try:
            self._post_loop_gba_impl(anchor_kf, scale_by_kf, epoch)
        except BaseException as e:
            self._gba_error = e

    def _post_loop_gba_impl(self, anchor_kf: int, scale_by_kf, epoch):
        with self.map_lock:
            ids = sorted(self.map.keyframes.keys())
            if len(ids) < 3:
                return
            # pre-solve poses: needed to correct keyframes/points that
            # appear while the solve is in flight
            pre_pose = {
                i: (kf.r_cw.copy(), kf.t_cw.copy())
                for i, kf in self.map.keyframes.items()
            }
            # the GLOBAL solve must cover every active landmark: refining
            # the poses against a truncated point subset leaves the rest
            # of the map inconsistent with the new poses, and subsequent
            # local BAs drag the trajectory back toward the stale points
            # (measured: post-loop KF ATE 0.012 -> 0.045 over 15 frames
            # with a 2048 cap on a 4110-point map)
            n_pts = int(self.map.pt_active.sum())
            pre_pts = set(np.nonzero(self.map.pt_active)[0].tolist())
        cap = max(self.max_ba_landmarks, 1 << int(np.ceil(np.log2(max(n_pts, 1)))))
        abort = (
            None
            if epoch is None
            else (lambda: self._loop_epoch != epoch)
        )
        self._local_ba(ids, fixed=[anchor_kf], max_landmarks=cap, abort_check=abort)
        if epoch is None:
            return
        # correct keyframes/points created during the solve via their
        # spanning-tree parent's pose delta (reference :738-819)
        with self.map_lock:
            if self._loop_epoch != epoch:
                return
            for i in sorted(self.map.keyframes.keys()):
                if i in pre_pose:
                    continue
                kf = self.map.keyframes[i]
                p = kf.parent_kf
                if p not in pre_pose or p not in self.map.keyframes:
                    continue
                r_old, t_old = pre_pose[p]
                pk = self.map.keyframes[p]
                # children of this KF (and its new points) reference ITS
                # pre-correction pose
                pre_pose[i] = (kf.r_cw.copy(), kf.t_cw.copy())
                # T_rel = T_child * T_parent_old^{-1}; child_new = T_rel * T_parent_new
                r_rel = kf.r_cw @ r_old.T
                t_rel = kf.t_cw - r_rel @ t_old
                kf.r_cw = normalize_np(r_rel @ pk.r_cw)
                kf.t_cw = (r_rel @ pk.t_cw + t_rel).astype(np.float32)
            new_pts = [
                int(p_)
                for p_ in np.nonzero(self.map.pt_active)[0]
                if int(p_) not in pre_pts
            ]
            for p_ in new_pts:
                ref = int(self.map.pt_first_kf[p_])
                if ref not in pre_pose or ref not in self.map.keyframes:
                    continue
                r_old, t_old = pre_pose[ref]
                kf = self.map.keyframes[ref]
                x_cam = r_old @ self.map.pt_xyz[p_] + t_old
                self.map.pt_xyz[p_] = kf.r_cw.T @ (x_cam - kf.t_cw)
            # the spanning-tree correction moved keyframes again after
            # _local_ba's publication — re-publish
            self.map.version += 1

    def _can_cull(self, k: int) -> bool:
        """Subclass veto hook (VI adds preintegration time-gap guards)."""
        return True

    def _on_cull(self, k: int):
        """Subclass hook run just before a keyframe is removed."""

    def _cull_keyframes(self, window: List[int]):
        """Redundant-keyframe culling (reference LocalMapping::
        KeyFrameCulling, src/LocalMapping.cc:1665-1824): a window KF is
        dropped when >=90% of its tracked points are observed by at least
        3 other keyframes. The first two keyframes are never culled; at
        most one KF is culled per call (conservative)."""
        protected = set(sorted(self.map.keyframes.keys())[:2])
        protected.add(self.last_kf_id)
        for k in window:
            if k in protected or k not in self.map.keyframes:
                continue
            if not self._can_cull(k):
                continue
            kf = self.map.keyframes[k]
            pts = kf.point_idx[kf.point_idx >= 0]
            if len(pts) < 20:
                continue
            n_obs = (self.map.obs_kf[pts] >= 0).sum(axis=1)
            redundant = (n_obs >= 4).mean()  # self + 3 others
            if redundant > 0.9:
                self._on_cull(k)
                # spanning tree: adopt the culled KF's children to its
                # parent (reference KeyFrame::SetBadFlag re-parenting)
                new_parent = kf.parent_kf
                if new_parent not in self.map.keyframes:
                    new_parent = self.last_kf_id
                for other in self.map.keyframes.values():
                    if other.parent_kf == k:
                        other.parent_kf = new_parent
                # re-anchor trajectory entries onto the spanning parent
                # (the reference's SaveTrajectoryTUM walks to a live
                # parent): T_rel' = T_rel * T_k * T_anchor^{-1}
                anchor = new_parent if new_parent >= 0 else self.last_kf_id
                akf = self.map.keyframes[anchor]
                r_ak = kf.r_cw @ akf.r_cw.T
                t_ak = kf.t_cw - r_ak @ akf.t_cw
                self.traj_entries = [
                    (ts, kf_id, r_rel, t_rel)
                    if kf_id != k
                    else (ts, anchor, r_rel @ r_ak, r_rel @ t_ak + t_rel)
                    for ts, kf_id, r_rel, t_rel in self.traj_entries
                ]
                for p in pts:
                    self.map.remove_observation(int(p), k)
                kf.active = False
                if self.loop_closer is not None:
                    self.loop_closer.db.remove(k)
                del self.map.keyframes[k]
                self._kf_dev.pop(k, None)
                return

    def _cull_points(self, kf_id: int):
        """Light MapPointCulling (reference src/LocalMapping.cc:1198):
        drop points whose found/visible ratio is low."""
        pts = self.map.active_point_ids()
        if len(pts) == 0:
            return
        vis = self.map.pt_visible[pts]
        fnd = self.map.pt_found[pts]
        bad = (vis > 4) & (fnd / np.maximum(vis, 1) < 0.25)
        for p in pts[bad]:
            self.map.remove_point(int(p))

    # -- output ----------------------------------------------------------

    def _record_trajectory(self, fr: FrameRecord, ts: float):
        if fr.r_cw is None or self.last_kf_id < 0:
            return
        kf = self.map.keyframes.get(self.last_kf_id)
        if kf is None:
            return
        # T_rel = T_frame_cw * T_kf_cw^{-1} (under the lock: the async VI
        # worker rescales traj_entries atomically with the map)
        with self.map_lock:
            r_rel = fr.r_cw @ kf.r_cw.T
            t_rel = fr.t_cw - r_rel @ kf.t_cw
            self.traj_entries.append((ts, self.last_kf_id, r_rel, t_rel))

    def _rescale_trajectory(self, s: float):
        """Applied when the map is globally rescaled (VI init)."""
        self.traj_entries = [
            (ts, k, r, t * s) for ts, k, r, t in self.traj_entries
        ]

    def trajectory_tum(self) -> np.ndarray:
        """(T,8): t, tx ty tz, qx qy qz qw (camera-to-world), composing
        stored relative poses with CURRENT keyframe poses — the reference's
        TUM trajectory export (src/System.cc SaveTrajectoryTUM)."""
        from viorb_tpu.geometry.so3 import matrix_to_quat
        import jax.numpy as jnp_

        self.flush_stream()
        self._flush_pending_ba()
        rows = []
        for ts, kf_id, r_rel, t_rel in self.traj_entries:
            kf = self.map.keyframes.get(kf_id)
            if kf is None:
                continue
            r_cw = r_rel @ kf.r_cw
            t_cw = r_rel @ kf.t_cw + t_rel
            r_wc = r_cw.T
            c = -r_wc @ t_cw
            q = np.asarray(matrix_to_quat(jnp_.asarray(r_wc)))  # (w,x,y,z)
            rows.append([ts, c[0], c[1], c[2], q[1], q[2], q[3], q[0]])
        return np.array(rows, np.float64)


def normalize_np(R: np.ndarray) -> np.ndarray:
    """Re-orthonormalize a 3x3 rotation ON HOST (SVD projection). This
    runs twice per tracked frame (motion-model prediction + velocity
    update); the previous jnp round trip cost a full tunnel RTT
    (~100-200 ms) per call and silently dominated the whole lock-step /
    async frame loop."""
    u, _, vt = np.linalg.svd(R.astype(np.float64))
    d = np.sign(np.linalg.det(u @ vt))
    return (u @ np.diag([1.0, 1.0, d]) @ vt).astype(np.float32)


def _pose_bucket(n: int) -> int:
    """Bucket a BA pose count to ONE of a tiny fixed set of launch shapes:
    4 (two-view init), 20 (any local window: 10 KFs + up to 8 anchors),
    then multiples of 8 (global BA, which grows with the map). Each
    distinct bucket is a fresh XLA compile (tens of seconds over a
    remote-attached chip), and a bucket first seen mid-run stalls the
    pipeline for exactly that long — padded pose slots are near-free, so
    buy fewer shapes with more padding."""
    if n <= 4:
        return 4
    if n <= 20:
        return 20
    return (n + 7) & ~7
