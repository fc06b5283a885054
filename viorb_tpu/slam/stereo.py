"""Stereo SLAM pipeline.

Counterpart of the reference's TrackStereo path (reference:
include/System.h TrackStereo, src/Tracking.cc GrabImageStereo,
Frame::ComputeStereoMatches src/Frame.cc:646, single-frame
StereoInitialization, and close/far point creation at keyframe insertion
src/Tracking.cc:1816-1902).

TPU design: both images go through the jitted ORB extractor; rectified
row matching is ONE masked Hamming matmul (slam.kernels.match_stereo)
instead of the reference's per-row candidate walk; BA uses the 3-dim
stereo residual (u_l, v_l, u_r) so metric scale is anchored in every
window solve (reference EdgeStereoSE3ProjectXYZ).

Initialization is a single frame: features with stereo depth become map
points immediately. At keyframe insertion, unmatched "close" features
(depth < depth_factor * baseline) are back-projected directly; far points
are left to two-view triangulation (reference's close/far split).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from viorb_tpu.geometry.camera import undistort_points
from viorb_tpu.slam.kernels import match_stereo, refine_stereo_subpixel
from viorb_tpu.slam.mono import FrameRecord, MonoSlam

DEPTH_MIN = 0.1


class StereoSlam(MonoSlam):
    # metric scale is observed: loop Sim3 + essential graph run with s=1
    # (reference Sim3Solver bFixScale, include/Sim3Solver.h:45)
    loop_fix_scale = True

    def __init__(
        self,
        cam,
        baseline: float,
        depth_factor: float = 35.0,
        min_disparity: float = 0.5,
        **kwargs,
    ):
        super().__init__(cam, **kwargs)
        self.baseline = float(baseline)
        self.bf = float(cam.fx) * self.baseline
        self.depth_th = depth_factor * self.baseline  # close-point bound
        self.min_disparity = min_disparity

    # -- frame construction ----------------------------------------------

    def _make_stereo_frame(self, img_l, img_r, ts: float) -> FrameRecord:
        fr = self._make_frame(img_l, ts)
        self._attach_stereo(fr, img_l, img_r)
        return fr

    # -- entry ------------------------------------------------------------

    def process_frame_stereo(self, img_l, img_r, ts: float) -> dict:
        """Steady state rides the same fused one-dispatch tracking core as
        mono — only the LEFT image is needed per frame; the right image is
        stashed and row-matched LAZILY when the frame becomes a keyframe
        (non-keyframe stereo matching was pure waste: per-frame ur/depth
        feed nothing but keyframe close-point creation and the stereo BA
        residuals, reference src/Tracking.cc:1816-1902)."""
        if (
            self.state != "NOT_INITIALIZED"
            and self.last_frame is not None
            and self.last_frame.r_cw is not None
        ):
            self._img_r_pending = (img_l, img_r)
            fr = self._track_fused(img_l, ts)
            self._img_r_pending = None
        else:
            fr = self._make_stereo_frame(img_l, img_r, ts)
            if self.state == "NOT_INITIALIZED":
                self._initialize_from_stereo(fr)
            else:
                self._track(fr)
        self._record_trajectory(fr, ts)
        self.last_frame = fr
        return {
            "state": self.state,
            "n_tracked": self.n_tracked,
            "n_kfs": len(self.map.kf_ids()),
            "n_points": len(self.map.active_point_ids()),
            "n_stereo": int((fr.ur >= 0).sum()) if fr.ur is not None else 0,
        }

    def _insert_keyframe(self, fr: FrameRecord):
        # lazy stereo matching for frames promoted to keyframes out of the
        # fused (left-only) steady state
        if fr.ur is None and getattr(self, "_img_r_pending", None) is not None:
            img_l, img_r = self._img_r_pending
            self._attach_stereo(fr, img_l, img_r)
        super()._insert_keyframe(fr)

    def _attach_stereo(self, fr: FrameRecord, img_l, img_r):
        """Row matching + subpixel refinement for an existing frame."""
        feats_r = self.extractor.extract(img_r)
        xy_r = undistort_points(self.cam, feats_r.xy)
        ur, matched = match_stereo(
            jnp.asarray(fr.xy),
            fr.desc_pm1,
            jnp.asarray(fr.valid),
            jnp.asarray(fr.level),
            xy_r,
            feats_r.descriptors_pm1(),
            feats_r.valid,
            feats_r.level,
            jnp.float32(self.min_disparity),
            jnp.float32(self.bf / DEPTH_MIN),
        )
        ur = refine_stereo_subpixel(
            jnp.asarray(img_l, jnp.float32),
            jnp.asarray(img_r, jnp.float32),
            jnp.asarray(fr.xy),
            ur,
            matched,
        )
        ur, ok = jax.device_get((ur, matched))
        disp = fr.xy[:, 0] - ur
        ok = ok & (disp > self.min_disparity)
        fr.ur = np.where(ok, ur, -1.0).astype(np.float32)
        fr.depth = np.where(
            ok, self.bf / np.maximum(disp, 1e-6), -1.0
        ).astype(np.float32)

    # -- initialization ----------------------------------------------------

    def _backproject(self, fr: FrameRecord, z: np.ndarray) -> np.ndarray:
        cam = self.cam
        xn = np.stack(
            [
                (fr.xy[:, 0] - cam.cx) / cam.fx,
                (fr.xy[:, 1] - cam.cy) / cam.fy,
                np.ones(len(fr.xy), np.float32),
            ],
            axis=1,
        )
        pc = xn * z[:, None]
        r_wc = fr.r_cw.T
        c_w = -r_wc @ fr.t_cw
        return pc @ r_wc.T + c_w

    def _initialize_from_stereo(self, fr: FrameRecord):
        """Single-frame metric init (reference StereoInitialization,
        src/Tracking.cc — creates a point for every stereo feature)."""
        ok = fr.valid & (fr.depth > DEPTH_MIN)
        if ok.sum() < 100:
            return
        fr.r_cw = np.eye(3, dtype=np.float32)
        fr.t_cw = np.zeros(3, np.float32)
        pts_w = self._backproject(fr, fr.depth)
        kf = self._kf_from_frame(fr)
        kf_id = self.map.add_keyframe(kf)
        for f in np.nonzero(ok)[0]:
            p = self.map.add_point(pts_w[f], fr.host_desc01()[f], kf_id, int(f))
            fr.point_idx[f] = p
        self.map.update_point_stats(self.map.active_point_ids())
        if self.loop_closer is not None:
            self.loop_closer.add_keyframe(kf_id)
        self.last_kf_id = kf_id
        self.frames_since_kf = 0
        self.velocity = None
        self.state = "OK"
        self.n_tracked = int(ok.sum())

    # -- mapping -----------------------------------------------------------

    def _on_keyframe_created(self, fr: FrameRecord, kf_id: int):
        """Close-point creation: back-project unmatched features with
        reliable (close) stereo depth (reference src/Tracking.cc:1816-1902).
        Runs BEFORE the mapping job so the (possibly async) worker's
        triangulation/fusion/BA sees the stereo points."""
        super()._on_keyframe_created(fr, kf_id)
        with self.map_lock:
            kf = self.map.keyframes[kf_id]
            free = (
                kf.valid
                & (kf.point_idx < 0)
                & (fr.depth > DEPTH_MIN)
                & (fr.depth < self.depth_th)
            )
            pts_w = self._backproject(fr, fr.depth)
            for f in np.nonzero(free)[0]:
                self.map.add_point(pts_w[f], kf.ensure_desc01()[f], kf_id, int(f))
            self.map.update_point_stats(self.map.local_map_points([kf_id]))
