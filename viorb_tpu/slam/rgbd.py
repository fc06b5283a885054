"""RGB-D SLAM pipeline.

Counterpart of the reference's TrackRGBD path (reference:
include/System.h TrackRGBD; src/Tracking.cc GrabImageRGBD +
StereoInitialization — depth-backed immediate map creation — and the
close-point creation in CreateNewKeyFrame/LocalMapping for stereo/RGB-D).

Differences from mono: initialization is a single frame (metric depth),
and keyframe insertion back-projects unmatched features with valid depth
directly instead of waiting for two-view triangulation parallax.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from viorb_tpu.slam.mono import FrameRecord, MonoSlam

DEPTH_MIN = 0.1
DEPTH_MAX = 12.0


class RgbdSlam(MonoSlam):
    # metric scale is observed: loop Sim3 + essential graph run with s=1
    # (reference Sim3Solver bFixScale, include/Sim3Solver.h:45)
    loop_fix_scale = True

    def __init__(self, cam, depth_max: float = DEPTH_MAX, **kwargs):
        super().__init__(cam, **kwargs)
        self.depth_max = depth_max

    def _sample_depth(self, depth: np.ndarray, fr: FrameRecord) -> np.ndarray:
        h, w = depth.shape
        xs = np.clip(np.round(fr.xy[:, 0]).astype(int), 0, w - 1)
        ys = np.clip(np.round(fr.xy[:, 1]).astype(int), 0, h - 1)
        return depth[ys, xs]

    def _backproject(self, fr: FrameRecord, z: np.ndarray) -> np.ndarray:
        """Feature pixels + depth -> world points under the frame pose."""
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

    def process_frame_rgbd(self, image, depth: np.ndarray, ts: float) -> dict:
        if (
            self.state != "NOT_INITIALIZED"
            and self.last_frame is not None
            and self.last_frame.r_cw is not None
        ):
            # steady state rides the fused one-dispatch tracking core;
            # depth is sampled host-side at the pulled keypoint pixels
            # (consumed only if the frame becomes a keyframe)
            self._pending_depth = None  # stale legacy-path sample
            self._pending_depth_img = depth
            fr = self._track_fused(image, ts)
            self._pending_depth_img = None
        else:
            fr = self._make_frame(image, ts)
            fr_depth = self._sample_depth(depth, fr)
            if self.state == "NOT_INITIALIZED":
                self._initialize_from_depth(fr, fr_depth)
            else:
                self._pending_depth = fr_depth
                self._track(fr)
        self._record_trajectory(fr, ts)
        self.last_frame = fr
        return {
            "state": self.state,
            "n_tracked": self.n_tracked,
            "n_kfs": len(self.map.kf_ids()),
            "n_points": len(self.map.active_point_ids()),
        }

    def _initialize_from_depth(self, fr: FrameRecord, z: np.ndarray):
        """Single-frame metric initialization (reference
        StereoInitialization, src/Tracking.cc)."""
        ok = fr.valid & (z > DEPTH_MIN) & (z < self.depth_max)
        if ok.sum() < 100:
            return
        fr.r_cw = np.eye(3, dtype=np.float32)
        fr.t_cw = np.zeros(3, np.float32)
        pts_w = self._backproject(fr, z)
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

    def _on_keyframe_created(self, fr: FrameRecord, kf_id: int):
        """Back-project unmatched features with valid depth into new
        points, BEFORE the mapping job runs (async-safe)."""
        super()._on_keyframe_created(fr, kf_id)
        z = getattr(self, "_pending_depth", None)
        dimg = getattr(self, "_pending_depth_img", None)
        if dimg is not None:
            # fused steady state: sample lazily for keyframe frames only
            z = self._sample_depth(dimg, fr)
        if z is None:
            return
        with self.map_lock:
            kf = self.map.keyframes[kf_id]
            free = (
                kf.valid
                & (kf.point_idx < 0)
                & (z > DEPTH_MIN)
                & (z < self.depth_max)
            )
            pts_w = self._backproject(fr, z)
            for f in np.nonzero(free)[0]:
                self.map.add_point(pts_w[f], kf.ensure_desc01()[f], kf_id, int(f))
            self.map.update_point_stats(self.map.local_map_points([kf_id]))
