"""Headless viewer: annotated frame overlays + map/trajectory plots.

TPU-first redesign of the reference's Pangolin GUI stack (Viewer thread
src/Viewer.cc:54-120, FrameDrawer::DrawFrame src/FrameDrawer.cc, MapDrawer
point/KF rendering src/MapDrawer.cc). There is no display on a TPU host, so
instead of a live GL window this renders the same content to PNG files on a
configurable cadence: a per-frame keypoint/track overlay with a status strip
and a two-panel map view (top-down XY + side XZ) with keyframe trajectory,
covisibility anchor, and current camera pose.

Drawing is pure numpy for the frame overlay (no per-frame matplotlib cost)
and matplotlib-Agg for the map panels; everything is host-side and never
touches the device, so enabling the viewer does not perturb tracking
performance beyond file IO.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

# overlay colors (RGB)
_GREEN = np.array([60, 220, 60], np.uint8)  # feature tracked to a map point
_BLUE = np.array([80, 140, 255], np.uint8)  # extracted feature, unmatched
_RED = np.array([230, 60, 60], np.uint8)  # LOST border
_YELLOW = np.array([240, 200, 40], np.uint8)  # IMU_ONLY border


def _to_rgb(image: np.ndarray) -> np.ndarray:
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img.copy()


def _stamp_squares(img: np.ndarray, xy: np.ndarray, color: np.ndarray, r: int):
    """Hollow squares at integer keypoint locations (vectorized)."""
    h, w = img.shape[:2]
    if len(xy) == 0:
        return
    x = np.round(xy[:, 0]).astype(np.int32)
    y = np.round(xy[:, 1]).astype(np.int32)
    keep = (x >= r) & (x < w - r) & (y >= r) & (y < h - r)
    x, y = x[keep], y[keep]
    rng = np.arange(-r, r + 1)
    for dy in (-r, r):
        img[y[:, None] + dy, x[:, None] + rng[None, :]] = color
    for dx in (-r, r):
        img[y[:, None] + rng[None, :], x[:, None] + dx] = color


class FrameDrawer:
    """Annotated tracking overlay (reference FrameDrawer::DrawFrame)."""

    def draw(
        self,
        image: np.ndarray,
        xy: Optional[np.ndarray],
        matched: Optional[np.ndarray],
        valid: Optional[np.ndarray],
        state: str,
        n_tracked: int,
        n_kfs: int,
        n_points: int,
    ) -> np.ndarray:
        img = _to_rgb(image)
        if xy is not None:
            v = (
                np.ones(len(xy), bool)
                if valid is None
                else np.asarray(valid, bool)
            )
            m = (
                np.zeros(len(xy), bool)
                if matched is None
                else np.asarray(matched, bool)
            )
            _stamp_squares(img, xy[v & ~m], _BLUE, 1)
            _stamp_squares(img, xy[v & m], _GREEN, 2)
        # status strip: state color band + tracked-count bar
        strip = np.zeros((12, img.shape[1], 3), np.uint8)
        band = {
            "OK": _GREEN,
            "IMU_ONLY": _YELLOW,
            "LOST": _RED,
        }.get(state, np.array([160, 160, 160], np.uint8))
        strip[:, :, :] = 30
        strip[2:10, 2:10] = band
        frac = min(1.0, n_tracked / 300.0)
        strip[4:8, 14 : 14 + int(frac * (img.shape[1] - 28))] = band
        img = np.concatenate([strip, img], axis=0)
        if state == "LOST":
            img[:3, :] = _RED
            img[-3:, :] = _RED
        self._last_hud = (state, n_tracked, n_kfs, n_points)
        return img


class MapDrawer:
    """Map points + keyframe trajectory + current pose, as a 2-panel PNG
    (reference MapDrawer::DrawMapPoints/DrawKeyFrames/DrawCurrentCamera)."""

    def draw(self, slam_map, cur_r_cw, cur_t_cw, path: str, title: str = ""):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        pts_ids = slam_map.active_point_ids()
        pts = slam_map.pt_xyz[pts_ids] if len(pts_ids) else np.zeros((0, 3))
        kf_ids = sorted(slam_map.keyframes)
        centers = (
            np.stack([slam_map.keyframes[k].center() for k in kf_ids])
            if kf_ids
            else np.zeros((0, 3))
        )
        cam_c = (
            -cur_r_cw.T @ cur_t_cw if cur_r_cw is not None else None
        )
        fig, axes = plt.subplots(1, 2, figsize=(11, 5))
        for ax, (a, b, la, lb) in zip(
            axes, [(0, 1, "x", "y"), (0, 2, "x", "z")]
        ):
            if len(pts):
                ax.scatter(pts[:, a], pts[:, b], s=1.5, c="#444", alpha=0.5)
            if len(centers):
                ax.plot(centers[:, a], centers[:, b], "-o", ms=2.5,
                        lw=1.0, color="#1766cc")
            if cam_c is not None:
                ax.plot([cam_c[a]], [cam_c[b]], "^", ms=9, color="#d62728")
                # view direction: camera +z axis in world
                d = cur_r_cw.T @ np.array([0, 0, 1.0])
                ax.annotate(
                    "", xy=(cam_c[a] + 0.5 * d[a], cam_c[b] + 0.5 * d[b]),
                    xytext=(cam_c[a], cam_c[b]),
                    arrowprops=dict(arrowstyle="->", color="#d62728"),
                )
            ax.set_xlabel(la)
            ax.set_ylabel(lb)
            ax.set_aspect("equal", adjustable="datalim")
            ax.grid(alpha=0.25)
        fig.suptitle(title or f"{len(kf_ids)} KFs / {len(pts)} points")
        fig.tight_layout()
        fig.savefig(path, dpi=90)
        plt.close(fig)


class Viewer:
    """Headless viewer orchestrator (reference Viewer::Run loop): call
    on_frame per processed frame; writes overlay PNGs every `every` frames
    and map PNGs every `map_every`; finalize() writes the last map view.

    Wire via run.py --viz-dir."""

    def __init__(self, out_dir: str, every: int = 10, map_every: int = 30):
        self.out_dir = out_dir
        self.every = max(1, every)
        self.map_every = max(1, map_every)
        self.frame_drawer = FrameDrawer()
        self.map_drawer = MapDrawer()
        self.n = 0
        os.makedirs(out_dir, exist_ok=True)

    def _save_png(self, img: np.ndarray, path: str):
        try:
            from PIL import Image

            Image.fromarray(img).save(path)
        except Exception:  # PIL unavailable: raw npy fallback
            np.save(path + ".npy", img)

    def on_frame(self, slam, image: np.ndarray, info: dict):
        i = self.n
        self.n += 1
        fr = slam.last_frame
        if i % self.every == 0 and fr is not None:
            matched = (
                fr.point_idx >= 0
                if getattr(fr, "point_idx", None) is not None
                else None
            )
            img = self.frame_drawer.draw(
                image, fr.xy, matched, fr.valid, info.get("state", "?"),
                info.get("n_tracked", 0), len(slam.map.keyframes),
                len(slam.map.active_point_ids()),
            )
            self._save_png(img, os.path.join(self.out_dir, f"frame_{i:05d}.png"))
        if i % self.map_every == 0 and len(slam.map.keyframes):
            r = fr.r_cw if fr is not None else None
            t = fr.t_cw if fr is not None else None
            self.map_drawer.draw(
                slam.map, r, t,
                os.path.join(self.out_dir, f"map_{i:05d}.png"),
                title=f"t={info.get('ts', 0.0):.2f}s  state={info.get('state')}",
            )

    def finalize(self, slam):
        fr = slam.last_frame
        r = fr.r_cw if fr is not None else None
        t = fr.t_cw if fr is not None else None
        if len(slam.map.keyframes):
            self.map_drawer.draw(
                slam.map, r, t, os.path.join(self.out_dir, "map_final.png"),
                title="final map",
            )
