"""Monocular visual-inertial SLAM pipeline (the TrackMonoVI path).

Counterpart of the reference's VI mode (reference: System::TrackMonoVI
src/System.cc:120, Tracking::GrabImageMonoVI src/Tracking.cc:598-627,
TrackWithIMU :412-534, PredictNavStateByIMU :348-410, VI init thread
src/LocalMapping.cc:166-940, VI local BA switch :1055-1080, IMU-only
fallback :981-1110).

Lock-step orchestration over the vision pipeline (slam/mono.py) with:
  * per-frame IMU buffering; keyframes carry the IMU segment since the
    previous keyframe (reference KeyFrame::ComputePreInt);
  * VI initialization once enough keyframe baseline exists
    (slam/vi_init.py); on success the map and poses are rescaled, all
    keyframes get NavStates, and tracking switches to IMU prediction +
    15-DoF VI pose optimization;
  * VI local BA over the keyframe window with preintegration chains
    (optim.ba.vi_ba);
  * IMU-only dead reckoning for a bounded window on tracking loss
    (reference IMU_SAFE_WINDOW, include/Tracking.h:46).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from viorb_tpu.imu import ImuBatch, ImuNoise, NavState, preintegrate, propagate_navstate
from viorb_tpu.imu.preintegration import preintegrate_batch
from viorb_tpu.optim import (
    BAObservations,
    Extrinsics,
    ImuChain,
    PoseObs,
    ViBAState,
    pose_optimization_vi,
    vi_ba_two_phase,
)
from viorb_tpu.slam.mono import FrameRecord, MonoSlam, normalize_np
from viorb_tpu.slam.vi_init import try_vi_init

IMU_SAFE_WINDOW = 3.0  # seconds of IMU-only tracking allowed (reference :46)


class MonoViSlam(MonoSlam):
    def __init__(
        self,
        cam,
        r_bc: np.ndarray | None = None,
        p_bc: np.ndarray | None = None,
        imu_noise: ImuNoise = ImuNoise(),
        vi_init_min_time: float = 3.0,
        vi_init_min_kfs: int = 8,
        imu_capacity: int = 256,
        **kwargs,
    ):
        super().__init__(cam, **kwargs)
        self.r_bc = np.eye(3, dtype=np.float32) if r_bc is None else r_bc
        self.p_bc = np.zeros(3, np.float32) if p_bc is None else p_bc
        self.ext = Extrinsics(jnp.asarray(self.r_bc), jnp.asarray(self.p_bc))
        self.imu_noise = imu_noise
        self.vi_init_min_time = vi_init_min_time
        self.vi_init_min_kfs = vi_init_min_kfs
        self.imu_capacity = imu_capacity
        self.vi_ready = False
        self.gravity: Optional[np.ndarray] = None
        self.imu_since_kf: list = []  # [(t, gyro, acc)]
        self.imu_since_frame: list = []
        self.nav_cur: Optional[NavState] = None
        self.last_vision_time = 0.0
        self.bias_g = np.zeros(3, np.float32)
        self.bias_a = np.zeros(3, np.float32)
        self.kf_chain: List[int] = []  # ordered keyframe ids with IMU links

    # -- pose conversions ------------------------------------------------

    def _nav_from_tcw(self, r_cw, t_cw, v=None) -> NavState:
        r_wc = r_cw.T
        c_w = -r_wc @ t_cw
        r_wb = r_wc @ self.r_bc.T
        p_cb = -(self.r_bc.T @ self.p_bc)
        p_wb = c_w + r_wc @ p_cb
        z = jnp.zeros(3, jnp.float32)
        return NavState(
            jnp.asarray(p_wb.astype(np.float32)),
            jnp.asarray((v if v is not None else np.zeros(3)).astype(np.float32)),
            jnp.asarray(r_wb.astype(np.float32)),
            jnp.asarray(self.bias_g),
            jnp.asarray(self.bias_a),
            z,
            z,
        )

    def _tcw_from_nav(self, nav: NavState):
        r_wb = np.asarray(nav.r)
        p_wb = np.asarray(nav.p)
        r_wc = r_wb @ self.r_bc
        p_cb = -(self.r_bc.T @ self.p_bc)
        c_w = p_wb - r_wc @ p_cb
        r_cw = r_wc.T
        t_cw = -r_cw @ c_w
        return r_cw.astype(np.float32), t_cw.astype(np.float32)

    # -- frame entry ------------------------------------------------------

    def process_frame_vi(self, image, ts: float, imu_samples) -> dict:
        """imu_samples: iterable of (t, gyro(3,), acc(3,)) since last call
        (the reference's vimu argument, src/Tracking.cc:598)."""
        for s in imu_samples:
            self.imu_since_kf.append(s)
            self.imu_since_frame.append(s)
        if not self.vi_ready:
            out = self.process_frame(image, ts)
            self.imu_since_frame = []
            return out
        # VI tracking
        fr = self._make_frame(image, ts)
        self._track_vi(fr, ts)
        self._record_trajectory(fr, ts)
        self.last_frame = fr
        self.imu_since_frame = []
        return {
            "state": self.state,
            "n_tracked": self.n_tracked,
            "n_kfs": len(self.map.kf_ids()),
            "n_points": len(self.map.active_point_ids()),
            "vi": True,
        }

    # -- keyframe hooks ---------------------------------------------------

    def _cull_keyframes(self, window):
        """Disabled in VI mode: culling a chain keyframe would require
        merging its IMU preintegration into the neighbours (the
        reference's VI-aware KeyFrameCulling with 0.5 s time-gap guards,
        src/LocalMapping.cc:1705-1750) — a next-round item."""
        return

    def _insert_keyframe(self, fr: FrameRecord):
        super()._insert_keyframe(fr)
        kf_id = self.last_kf_id
        kf = self.map.keyframes[kf_id]
        # attach the IMU segment since the previous keyframe
        if self.imu_since_kf:
            t = np.array([s[0] for s in self.imu_since_kf], np.float32)
            g = np.stack([np.asarray(s[1]) for s in self.imu_since_kf])
            a = np.stack([np.asarray(s[2]) for s in self.imu_since_kf])
            n = min(len(t), self.imu_capacity)
            kf.nav = kf.nav or {}
            kf.nav["imu_t"] = t[-n:]
            kf.nav["imu_g"] = g[-n:].astype(np.float32)
            kf.nav["imu_a"] = a[-n:].astype(np.float32)
        else:
            kf.nav = kf.nav or {}
            kf.nav["imu_t"] = np.zeros(0, np.float32)
            kf.nav["imu_g"] = np.zeros((0, 3), np.float32)
            kf.nav["imu_a"] = np.zeros((0, 3), np.float32)
        if self.kf_chain:
            kf.prev_kf = self.kf_chain[-1]
            self.map.keyframes[self.kf_chain[-1]].next_kf = kf_id
        self.kf_chain.append(kf_id)
        self.imu_since_kf = []
        if self.vi_ready:
            # store NavState on the KF from the tracked frame state
            if self.nav_cur is not None:
                kf.nav["state"] = jax.tree.map(np.asarray, self.nav_cur)
            self._vi_local_ba(kf_id)
        else:
            self._maybe_vi_init()

    def _kf_imu_batch(self, kf_id: int) -> ImuBatch:
        nav = self.map.keyframes[kf_id].nav
        return ImuBatch.from_arrays(
            nav["imu_g"], nav["imu_a"], nav["imu_t"], capacity=self.imu_capacity
        )

    # -- VI initialization ------------------------------------------------

    def _maybe_vi_init(self):
        chain = self.kf_chain
        if len(chain) < self.vi_init_min_kfs:
            return
        t0 = self.map.keyframes[chain[0]].timestamp
        t1 = self.map.keyframes[chain[-1]].timestamp
        if t1 - t0 < self.vi_init_min_time:
            return
        kfs = [self.map.keyframes[i] for i in chain]
        p_c = np.stack([k.center() for k in kfs])
        r_wc = np.stack([k.r_cw.T for k in kfs])
        ts = np.array([k.timestamp for k in kfs])
        batches = [self._kf_imu_batch(i) for i in chain[1:]]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        res = try_vi_init(
            p_c, r_wc, ts, stacked, r_bc=self.r_bc, p_bc=self.p_bc,
            noise=self.imu_noise,
        )
        if res is None or not res.success or res.scale <= 0:
            return
        s = res.scale
        # rescale the whole map (reference src/LocalMapping.cc:690-707)
        pts = self.map.active_point_ids()
        self.map.pt_xyz[pts] *= s
        self.map.pt_min_dist[pts] *= s
        self.map.pt_max_dist[pts] *= s
        for kf in self.map.keyframes.values():
            kf.t_cw = (kf.t_cw * s).astype(np.float32)
        self._rescale_trajectory(s)
        self.bias_g = res.bias_g.astype(np.float32)
        self.bias_a = res.bias_a.astype(np.float32)
        self.gravity = res.gravity_w.astype(np.float32)
        # NavStates for all chain KFs
        for idx, kf_id in enumerate(chain):
            kf = self.map.keyframes[kf_id]
            nav = self._nav_from_tcw(kf.r_cw, kf.t_cw, v=res.velocities[idx])
            kf.nav["state"] = jax.tree.map(np.asarray, nav)
        # current frame state continues from the newest KF
        last = self.map.keyframes[chain[-1]]
        self.nav_cur = jax.tree.map(jnp.asarray, last.nav["state"])
        if self.last_frame is not None and self.last_frame.t_cw is not None:
            self.last_frame.t_cw = self.last_frame.t_cw * s
        self.vi_ready = True
        self.last_vision_time = last.timestamp
        # global VI BA over the chain (reference GBA after init :802-804)
        self._vi_local_ba(chain[-1], window_size=len(chain))

    # -- VI tracking ------------------------------------------------------

    def _imu_batch_since_frame(self) -> ImuBatch:
        if self.imu_since_frame:
            t = np.array([s[0] for s in self.imu_since_frame], np.float32)
            g = np.stack([np.asarray(s[1]) for s in self.imu_since_frame]).astype(
                np.float32
            )
            a = np.stack([np.asarray(s[2]) for s in self.imu_since_frame]).astype(
                np.float32
            )
            return ImuBatch.from_arrays(g, a, t, capacity=self.imu_capacity)
        return ImuBatch.empty(self.imu_capacity)

    def _track_vi(self, fr: FrameRecord, ts: float):
        last_t = self.last_frame.timestamp if self.last_frame else ts
        batch = self._imu_batch_since_frame()
        pre = preintegrate(
            batch,
            jnp.asarray(self.bias_g),
            jnp.asarray(self.bias_a),
            jnp.float32(last_t),
            jnp.float32(ts),
            self.imu_noise,
        )
        nav_pred = propagate_navstate(
            self.nav_cur, pre, jnp.asarray(self.gravity)
        )
        fr.r_cw, fr.t_cw = self._tcw_from_nav(nav_pred)

        # projection matching at the predicted pose (as in vision path)
        kf_ids = self._local_kf_ids()
        pts, xyz, desc, normal, dmin, dmax, valid = self._gather_local_points(kf_ids)
        from viorb_tpu.slam.kernels import match_by_projection

        desc_pm1 = (jnp.asarray(desc, jnp.bfloat16) * 2 - 1) * jnp.asarray(
            valid, jnp.bfloat16
        )[:, None]
        point_for_feat, res, n, visible = match_by_projection(
            jnp.asarray(xyz), desc_pm1, jnp.asarray(valid), jnp.asarray(normal),
            jnp.asarray(dmin), jnp.asarray(dmax), jnp.asarray(fr.r_cw),
            jnp.asarray(fr.t_cw), jnp.asarray(fr.xy), fr.desc_pm1,
            jnp.asarray(fr.valid), self.cam, jnp.float32(15.0),
        )
        if int(n) < 20:
            point_for_feat, res, n, visible = match_by_projection(
                jnp.asarray(xyz), desc_pm1, jnp.asarray(valid), jnp.asarray(normal),
                jnp.asarray(dmin), jnp.asarray(dmax), jnp.asarray(fr.r_cw),
                jnp.asarray(fr.t_cw), jnp.asarray(fr.xy), fr.desc_pm1,
                jnp.asarray(fr.valid), self.cam, jnp.float32(30.0),
            )
        pf = np.asarray(point_for_feat)
        matched_feats = np.nonzero(pf >= 0)[0]

        if len(matched_feats) < 10:
            # IMU-only dead reckoning (reference src/Tracking.cc:981-1110)
            if ts - self.last_vision_time <= IMU_SAFE_WINDOW:
                self.state = "IMU_ONLY"
                self.nav_cur = nav_pred
                self.n_tracked = 0
                return
            self.state = "LOST"
            self.n_tracked = 0
            return

        # 15-DoF VI pose optimization against the last keyframe
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
        last_kf = self.map.keyframes[self.last_kf_id]
        ns_i = jax.tree.map(jnp.asarray, last_kf.nav["state"])
        # preintegration from last KF to this frame: the since-KF buffer
        # (includes since-frame samples)
        kf_batch = ImuBatch.empty(self.imu_capacity)
        if self.imu_since_kf:
            t = np.array([s[0] for s in self.imu_since_kf], np.float32)
            g = np.stack([np.asarray(s[1]) for s in self.imu_since_kf]).astype(np.float32)
            a = np.stack([np.asarray(s[2]) for s in self.imu_since_kf]).astype(np.float32)
            n_keep = min(len(t), self.imu_capacity)
            kf_batch = ImuBatch.from_arrays(
                g[-n_keep:], a[-n_keep:], t[-n_keep:], capacity=self.imu_capacity
            )
        pre_kf = preintegrate(
            kf_batch,
            jnp.asarray(self.bias_g),
            jnp.asarray(self.bias_a),
            jnp.float32(last_kf.timestamp),
            jnp.float32(ts),
            self.imu_noise,
        )
        # bias random-walk information ~ 1/(rw_var * dt)
        bias_info = jnp.concatenate(
            [
                jnp.full(3, 1.0 / max(self.imu_noise.gyro_bias_rw_var, 1e-12)),
                jnp.full(3, 1.0 / max(self.imu_noise.acc_bias_rw_var, 1e-12)),
            ]
        ) / jnp.maximum(pre_kf.dt, 1e-3)
        nav_j = nav_pred
        ns_j, ns_i_out, inlier, marg_info = pose_optimization_vi(
            nav_j, ns_i, obs, self.cam, self.ext, pre_kf,
            jnp.asarray(self.gravity), bias_info,
            rounds=2, iters_per_round=5, optimize_i=False,
        )
        inl = np.asarray(inlier)
        self.n_tracked = int(inl.sum())
        if self.n_tracked < 10:
            if ts - self.last_vision_time <= IMU_SAFE_WINDOW:
                self.state = "IMU_ONLY"
                self.nav_cur = nav_pred
                return
            self.state = "LOST"
            return
        self.state = "OK"
        self.last_vision_time = ts
        self.nav_cur = ns_j
        fr.r_cw, fr.t_cw = self._tcw_from_nav(ns_j)

        # record matches, counters
        fr.point_idx = np.full(nf, -1, np.int32)
        ok_feats = np.nonzero((pf >= 0) & inl)[0]
        fr.point_idx[ok_feats] = pts[pf[ok_feats]]
        if len(pts):
            vis = np.asarray(visible)[: len(pts)]
            self.map.pt_visible[pts[vis]] += 1
            self.map.pt_found[fr.point_idx[ok_feats]] += 1

        # keyframe decision
        self.frames_since_kf += 1
        ref_kf = self.map.keyframes[self.last_kf_id]
        ref_tracked = int((ref_kf.point_idx >= 0).sum())
        need = (
            self.frames_since_kf >= self.kf_max_interval
            or self.n_tracked < 0.6 * max(ref_tracked, 1)
        ) and self.n_tracked > 15
        if need:
            self._insert_keyframe(fr)
            self.frames_since_kf = 0

    # -- VI local BA ------------------------------------------------------

    def _vi_local_ba(self, kf_id: int, window_size: Optional[int] = None):
        w = window_size or self.local_window
        chain = [k for k in self.kf_chain if k in self.map.keyframes]
        window = chain[-w:]
        if len(window) < 2:
            return
        # anchors: covisible KFs outside the window (fixed)
        anchor = set()
        for p in self.map.local_map_points(window):
            for k in self.map.obs_kf[p]:
                if k >= 0 and int(k) not in window and int(k) in self.map.keyframes:
                    anchor.add(int(k))
        fixed = sorted(anchor)[:6]
        kf_list, pt_ids, kf_idx, uv, inv_s2, valid = self.map.build_ba_problem(
            window, fixed, self.max_ba_landmarks
        )
        if len(pt_ids) == 0:
            return
        k = len(kf_list)
        # NavStates: window KFs must all have them; fixed anchors might be
        # pre-VI keyframes — give them vision-derived states and fix them
        navs = []
        for i in kf_list:
            kf = self.map.keyframes[i]
            if kf.nav and "state" in kf.nav:
                navs.append(jax.tree.map(jnp.asarray, kf.nav["state"]))
            else:
                navs.append(self._nav_from_tcw(kf.r_cw, kf.t_cw))
        nav_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *navs)
        points = np.zeros((self.max_ba_landmarks, 3), np.float32)
        points[: len(pt_ids)] = self.map.pt_xyz[pt_ids]
        fixed_mask = np.array(
            [i in fixed or i == min(window) for i in kf_list]
        )
        # IMU chain between consecutive WINDOW kfs (slots 0..len(window)-1)
        n_win = len(window)
        batches = []
        valid_edges = []
        t0s, t1s = [], []
        for a, b in zip(window[:-1], window[1:]):
            kfb = self.map.keyframes[b]
            batches.append(self._kf_imu_batch(b))
            valid_edges.append(
                self.map.keyframes[b].prev_kf == a and len(kfb.nav["imu_t"]) > 0
            )
            t0s.append(self.map.keyframes[a].timestamp)
            t1s.append(kfb.timestamp)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        pre = preintegrate_batch(
            stacked,
            jnp.asarray(self.bias_g),
            jnp.asarray(self.bias_a),
            jnp.asarray(np.array(t0s, np.float32)),
            jnp.asarray(np.array(t1s, np.float32)),
            self.imu_noise,
        )
        # pad chain to k-1 edges (edges among anchors invalid)
        pad = (k - 1) - (n_win - 1)
        if pad > 0:
            from viorb_tpu.imu.preintegration import PreintegratedImu

            pre_pad = PreintegratedImu.identity((pad,))
            pre = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b]), pre, pre_pad
            )
            valid_edges = valid_edges + [False] * pad
        chain_obj = ImuChain(
            pre=pre,
            valid=jnp.asarray(np.array(valid_edges)),
            bias_cov_inv_diag=jnp.concatenate(
                [
                    jnp.full(3, 1.0 / max(self.imu_noise.gyro_bias_rw_var, 1e-12)),
                    jnp.full(3, 1.0 / max(self.imu_noise.acc_bias_rw_var, 1e-12)),
                ]
            )
            * 0.005,
        )
        state = ViBAState(nav_stack, jnp.asarray(points))
        obs = BAObservations(
            kf_idx=jnp.asarray(kf_idx),
            uv=jnp.asarray(uv),
            inv_sigma2=jnp.asarray(inv_s2),
            valid=jnp.asarray(valid),
        )
        out, obs2 = vi_ba_two_phase(
            state, obs, self.cam, self.ext, chain_obj,
            jnp.asarray(self.gravity), jnp.asarray(fixed_mask),
        )
        # write back
        nav_np = jax.tree.map(np.asarray, out.nav)
        p_new = np.asarray(out.points)
        for s_i, i in enumerate(kf_list):
            if fixed_mask[s_i]:
                continue
            kf = self.map.keyframes[i]
            ns = jax.tree.map(lambda x: x[s_i], nav_np)
            kf.nav = kf.nav or {}
            kf.nav["state"] = ns
            nav_j = jax.tree.map(jnp.asarray, ns)
            kf.r_cw, kf.t_cw = self._tcw_from_nav(nav_j)
        self.map.pt_xyz[pt_ids] = p_new[: len(pt_ids)]
        if kf_id in kf_list:
            s_i = kf_list.index(kf_id)
            self.nav_cur = jax.tree.map(
                lambda x: jnp.asarray(x[s_i]), nav_np
            )
        # outlier write-back
        was_valid = valid
        now_valid = np.asarray(obs2.valid)
        dropped = was_valid & ~now_valid
        for row in np.nonzero(dropped.any(axis=1))[0]:
            p = int(pt_ids[row])
            for s in np.nonzero(dropped[row])[0]:
                self.map.remove_observation(p, int(kf_list[kf_idx[row, s]]))
