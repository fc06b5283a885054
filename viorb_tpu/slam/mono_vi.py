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
    ViBAState,
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
        self.init_time = 0.0
        # keep refining the init estimates until this much data exists
        # (reference VINS init acceptance window, src/LocalMapping.cc:554-563)
        self.init_refine_window = 12.0
        # chain spans (s) at which the full-chain gravity-vertex GBA fires
        # (each mark once); below the first mark the closed-form triplet
        # refine runs instead
        self.gw_refine_marks = [3.5, 5.0, 7.0, 9.0, 11.0]
        self._gw_mark_done = 0
        # post-relocalization bias re-estimation (reference
        # mbRelocBiasPrepare + RecomputeIMUBiasAndCurrentNavstate,
        # src/Tracking.cc:59-227, :2285-2287)
        self.reloc_bias_prepare = False
        self.reloc_buffer: List[tuple] = []  # (ts, r_cw, t_cw, imu samples)
        self.reloc_frames_needed = 20
        self.pre_init_lost = 0
        # optional VI-init convergence dump directory (reference writes
        # tmp/scale.txt, gw.txt, biasg.txt... from src/LocalMapping.cc:527-547,
        # plotted by pyplotscripts/plotinit.py; ours: eval/plot_init.py)
        self.init_log_dir: Optional[str] = None
        # marginalized frame prior chain (reference Frame::mNavStatePrior +
        # mMargCovInv, src/Optimizer.cc:740-772 produce, :407-423 consume):
        # frame-to-frame tracking carries the previous frame's Schur
        # marginal; the chain re-anchors to the keyframe whenever the map
        # updates (KF insertion / BA / rescale)
        self.frame_prior = None
        self._prior_map_version = -1
        self._nav_last_frame: Optional[NavState] = None
        # async mapping: the worker NEVER touches tracker-owned state
        # (nav_cur, frame_prior, velocity, last_frame pose, biases,
        # gravity). When a mapping-side event invalidates it — VI init
        # (re)scale, VI BA moving the newest keyframe, loop correction —
        # the worker bumps this epoch under map_lock and the tracker
        # re-bases ONCE at the next frame entry (_drain_tracker_rebase):
        # nav_cur re-derives from the newest chain keyframe's NavState
        # propagated through the since-KF IMU buffer. This is the
        # epoch-gated atomic swap replacing the reference's map-update
        # flags (src/Tracking.cc:896-906).
        self._rebase_epoch = 0
        self._rebase_seen = 0
        self._pending_imu_params = None  # (bias_g, bias_a, gravity) from worker
        # mapping-side canonical bias/gravity (the worker's copies; the
        # tracker's self.bias_*/self.gravity sync either inline in
        # lock-step or at the rebase drain in async)
        self._map_bias_g = np.zeros(3, np.float32)
        self._map_bias_a = np.zeros(3, np.float32)
        self._map_gravity: Optional[np.ndarray] = None
        # fused single-dispatch VI tracking core (built lazily)
        self._vi_core = None

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

    def _drain_tracker_rebase(self):
        """Apply pending mapping-side events to the tracker state, once,
        at frame entry (async mode; lock-step applies them inline). The
        tracker state re-derives from the newest chain keyframe's
        NavState, propagated through the since-KF IMU buffer to the last
        frame's timestamp, so prediction continues seamlessly in the new
        (possibly rescaled) world."""
        with self.map_lock:
            if self._rebase_seen == self._rebase_epoch:
                return
            self._rebase_seen = self._rebase_epoch
            if self._pending_imu_params is not None:
                self.bias_g, self.bias_a, self.gravity = self._pending_imu_params
                self._pending_imu_params = None
            self.frame_prior = None
            self._nav_last_frame = None
            self.velocity = None
            if not self.vi_ready:
                return
            chain = [k for k in self.kf_chain if k in self.map.keyframes]
            if not chain:
                return
            last_kf = self.map.keyframes[chain[-1]]
            if not (last_kf.nav and "state" in last_kf.nav):
                return
            ns = jax.tree.map(jnp.asarray, last_kf.nav["state"])
            kf_ts = last_kf.timestamp
            imu_buf = list(self.imu_since_kf)
        if self.last_frame is not None and self.last_frame.timestamp > kf_ts:
            if imu_buf:
                t = np.array([s[0] for s in imu_buf], np.float32)
                g = np.stack([np.asarray(s[1]) for s in imu_buf]).astype(np.float32)
                a = np.stack([np.asarray(s[2]) for s in imu_buf]).astype(np.float32)
                batch = ImuBatch.from_arrays(g, a, t, capacity=self.imu_capacity)
            else:
                batch = ImuBatch.empty(self.imu_capacity)
            pre = preintegrate(
                batch, jnp.asarray(self.bias_g), jnp.asarray(self.bias_a),
                jnp.float32(kf_ts), jnp.float32(self.last_frame.timestamp),
                self.imu_noise,
            )
            ns = propagate_navstate(ns, pre, jnp.asarray(self.gravity))
            self.last_frame.r_cw, self.last_frame.t_cw = self._tcw_from_nav(ns)
        self.nav_cur = ns
        self.last_vision_time = max(
            self.last_vision_time,
            self.last_frame.timestamp if self.last_frame else kf_ts,
        )

    def process_frame_vi(self, image, ts: float, imu_samples) -> dict:
        """imu_samples: iterable of (t, gyro(3,), acc(3,)) since last call
        (the reference's vimu argument, src/Tracking.cc:598)."""
        for s in imu_samples:
            self.imu_since_kf.append(s)
            self.imu_since_frame.append(s)
        if self.async_mapping:
            self._drain_tracker_rebase()
        if not self.vi_ready:
            out = self.process_frame(image, ts)
            # pre-init loss with a tiny map is unrecoverable: full reset
            # (reference src/Tracking.cc:1188-1196)
            if out["state"] == "LOST" and len(self.map.kf_ids()) <= 5:
                self.pre_init_lost += 1
                if self.pre_init_lost >= 3:
                    self.reset_vi()
                    out = {"state": "NOT_INITIALIZED", "n_tracked": 0,
                           "n_kfs": 0, "n_points": 0}
            else:
                self.pre_init_lost = 0
            self.imu_since_frame = []
            return out
        # VI tracking: the fused steady-state core extracts features
        # inside its single dispatch; the guard branches (reloc prepare,
        # missing inertial anchor) extract the old way first
        if self.reloc_bias_prepare or self.nav_cur is None:
            fr = self._make_frame(image, ts)
            self._track_vi(fr, ts)
        else:
            fr = self._track_vi_fused(image, ts)
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

    def _can_cull(self, k: int) -> bool:
        """VI time-gap guard (reference VI-aware KeyFrameCulling,
        src/LocalMapping.cc:1705-1750): a chain keyframe may only be
        culled when merging its IMU segment into the next one keeps the
        preintegration interval short (<= 0.5 s), and never the chain
        ends."""
        if k not in self.kf_chain:
            return True
        i = self.kf_chain.index(k)
        if i == 0 or i == len(self.kf_chain) - 1:
            return False
        prev_id = self.kf_chain[i - 1]
        next_id = self.kf_chain[i + 1]
        if prev_id not in self.map.keyframes or next_id not in self.map.keyframes:
            return False
        gap = (
            self.map.keyframes[next_id].timestamp
            - self.map.keyframes[prev_id].timestamp
        )
        return gap <= 0.5

    def _on_cull(self, k: int):
        """Merge the culled keyframe's IMU segment into its next chain
        neighbour and re-link prev<->next (the reference re-chains
        pPrevKF/pNextKF and recomputes the preintegration; here the raw
        sample buffers concatenate, so the next BA's preintegration is
        exact rather than composed)."""
        if k not in self.kf_chain:
            return
        i = self.kf_chain.index(k)
        prev_id = self.kf_chain[i - 1]
        next_id = self.kf_chain[i + 1]
        kf = self.map.keyframes[k]
        nxt = self.map.keyframes[next_id]
        nav_k = kf.nav or {}
        nav_n = nxt.nav or {}
        t = np.concatenate([nav_k.get("imu_t", np.zeros(0, np.float32)),
                            nav_n.get("imu_t", np.zeros(0, np.float32))])
        g = np.concatenate([nav_k.get("imu_g", np.zeros((0, 3), np.float32)),
                            nav_n.get("imu_g", np.zeros((0, 3), np.float32))])
        a = np.concatenate([nav_k.get("imu_a", np.zeros((0, 3), np.float32)),
                            nav_n.get("imu_a", np.zeros((0, 3), np.float32))])
        n_keep = min(len(t), self.imu_capacity)
        nxt.nav = nav_n or {}
        nxt.nav["imu_t"] = t[-n_keep:]
        nxt.nav["imu_g"] = g[-n_keep:].astype(np.float32)
        nxt.nav["imu_a"] = a[-n_keep:].astype(np.float32)
        nxt.prev_kf = prev_id
        self.map.keyframes[prev_id].next_kf = next_id
        self.kf_chain.remove(k)

    def _on_keyframe_created(self, fr: FrameRecord, kf_id: int):
        """Attach the IMU segment since the previous keyframe, link the
        chain, and store the tracked NavState — all BEFORE the mapping job
        can start, so the (possibly async) worker reads complete keyframes
        (reference CreateNewKeyFrame attaches mvIMUSinceLastKF + the
        prev-KF link, src/Tracking.cc:1822-1828)."""
        with self.map_lock:
            kf = self.map.keyframes[kf_id]
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
            if self.vi_ready and self.nav_cur is not None:
                kf.nav["state"] = jax.tree.map(np.asarray, self.nav_cur)

    def _insert_keyframe(self, fr: FrameRecord):
        super()._insert_keyframe(fr)
        if not self.async_mapping:
            # lock-step: the mapping job (VI BA / init rescale) already ran
            # inline — re-sync the frame pose and drop a stale prior if the
            # map was rescaled (async mode re-bases at next frame entry)
            kf_now = self.map.keyframes[self.last_kf_id]
            fr.r_cw, fr.t_cw = kf_now.r_cw.copy(), kf_now.t_cw.copy()

    def _mapping_ba(self, kf_id: int, window):
        """The reference's VI-vs-vision local-BA switch
        (src/LocalMapping.cc:1055-1080): vision windowed BA until VI init
        succeeds (plus the init attempt itself), then the VI windowed BA
        with preintegration chains — the post-init vision BA must NOT run,
        its scale-gauge-free solve would fight the IMU's metric scale."""
        if not self.vi_ready:
            # pre-init the vision BA must NOT be skipped under queue
            # pressure: the closed-form init solves against the BA'd
            # camera centers, and un-refined geometry fails its
            # plausibility gates indefinitely (observed in async runs on
            # a slow host: queue never empty -> BA never ran -> no init)
            with self.map_lock:
                anchor = set()
                for p in self.map.local_map_points(window):
                    for k in self.map.obs_kf[p]:
                        if k >= 0 and int(k) not in window:
                            anchor.add(int(k))
                fixed = sorted(anchor)[:8]
                if not fixed:
                    # pin the gauge (see mono._mapping_ba)
                    fixed = [min(window)]
            self._local_ba(window, fixed)
            self._maybe_vi_init()
            return
        # continuous init refinement: the reference only ACCEPTS init
        # after 15 s of data (src/LocalMapping.cc:554-563); we accept
        # early for usability and keep re-estimating on the growing chain
        # until the same time span. Two regimes:
        #   * short chain: the closed-form triplet re-solve (fast, but its
        #     errors-in-variables attenuation SHRINKS scale by the
        #     noise-to-signal ratio on every application — compounding);
        #   * once the chain spans gw_refine_marks[i]: the full-chain
        #     gravity-vertex GBA (optim.ba.vi_ba_gw, reference
        #     GlobalBundleAdjustmentNavStateWithGw src/Optimizer.cc:2702) —
        #     the joint MLE over raw reprojections has no attenuation and
        #     repairs scale+gravity together (test_ba.py: 5% scale error ->
        #     1.6% on a 1.75 s window; better on longer chains).
        with self.map_lock:
            kf_ts = self.map.keyframes[kf_id].timestamp
            chain = [k for k in self.kf_chain if k in self.map.keyframes]
            chain_len = len(chain)
            span = (
                self.map.keyframes[chain[-1]].timestamp
                - self.map.keyframes[chain[0]].timestamp
                if chain_len >= 2
                else 0.0
            )
        ran_full_gba = False
        if kf_ts - self.init_time < self.init_refine_window:
            marks = self.gw_refine_marks
            if self._gw_mark_done < len(marks) and span >= marks[self._gw_mark_done]:
                while (
                    self._gw_mark_done < len(marks)
                    and span >= marks[self._gw_mark_done]
                ):
                    self._gw_mark_done += 1
                self._vi_local_ba(
                    kf_id, window_size=chain_len,
                    optimize_gravity=True, iters=(10, 8),
                )
                ran_full_gba = True
            elif (
                span < marks[0]
                and chain_len - getattr(self, "_last_refine_len", 0) >= 2
            ):
                # throttle: the closed-form re-solve only improves after
                # the BA has moved the geometry, and every distinct chain
                # length is a fresh XLA compile — refine every 2nd KF
                self._refine_vi_init()
                self._last_refine_len = chain_len
        # BA abort: a newer keyframe is already queued — the next job
        # optimizes a superset window (reference mbAbortBA); bounded to 2
        # consecutive skips so sustained backlog cannot starve BA
        if ran_full_gba:
            self._ba_skips = 0
            return
        if (
            self.async_mapping
            and not self._mapping_queue.empty()
            and self._ba_skips < 2
        ):
            self._ba_skips += 1
            return
        self._ba_skips = 0
        self._vi_local_ba(kf_id)

    def _kf_imu_batch(self, kf_id: int) -> ImuBatch:
        nav = self.map.keyframes[kf_id].nav
        return ImuBatch.from_arrays(
            nav["imu_g"], nav["imu_a"], nav["imu_t"], capacity=self.imu_capacity
        )

    # -- VI initialization ------------------------------------------------

    def _maybe_vi_init(self):
        with self.map_lock:
            chain = [k for k in self.kf_chain if k in self.map.keyframes]
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
        self._apply_init_result(res, chain)
        self.vi_ready = True
        last = self.map.keyframes[chain[-1]]
        self.vi_ready = True
        self.last_vision_time = last.timestamp
        self.init_time = last.timestamp
        # post-init global VI BA with gravity FIXED (reference GBA after
        # init, src/LocalMapping.cc:802-804 / GlobalBundleAdjustmentNavState).
        # Gravity stays at the closed-form estimate: over a short init
        # window the free-gravity GBA (vi_ba_gw) trades gravity error for
        # bias — measured 1.4deg -> 4.2deg on the rendered sequence.
        self._vi_local_ba(chain[-1], window_size=len(chain), iters=(15, 10))

    def _log_init_state(self, res, t):
        if self.init_log_dir is None:
            return
        import os

        os.makedirs(self.init_log_dir, exist_ok=True)

        def app(name, vals):
            with open(os.path.join(self.init_log_dir, name), "a") as f:
                f.write(" ".join(f"{v:.6f}" for v in [t] + list(vals)) + "\n")

        app("scale.txt", [res.scale])
        app("gw.txt", list(res.gravity_w))
        app("biasg.txt", list(res.bias_g))
        app("biasa.txt", list(res.bias_a))
        app("condnum.txt", [res.condition_number])

    def _apply_init_result(self, res, chain):
        """Apply a (re-)estimated VI init: rescale the map, refresh
        gravity/biases, overwrite chain NavStates with the solved
        velocities (reference src/LocalMapping.cc:583-707). The whole
        rescale is atomic under map_lock; in async mode the tracker-owned
        state (nav_cur, biases, gravity, last-frame pose) is NOT touched
        here — the rebase epoch makes the tracker re-derive it at the next
        frame entry."""
        with self.map_lock:
            self._log_init_state(res, self.map.keyframes[chain[-1]].timestamp)
            s = res.scale
            pts = self.map.active_point_ids()
            self.map.pt_xyz[pts] *= s
            self.map.pt_min_dist[pts] *= s
            self.map.pt_max_dist[pts] *= s
            for kf in self.map.keyframes.values():
                kf.t_cw = (kf.t_cw * s).astype(np.float32)
            self._rescale_trajectory(s)
            nav_from = self._nav_from_tcw_biases(
                res.bias_g.astype(np.float32), res.bias_a.astype(np.float32)
            )
            for idx, kf_id in enumerate(chain):
                kf = self.map.keyframes[kf_id]
                nav = nav_from(kf.r_cw, kf.t_cw, res.velocities[idx])
                kf.nav = kf.nav or {}
                kf.nav["state"] = jax.tree.map(np.asarray, nav)
            self.map.version += 1
            self._map_bias_g = res.bias_g.astype(np.float32)
            self._map_bias_a = res.bias_a.astype(np.float32)
            self._map_gravity = res.gravity_w.astype(np.float32)
            if self.async_mapping:
                self._pending_imu_params = (
                    res.bias_g.astype(np.float32),
                    res.bias_a.astype(np.float32),
                    res.gravity_w.astype(np.float32),
                )
                self._rebase_epoch += 1
                return
            self.bias_g = res.bias_g.astype(np.float32)
            self.bias_a = res.bias_a.astype(np.float32)
            self.gravity = res.gravity_w.astype(np.float32)
            # current frame state continues from the newest chain KF
            last = self.map.keyframes[chain[-1]]
            self.nav_cur = jax.tree.map(jnp.asarray, last.nav["state"])
            if self.last_frame is not None and self.last_frame.t_cw is not None:
                self.last_frame.t_cw = self.last_frame.t_cw * s

    def _nav_from_tcw_biases(self, bias_g, bias_a):
        """NavState factory pinned to explicit biases (the worker must not
        read the tracker's self.bias_* mid-update)."""

        def make(r_cw, t_cw, v):
            r_wc = r_cw.T
            c_w = -r_wc @ t_cw
            r_wb = r_wc @ self.r_bc.T
            p_cb = -(self.r_bc.T @ self.p_bc)
            p_wb = c_w + r_wc @ p_cb
            z = jnp.zeros(3, jnp.float32)
            return NavState(
                jnp.asarray(p_wb.astype(np.float32)),
                jnp.asarray(np.asarray(v).astype(np.float32)),
                jnp.asarray(r_wb.astype(np.float32)),
                jnp.asarray(bias_g),
                jnp.asarray(bias_a),
                z,
                z,
            )

        return make

    def _refine_vi_init(self):
        """Re-run the closed-form init on the full (already metric) chain:
        the scale correction should be ~1; gravity/bias estimates improve
        with the longer baseline. Beyond-reference redesign of the 15 s
        init acceptance window (src/LocalMapping.cc:554-563): accept early,
        keep refining while running.

        The closed-form solve is exactly scale-equivariant in the camera
        centers, so re-running it on unchanged geometry returns 1.0 —
        improvement comes from the windowed/global VI BA moving the
        centers toward IMU-metric between calls (see _maybe_vi_init's
        BA<->refine alternation)."""
        with self.map_lock:
            chain = [k for k in self.kf_chain if k in self.map.keyframes]
            if len(chain) < max(4, self.vi_init_min_kfs):
                return
            kfs = [self.map.keyframes[i] for i in chain]
            p_c = np.stack([k.center() for k in kfs])
            r_wc = np.stack([k.r_cw.T for k in kfs])
            ts = np.array([k.timestamp for k in kfs])
            batches = [self._kf_imu_batch(i) for i in chain[1:]]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        # widen triplet strides as the chain grows: the scale signal in a
        # triplet grows ~dt^2 while vision noise is constant, so wide
        # triplets cut the errors-in-variables attenuation of the estimate
        max_stride = max(3, min(6, (len(chain) - 1) // 2))
        res = try_vi_init(
            p_c, r_wc, ts, stacked, r_bc=self.r_bc, p_bc=self.p_bc,
            noise=self.imu_noise, strides=tuple(range(1, max_stride + 1)),
        )
        if res is None or not res.success:
            return
        # corrections on a metric map must be small — reject outliers
        if not 0.7 < res.scale < 1.4:
            return
        self._apply_init_result(res, chain)

    def _need_new_keyframe(self, ts: float) -> bool:
        """Vision rules plus the VI time-gap rule: insert after >=0.5 s
        without a keyframe so preintegration segments stay short
        (reference NeedNewKeyFrame VI branch, src/Tracking.cc:1773-1777).
        Under a saturated async mapping queue the time gap may stretch to
        1.5 s before forcing."""
        if super()._need_new_keyframe(ts):
            return True
        if getattr(self, "suppress_keyframes", False) or self.localization_only:
            return False
        if not self.vi_ready or self.n_tracked <= 15:
            return False
        ref_kf = self.map.keyframes.get(self.last_kf_id)
        if ref_kf is None:
            return False
        gap = ts - ref_kf.timestamp
        if self.async_mapping and self._mapping_queue.qsize() >= 2:
            return gap >= 1.5
        return gap >= 0.5

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

    def reset_vi(self):
        """Reset the whole VI system (map + inertial state)."""
        self.reset()
        self.vi_ready = False
        self.gravity = None
        self.imu_since_kf = []
        self.imu_since_frame = []
        self.nav_cur = None
        self.bias_g = np.zeros(3, np.float32)
        self.bias_a = np.zeros(3, np.float32)
        self.kf_chain = []
        self.reloc_bias_prepare = False
        self.reloc_buffer = []
        self.pre_init_lost = 0
        self.frame_prior = None
        self._nav_last_frame = None
        self._rebase_epoch = 0
        self._rebase_seen = 0
        self._pending_imu_params = None
        self._map_bias_g = np.zeros(3, np.float32)
        self._map_bias_a = np.zeros(3, np.float32)
        self._map_gravity = None
        self._gw_mark_done = 0
        self._last_refine_len = 0

    # -- checkpoint/resume --------------------------------------------------

    def save_map(self, path: str):
        """VI checkpoint: the base map (keyframe NavStates and IMU buffers
        already serialize) plus pipeline-level VI state — gravity, biases,
        the keyframe chain, init bookkeeping (beyond the reference, whose
        SaveMap was a TODO, include/System.h:132-134)."""
        from viorb_tpu.mapping.serialize import save_map

        self.wait_mapping_idle()
        with self.map_lock:
            extra = {
                "vi_ready": np.array(self.vi_ready),
                "kf_chain": np.asarray(
                    [k for k in self.kf_chain if k in self.map.keyframes],
                    np.int64,
                ),
                "bias_g": self._map_bias_g,
                "bias_a": self._map_bias_a,
                "init_time": np.float64(self.init_time),
            }
            if self._map_gravity is not None:
                extra["gravity"] = self._map_gravity
            save_map(self.map, path, extra=extra)

    def load_map(self, path: str, localization_only: bool = True):
        """Resume from a VI checkpoint: the next frame relocalizes (BoW +
        PnP) and then runs the 20-frame bias re-solve before VI tracking
        resumes (the reference's mbRelocBiasPrepare path,
        src/Tracking.cc:2285-2287)."""
        from viorb_tpu.mapping.serialize import load_map_extra

        super().load_map(path, localization_only=localization_only)
        extra = load_map_extra(path)
        self.vi_ready = bool(extra.get("vi_ready", False))
        self.kf_chain = [int(k) for k in extra.get("kf_chain", [])]
        self.bias_g = np.asarray(
            extra.get("bias_g", np.zeros(3)), np.float32
        )
        self.bias_a = np.asarray(
            extra.get("bias_a", np.zeros(3)), np.float32
        )
        self._map_bias_g = self.bias_g.copy()
        self._map_bias_a = self.bias_a.copy()
        self.init_time = float(extra.get("init_time", 0.0))
        if "gravity" in extra:
            self.gravity = np.asarray(extra["gravity"], np.float32)
            self._map_gravity = self.gravity.copy()
        # refinement finished in the saved session; don't re-run it on a
        # resumed (relocalization-based) run
        self._gw_mark_done = len(self.gw_refine_marks)
        self.init_refine_window = 0.0
        # tracker state is gone: the first frame must relocalize, then the
        # 20-frame bias re-solve rebuilds nav_cur (see _track_vi)
        self.nav_cur = None
        self.imu_since_kf = []
        self.imu_since_frame = []
        self.frame_prior = None
        self._nav_last_frame = None

    # -- relocalization + bias recompute ----------------------------------

    def _begin_reloc_bias_prepare(self, fr: FrameRecord, ts: float):
        """After a successful relocalization, suspend VI tracking and
        collect vision-only frames for the bias re-solve (reference
        mbRelocBiasPrepare set at src/Tracking.cc:2285-2287)."""
        self.reloc_bias_prepare = True
        self.reloc_buffer = [
            (ts, fr.r_cw.copy(), fr.t_cw.copy(), [])
        ]
        self.suppress_keyframes = True
        self.imu_since_kf = []  # the pre-loss segment is no longer usable
        self.frame_prior = None
        self._nav_last_frame = None

    def _reloc_prepare_step(self, fr: FrameRecord, ts: float):
        """Vision-only tracking while collecting the 20-frame buffer; on
        completion re-solve gyro bias + velocity and resume VI tracking
        (reference RecomputeIMUBiasAndCurrentNavstate,
        src/Tracking.cc:59-227, invoked at :1053-1082)."""
        self._track(fr)  # vision path (KF insertion suppressed)
        if self.state != "OK" or fr.r_cw is None:
            # lost again mid-prepare: abandon and wait for the next reloc
            self.reloc_bias_prepare = False
            self.suppress_keyframes = False
            self.reloc_buffer = []
            self.state = "LOST"
            return
        self.reloc_buffer.append(
            (ts, fr.r_cw.copy(), fr.t_cw.copy(), list(self.imu_since_frame))
        )
        if len(self.reloc_buffer) < self.reloc_frames_needed:
            return
        self._recompute_bias_and_navstate(ts)

    def _recompute_bias_and_navstate(self, ts: float):
        from viorb_tpu.slam.vi_init import estimate_gyro_bias

        buf = self.reloc_buffer
        self.reloc_bias_prepare = False
        self.suppress_keyframes = False
        self.reloc_buffer = []
        # body rotations from vision poses
        r_wb = np.stack([(r.T @ self.r_bc.T) for _, r, _, _ in buf])
        # per-gap preintegrations at zero gyro bias
        batches = []
        for (t0, _, _, _), (t1, _, _, samples) in zip(buf[:-1], buf[1:]):
            if samples:
                t = np.array([s[0] for s in samples], np.float32)
                g = np.stack([np.asarray(s[1]) for s in samples]).astype(np.float32)
                a = np.stack([np.asarray(s[2]) for s in samples]).astype(np.float32)
                batches.append(
                    ImuBatch.from_arrays(g, a, t, capacity=self.imu_capacity)
                )
            else:
                batches.append(ImuBatch.empty(self.imu_capacity))
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        t0s = np.array([b[0] for b in buf[:-1]], np.float32)
        t1s = np.array([b[0] for b in buf[1:]], np.float32)
        pre0 = preintegrate_batch(
            stacked, jnp.zeros(3), jnp.zeros(3), jnp.asarray(t0s),
            jnp.asarray(t1s), self.imu_noise,
        )
        self.bias_g = estimate_gyro_bias(r_wb, pre0).astype(np.float32)
        with self.map_lock:
            self._map_bias_g = self.bias_g
        # velocity from the last position difference (reference :180-220)
        p_cb = -(self.r_bc.T @ self.p_bc)
        p_wb = []
        for _, r_cw, t_cw, _ in buf[-2:]:
            r_wc = r_cw.T
            c_w = -r_wc @ t_cw
            p_wb.append(c_w + r_wc @ p_cb)
        dt = max(buf[-1][0] - buf[-2][0], 1e-3)
        v = (p_wb[1] - p_wb[0]) / dt
        last_ts, r_cw, t_cw, _ = buf[-1]
        self.nav_cur = self._nav_from_tcw(r_cw, t_cw, v=v.astype(np.float32))
        self.last_vision_time = last_ts
        self.imu_since_kf = []
        self.state = "OK"

    def _track_vi(self, fr: FrameRecord, ts: float):
        if self.reloc_bias_prepare:
            self._reloc_prepare_step(fr, ts)
            return
        if self.nav_cur is None:
            # no inertial anchor (resumed from a checkpoint): relocalize,
            # then the 20-frame bias re-solve rebuilds the NavState
            # (reference Relocalization -> mbRelocBiasPrepare,
            # src/Tracking.cc:2127-2291). Localization-only stays on the
            # vision tracker (the reference's mbOnlyTracking mode is
            # vision-only as well).
            if (
                self.localization_only
                and self.last_frame is not None
                and self.last_frame.r_cw is not None
                and self.state == "OK"
            ):
                self._track(fr)
                return
            if self._relocalize(fr):
                if not self.localization_only:
                    self._begin_reloc_bias_prepare(fr, ts)
            else:
                self.state = "LOST"
                self.n_tracked = 0
            return
        # steady state is handled by the fused core (process_frame_vi
        # dispatches there directly; reaching here means a caller fed a
        # pre-extracted frame — run the fused core on nothing? No: the
        # guard branches above are the only legitimate entries)
        raise RuntimeError("_track_vi called outside its guard branches")

    def _track_vi_fused(self, image, ts: float) -> FrameRecord:
        """Steady-state VI tracking as ONE fused device dispatch + ONE
        host pull: since-frame AND since-KF preintegration, NavState
        propagation, projection matching (wide-radius retry as lax.cond)
        and the 15-DoF VI pose optimization run as a single XLA program
        (tracking_loop.make_vi_pipeline_core). This replaces the legacy
        ~6-dispatch path with its mid-frame int(n) host sync — the device
        shape of the reference's TrackWithIMU (src/Tracking.cc:412-534)."""
        if self._vi_core is None:
            from viorb_tpu.slam.tracking_loop import make_vi_pipeline_core

            self._vi_core = make_vi_pipeline_core(
                self.cam, self.extractor, self.ext, self.imu_noise
            )
        last_t = self.last_frame.timestamp if self.last_frame else ts
        with self.map_lock:
            kf_ids = self._local_kf_ids()
            pts, dev = self._device_local_map_vi(kf_ids)
            last_kf = self.map.keyframes[self.last_kf_id]
            ns_kf = last_kf.nav["state"]
            t_kf = last_kf.timestamp
            map_version = self.map.version
        batch_fr = self._imu_batch_since_frame()
        kf_batch = ImuBatch.empty(self.imu_capacity)
        if self.imu_since_kf:
            t = np.array([s[0] for s in self.imu_since_kf], np.float32)
            g = np.stack(
                [np.asarray(s[1]) for s in self.imu_since_kf]
            ).astype(np.float32)
            a = np.stack(
                [np.asarray(s[2]) for s in self.imu_since_kf]
            ).astype(np.float32)
            n_keep = min(len(t), self.imu_capacity)
            kf_batch = ImuBatch.from_arrays(
                g[-n_keep:], a[-n_keep:], t[-n_keep:],
                capacity=self.imu_capacity,
            )
        # frame-to-frame with the marginalized prior when the map is
        # unchanged since the prior was built; otherwise frame-to-KF
        # (reference: TrackWithIMU's map-updated switch,
        # src/Tracking.cc:412-534). A STATIC switch: two compiled
        # programs, zero device syncs.
        use_prior = (
            self.frame_prior is not None
            and self._prior_map_version == map_version
            and self._nav_last_frame is not None
        )
        ns_i = (
            self._nav_last_frame
            if use_prior
            else jax.tree.map(jnp.asarray, ns_kf)
        )
        if use_prior:
            prior_state, prior_info = self.frame_prior.state, self.frame_prior.info
        else:
            prior_state, prior_info = ns_i, jnp.zeros((15, 15), jnp.float32)
        out = self._vi_core(
            jnp.asarray(image),
            self.nav_cur, ns_i, batch_fr, kf_batch,
            jnp.float32(last_t), jnp.float32(ts), jnp.float32(t_kf),
            jnp.asarray(self.bias_g), jnp.asarray(self.bias_a),
            jnp.asarray(self.gravity), prior_state, prior_info,
            *dev, use_prior=use_prior,
        )
        (feats, xy_d, fdesc, pf_d, vis_d, _n, nav_pred_d, ns_j_d, inl_d,
         marg_d) = out
        # the frame's single host pull (desc01 stays on device; see
        # FrameRecord.host_desc01)
        (xy, level, angle, fvalid, pf, visible, inl, nav_pred_np,
         ns_j_np, marg) = jax.device_get(
            (
                xy_d, feats.level, feats.angle, feats.valid,
                pf_d, vis_d, inl_d, nav_pred_d, ns_j_d, marg_d,
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
        matched_feats = np.nonzero(pf >= 0)[0]
        n_inl = int(inl.sum())
        nav_pred = jax.tree.map(jnp.asarray, nav_pred_np)
        fr.r_cw, fr.t_cw = self._tcw_from_nav(nav_pred)

        if len(matched_feats) < 10 or n_inl < 10:
            # IMU-only dead reckoning (reference src/Tracking.cc:981-1110)
            if ts - self.last_vision_time <= IMU_SAFE_WINDOW:
                self.state = "IMU_ONLY"
                self.nav_cur = nav_pred
                self.n_tracked = 0
                return fr
            # beyond the IMU window: BoW relocalization, then a 20-frame
            # bias re-solve before resuming VI (reference
            # src/Tracking.cc:2127-2291 + :1053-1082)
            if self._relocalize(fr):
                self._begin_reloc_bias_prepare(fr, ts)
                return fr
            self.state = "LOST"
            self.n_tracked = 0
            return fr

        ns_j = jax.tree.map(jnp.asarray, ns_j_np)
        self.n_tracked = n_inl
        self.state = "OK"
        self.last_vision_time = ts
        self.nav_cur = ns_j
        fr.r_cw, fr.t_cw = self._tcw_from_nav(ns_j)
        # carry this frame's marginal information forward as the next
        # frame's prior (true Schur marginal in frame-to-frame mode)
        from viorb_tpu.optim import ViPosePrior

        mi = 0.5 * (marg + marg.T)
        self.frame_prior = ViPosePrior(
            state=ns_j, info=jnp.asarray(mi), valid=jnp.asarray(True)
        )
        self._prior_map_version = map_version
        self._nav_last_frame = ns_j

        # record matches, counters (alive-gated: async culls may race)
        ok_feats = np.nonzero((pf >= 0) & inl)[0]
        fr.point_idx[ok_feats] = pts[pf[ok_feats]]
        if len(pts):
            with self.map_lock:
                vis = visible[: len(pts)]
                alive = self.map.pt_active[pts]
                self.map.pt_visible[pts[vis & alive[: len(vis)]]] += 1
                ok_alive = ok_feats[self.map.pt_active[fr.point_idx[ok_feats]]]
                self.map.pt_found[fr.point_idx[ok_alive]] += 1

        # keyframe decision: vision rules (hardened _need_new_keyframe)
        # OR the VI time-gap rule (reference NeedNewKeyFrame VI branch,
        # src/Tracking.cc:1773-1777)
        self.frames_since_kf += 1
        if self._need_new_keyframe(ts):
            self._insert_keyframe(fr)
            self.frames_since_kf = 0
        return fr

    def _device_local_map_vi(self, kf_ids):
        """Padded local-map device buffers for the fused VI core (same
        layout as the mono _device_local_map; caller holds the lock)."""
        from viorb_tpu.slam.kernels import unpack_local_map

        key = (id(self.map), self.map.version, self.last_kf_id)
        if self._lm_cache is not None and self._lm_cache[0] == key:
            return self._lm_cache[1], self._lm_cache[2]
        pts, packed, desc, valid = self._gather_local_points_packed(kf_ids)
        dev = unpack_local_map(
            jnp.asarray(packed), jnp.asarray(desc), jnp.asarray(valid)
        )
        self._lm_cache = (key, pts, dev)
        return pts, dev

    # -- VI-aware loop closing ---------------------------------------------

    def _post_loop_gba(self, anchor_kf: int, scale_by_kf=None):
        """VI flavour of the post-loop global BA (reference
        RunGlobalBundleAdjustment -> GlobalBundleAdjustmentNavState +
        NavState propagation, src/LoopClosing.cc:674-819): first re-derive
        every keyframe's NavState from its essential-graph-corrected SE3
        pose — rotating the world velocity into the corrected frame,
        `Vw2 = Rwb2 * Rwb1^T * Vw1` (reference :738-757, the body-frame
        velocity is invariant), and rescaling it by the local world-scale
        change of the Sim3 correction — then run the full-chain VI global
        BA so the IMU chain and the closed loop settle jointly. The
        scale-gauge-free vision GBA must NOT run here: it would fight the
        IMU's metric scale."""
        if not self.vi_ready:
            return super()._post_loop_gba(anchor_kf, scale_by_kf)
        for kf_id, kf in self.map.keyframes.items():
            if not (kf.nav and "state" in kf.nav):
                continue
            ns = kf.nav["state"]
            r_wb_old = np.asarray(ns.r)
            v_old = np.asarray(ns.v)
            # corrected body pose from the corrected camera pose
            r_wc = kf.r_cw.T
            c_w = -r_wc @ kf.t_cw
            r_wb_new = r_wc @ self.r_bc.T
            p_cb = -(self.r_bc.T @ self.p_bc)
            p_wb_new = c_w + r_wc @ p_cb
            s_loc = 1.0
            if scale_by_kf is not None:
                s_loc = float(scale_by_kf.get(kf_id, 1.0))
            v_new = s_loc * (r_wb_new @ r_wb_old.T @ v_old)
            kf.nav["state"] = NavState(
                p=p_wb_new.astype(np.float32),
                v=v_new.astype(np.float32),
                r=r_wb_new.astype(np.float32),
                bg=np.asarray(ns.bg),
                ba=np.asarray(ns.ba),
                dbg=np.asarray(ns.dbg),
                dba=np.asarray(ns.dba),
            )
        chain = [k for k in self.kf_chain if k in self.map.keyframes]
        if len(chain) >= 3:
            self._vi_local_ba(chain[-1], window_size=len(chain), iters=(10, 8))
        # re-base the tracker on the corrected newest keyframe; the
        # marginalized frame prior is stale (map epoch bumps after the
        # mapping job) and nav_cur must not keep the pre-correction frame
        if self.async_mapping:
            self._rebase_epoch += 1
            return
        last = self.map.keyframes[chain[-1]]
        if last.nav and "state" in last.nav:
            self.nav_cur = jax.tree.map(jnp.asarray, last.nav["state"])
        self.frame_prior = None
        self._nav_last_frame = None
        self.velocity = None

    # -- VI local BA ------------------------------------------------------

    def _vi_local_ba(
        self,
        kf_id: int,
        window_size: Optional[int] = None,
        optimize_gravity: bool = False,
        iters: tuple = (5, 5),
    ):
        # --- assembly (map snapshot, under the lock) -------------------
        with self.map_lock:
            w = window_size or self.local_window
            chain = [k for k in self.kf_chain if k in self.map.keyframes]
            window = chain[-w:]
            if len(window) < 2:
                return
            # anchors: covisible KFs outside the window (fixed)
            anchor = set()
            for p in self.map.local_map_points(window):
                for k in self.map.obs_kf[p]:
                    if (
                        k >= 0
                        and int(k) not in window
                        and int(k) in self.map.keyframes
                    ):
                        anchor.add(int(k))
            fixed = sorted(anchor)[:6]
            kf_list, pt_ids, kf_idx, uv, inv_s2, valid = self.map.build_ba_problem(
                window, fixed, self.max_ba_landmarks
            )
            if len(pt_ids) == 0:
                return
            # bucketed pose count (see mono._pose_bucket): the VI BA
            # program compiles per (K, E, M, R) shape — padded slots are
            # fixed identity NavStates with no observations or edges
            from viorb_tpu.slam.mono import _pose_bucket

            k = _pose_bucket(len(kf_list))
            # NavStates: window KFs must all have them; fixed anchors might
            # be pre-VI keyframes — give them vision-derived states, fixed
            navs = []
            for i in kf_list:
                kf = self.map.keyframes[i]
                if kf.nav and "state" in kf.nav:
                    navs.append(jax.tree.map(jnp.asarray, kf.nav["state"]))
                else:
                    navs.append(self._nav_from_tcw(kf.r_cw, kf.t_cw))
            for _ in range(k - len(kf_list)):
                navs.append(NavState.identity())
            nav_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *navs)
            points = np.zeros((self.max_ba_landmarks, 3), np.float32)
            points[: len(pt_ids)] = self.map.pt_xyz[pt_ids]
            fixed_mask = np.ones(k, bool)
            for s, i in enumerate(kf_list):
                fixed_mask[s] = i in fixed or i == min(window)
            # IMU chain between consecutive WINDOW kfs (slots 0..n_win-1),
            # padded to k-1 segments so the preintegration launch shape is
            # bucketed too (padded segments are invalid edges)
            n_win = len(window)
            batches = []
            valid_edges = []
            t0s, t1s = [], []
            for a, b in zip(window[:-1], window[1:]):
                kfb = self.map.keyframes[b]
                batches.append(self._kf_imu_batch(b))
                # an edge spanning a tracking-loss gap carries a huge-dt
                # preintegration: drop it (its covariance whitening would
                # nearly zero it anyway, but padded buffers may also have
                # missed samples)
                dt_ab = kfb.timestamp - self.map.keyframes[a].timestamp
                valid_edges.append(
                    self.map.keyframes[b].prev_kf == a
                    and len(kfb.nav["imu_t"]) > 0
                    and dt_ab < 3.0
                )
                t0s.append(self.map.keyframes[a].timestamp)
                t1s.append(kfb.timestamp)
            while len(batches) < k - 1:
                batches.append(ImuBatch.empty(self.imu_capacity))
                valid_edges.append(False)
                t0s.append(0.0)
                t1s.append(0.01)
            bias_g = self._map_bias_g
            bias_a = self._map_bias_a
            gravity = self._map_gravity
        # --- solve (immutable snapshots, no lock) ----------------------
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        pre = preintegrate_batch(
            stacked,
            jnp.asarray(bias_g),
            jnp.asarray(bias_a),
            jnp.asarray(np.array(t0s, np.float32)),
            jnp.asarray(np.array(t1s, np.float32)),
            self.imu_noise,
        )
        bias_info = jnp.concatenate(
            [
                jnp.full(3, 1.0 / max(self.imu_noise.gyro_bias_rw_var, 1e-12)),
                jnp.full(3, 1.0 / max(self.imu_noise.acc_bias_rw_var, 1e-12)),
            ]
        ) * 0.005
        if window_size is not None and n_win >= 5:
            # global BA: add MULTI-STRIDE composed edges i -> i+s. The
            # scale signal grows ~accel*dt^2 while preintegration noise
            # grows ~dt^1.5, so long edges see the mono scale drift that
            # 0.5 s consecutive edges bury in noise (same physics as the
            # init's wide triplets; uses compose_preint)
            from viorb_tpu.imu.preintegration import compose_preint

            seg1 = [jax.tree.map(lambda x: x[i], pre) for i in range(n_win - 1)]
            seg = {1: seg1}
            ok1 = list(valid_edges)
            okd = {1: ok1}
            strides = [s_ for s_ in (2, 4, 8) if s_ < n_win]
            for s_ in strides:
                h = s_ // 2
                seg[s_] = [
                    compose_preint(seg[h][i], seg[h][i + h])
                    for i in range(n_win - s_)
                ]
                okd[s_] = [
                    okd[h][i] and okd[h][i + h] for i in range(n_win - s_)
                ]
            idx_i, idx_j, pres, oks = [], [], [], []
            for s_ in [1] + strides:
                for i in range(n_win - s_):
                    idx_i.append(i)
                    idx_j.append(i + s_)
                    pres.append(seg[s_][i])
                    oks.append(okd[s_][i])
            # bucket the edge count (multiples of 16): the GBA fires at
            # several chain lengths and each distinct E is a fresh compile
            from viorb_tpu.imu.preintegration import PreintegratedImu

            e_b = max(16, (len(idx_i) + 15) & ~15)
            while len(idx_i) < e_b:
                idx_i.append(0)
                idx_j.append(1)
                pres.append(PreintegratedImu.identity(()))
                oks.append(False)
            chain_obj = ImuChain(
                pre=jax.tree.map(lambda *xs: jnp.stack(xs), *pres),
                valid=jnp.asarray(np.array(oks)),
                bias_cov_inv_diag=bias_info,
                idx_i=jnp.asarray(np.array(idx_i, np.int32)),
                idx_j=jnp.asarray(np.array(idx_j, np.int32)),
            )
        else:
            # windowed BA: consecutive chain edges (already padded to k-1
            # invalid-marked segments at assembly)
            chain_obj = ImuChain(
                pre=pre,
                valid=jnp.asarray(np.array(valid_edges)),
                bias_cov_inv_diag=bias_info,
            )
        state = ViBAState(nav_stack, jnp.asarray(points))
        obs = BAObservations(
            kf_idx=jnp.asarray(kf_idx),
            uv=jnp.asarray(uv),
            inv_sigma2=jnp.asarray(inv_s2),
            valid=jnp.asarray(valid),
        )
        if optimize_gravity:
            from viorb_tpu.optim import vi_ba_gw_two_phase

            out, g_new, obs2 = vi_ba_gw_two_phase(
                state, obs, self.cam, self.ext, chain_obj,
                jnp.asarray(gravity), jnp.asarray(fixed_mask),
                iters1=15, iters2=10,
            )
        else:
            out, obs2 = vi_ba_two_phase(
                state, obs, self.cam, self.ext, chain_obj,
                jnp.asarray(gravity), jnp.asarray(fixed_mask),
                iters1=iters[0], iters2=iters[1],
            )
        # --- write back (under the lock; culls may have intervened);
        # one batched pull for the whole result set ----
        nav_np, p_new, valid_new = jax.device_get(
            (out.nav, out.points, obs2.valid)
        )
        obs2 = obs2._replace(valid=valid_new)
        with self.map_lock:
            if optimize_gravity:
                self._map_gravity = np.asarray(g_new).astype(np.float32)
                if self.async_mapping:
                    self._pending_imu_params = (
                        self._map_bias_g, self._map_bias_a, self._map_gravity
                    )
                else:
                    self.gravity = self._map_gravity
            for s_i, i in enumerate(kf_list):
                if fixed_mask[s_i] or i not in self.map.keyframes:
                    continue
                kf = self.map.keyframes[i]
                ns = jax.tree.map(lambda x: x[s_i], nav_np)
                kf.nav = kf.nav or {}
                kf.nav["state"] = ns
                nav_j = jax.tree.map(jnp.asarray, ns)
                kf.r_cw, kf.t_cw = self._tcw_from_nav(nav_j)
            # only landmarks still alive take the solved positions
            alive = self.map.pt_active[pt_ids]
            self.map.pt_xyz[pt_ids[alive]] = p_new[: len(pt_ids)][alive]
            if kf_id in kf_list:
                if self.async_mapping:
                    # tracker re-bases from the updated newest KF state
                    self._rebase_epoch += 1
                else:
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
                if not self.map.pt_active[p]:
                    continue
                for s in np.nonzero(dropped[row])[0]:
                    self.map.remove_observation(p, int(kf_list[kf_idx[row, s]]))
            # publish the moved poses/points to version-keyed consumers
            # (device local-map cache, streaming carry re-anchor)
            self.map.version += 1
