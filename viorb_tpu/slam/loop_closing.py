"""Loop closing: BoW detection -> Sim3 verification -> pose-graph correction.

Counterpart of the reference's LoopClosing thread (reference:
src/LoopClosing.cc — DetectLoop :127 with 3-consecutive-group consistency,
ComputeSim3 :255 with Sim3Solver RANSAC, CorrectLoop :426 with Sim3
propagation + essential-graph optimization :593; the follow-up GBA runs in
optim.ba). Runs lock-step after keyframe insertion (the reference's
dedicated thread is an execution detail; SURVEY.md §2.3 snapshot plan).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from viorb_tpu.bow import BinaryVocabulary, KeyframeDatabase
from viorb_tpu.features.matching import hamming_matrix, match_with_mask, valid_gate
from viorb_tpu.geometry.sim3 import sim3_compose, sim3_inverse
from viorb_tpu.mapping.map import MapStore
from viorb_tpu.optim.pose_graph import Sim3Graph, optimize_sim3_graph
from viorb_tpu.solvers import sim3_ransac


class LoopCloser:
    def __init__(
        self,
        map_store: MapStore,
        vocab: BinaryVocabulary,
        min_matches: int = 20,
        covis_consistency: int = 3,
        key=None,
        cam=None,
        min_confirm_matches: int = 40,
        fix_scale: bool = False,
    ):
        self.map = map_store
        self.vocab = vocab
        self.db = KeyframeDatabase(vocab)
        self.min_matches = min_matches
        self.covis_consistency = covis_consistency
        self._consistency: Dict[int, int] = {}  # candidate group anchor -> count
        self.key = key if key is not None else jax.random.PRNGKey(7)
        self.loops_closed = 0
        self.cam = cam  # enables guided-projection confirm + Sim3 refine
        self.min_confirm_matches = min_confirm_matches
        # stereo/RGB-D: metric scale is observed, so the loop Sim3 and the
        # essential graph run with s pinned at 1 (reference Sim3Solver
        # bFixScale, include/Sim3Solver.h:45)
        self.fix_scale = fix_scale
        # post-correction cooldown: the reference skips detection for 10
        # keyframes after a closure (src/LoopClosing.cc DetectLoop's
        # mLastLoopKFid+10 guard) — back-to-back re-closures of the same
        # revisit re-correct an already-consistent map and can latch onto
        # a degenerate Sim3
        self.loop_cooldown = 10
        self.last_loop_kf = -(10**9)
        # post-loop global BA callback, set by the owning pipeline
        # (reference RunGlobalBundleAdjustment, src/LoopClosing.cc:674-819)
        self.gba_fn = None
        # seam-fusion callback fuse_fn(pt_ids, target_kf_id, radius) -> int,
        # set by the owning pipeline (reference SearchAndFuse,
        # src/LoopClosing.cc:616 — projects the loop side's map points into
        # the corrected current-side keyframes and merges duplicates). The
        # fusion is what gives the post-loop GBA cross-seam observations;
        # without it the GBA has no constraint holding the closure and
        # relaxes back to the drifted shape.
        self.fuse_fn = None

    # -- bookkeeping -------------------------------------------------------

    def add_keyframe(self, kf_id: int):
        kf = self.map.keyframes[kf_id]
        # device tree descent: the whole keyframe transforms in L gathered
        # matmuls (bow/vocabulary.py transform_device) instead of the host
        # numpy loop — this is the per-keyframe hot cost of place
        # recognition (reference ComputeBoW in ProcessNewKeyFrame)
        d_pm1 = jnp.asarray(kf.ensure_desc01(), jnp.float32) * 2 - 1
        words, bow = self.vocab.transform_device(d_pm1, jnp.asarray(kf.valid))
        kf.bow = bow
        self.db.add(kf_id, bow)

    # -- detection ---------------------------------------------------------

    def detect(self, kf_id: int) -> Optional[int]:
        """Returns a consistent loop-candidate KF id or None (reference
        DetectLoop: min-score from covisible neighbours, candidates must
        persist for `covis_consistency` consecutive detections)."""
        kf = self.map.keyframes[kf_id]
        if kf.bow is None:
            return None
        if kf_id < self.last_loop_kf + self.loop_cooldown:
            return None
        cov = self.map.covisibility_weights(kf_id)
        covisible = {k for k, w in cov.items() if w >= 15}
        neigh_scores = [
            BinaryVocabulary.score(kf.bow, self.map.keyframes[k].bow)
            for k in covisible
            if self.map.keyframes[k].bow is not None
        ]
        # neighbours may have no BoW yet (async mapping lag)
        min_score = min(neigh_scores) if neigh_scores else 0.05
        cands = self.db.detect_loop_candidates(
            kf_id, kf.bow, covisible, max(min_score, 0.01)
        )
        # temporal consistency: a candidate's covisibility group must
        # persist across consecutive keyframes
        new_consistency: Dict[int, int] = {}
        best = None
        for cand, score in cands:
            group = {cand} | set(self.map.covisibility_weights(cand))
            cnt = max(
                (self._consistency.get(g, 0) for g in group), default=0
            ) + 1
            for g in group:
                new_consistency[g] = max(new_consistency.get(g, 0), cnt)
            if cnt >= self.covis_consistency and best is None:
                best = cand
        self._consistency = new_consistency
        return best

    # -- Sim3 verification -------------------------------------------------

    def compute_sim3(self, kf_id: int, cand_id: int):
        """3D-3D Sim3 between the two keyframes' matched map points in
        their camera frames (reference ComputeSim3 -> Sim3Solver)."""
        kf = self.map.keyframes[kf_id]
        cd = self.map.keyframes[cand_id]
        # descriptor matching between features that HAVE map points
        has1 = (kf.point_idx >= 0) & kf.valid
        has2 = (cd.point_idx >= 0) & cd.valid
        if has1.sum() < self.min_matches or has2.sum() < self.min_matches:
            return None
        d1 = jnp.asarray(kf.ensure_desc01(), jnp.float32) * 2 - 1
        d2 = jnp.asarray(cd.ensure_desc01(), jnp.float32) * 2 - 1
        dist = hamming_matrix(d1, d2)
        gate = valid_gate(jnp.asarray(has1), jnp.asarray(has2))
        res = match_with_mask(dist, gate, max_dist=50.0, ratio=0.9, mutual=True)
        idx = np.asarray(res.idx)
        m1 = np.nonzero(idx >= 0)[0]
        if len(m1) < self.min_matches:
            return None
        m2 = idx[m1]
        p_w1 = self.map.pt_xyz[kf.point_idx[m1]]
        p_w2 = self.map.pt_xyz[cd.point_idx[m2]]
        # camera-frame coordinates
        pc1 = p_w1 @ kf.r_cw.T + kf.t_cw
        pc2 = p_w2 @ cd.r_cw.T + cd.t_cw
        n = len(m1)
        cap = 256
        p1 = np.zeros((cap, 3), np.float32)
        p2 = np.zeros((cap, 3), np.float32)
        v = np.zeros(cap, bool)
        p1[:n] = pc1[:cap]
        p2[:n] = pc2[:cap]
        v[:n] = True
        self.key, k = jax.random.split(self.key)
        out = sim3_ransac(
            jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(v), k,
            inlier_th=0.1, min_inliers=self.min_matches,
            fix_scale=self.fix_scale,
        )
        if not bool(out.success):
            return None
        # mono scale drift within one loop stays far from 2x; a Sim3 with
        # extreme scale is a degenerate fit (coplanar/clustered pairs),
        # not a real closure
        if not self.fix_scale and not (0.5 < float(out.s) < 2.0):
            return None
        s12 = float(out.s)
        r12 = np.asarray(out.r)
        t12 = np.asarray(out.t)
        ransac_inl = np.asarray(out.inliers)
        n_inl = int(ransac_inl.sum())
        nn = min(n, cap)
        cur_pts = self.map.keyframes[kf_id].point_idx[m1[:nn]]
        loop_pts = cd.point_idx[m2[:nn]]
        if self.cam is None:
            keep = ransac_inl[:nn]
            return (s12, r12, t12, n_inl, (cur_pts[keep], loop_pts[keep]))

        # Sim3 refinement on the matched pairs by two-way reprojection
        # (reference OptimizeSim3, src/Optimizer.cc:4589)
        from viorb_tpu.optim.sim3_refine import optimize_sim3_reproj

        uv1 = np.zeros((cap, 2), np.float32)
        uv2 = np.zeros((cap, 2), np.float32)
        uv1[:nn] = kf.xy[m1[:nn]]
        uv2[:nn] = cd.xy[m2[:nn]]
        s_r, r_r, t_r, inl = optimize_sim3_reproj(
            jnp.float32(s12), jnp.asarray(r12), jnp.asarray(t12),
            jnp.asarray(p1), jnp.asarray(uv1), jnp.asarray(p2),
            jnp.asarray(uv2), jnp.asarray(v), self.cam,
            fix_scale=self.fix_scale,
        )
        inl_np = np.asarray(inl)
        n_ref = int(inl_np.sum())
        if n_ref < self.min_matches:
            return None
        s12, r12, t12 = float(s_r), np.asarray(r_r), np.asarray(t_r)

        # guided-projection confirmation: project the candidate
        # neighborhood's map points through S12 into the current keyframe
        # and count total agreeing matches (reference ComputeSim3's
        # SearchByProjection confirm requiring >=40, src/LoopClosing.cc:255-420)
        n_proj = self._confirm_by_projection(kf, cand_id, s12, r12, t12)
        if n_proj < self.min_confirm_matches:
            return None
        keep = inl_np[:nn]
        return (s12, r12, t12, n_proj, (cur_pts[keep], loop_pts[keep]))

    def _confirm_by_projection(self, kf, cand_id: int, s12, r12, t12) -> int:
        """Count map points of the candidate's covisibility group that
        project (through S12) onto matching features of the current KF."""
        from viorb_tpu.features.matching import hamming_matrix, match_with_mask
        from viorb_tpu.geometry.camera import in_image_mask, project as cam_project

        group = [cand_id] + [
            g for g, w in self.map.covisibility_weights(cand_id).items()
            if w >= 15 and g in self.map.keyframes
        ]
        pts = self.map.local_map_points(group)
        if len(pts) == 0:
            return 0
        cap = 1024
        pts = pts[:cap]
        cd = self.map.keyframes[cand_id]
        x_w = self.map.pt_xyz[pts]
        x_cand = x_w @ cd.r_cw.T + cd.t_cw
        x_cur = (s12 * (x_cand @ r12.T) + t12).astype(np.float32)
        depth_ok = x_cur[:, 2] > 0.05
        uv = np.asarray(cam_project(self.cam, jnp.asarray(x_cur)))
        in_img = np.asarray(
            in_image_mask(self.cam, jnp.asarray(uv), margin=1.0)
        )
        pvalid = depth_ok & in_img
        if pvalid.sum() < 10:
            return 0
        d_pts = (jnp.asarray(self.map.pt_desc01[pts], jnp.bfloat16) * 2 - 1)
        d_kf = (jnp.asarray(kf.ensure_desc01(), jnp.bfloat16) * 2 - 1)
        dist = hamming_matrix(d_pts, d_kf)
        d2 = jnp.sum(
            (jnp.asarray(uv)[:, None, :] - jnp.asarray(kf.xy)[None, :, :]) ** 2,
            axis=-1,
        )
        gate = (
            jnp.asarray(pvalid)[:, None]
            & jnp.asarray(kf.valid)[None, :]
            & (d2 <= 7.5**2)
        )
        res = match_with_mask(dist, gate, max_dist=50.0, ratio=0.9, mutual=True)
        return int((np.asarray(res.idx) >= 0).sum())

    # -- correction --------------------------------------------------------

    def correct(self, kf_id: int, cand_id: int, s12, r12, t12, pairs=None):
        """Essential-graph correction (reference CorrectLoop :426-614).

        Builds the Sim3 graph over the whole keyframe set: consecutive/
        covisibility edges from current relative poses, plus the measured
        loop edge; optimizes with the loop-side fixed; writes back SE3
        poses (scale folded into translation) and rescales map points via
        their reference keyframe's correction. Then merges the seam —
        direct replacement of the Sim3-verified matched pairs plus
        projection fusion of the loop side's points into the current group
        (reference :543-556 and SearchAndFuse :616) — and finally runs the
        post-loop global BA, which the fused cross-seam observations
        anchor."""
        ids = sorted(self.map.keyframes.keys())
        slot = {k: i for i, k in enumerate(ids)}
        k = len(ids)
        s = np.ones(k, np.float32)
        r = np.stack([self.map.keyframes[i].r_cw for i in ids])
        t = np.stack([self.map.keyframes[i].t_cw for i in ids])

        # rigid propagation of the measured correction to the current KF
        # and its covisible group BEFORE graph optimization (reference
        # CorrectLoop :461-541): corrected S_cur = S12 ∘ S_cand; each group
        # member keeps its relative pose to the current KF.
        ic = slot[kf_id]
        il = slot[cand_id]
        s_corr = sim3_compose(
            jnp.asarray(np.float32(s12)), jnp.asarray(r12), jnp.asarray(t12),
            jnp.asarray(s[il]), jnp.asarray(r[il]), jnp.asarray(t[il]),
        )
        group = {kf_id} | {
            g for g, wgt in self.map.covisibility_weights(kf_id).items()
            if wgt >= 15
        }
        inv_cur_old = sim3_inverse(
            jnp.asarray(s[ic]), jnp.asarray(r[ic]), jnp.asarray(t[ic])
        )
        s_init = s.copy()
        r_init = r.copy()
        t_init = t.copy()
        for g in group:
            ig = slot[g]
            rel_g = sim3_compose(
                jnp.asarray(s[ig]), jnp.asarray(r[ig]), jnp.asarray(t[ig]),
                *inv_cur_old,
            )
            sg = sim3_compose(*rel_g, *s_corr)
            s_init[ig] = float(sg[0])
            r_init[ig] = np.asarray(sg[1])
            t_init[ig] = np.asarray(sg[2])

        ei, ej, ms, mr, mt, w = [], [], [], [], [], []

        def add_edge(a, b, weight, meas=None):
            ia, ib = slot[a], slot[b]
            if meas is None:
                # current relative: S_ba = S_b * S_a^{-1}
                inv = sim3_inverse(
                    jnp.asarray(s[ia]), jnp.asarray(r[ia]), jnp.asarray(t[ia])
                )
                meas = sim3_compose(
                    jnp.asarray(s[ib]), jnp.asarray(r[ib]), jnp.asarray(t[ib]), *inv
                )
            ei.append(ia)
            ej.append(ib)
            ms.append(float(meas[0]))
            mr.append(np.asarray(meas[1]))
            mt.append(np.asarray(meas[2]))
            w.append(weight)

        # covisibility + spanning-tree + temporal edges (the reference's
        # essential graph: spanning tree, covisibility >= 100, loop edges;
        # src/Optimizer.cc OptimizeEssentialGraph)
        seen = set()
        for a in ids:
            covw = self.map.covisibility_weights(a)
            for b, cw in covw.items():
                if cw >= 30 and (b, a) not in seen and b in slot:
                    seen.add((a, b))
                    add_edge(a, b, 1.0)
        for a in ids:
            p = self.map.keyframes[a].parent_kf
            if p in slot and (a, p) not in seen and (p, a) not in seen:
                seen.add((p, a))
                add_edge(p, a, 1.0)
        for a, b in zip(ids[:-1], ids[1:]):
            if (a, b) not in seen and (b, a) not in seen:
                add_edge(a, b, 1.0)

        # loop edge: measured S_cur_cand = S12 * S_cand (cam frames):
        # x_cur = S12 x_cand => S_cur_w(corr) = S12 ∘ S_cand_w
        # relative measurement cand->cur: S_cur * S_cand^{-1} = S12
        ei.append(slot[cand_id])
        ej.append(slot[kf_id])
        ms.append(float(s12))
        mr.append(np.asarray(r12))
        mt.append(np.asarray(t12))
        w.append(2.0)

        graph = Sim3Graph(
            edge_i=jnp.asarray(np.array(ei, np.int32)),
            edge_j=jnp.asarray(np.array(ej, np.int32)),
            meas_s=jnp.asarray(np.array(ms, np.float32)),
            meas_r=jnp.asarray(np.stack(mr)),
            meas_t=jnp.asarray(np.stack(mt)),
            weight=jnp.asarray(np.array(w, np.float32)),
        )
        # fix the loop (old) side; start from the rigidly-corrected states
        fixed = np.zeros(k, bool)
        fixed[slot[cand_id]] = True
        s_o, r_o, t_o = optimize_sim3_graph(
            jnp.asarray(s_init), jnp.asarray(r_init), jnp.asarray(t_init),
            graph, jnp.asarray(fixed), iters=40, fix_scale=self.fix_scale,
        )
        s_o = np.asarray(s_o)
        r_o = np.asarray(r_o)
        t_o = np.asarray(t_o)

        # transform map points via their first-observation keyframe's
        # correction: p' = S_new^{-1}( S_old(p) )
        pts = self.map.active_point_ids()
        for p in pts:
            ref = int(self.map.pt_first_kf[p])
            if ref not in slot:
                for q in self.map.obs_kf[p]:
                    if q >= 0 and int(q) in slot:
                        ref = int(q)
                        break
                else:
                    continue
            i = slot[ref]
            x = self.map.pt_xyz[p]
            x_cam = s[i] * (r[i] @ x) + t[i]  # old Sim3 (s=1): camera coords
            # invert new Sim3
            sn, rn, tn = s_o[i], r_o[i], t_o[i]
            x_new = (rn.T @ ((x_cam - tn) / sn))
            self.map.pt_xyz[p] = x_new

        # write back SE3 poses: R, t/s (reference :529-541)
        for kf_key, i in slot.items():
            kf = self.map.keyframes[kf_key]
            kf.r_cw = r_o[i].astype(np.float32)
            kf.t_cw = (t_o[i] / s_o[i]).astype(np.float32)
        # local map-scale change per keyframe (world distances near KF i
        # multiplied by 1/s_o[i]); the VI pipeline rescales NavState
        # velocities with this
        scale_by_kf = {kf_key: 1.0 / float(s_o[i]) for kf_key, i in slot.items()}

        # --- seam merge (reference CorrectLoop :543-556 + SearchAndFuse
        # :616): without it the only cross-seam constraint is the loop
        # edge itself, and the follow-up GBA — which sees observations
        # only — relaxes the map straight back to the drifted shape.
        if pairs is not None:
            for pc, pl in zip(*pairs):
                pc, pl = int(pc), int(pl)
                if (
                    pc >= 0 and pl >= 0 and pc != pl
                    and self.map.pt_active[pc] and self.map.pt_active[pl]
                ):
                    # the loop (old-side) point survives, as in the reference
                    self.map.replace_point(pc, pl)
        if self.fuse_fn is not None:
            loop_group = [cand_id] + [
                g for g, wgt in self.map.covisibility_weights(cand_id).items()
                if wgt >= 15 and g in self.map.keyframes
            ]
            loop_pts = self.map.local_map_points(loop_group)
            for g in sorted(group):
                if g in self.map.keyframes:
                    self.fuse_fn(loop_pts, g, 4.0)

        # post-loop global BA (reference RunGlobalBundleAdjustment,
        # src/LoopClosing.cc:674-819; spanning-tree propagation is not
        # needed here — mapping jobs are serialized, so no keyframes are
        # created while the GBA runs)
        if self.gba_fn is not None:
            self.gba_fn(cand_id, scale_by_kf)
        self.loops_closed += 1
        self.last_loop_kf = kf_id
        return True

    # -- entry -------------------------------------------------------------

    def try_close(self, kf_id: int) -> bool:
        """Detection + verification + correction for an already-registered
        keyframe."""
        cand = self.detect(kf_id)
        if cand is None:
            return False
        sim = self.compute_sim3(kf_id, cand)
        if sim is None:
            return False
        s12, r12, t12, n_inl, pairs = sim
        return self.correct(kf_id, cand, s12, r12, t12, pairs=pairs)

    def process(self, kf_id: int) -> bool:
        """Full loop-closing step for a freshly inserted keyframe."""
        self.add_keyframe(kf_id)
        return self.try_close(kf_id)
