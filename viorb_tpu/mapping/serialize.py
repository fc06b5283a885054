"""Map checkpoint/resume: save/load a full MapStore as one .npz.

The reference never implemented this (include/System.h:132-134 —
``// TODO: Save/Load functions SaveMap/LoadMap``); trajectory export was its
only persistence. Here the SoA layout of MapStore makes a checkpoint
trivial: the point arrays dump as-is, and keyframes serialize as per-KF
prefixed arrays plus a packed meta table. A loaded map supports
localization-only tracking (run.py --localization-only) and resuming
mapping.
"""

from __future__ import annotations

import numpy as np

from viorb_tpu.mapping.map import KeyFrameData, MapStore

_PT_FIELDS = (
    "pt_xyz", "pt_desc01", "pt_normal", "pt_min_dist", "pt_max_dist",
    "pt_found", "pt_visible", "pt_first_kf", "pt_active", "obs_kf",
    "obs_feat",
)
_KF_ARRAYS = ("xy", "level", "angle", "desc01", "valid", "point_idx")
_NAV_KEYS = ("state_p", "state_v", "state_r", "state_bg", "state_ba",
             "state_dbg", "state_dba")


def save_map(m: MapStore, path: str, extra: dict | None = None):
    """extra: pipeline-level state (VI gravity/biases/chain, stereo bf...)
    stored under an ``x_`` prefix; load_map_extra retrieves it."""
    data = {}
    if extra:
        for k, v in extra.items():
            data["x_" + k] = np.asarray(v)
    for f in _PT_FIELDS:
        data[f] = getattr(m, f)
    data["_next_pt"] = np.int64(m._next_pt)
    data["_free_pts"] = np.asarray(m._free_pts, np.int64)
    data["_next_kf"] = np.int64(m._next_kf)
    data["max_points"] = np.int64(m.max_points)
    ids = sorted(m.keyframes)
    # id, ts, prev, next, active, imu_t0, parent
    meta = np.zeros((len(ids), 7), np.float64)
    for row, i in enumerate(ids):
        kf = m.keyframes[i]
        meta[row] = [i, kf.timestamp, kf.prev_kf, kf.next_kf,
                     float(kf.active), kf.imu_t0, kf.parent_kf]
        p = f"kf{i}_"
        data[p + "r_cw"] = kf.r_cw
        data[p + "t_cw"] = kf.t_cw
        kf.ensure_desc01()  # fulfill a deferred descriptor pull
        for f in _KF_ARRAYS:
            data[p + f] = getattr(kf, f)
        if kf.ur is not None:
            data[p + "ur"] = kf.ur
        if kf.bow is not None:
            # bow is a {word_id: weight} dict — pack to an (W,2) array
            data[p + "bow"] = np.array(
                sorted(kf.bow.items()), np.float64
            ).reshape(-1, 2)
        if kf.nav:
            if "state" in kf.nav:
                ns = kf.nav["state"]
                for name, val in zip(_NAV_KEYS,
                                     (ns.p, ns.v, ns.r, ns.bg, ns.ba,
                                      ns.dbg, ns.dba)):
                    data[p + "nav_" + name] = np.asarray(val)
            for key in ("imu_t", "imu_g", "imu_a"):
                if key in kf.nav:
                    data[p + "nav_" + key] = kf.nav[key]
    data["kf_meta"] = meta
    np.savez_compressed(path, **data)


def load_map_extra(path: str) -> dict:
    """The ``extra`` dict passed to save_map (pipeline-level state)."""
    z = np.load(path, allow_pickle=False)
    return {k[2:]: z[k] for k in z.files if k.startswith("x_")}


def load_map(path: str) -> MapStore:
    z = np.load(path, allow_pickle=False)
    m = MapStore(max_points=int(z["max_points"]))
    for f in _PT_FIELDS:
        getattr(m, f)[...] = z[f]
    m._next_pt = int(z["_next_pt"])
    m._free_pts = [int(i) for i in z["_free_pts"]]
    m._next_kf = int(z["_next_kf"])
    for row in z["kf_meta"]:
        i = int(row[0])
        p = f"kf{i}_"
        nav = None
        if p + "nav_state_p" in z:
            from viorb_tpu.imu.navstate import NavState

            ns = NavState(*(np.asarray(z[p + "nav_" + k]) for k in _NAV_KEYS))
            nav = {"state": ns}
        for key in ("imu_t", "imu_g", "imu_a"):
            if p + "nav_" + key in z:
                nav = nav or {}
                nav[key] = z[p + "nav_" + key]
        kf = KeyFrameData(
            kf_id=i, timestamp=float(row[1]),
            r_cw=z[p + "r_cw"], t_cw=z[p + "t_cw"],
            xy=z[p + "xy"], level=z[p + "level"], angle=z[p + "angle"],
            desc01=z[p + "desc01"], valid=z[p + "valid"],
            point_idx=z[p + "point_idx"],
            ur=z[p + "ur"] if p + "ur" in z else None,
            nav=nav, imu_t0=float(row[5]),
            prev_kf=int(row[2]), next_kf=int(row[3]),
            # column 6 added with the spanning tree; older checkpoints
            # predate it
            parent_kf=int(row[6]) if len(row) > 6 else -1,
            bow=(
                {int(w): float(v) for w, v in z[p + "bow"]}
                if p + "bow" in z
                else None
            ),
            active=bool(row[4]),
        )
        m.keyframes[i] = kf
    m.version += 1
    return m
