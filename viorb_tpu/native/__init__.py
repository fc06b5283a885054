"""Native (C++) host-runtime kernels, compiled at import with g++ and
bound via ctypes (pybind11 is not available in this environment). Falls
back to numpy implementations if the toolchain is unavailable."""

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "_map_index.so")
_SRC = os.path.join(_HERE, "map_index.cpp")

_lib = None


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.covis_count.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.union_points.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.build_ba_grid.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.update_point_stats.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def covis_count(pt_ids, obs_kf, exclude_kf, max_kf):
    """Counts of co-observation per keyframe id. pt_ids (n,) int64;
    obs_kf (max_points, slots) int32 contiguous."""
    lib = get_lib()
    pt_ids = np.ascontiguousarray(pt_ids, np.int64)
    out = np.zeros(max_kf, np.int32)
    if lib is None:
        for p in pt_ids:
            for k in obs_kf[p]:
                if 0 <= k < max_kf and k != exclude_kf:
                    out[k] += 1
        return out
    obs_kf = np.ascontiguousarray(obs_kf, np.int32)
    lib.covis_count(
        pt_ids.ctypes.data, len(pt_ids), obs_kf.ctypes.data,
        obs_kf.shape[1], np.int32(exclude_kf), out.ctypes.data, max_kf,
    )
    return out


def union_points(point_idx_concat, active):
    lib = get_lib()
    point_idx_concat = np.ascontiguousarray(point_idx_concat, np.int32)
    active_u8 = np.ascontiguousarray(active, np.uint8)
    out = np.zeros(len(active), np.uint8)
    if lib is None:
        sel = point_idx_concat[point_idx_concat >= 0]
        sel = sel[active[sel].astype(bool)]
        out[sel] = 1
        return out
    lib.union_points(
        point_idx_concat.ctypes.data, len(point_idx_concat),
        active_u8.ctypes.data, len(active), out.ctypes.data,
    )
    return out


def update_point_stats(
    pt_ids, obs_kf, obs_feat, desc_ptrs, level_ptrs, centers, kf_alive,
    pt_xyz, pt_desc01, pt_normal, pt_min_dist, pt_max_dist,
):
    """In-place refresh of distinctive descriptor / normal / depth range
    for the given point rows (the hot host pass of the mapping job —
    reference MapPoint::ComputeDistinctiveDescriptors +
    UpdateNormalAndDepth). Returns False when the native library is
    unavailable (caller falls back to numpy)."""
    lib = get_lib()
    if lib is None or len(pt_ids) == 0:
        return lib is not None
    pt_ids = np.ascontiguousarray(pt_ids, np.int64)
    lib.update_point_stats(
        pt_ids.ctypes.data, len(pt_ids),
        obs_kf.ctypes.data, obs_feat.ctypes.data, obs_kf.shape[1],
        desc_ptrs.ctypes.data, level_ptrs.ctypes.data,
        centers.ctypes.data, kf_alive.ctypes.data, len(kf_alive),
        pt_xyz.ctypes.data,
        pt_desc01.ctypes.data, pt_normal.ctypes.data,
        pt_min_dist.ctypes.data, pt_max_dist.ctypes.data,
    )
    return True


def build_ba_grid(
    pt_ids, obs_kf, obs_feat, slot_of_kf, xy_all, level_all,
    inv_sigma2_of_level,
):
    """Returns (kf_idx (m,R), uv (m,R,2), inv_sigma2 (m,R), valid (m,R))."""
    m = len(pt_ids)
    slots = obs_kf.shape[1]
    kf_idx = np.zeros((m, slots), np.int32)
    uv = np.zeros((m, slots, 2), np.float32)
    inv_s2 = np.ones((m, slots), np.float32)
    valid = np.zeros((m, slots), np.uint8)
    lib = get_lib()
    if lib is None or m == 0:
        for row, p in enumerate(pt_ids):
            for s in range(slots):
                k = obs_kf[p, s]
                if k < 0 or slot_of_kf[k] < 0:
                    continue
                slot = slot_of_kf[k]
                f = obs_feat[p, s]
                kf_idx[row, s] = slot
                uv[row, s] = xy_all[slot, f]
                inv_s2[row, s] = inv_sigma2_of_level[level_all[slot, f]]
                valid[row, s] = 1
        return kf_idx, uv, inv_s2, valid.astype(bool)
    pt_ids = np.ascontiguousarray(pt_ids, np.int64)
    obs_kf = np.ascontiguousarray(obs_kf, np.int32)
    obs_feat = np.ascontiguousarray(obs_feat, np.int32)
    slot_of_kf = np.ascontiguousarray(slot_of_kf, np.int32)
    xy_all = np.ascontiguousarray(xy_all, np.float32)
    level_all = np.ascontiguousarray(level_all, np.int32)
    inv_sigma2_of_level = np.ascontiguousarray(inv_sigma2_of_level, np.float32)
    lib.build_ba_grid(
        pt_ids.ctypes.data, m,
        obs_kf.ctypes.data, obs_feat.ctypes.data, slots,
        slot_of_kf.ctypes.data, len(slot_of_kf),
        xy_all.ctypes.data, level_all.ctypes.data, xy_all.shape[1],
        inv_sigma2_of_level.ctypes.data,
        kf_idx.ctypes.data, uv.ctypes.data, inv_s2.ctypes.data,
        valid.ctypes.data,
    )
    return kf_idx, uv, inv_s2, valid.astype(bool)
