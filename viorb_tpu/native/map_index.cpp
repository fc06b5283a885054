// Native map-index kernels: the host-side graph bookkeeping hot paths.
//
// The reference does all of this in C++ inside KeyFrame/MapPoint
// (reference: KeyFrame::UpdateConnections covisibility counting,
// Optimizer.cc graph assembly loops). Here the map lives in
// struct-of-arrays numpy buffers; these kernels run the per-keyframe
// Python-loop-free passes over them. Compiled with g++ at import time,
// called through ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>

extern "C" {

// Count co-observations: for each point in pt_ids, walk its observation
// slots and accumulate counts per observing keyframe (excluding one kf).
// obs_kf: (max_points, slots) int32, -1 = empty.
void covis_count(const int64_t* pt_ids, int64_t n_pts,
                 const int32_t* obs_kf, int64_t slots,
                 int32_t exclude_kf, int32_t* out_counts,
                 int64_t max_kf) {
    for (int64_t i = 0; i < n_pts; ++i) {
        const int32_t* row = obs_kf + pt_ids[i] * slots;
        for (int64_t s = 0; s < slots; ++s) {
            int32_t k = row[s];
            if (k >= 0 && k != exclude_kf && k < max_kf) {
                out_counts[k] += 1;
            }
        }
    }
}

// Mark points observed by any of the given keyframes.
// point_idx: concatenated per-kf feature->point arrays (n_kfs * n_feat).
void union_points(const int32_t* point_idx, int64_t n_entries,
                  const uint8_t* active, int64_t max_points,
                  uint8_t* out_mask) {
    for (int64_t i = 0; i < n_entries; ++i) {
        int32_t p = point_idx[i];
        if (p >= 0 && p < max_points && active[p]) {
            out_mask[p] = 1;
        }
    }
}

// Assemble the landmark-major BA observation grid.
// For each selected point row, scan its observation slots; if the
// observing keyframe is in the window (slot_of_kf[kf] >= 0), emit
// kf-slot, uv (gathered from per-kf keypoint arrays), inv_sigma2
// (from per-kf levels) and validity.
//  pt_ids: (m,) selected point ids
//  obs_kf/obs_feat: (max_points, slots)
//  slot_of_kf: (max_kf,) int32, -1 if not in window
//  kf_xy: (n_kfs_total_padded) flattened as kf_rows x n_feat x 2 where
//         kf_rows indexes by slot_of_kf value? -> we pass per-kf arrays
//         via a flat buffer: xy_all (n_window_kfs, n_feat, 2) and
//         level_all (n_window_kfs, n_feat), indexed by slot.
void build_ba_grid(const int64_t* pt_ids, int64_t m,
                   const int32_t* obs_kf, const int32_t* obs_feat,
                   int64_t slots,
                   const int32_t* slot_of_kf, int64_t max_kf,
                   const float* xy_all, const int32_t* level_all,
                   int64_t n_feat,
                   const float* inv_sigma2_of_level,
                   int32_t* out_kf_idx, float* out_uv,
                   float* out_inv_sigma2, uint8_t* out_valid) {
    for (int64_t row = 0; row < m; ++row) {
        const int32_t* okf = obs_kf + pt_ids[row] * slots;
        const int32_t* oft = obs_feat + pt_ids[row] * slots;
        for (int64_t s = 0; s < slots; ++s) {
            int64_t o = row * slots + s;
            int32_t k = okf[s];
            if (k < 0 || k >= max_kf) continue;
            int32_t slot = slot_of_kf[k];
            if (slot < 0) continue;
            int32_t f = oft[s];
            out_kf_idx[o] = slot;
            out_uv[o * 2 + 0] = xy_all[(slot * n_feat + f) * 2 + 0];
            out_uv[o * 2 + 1] = xy_all[(slot * n_feat + f) * 2 + 1];
            out_inv_sigma2[o] = inv_sigma2_of_level[level_all[slot * n_feat + f]];
            out_valid[o] = 1;
        }
    }
}

}  // extern "C"
