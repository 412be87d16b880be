// Native octree-core runtime for hpmvs_tpu.
//
// The reference's runtime skeleton (DynOctTree + CellProcessor bookkeeping,
// include/hpmvs/doctree.h, src/hpmvs/CellProcessor.cpp) is C++; this module
// provides the equivalent native hot path for the linear Morton octree in
// hpmvs_tpu/core/octree.py: batched morton coding, sorted-key membership,
// derived-structure queries (structure level / containing cell) and the
// seed conflict pushdown. Exposed with a plain C ABI and loaded via ctypes
// (hpmvs_tpu/core/native.py); the numpy implementation remains as fallback.
//
// Build: bash native/build.sh  ->  native/libhpmvs_octree.so

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>

extern "C" {

static inline uint64_t spread_bits(uint64_t v) {
  v &= 0x1FFFFFULL;
  v = (v | (v << 32)) & 0x1F00000000FFFFULL;
  v = (v | (v << 16)) & 0x1F0000FF0000FFULL;
  v = (v | (v << 8)) & 0x100F00F00F00F00FULL;
  v = (v | (v << 4)) & 0x10C30C30C30C30C3ULL;
  v = (v | (v << 2)) & 0x1249249249249249ULL;
  return v;
}

static inline uint64_t compact_bits(uint64_t v) {
  v &= 0x1249249249249249ULL;
  v = (v | (v >> 2)) & 0x10C30C30C30C30C3ULL;
  v = (v | (v >> 4)) & 0x100F00F00F00F00FULL;
  v = (v | (v >> 8)) & 0x1F0000FF0000FFULL;
  v = (v | (v >> 16)) & 0x1F00000000FFFFULL;
  v = (v | (v >> 32)) & 0x1FFFFFULL;
  return v;
}

void morton_encode(int64_t n, const int64_t* ix, const int64_t* iy,
                   const int64_t* iz, uint64_t* out) {
  for (int64_t i = 0; i < n; i++)
    out[i] = spread_bits((uint64_t)ix[i]) | (spread_bits((uint64_t)iy[i]) << 1)
           | (spread_bits((uint64_t)iz[i]) << 2);
}

void morton_decode(int64_t n, const uint64_t* keys, int64_t* ix, int64_t* iy,
                   int64_t* iz) {
  for (int64_t i = 0; i < n; i++) {
    ix[i] = (int64_t)compact_bits(keys[i]);
    iy[i] = (int64_t)compact_bits(keys[i] >> 1);
    iz[i] = (int64_t)compact_bits(keys[i] >> 2);
  }
}

// keys of points at `level` within the cube (center, width)
void keys_at_level(int64_t n, const double* pts /* (n,3) */, double cx,
                   double cy, double cz, double width, int64_t level,
                   uint64_t* out) {
  const double res = (double)(1ULL << level);
  const double cw = width / res;
  const double lx = cx - width / 2.0, ly = cy - width / 2.0,
               lz = cz - width / 2.0;
  const int64_t hi = (int64_t)res - 1;
  for (int64_t i = 0; i < n; i++) {
    int64_t ix = (int64_t)std::floor((pts[3 * i] - lx) / cw);
    int64_t iy = (int64_t)std::floor((pts[3 * i + 1] - ly) / cw);
    int64_t iz = (int64_t)std::floor((pts[3 * i + 2] - lz) / cw);
    ix = std::max<int64_t>(0, std::min(hi, ix));
    iy = std::max<int64_t>(0, std::min(hi, iy));
    iz = std::max<int64_t>(0, std::min(hi, iz));
    out[i] = spread_bits((uint64_t)ix) | (spread_bits((uint64_t)iy) << 1)
           | (spread_bits((uint64_t)iz) << 2);
  }
}

static inline bool member(const uint64_t* sorted, int64_t nk, uint64_t q,
                          int64_t* pos_out) {
  const uint64_t* p = std::lower_bound(sorted, sorted + nk, q);
  if (p < sorted + nk && *p == q) {
    if (pos_out) *pos_out = p - sorted;
    return true;
  }
  return false;
}

// structure level of each query point: 1 + deepest ancestor-set level
// containing the point (doctree `at()` leaf level; anc sets per level are
// the sorted ancestor keys of occupied cells deeper than that level)
void structure_level(int64_t nq, const uint64_t* qkeys_max /* at max_level */,
                     int64_t max_level,
                     const uint64_t* anc_flat, const int64_t* anc_off,
                     int64_t* out) {
  for (int64_t i = 0; i < nq; i++) {
    int64_t best = -1;
    for (int64_t lv = max_level; lv >= 0; lv--) {
      int64_t nk = anc_off[lv + 1] - anc_off[lv];
      if (nk == 0) continue;
      uint64_t q = qkeys_max[i] >> (uint64_t)(3 * (max_level - lv));
      if (member(anc_flat + anc_off[lv], nk, q, nullptr)) {
        best = lv;
        break;  // deeper levels already checked (descending scan)
      }
    }
    out[i] = best + 1;
  }
}

// containing occupied cell id per query point (-1 if none); occ sets are
// (sorted keys, cell ids) per level
void containing_cell(int64_t nq, const uint64_t* qkeys_max, int64_t max_level,
                     const uint64_t* occ_flat, const int64_t* occ_off,
                     const int64_t* occ_cid_flat, int64_t* out) {
  for (int64_t i = 0; i < nq; i++) {
    out[i] = -1;
    for (int64_t lv = 0; lv <= max_level; lv++) {
      int64_t nk = occ_off[lv + 1] - occ_off[lv];
      if (nk == 0) continue;
      uint64_t q = qkeys_max[i] >> (uint64_t)(3 * (max_level - lv));
      int64_t pos;
      if (member(occ_flat + occ_off[lv], nk, q, &pos)) {
        out[i] = occ_cid_flat[occ_off[lv] + pos];
        break;  // occupied cells are disjoint leaves
      }
    }
  }
}

// Merge-based variants for large batches: queries arrive SORTED by their
// max-level key (the level-lv ancestor of a sorted key sequence is itself
// sorted, so each level is one cache-friendly two-pointer sweep instead of
// nq binary searches). ~5x faster than the per-query search at 1M queries.

void structure_level_sorted(int64_t nq, const uint64_t* qkeys_max_sorted,
                            int64_t max_level, const uint64_t* anc_flat,
                            const int64_t* anc_off, int64_t* out) {
  std::memset(out, 0, nq * sizeof(int64_t));
  for (int64_t lv = max_level; lv >= 0; lv--) {
    int64_t nk = anc_off[lv + 1] - anc_off[lv];
    if (nk == 0) continue;
    const uint64_t* keys = anc_flat + anc_off[lv];
    const uint64_t shift = (uint64_t)(3 * (max_level - lv));
    int64_t j = 0;
    for (int64_t i = 0; i < nq; i++) {
      if (out[i] != 0) continue;  // deeper level already matched
      uint64_t q = qkeys_max_sorted[i] >> shift;
      while (j < nk && keys[j] < q) j++;
      if (j < nk && keys[j] == q) out[i] = lv + 1;
    }
  }
}

void containing_cell_sorted(int64_t nq, const uint64_t* qkeys_max_sorted,
                            int64_t max_level, const uint64_t* occ_flat,
                            const int64_t* occ_off,
                            const int64_t* occ_cid_flat, int64_t* out) {
  for (int64_t i = 0; i < nq; i++) out[i] = -1;
  for (int64_t lv = 0; lv <= max_level; lv++) {
    int64_t nk = occ_off[lv + 1] - occ_off[lv];
    if (nk == 0) continue;
    const uint64_t* keys = occ_flat + occ_off[lv];
    const int64_t* cid = occ_cid_flat + occ_off[lv];
    const uint64_t shift = (uint64_t)(3 * (max_level - lv));
    int64_t j = 0;
    for (int64_t i = 0; i < nq; i++) {
      if (out[i] >= 0) continue;  // leaves are disjoint: first match wins
      uint64_t q = qkeys_max_sorted[i] >> shift;
      while (j < nk && keys[j] < q) j++;
      if (j < nk && keys[j] == q) out[i] = cid[j];
    }
  }
}

// exact (level, key) lookup -> cell id or -1
void lookup_cells(int64_t nq, const int64_t* qlevels, const uint64_t* qkeys,
                  int64_t max_level, const uint64_t* occ_flat,
                  const int64_t* occ_off, const int64_t* occ_cid_flat,
                  int64_t* out) {
  for (int64_t i = 0; i < nq; i++) {
    out[i] = -1;
    int64_t lv = qlevels[i];
    if (lv < 0 || lv > max_level) continue;
    int64_t nk = occ_off[lv + 1] - occ_off[lv];
    if (nk == 0) continue;
    int64_t pos;
    if (member(occ_flat + occ_off[lv], nk, qkeys[i], &pos))
      out[i] = occ_cid_flat[occ_off[lv] + pos];
  }
}

// seed conflict pushdown (doctree add-with-width split semantics,
// doctree.h:378-394): iterate levels until no patch sits on a cell that is
// an ancestor of another patch's deeper cell. pts (n,3), io_levels updated
// in place; returns iterations used.
int64_t seed_pushdown(int64_t n, const double* pts, double cx, double cy,
                      double cz, double width, int64_t max_level,
                      int64_t* io_levels, uint64_t* out_keys) {
  // keys at max_level once
  uint64_t* kmax = new uint64_t[n];
  keys_at_level(n, pts, cx, cy, cz, width, max_level, kmax);

  uint64_t* anc = new uint64_t[n];
  int64_t iters = 0;
  for (; iters < max_level + 1; iters++) {
    bool changed = false;
    // ancestor set per level from current assignment
    for (int64_t lv = 0; lv <= max_level; lv++) {
      // collect ancestors at lv of patches with level > lv
      int64_t m = 0;
      for (int64_t i = 0; i < n; i++)
        if (io_levels[i] > lv)
          anc[m++] = kmax[i] >> (uint64_t)(3 * (max_level - lv));
      if (m == 0) continue;
      std::sort(anc, anc + m);
      int64_t u = std::unique(anc, anc + m) - anc;
      for (int64_t i = 0; i < n; i++) {
        if (io_levels[i] > lv) continue;
        uint64_t q = kmax[i] >> (uint64_t)(3 * (max_level - lv));
        if (member(anc, u, q, nullptr) && io_levels[i] < lv + 1) {
          io_levels[i] = lv + 1;
          changed = true;
        }
      }
    }
    if (!changed) break;
  }
  for (int64_t i = 0; i < n; i++)
    out_keys[i] = kmax[i] >> (uint64_t)(3 * (max_level - io_levels[i]));
  delete[] kmax;
  delete[] anc;
  return iters;
}

}  // extern "C"
