// Pure compute core of the host IO / plan engine — no Python or numpy
// dependencies, so a standalone TSAN harness (scripts/tsan_hostio.cpp) can
// link it directly (SURVEY.md §5.2: the threaded host pipeline must be
// TSAN-clean).  Included by io/_hostio.cpp for the CPython extension.
#pragma once

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace hostio_core {

constexpr long kTileT = 128;
constexpr long kStartAlign = 16;
constexpr long kAnchorA = 128;
constexpr long kPlanR = 384;  // _padded_table pad: round_up(cap,128)+PLAN_R

struct PlanShape {
  long window_r;
  long overflow_cap;
};

struct LevelData {
  // sorted unique linear keys of live sites + unlinearized coords
  std::vector<int64_t> keys;
  std::vector<int32_t> coords;  // [n, 3]
  int64_t dropped = 0;          // unique sites lost to the level capacity
};

struct SidecarOut {
  std::vector<int32_t> src, dst, kk;
  int64_t total = 0;  // pre-cap count
};

// One plan: queries = q_coords rows (+offsets), table = `table` level.
// Writes start[tiles*K] and appends overflow pairs.
// Largest window start the CONV kernel may use: its table array is the
// level's [B, cap, C] tensor itself (16-rounded when cap isn't aligned),
// NOT the plan-staging npad — windows must satisfy start + r <= that
// length.  Clamping left preserves exactness: matches sit at positions
// < n_active <= cap, so a left-shifted window still covers them, and the
// in-window test below runs AFTER the clamp.
inline long conv_max_start(long table_cap, long window_r) {
  auto r16 = [](long x) { return (x + 15) / 16 * 16; };
  long len = std::max(r16(table_cap), r16(window_r));
  return len - window_r;
}

void build_plan_one(const LevelData& table, const int64_t* grid,
                    const int32_t* q_coords, long n_q, long q_cap,
                    const long* offs, long k, const long* scale,
                    long npad, const PlanShape& ps, int32_t* start_out,
                    SidecarOut* sc, long table_cap) {
  const long n_tiles = (q_cap + kTileT - 1) / kTileT;
  const long max_start = conv_max_start(table_cap, ps.window_r);
  const int64_t n_tab = int64_t(table.keys.size());
  const int64_t g1 = grid[1], g2 = grid[2];
  std::vector<int64_t> match_pos(n_q);
  // temp per-offset match positions (-1 = no match / invalid)
  for (long kk_i = 0; kk_i < k; ++kk_i) {
    const long d0 = offs[kk_i * 3 + 0], d1 = offs[kk_i * 3 + 1],
               d2 = offs[kk_i * 3 + 2];
    int64_t j = 0;
    for (long i = 0; i < n_q; ++i) {
      const int32_t* c = q_coords + i * 3;
      long q0 = long(c[0]) * scale[0] + d0;
      long q1 = long(c[1]) * scale[1] + d1;
      long q2 = long(c[2]) * scale[2] + d2;
      if (c[0] < 0 || q0 < 0 || q0 >= grid[0] || q1 < 0 || q1 >= grid[1] ||
          q2 < 0 || q2 >= grid[2]) {
        match_pos[i] = -1;
        continue;
      }
      int64_t q = (int64_t(q0) * g1 + q1) * g2 + q2;
      while (j < n_tab && table.keys[size_t(j)] < q) ++j;
      // queries are monotone in i for a fixed offset, but reset j cheaply
      // if we've overshot (can happen after an invalid gap): keys sorted.
      if (j > 0 && j <= n_tab && (j == n_tab || table.keys[size_t(j)] > q) &&
          table.keys[size_t(j - 1)] >= q) {
        // binary search fallback (rare: monotonicity broken by bounds skips)
        j = std::lower_bound(table.keys.begin(), table.keys.end(), q) -
            table.keys.begin();
      }
      match_pos[i] =
          (j < n_tab && table.keys[size_t(j)] == q) ? int64_t(j) : -1;
    }
    // per-tile exact start + overflow pairs
    for (long t = 0; t < n_tiles; ++t) {
      long lo = t * kTileT, hi = std::min(lo + kTileT, n_q);
      int64_t mn = -1;
      for (long i = lo; i < hi; ++i)
        if (match_pos[i] >= 0 && (mn < 0 || match_pos[i] < mn))
          mn = match_pos[i];
      long st = 0;
      if (mn >= 0) {
        st = long(mn) / kStartAlign * kStartAlign;
        if (st > max_start) st = max_start;
        if (st < 0) st = 0;
      }
      start_out[t * k + kk_i] = int32_t(st);
      if (mn >= 0) {
        for (long i = lo; i < hi; ++i) {
          int64_t p = match_pos[i];
          if (p < 0 || (p >= st && p < st + ps.window_r)) continue;
          ++sc->total;
          if (long(sc->src.size()) < ps.overflow_cap) {
            sc->src.push_back(int32_t(p));
            sc->dst.push_back(int32_t(i));
            sc->kk.push_back(int32_t(kk_i));
          }
        }
      }
    }
  }
}

void enumerate_offsets(const long* ksize, bool centered,
                       std::vector<long>* out) {
  long lo[3], hi[3];
  for (int d = 0; d < 3; ++d) {
    if (centered) {
      lo[d] = -(ksize[d] / 2);
      hi[d] = ksize[d] / 2;
    } else {
      lo[d] = 0;
      hi[d] = ksize[d] - 1;
    }
  }
  for (long a = lo[0]; a <= hi[0]; ++a)
    for (long b = lo[1]; b <= hi[1]; ++b)
      for (long c = lo[2]; c <= hi[2]; ++c) {
        out->push_back(a);
        out->push_back(b);
        out->push_back(c);
      }
}

long round_up(long x, long m) { return (x + m - 1) / m * m; }

// Build the sorted level-0 site list from a padded coords block.
LevelData level0_from_coords(const int32_t* coords, long cap,
                             const int64_t* grid) {
  LevelData out;
  std::vector<std::pair<int64_t, long>> rows;
  rows.reserve(size_t(cap));
  for (long i = 0; i < cap; ++i) {
    const int32_t* c = coords + i * 3;
    if (c[0] < 0 || c[1] < 0 || c[2] < 0) continue;
    int64_t key = (int64_t(c[0]) * grid[1] + c[1]) * grid[2] + c[2];
    rows.emplace_back(key, i);
  }
  std::sort(rows.begin(), rows.end());
  out.keys.reserve(rows.size());
  out.coords.reserve(rows.size() * 3);
  for (auto& kv : rows) {
    out.keys.push_back(kv.first);
    const int32_t* c = coords + kv.second * 3;
    out.coords.insert(out.coords.end(), {c[0], c[1], c[2]});
  }
  return out;
}

// unique(coords // stride) under the child capacity (lowest keys kept).
LevelData downsample_level(const LevelData& parent, const long* stride,
                           const int64_t* grid, const int64_t* child_grid,
                           long child_cap) {
  LevelData out;
  std::vector<int64_t> child;
  child.reserve(parent.keys.size());
  const long n = long(parent.coords.size() / 3);
  for (long i = 0; i < n; ++i) {
    const int32_t* c = parent.coords.data() + i * 3;
    int64_t k = (int64_t(c[0] / stride[0]) * child_grid[1] +
                 c[1] / stride[1]) *
                    child_grid[2] +
                c[2] / stride[2];
    child.push_back(k);
  }
  std::sort(child.begin(), child.end());
  child.erase(std::unique(child.begin(), child.end()), child.end());
  int64_t total = int64_t(child.size());
  if (long(child.size()) > child_cap) child.resize(size_t(child_cap));
  out.dropped = total - int64_t(child.size());
  out.keys = child;
  out.coords.reserve(child.size() * 3);
  for (int64_t k : child) {
    int64_t rem = k;
    int32_t c2 = int32_t(rem % child_grid[2]);
    rem /= child_grid[2];
    int32_t c1 = int32_t(rem % child_grid[1]);
    rem /= child_grid[1];
    out.coords.insert(out.coords.end(), {int32_t(rem), c1, c2});
  }
  return out;
}

struct PlanResult {
  std::vector<int32_t> start;  // [tiles, K]
  SidecarOut sc;
};

// Everything one event needs: pyramid + all plans.
struct EventPlans {
  std::vector<LevelData> levels;
  std::vector<PlanResult> series;   // depth+1 (kernel k at each level)
  PlanResult initial;               // level 0, initial kernel
  std::vector<PlanResult> down_f;   // depth (queries=child, table=parent)
  std::vector<PlanResult> down_r;   // depth (queries=parent rows into child)
};

// series_kernels: [depth+1][3] per-level kernels (2D multiplane models
// switch from plane-shared [1,k,k] to cross-plane [3,k,k] kernels at
// plane_merge_depth — reference sparseresnet.py:194-334).
void build_event_plans(const int32_t* coords0, long cap0,
                       const int64_t* grid_in, const long* caps, long depth,
                       const long* initial_kernel, const long* series_kernels,
                       const long* stride, const PlanShape* series_ps,
                       const PlanShape& initial_ps, const PlanShape* down_ps,
                       long window_r_rev, EventPlans* ev) {
  const long one[3] = {1, 1, 1};
  std::vector<int64_t> grids((depth + 1) * 3);
  for (int d = 0; d < 3; ++d) grids[d] = grid_in[d];
  for (long l = 1; l <= depth; ++l)
    for (int d = 0; d < 3; ++d)
      grids[l * 3 + d] =
          (grids[(l - 1) * 3 + d] + stride[d] - 1) / stride[d];

  ev->levels.resize(depth + 1);
  ev->levels[0] = level0_from_coords(coords0, cap0, grids.data());
  for (long l = 1; l <= depth; ++l)
    ev->levels[l] = downsample_level(ev->levels[l - 1], stride,
                                     grids.data() + (l - 1) * 3,
                                     grids.data() + l * 3, caps[l]);

  std::vector<long> i_offs, d_offs;
  enumerate_offsets(initial_kernel, true, &i_offs);
  enumerate_offsets(stride, false, &d_offs);
  const long ki = long(i_offs.size() / 3), kd = long(d_offs.size() / 3);

  ev->series.resize(depth + 1);
  ev->down_f.resize(depth);
  ev->down_r.resize(depth);
  for (long l = 0; l <= depth; ++l) {
    const LevelData& lv = ev->levels[l];
    const long cap = caps[l];
    const long npad = round_up(cap, kAnchorA) + kPlanR;
    const long n_tiles = (cap + kTileT - 1) / kTileT;
    std::vector<long> s_offs;
    enumerate_offsets(series_kernels + l * 3, true, &s_offs);
    const long ks = long(s_offs.size() / 3);
    ev->series[l].start.assign(size_t(n_tiles * ks), 0);
    build_plan_one(lv, grids.data() + l * 3, lv.coords.data(),
                   long(lv.keys.size()), cap, s_offs.data(), ks, one, npad,
                   series_ps[l], ev->series[l].start.data(),
                   &ev->series[l].sc, cap);
    if (l == 0) {
      ev->initial.start.assign(size_t(n_tiles * ki), 0);
      build_plan_one(lv, grids.data(), lv.coords.data(),
                     long(lv.keys.size()), cap, i_offs.data(), ki, one, npad,
                     initial_ps, ev->initial.start.data(), &ev->initial.sc,
                     cap);
    }
    if (l < depth) {
      const LevelData& ch = ev->levels[l + 1];
      const long ch_cap = caps[l + 1];
      const long ch_tiles = (ch_cap + kTileT - 1) / kTileT;
      // forward: queries from child sites scaled by stride into parent table
      ev->down_f[l].start.assign(size_t(ch_tiles * kd), 0);
      const long scale[3] = {stride[0], stride[1], stride[2]};
      build_plan_one(lv, grids.data() + l * 3, ch.coords.data(),
                     long(ch.keys.size()), ch_cap, d_offs.data(), kd, scale,
                     npad, down_ps[l], ev->down_f[l].start.data(),
                     &ev->down_f[l].sc, cap);
      // reverse: one live column per parent row — its parent cell's key in
      // the child table at the row's intra-cell offset.  Mimic via a
      // per-column query walk (queries monotone within a column).
      const long ch_npad = round_up(ch_cap, kAnchorA) + kPlanR;
      ev->down_r[l].start.assign(size_t(n_tiles * kd), 0);
      const long n_par = long(lv.keys.size());
      std::vector<int64_t> mpos(n_par);
      const int64_t* cg = grids.data() + (l + 1) * 3;
      for (long kk_i = 0; kk_i < kd; ++kk_i) {
        int64_t j = 0;
        for (long i = 0; i < n_par; ++i) {
          const int32_t* c = lv.coords.data() + i * 3;
          long r0 = c[0] % stride[0], r1 = c[1] % stride[1],
               r2 = c[2] % stride[2];
          long off_id = (r0 * stride[1] + r1) * stride[2] + r2;
          if (off_id != kk_i) {
            mpos[i] = -1;
            continue;
          }
          int64_t q = (int64_t(c[0] / stride[0]) * cg[1] + c[1] / stride[1]) *
                          cg[2] +
                      c[2] / stride[2];
          while (j < int64_t(ch.keys.size()) && ch.keys[size_t(j)] < q) ++j;
          mpos[i] = (j < int64_t(ch.keys.size()) && ch.keys[size_t(j)] == q)
                        ? j
                        : -1;
        }
        for (long t = 0; t < n_tiles; ++t) {
          long lo2 = t * kTileT, hi2 = std::min(lo2 + kTileT, n_par);
          int64_t mn = -1;
          for (long i = lo2; i < hi2; ++i)
            if (mpos[i] >= 0 && (mn < 0 || mpos[i] < mn)) mn = mpos[i];
          long st = 0;
          if (mn >= 0) {
            st = long(mn) / kStartAlign * kStartAlign;
            if (st > conv_max_start(ch_cap, window_r_rev))
              st = conv_max_start(ch_cap, window_r_rev);
            if (st < 0) st = 0;
          }
          ev->down_r[l].start[size_t(t * kd + kk_i)] = int32_t(st);
          if (mn >= 0) {
            for (long i = lo2; i < hi2; ++i) {
              int64_t p = mpos[i];
              if (p < 0 || (p >= st && p < st + window_r_rev))
                continue;
              ++ev->down_r[l].sc.total;
              if (long(ev->down_r[l].sc.src.size()) <
                  down_ps[l].overflow_cap) {
                ev->down_r[l].sc.src.push_back(int32_t(p));
                ev->down_r[l].sc.dst.push_back(int32_t(i));
                ev->down_r[l].sc.kk.push_back(int32_t(kk_i));
              }
            }
          }
        }
      }
    }
  }
}


}  // namespace hostio_core
