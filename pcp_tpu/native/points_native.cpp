// Native point-cloud ops for the partition pipeline.
//
// radius_outlier_filter: exact open3d remove_radius_outlier semantics
// (keep points with >= nb neighbours within r, self excluded) — replaces
// the reference's open3d call (shen_partition_utils.py:28-55). The
// partition host has a single CPU core, so numpy formulations cost
// ~45 s at 5M points and accelerator offload pays ~1 min of remote
// compile per grid shape; this grid-hash + early-exit scan runs the same
// filter in a couple of seconds.
//
// Algorithm: quantize to cells of side r, sort point indices by cell id
// (one std::sort), then for each point scan its 27-cell neighbourhood with
// exact distance tests, stopping as soon as nb neighbours are found.
//
// ctypes ABI: all buffers caller-allocated numpy arrays.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct CellKey {
  int64_t id;
  int32_t idx;
  bool operator<(const CellKey& o) const { return id < o.id; }
};

}  // namespace

extern "C" {

// points: (n, 3) float32; keep: (n,) uint8 out. Returns 0 on success.
int radius_outlier_filter(const float* points, int64_t n, int32_t nb,
                          float radius, uint8_t* keep) {
  if (n <= 0) return 0;
  const double r = radius;
  const double r2 = r * r;

  // quantize
  double mn[3] = {points[0], points[1], points[2]};
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d)
      mn[d] = std::min(mn[d], (double)points[3 * i + d]);

  std::vector<int32_t> q(3 * n);
  int64_t dims[3] = {1, 1, 1};
  for (int64_t i = 0; i < n; ++i)
    for (int d = 0; d < 3; ++d) {
      int64_t c = (int64_t)std::floor((points[3 * i + d] - mn[d]) / r);
      q[3 * i + d] = (int32_t)c;
      dims[d] = std::max(dims[d], c + 1);
    }
  const int64_t sy = dims[2];
  const int64_t sx = dims[1] * dims[2];

  std::vector<CellKey> order(n);
  for (int64_t i = 0; i < n; ++i) {
    order[i].id = q[3 * i] * sx + q[3 * i + 1] * sy + q[3 * i + 2];
    order[i].idx = (int32_t)i;
  }
  std::sort(order.begin(), order.end());

  // segment starts per unique cell (ids sorted): binary search later
  std::vector<int64_t> uniq;
  std::vector<int64_t> start;
  uniq.reserve(n / 4);
  start.reserve(n / 4 + 1);
  for (int64_t i = 0; i < n; ++i) {
    if (i == 0 || order[i].id != order[i - 1].id) {
      uniq.push_back(order[i].id);
      start.push_back(i);
    }
  }
  start.push_back(n);
  const int64_t ncells = (int64_t)uniq.size();

  for (int64_t ci = 0; ci < ncells; ++ci) {
    const int64_t cell = uniq[ci];
    const int64_t cz = cell % dims[2];
    const int64_t cy = (cell / dims[2]) % dims[1];
    const int64_t cx = cell / sx;

    // candidate segments: the 27-neighbourhood
    int64_t seg_lo[27], seg_hi[27];
    int nseg = 0;
    for (int ox = -1; ox <= 1; ++ox) {
      const int64_t x = cx + ox;
      if (x < 0 || x >= dims[0]) continue;
      for (int oy = -1; oy <= 1; ++oy) {
        const int64_t y = cy + oy;
        if (y < 0 || y >= dims[1]) continue;
        for (int oz = -1; oz <= 1; ++oz) {
          const int64_t z = cz + oz;
          if (z < 0 || z >= dims[2]) continue;
          const int64_t id = x * sx + y * sy + z;
          auto it = std::lower_bound(uniq.begin(), uniq.end(), id);
          if (it != uniq.end() && *it == id) {
            const int64_t k = it - uniq.begin();
            seg_lo[nseg] = start[k];
            seg_hi[nseg] = start[k + 1];
            ++nseg;
          }
        }
      }
    }

    for (int64_t s = start[ci]; s < start[ci + 1]; ++s) {
      const int32_t i = order[s].idx;
      const float px = points[3 * i], py = points[3 * i + 1],
                  pz = points[3 * i + 2];
      int32_t cnt = -1;  // self will be counted once
      for (int g = 0; g < nseg && cnt < nb; ++g) {
        for (int64_t t = seg_lo[g]; t < seg_hi[g]; ++t) {
          const int32_t j = order[t].idx;
          const double dx = (double)points[3 * j] - px;
          const double dy = (double)points[3 * j + 1] - py;
          const double dz = (double)points[3 * j + 2] - pz;
          if (dx * dx + dy * dy + dz * dz <= r2) {
            if (++cnt >= nb) break;
          }
        }
      }
      keep[i] = cnt >= nb ? 1 : 0;
    }
  }
  return 0;
}

}  // extern "C"
