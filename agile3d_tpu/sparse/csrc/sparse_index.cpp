// Native sparse-index runtime: voxel quantization + kernel-map building.
//
// Host-side counterpart of MinkowskiEngine's C++ CoordinateManager
// (reference models/modules/common.py:125-188, engine.py:47): an
// open-addressing hash map over packed (batch,x,y,z) keys provides
// first-occurrence voxel dedup and per-offset neighbor lookups. The packed
// key layout matches agile3d_tpu/sparse/quantize.pack_coords (19 bits per
// signed coordinate, batch above bit 57) so the numpy fallback and this
// fast path are bit-identical.
//
// Exposed via ctypes (agile3d_tpu/sparse/native.py); built with
//   g++ -O3 -march=native -shared -fPIC sparse_index.cpp -o libsparse_index.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int COORD_BITS = 19;
constexpr int64_t COORD_OFFSET = 1LL << (COORD_BITS - 1);
constexpr int64_t COORD_MAX = (1LL << COORD_BITS) - 1;
constexpr uint64_t EMPTY = ~0ULL;

inline uint64_t mix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ULL;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
  return x ^ (x >> 31);
}

// MARGIN keeps a guard band at the field edges so that adding a small
// kernel offset to a packed key can never carry into the neighboring bit
// field (required for the additive-delta merge in agile3d_neighbor_map).
constexpr int64_t MARGIN = 4;

inline int64_t pack(int32_t b, int32_t x, int32_t y, int32_t z) {
  int64_t px = (int64_t)x + COORD_OFFSET;
  int64_t py = (int64_t)y + COORD_OFFSET;
  int64_t pz = (int64_t)z + COORD_OFFSET;
  if (px < MARGIN || px > COORD_MAX - MARGIN || py < MARGIN ||
      py > COORD_MAX - MARGIN || pz < MARGIN || pz > COORD_MAX - MARGIN)
    return -1;  // out of packable range
  return ((int64_t)b << (3 * COORD_BITS)) | (px << (2 * COORD_BITS)) |
         (py << COORD_BITS) | pz;
}

// Open-addressing hash map: key -> first row index.
struct IndexMap {
  std::vector<uint64_t> keys;
  std::vector<int32_t> vals;
  uint64_t mask;

  explicit IndexMap(size_t n) {
    size_t cap = 16;
    while (cap < 2 * n) cap <<= 1;
    keys.assign(cap, EMPTY);
    vals.assign(cap, -1);
    mask = cap - 1;
  }

  // Insert if absent; returns the stored row (existing or `row`).
  int32_t insert(uint64_t key, int32_t row) {
    uint64_t h = mix64(key) & mask;
    for (;;) {
      if (keys[h] == EMPTY) {
        keys[h] = key;
        vals[h] = row;
        return row;
      }
      if (keys[h] == key) return vals[h];
      h = (h + 1) & mask;
    }
  }

  int32_t find(uint64_t key) const {
    uint64_t h = mix64(key) & mask;
    for (;;) {
      if (keys[h] == EMPTY) return -1;
      if (keys[h] == key) return vals[h];
      h = (h + 1) & mask;
    }
  }
};

}  // namespace

// Sort provisional ids by packed key (the sorted-row invariant both
// agile3d_quantize and agile3d_stride_down must emit): order[r] = the
// provisional id holding sorted rank r; rank[p] = sorted rank of id p.
static void sort_ranks(const std::vector<int64_t>& prov_key,
                       std::vector<int32_t>& order,
                       std::vector<int32_t>& rank) {
  const int64_t n = (int64_t)prov_key.size();
  order.resize((size_t)n);
  rank.resize((size_t)n);
  for (int64_t i = 0; i < n; ++i) order[i] = (int32_t)i;
  std::sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    return prov_key[a] < prov_key[b];
  });
  for (int64_t r = 0; r < n; ++r) rank[order[r]] = (int32_t)r;
}


extern "C" {

// Quantize float points to voxels with dedup; voxel rows come out SORTED
// by packed key (z-minor lexicographic) — the strip-gather invariant
// (see agile3d_tpu/sparse/quantize.py module docstring). unique_map picks
// each voxel's first point in point order.
// coords [n,3] row-major; outputs: vox [n,3] (first n_unique rows used),
// unique_map [n], inverse_map [n]. Returns n_unique, or -1 on
// out-of-range coordinates.
int64_t agile3d_quantize(const float* coords, int64_t n, double qsize,
                         int32_t* vox, int64_t* unique_map,
                         int64_t* inverse_map) {
  IndexMap map((size_t)n);
  std::vector<int32_t> vx(3 * n);
  for (int64_t i = 0; i < n; ++i) {
    vx[3 * i + 0] = (int32_t)std::floor(coords[3 * i + 0] / qsize);
    vx[3 * i + 1] = (int32_t)std::floor(coords[3 * i + 1] / qsize);
    vx[3 * i + 2] = (int32_t)std::floor(coords[3 * i + 2] / qsize);
  }
  // Pass 1: first-occurrence dedup with provisional ids.
  std::vector<int64_t> prov_key;
  std::vector<int64_t> prov_first;
  prov_key.reserve((size_t)n);
  prov_first.reserve((size_t)n);
  int64_t n_unique = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t key = pack(0, vx[3 * i], vx[3 * i + 1], vx[3 * i + 2]);
    if (key < 0) return -1;
    int32_t row = map.insert((uint64_t)key, (int32_t)n_unique);
    if (row == (int32_t)n_unique) {
      prov_key.push_back(key);
      prov_first.push_back(i);
      ++n_unique;
    }
    inverse_map[i] = row;  // provisional id, remapped below
  }
  // Pass 2: sort voxels by key; remap provisional ids to sorted ranks.
  std::vector<int32_t> order, rank;
  sort_ranks(prov_key, order, rank);
  for (int64_t r = 0; r < n_unique; ++r) {
    const int32_t p = order[r];
    const int64_t src = prov_first[p];
    vox[3 * r + 0] = vx[3 * src + 0];
    vox[3 * r + 1] = vx[3 * src + 1];
    vox[3 * r + 2] = vx[3 * src + 2];
    unique_map[r] = src;
  }
  for (int64_t i = 0; i < n; ++i) inverse_map[i] = rank[inverse_map[i]];
  return n_unique;
}

// Neighbor gather map: out[i*k + j] = row of grid[i] + offsets[j], else -1.
//
// Sorted two-pointer merge instead of hash probes: for a fixed offset every
// query key is the same constant shift of a sorted sequence, so
// present/absent resolves in one sequential co-scan per offset (O(K*N)
// streaming reads, no cache-missing probe chains — the Minuet-style sorted
// lookup). Two layouts of the same algorithm:
//
//   * FAST PATH (input rows already sorted by packed key — the sorted-row
//     invariant every pyramid level upholds, sparse/quantize.py): skip the
//     sort entirely, fold each z-run of offsets (same (dx,dy), consecutive
//     dz — consecutive PACKED KEYS, since z is the low field and MARGIN
//     guards the carry) into ONE co-scan, and emit rows in row-major order
//     so the [n, k] writes are sequential (the per-offset layout writes
//     with a 4*k-byte stride — one cache miss per element at k=125, which
//     dominated the profile at KITTI scale).
//   * LEGACY PATH (unsorted input): sort (key, row) pairs first, then the
//     per-offset co-scan.
//
// Returns -1 on out-of-range coordinates.
int64_t agile3d_neighbor_map(const int32_t* grid, const int32_t* batch,
                             int64_t n, const int32_t* offsets, int64_t k,
                             int32_t* out) {
  std::vector<int64_t> keys((size_t)n);
  bool is_sorted = true;
  for (int64_t i = 0; i < n; ++i) {
    int64_t key = pack(batch[i], grid[3 * i], grid[3 * i + 1], grid[3 * i + 2]);
    if (key < 0) return -1;
    keys[i] = key;
    if (i > 0 && key <= keys[i - 1]) is_sorted = false;
  }

  auto delta = [&](int64_t j) {
    return (int64_t)offsets[3 * j] * (1LL << (2 * COORD_BITS)) +
           (int64_t)offsets[3 * j + 1] * (1LL << COORD_BITS) +
           (int64_t)offsets[3 * j + 2];
  };

  if (is_sorted) {
    // Group offsets into maximal z-runs: same (dx, dy), dz ascending by 1.
    struct Grp {
      int64_t j0, m, d;
    };
    std::vector<Grp> grps;
    for (int64_t j = 0; j < k; ++j) {
      if (!grps.empty()) {
        Grp& g = grps.back();
        const int64_t p = g.j0 + g.m - 1;
        if (offsets[3 * j] == offsets[3 * p] &&
            offsets[3 * j + 1] == offsets[3 * p + 1] &&
            offsets[3 * j + 2] == offsets[3 * p + 2] + 1) {
          ++g.m;
          continue;
        }
      }
      grps.push_back({j, 1, delta(j)});
    }
    std::vector<int64_t> t(grps.size(), 0);
    for (int64_t q = 0; q < n; ++q) {
      int32_t* orow = out + q * k;
      const int64_t base = keys[q];
      for (size_t gi = 0; gi < grps.size(); ++gi) {
        const Grp& g = grps[gi];
        const int64_t want = base + g.d;
        int64_t& tg = t[gi];
        while (tg < n && keys[tg] < want) ++tg;
        int64_t p = tg;  // intra-run scan: intermediate absent cells shift
                         // later present cells to EARLIER positions
        for (int64_t i = 0; i < g.m; ++i) {
          const int64_t w = want + i;
          while (p < n && keys[p] < w) ++p;
          orow[g.j0 + i] = (p < n && keys[p] == w) ? (int32_t)p : -1;
        }
      }
    }
    return 0;
  }

  // Legacy path: unsorted input (tests / ad-hoc callers).
  struct KeyRow {
    int64_t key;
    int32_t row;
  };
  std::vector<KeyRow> sorted((size_t)n);
  for (int64_t i = 0; i < n; ++i) sorted[i] = {keys[i], (int32_t)i};
  std::sort(sorted.begin(), sorted.end(),
            [](const KeyRow& a, const KeyRow& b) { return a.key < b.key; });
  for (int64_t j = 0; j < k; ++j) {
    const int64_t d = delta(j);
    int64_t t = 0;
    for (int64_t q = 0; q < n; ++q) {
      const int64_t want = sorted[q].key + d;
      while (t < n && sorted[t].key < want) ++t;
      out[(int64_t)sorted[q].row * k + j] =
          (t < n && sorted[t].key == want) ? sorted[t].row : -1;
    }
  }
  return 0;
}

// Stride-2 transition: coarse grid SORTED by packed (batch,x,y,z) key (the
// strip-gather invariant — floor(g/2) does not preserve lexicographic order,
// so the coarse level is re-sorted), parent row and kernel-2 element per
// fine voxel, and the inverse down map (down[coarse*8 + elem] = fine row,
// -1 absent). Returns n_coarse or -1.
int64_t agile3d_stride_down(const int32_t* grid, const int32_t* batch,
                            int64_t n, int32_t* coarse_grid,
                            int32_t* coarse_batch, int32_t* parent,
                            int32_t* child_off, int32_t* down) {
  IndexMap map((size_t)n);
  std::vector<int64_t> prov_key;
  std::vector<int64_t> prov_first;
  prov_key.reserve((size_t)n);
  prov_first.reserve((size_t)n);
  int64_t n_coarse = 0;
  for (int64_t i = 0; i < n; ++i) {
    // arithmetic shift = floor division for negatives (matches numpy >>)
    int32_t cx = grid[3 * i] >> 1, cy = grid[3 * i + 1] >> 1,
            cz = grid[3 * i + 2] >> 1;
    int64_t key = pack(batch[i], cx, cy, cz);
    if (key < 0) return -1;
    int32_t row = map.insert((uint64_t)key, (int32_t)n_coarse);
    if (row == (int32_t)n_coarse) {
      prov_key.push_back(key);
      prov_first.push_back(i);
      ++n_coarse;
    }
    parent[i] = row;  // provisional id, remapped below
    // kernel-2 element enumeration order: x slowest (kernel_offsets(2))
    child_off[i] = ((grid[3 * i] & 1) << 2) | ((grid[3 * i + 1] & 1) << 1) |
                   (grid[3 * i + 2] & 1);
  }
  std::vector<int32_t> order, rank;
  sort_ranks(prov_key, order, rank);
  for (int64_t r = 0; r < n_coarse; ++r) {
    const int32_t p = order[r];
    const int64_t src = prov_first[p];
    coarse_grid[3 * r + 0] = grid[3 * src] >> 1;
    coarse_grid[3 * r + 1] = grid[3 * src + 1] >> 1;
    coarse_grid[3 * r + 2] = grid[3 * src + 2] >> 1;
    coarse_batch[r] = batch[src];
  }
  for (int64_t i = 0; i < n; ++i) parent[i] = rank[parent[i]];
  for (int64_t j = 0; j < n_coarse * 8; ++j) down[j] = -1;
  for (int64_t i = 0; i < n; ++i)
    down[(int64_t)parent[i] * 8 + child_off[i]] = (int32_t)i;
  return n_coarse;
}

// Band planning for the banded windowed-gather Mosaic conv
// (ops/banded_conv.banded_prep): single-streaming-pass equivalent of the
// numpy multi-pass version (which allocates ~6 full [n, k] intermediates —
// the dominant host cost at KITTI scale on this 1-core box).
//
// nbr [n, k] neighbor rows (-1 absent/pad); n % (block_m * sub) == 0 and
// max(sub_ws) <= w_eff are checked by the Python caller. Outputs:
//   w0_t [n / (block_m*sub)]   window starts / 32
//   lo_p [n / block_m, kpad]   band starts / 32 (cols >= k zero)
//   exc  [exc_cap, 2]          out-of-band (row, offset), -1-padded
// Returns the TOTAL exception count (may exceed exc_cap — caller falls
// back), or -1 on bad arguments.
int64_t agile3d_band_plan(const int32_t* nbr, int64_t n, int64_t k,
                          int64_t block_m, int64_t sub, int64_t w_eff,
                          const int32_t* sub_ws, int64_t kpad,
                          int64_t exc_cap, int32_t* w0_t, int32_t* lo_p,
                          int32_t* exc) {
  if (n % (block_m * sub) || kpad < k) return -1;
  const int32_t BIG = 1 << 30;
  const int64_t sb_rows = block_m * sub;
  const int64_t n_sb = n / sb_rows;
  std::vector<int32_t> lo((size_t)k);
  for (int64_t e = 0; e < exc_cap; ++e) exc[2 * e] = exc[2 * e + 1] = -1;
  int64_t n_exc = 0;
  for (int64_t s = 0; s < n_sb; ++s) {
    const int32_t* sb = nbr + s * sb_rows * k;
    // pass 1: superblock min over all offsets -> shared window start
    int32_t gmin = BIG;
    for (int64_t i = 0; i < sb_rows * k; ++i) {
      const int32_t c = sb[i];
      if (c >= 0 && c < gmin) gmin = c;
    }
    if (gmin == BIG) gmin = 0;
    int32_t w0 = (gmin / 32) * 32;
    if (w0 > (int32_t)(n - w_eff)) w0 = (int32_t)(n - w_eff);
    if (w0 < 0) w0 = 0;
    w0_t[s] = w0 / 32;
    for (int64_t b = 0; b < sub; ++b) {
      const int32_t* blk = sb + b * block_m * k;
      // pass 2: per-offset band start within this 128-row block
      for (int64_t j = 0; j < k; ++j) lo[j] = BIG;
      for (int64_t m = 0; m < block_m; ++m)
        for (int64_t j = 0; j < k; ++j) {
          const int32_t c = blk[m * k + j];
          if (c >= 0 && c - w0 < lo[j]) lo[j] = c - w0;
        }
      int32_t* lrow = lo_p + (s * sub + b) * kpad;
      for (int64_t j = 0; j < k; ++j) {
        int32_t l = lo[j] == BIG ? 0 : (lo[j] / 32) * 32;
        const int32_t hi = (int32_t)(w_eff - sub_ws[j]);
        if (l > hi) l = hi;
        if (l < 0) l = 0;
        lo[j] = l;
        lrow[j] = l / 32;
      }
      for (int64_t j = k; j < kpad; ++j) lrow[j] = 0;
      // pass 3: out-of-band exceptions (row-major order — the conv's
      // sorted scatter-add relies on ascending rows)
      for (int64_t m = 0; m < block_m; ++m)
        for (int64_t j = 0; j < k; ++j) {
          const int32_t c = blk[m * k + j];
          if (c < 0) continue;
          const int32_t rel = c - w0 - lo[j];
          if (rel < 0 || rel >= sub_ws[j]) {
            if (n_exc < exc_cap) {
              exc[2 * n_exc] = (int32_t)((s * sub + b) * block_m + m);
              exc[2 * n_exc + 1] = (int32_t)j;
            }
            ++n_exc;
          }
        }
    }
  }
  return n_exc;
}

// Band + strip planning for the banded STEM kernel
// (ops/banded_stem.stem_banded_prep). k5 [n, ng*kz] cell map, offsets
// (dx,dy)-major with dz fastest, so group g's kz cells are consecutive
// columns. Outputs:
//   w0_t  [n / (block_m*sub)]      window starts / 32
//   lo_p  [n / block_m, 32]        band starts / 32 (cols >= ng zero)
//   r0_p  [n, 32]                  strip-start row per group (-1 absent)
//   rank_p [n, 32*16] int8         per-lane cell rank: lane g*16 + j*3 + c
//                                  = rank of cell j (reps=3 cin lanes)
//   exc   [exc_cap, 2 + kz]        out-of-band (row, group, cells...),
//                                  -1-padded — the exception strip's kz
//                                  cell rows ride along so the conv's
//                                  correction pass never needs the full
//                                  [n, ng*kz] map on device
// Returns total exception count, -1 on bad arguments, or -2 when a present
// cell's rank >= kz (non-consecutive strip; caller falls back like numpy's
// rank.max() >= K check).
int64_t agile3d_stem_prep(const int32_t* k5, int64_t n, int64_t ng,
                          int64_t kz, int64_t block_m, int64_t sub,
                          int64_t w_eff, const int32_t* sub_ws,
                          int64_t exc_cap, int32_t* w0_t, int32_t* lo_p,
                          int32_t* r0_p, int8_t* rank_p, int32_t* exc) {
  if (n % (block_m * sub) || ng > 32 || kz * 3 + 1 > 16) return -1;
  const int32_t BIG = 1 << 30;
  const int64_t kk = ng * kz;
  const int64_t ew = 2 + kz;  // exc row width
  const int64_t sb_rows = block_m * sub;
  const int64_t n_sb = n / sb_rows;
  std::vector<int32_t> lo((size_t)ng);
  for (int64_t e = 0; e < exc_cap * ew; ++e) exc[e] = -1;
  int64_t n_exc = 0;
  for (int64_t s = 0; s < n_sb; ++s) {
    int32_t gmin = BIG;
    // pass 1: strip starts r0, per-lane ranks, superblock min
    for (int64_t m = 0; m < sb_rows; ++m) {
      const int64_t i = s * sb_rows + m;
      const int32_t* cells = k5 + i * kk;
      int32_t* r0row = r0_p + i * 32;
      int8_t* rrow = rank_p + i * 32 * 16;
      memset(rrow, 0xff, 32 * 16);  // -1
      for (int64_t g = 0; g < ng; ++g) {
        int32_t r0 = BIG;
        for (int64_t j = 0; j < kz; ++j) {
          const int32_t c = cells[g * kz + j];
          if (c >= 0 && c < r0) r0 = c;
        }
        if (r0 == BIG) {
          r0row[g] = -1;
          continue;
        }
        r0row[g] = r0;
        if (r0 < gmin) gmin = r0;
        int8_t* lanes = rrow + g * 16;
        for (int64_t j = 0; j < kz; ++j) {
          const int32_t c = cells[g * kz + j];
          if (c < 0) continue;
          const int32_t rk = c - r0;
          if (rk >= kz) return -2;  // non-consecutive strip
          lanes[j * 3] = lanes[j * 3 + 1] = lanes[j * 3 + 2] = (int8_t)rk;
        }
      }
      for (int64_t g = ng; g < 32; ++g) r0row[g] = -1;
    }
    if (gmin == BIG) gmin = 0;
    int32_t w0 = (gmin / 32) * 32;
    if (w0 > (int32_t)(n - w_eff)) w0 = (int32_t)(n - w_eff);
    if (w0 < 0) w0 = 0;
    w0_t[s] = w0 / 32;
    for (int64_t b = 0; b < sub; ++b) {
      const int64_t row0 = s * sb_rows + b * block_m;
      // pass 2: per-group band start within this 128-row block
      for (int64_t g = 0; g < ng; ++g) lo[g] = BIG;
      for (int64_t m = 0; m < block_m; ++m) {
        const int32_t* r0row = r0_p + (row0 + m) * 32;
        for (int64_t g = 0; g < ng; ++g)
          if (r0row[g] >= 0 && r0row[g] - w0 < lo[g]) lo[g] = r0row[g] - w0;
      }
      int32_t* lrow = lo_p + (s * sub + b) * 32;
      for (int64_t g = 0; g < ng; ++g) {
        int32_t l = lo[g] == BIG ? 0 : (lo[g] / 32) * 32;
        const int32_t hi = (int32_t)(w_eff - sub_ws[g]);
        if (l > hi) l = hi;
        if (l < 0) l = 0;
        lo[g] = l;
        lrow[g] = l / 32;
      }
      for (int64_t g = ng; g < 32; ++g) lrow[g] = 0;
      // pass 3: out-of-band exception strips (ascending row order)
      for (int64_t m = 0; m < block_m; ++m) {
        const int32_t* r0row = r0_p + (row0 + m) * 32;
        for (int64_t g = 0; g < ng; ++g) {
          if (r0row[g] < 0) continue;
          const int32_t rel = r0row[g] - w0 - lo[g];
          if (rel < 0 || rel >= sub_ws[g]) {
            if (n_exc < exc_cap) {
              int32_t* erow = exc + n_exc * ew;
              erow[0] = (int32_t)(row0 + m);
              erow[1] = (int32_t)g;
              const int32_t* cells = k5 + (row0 + m) * kk + g * kz;
              for (int64_t j = 0; j < kz; ++j) erow[2 + j] = cells[j];
            }
            ++n_exc;
          }
        }
      }
    }
  }
  return n_exc;
}

}  // extern "C"
