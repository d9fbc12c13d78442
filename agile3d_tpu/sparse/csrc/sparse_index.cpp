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
// Sorted two-pointer merge instead of hash probes: voxel keys are sorted
// once; for a fixed offset every query key is the same constant shift of a
// sorted sequence, so present/absent resolves in one sequential co-scan per
// offset (O(K*N) streaming reads, no cache-missing probe chains — the
// Minuet-style sorted lookup). Returns -1 on out-of-range coordinates.
int64_t agile3d_neighbor_map(const int32_t* grid, const int32_t* batch,
                             int64_t n, const int32_t* offsets, int64_t k,
                             int32_t* out) {
  struct KeyRow {
    int64_t key;
    int32_t row;
  };
  std::vector<KeyRow> sorted((size_t)n);
  for (int64_t i = 0; i < n; ++i) {
    int64_t key = pack(batch[i], grid[3 * i], grid[3 * i + 1], grid[3 * i + 2]);
    if (key < 0) return -1;
    sorted[i] = {key, (int32_t)i};
  }
  std::sort(sorted.begin(), sorted.end(),
            [](const KeyRow& a, const KeyRow& b) { return a.key < b.key; });

  for (int64_t j = 0; j < k; ++j) {
    // Query key = voxel key + constant delta. The MARGIN guard band in
    // pack() guarantees no bit-field carry for |offset| <= MARGIN, so the
    // shifted keys stay a faithful (and still sorted) coordinate encoding.
    const int64_t d = (int64_t)offsets[3 * j] * (1LL << (2 * COORD_BITS)) +
                      (int64_t)offsets[3 * j + 1] * (1LL << COORD_BITS) +
                      (int64_t)offsets[3 * j + 2];
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

}  // extern "C"
