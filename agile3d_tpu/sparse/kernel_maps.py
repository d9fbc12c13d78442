"""Kernel-map builder: the TPU replacement for MinkowskiEngine's
CoordinateManager (reference models/modules/common.py:125-188, engine.py:47).

MinkowskiEngine builds GPU hash maps from (batch,x,y,z) to row index and
derives per-kernel-offset (input_row, output_row) pairs on the fly. On TPU the
equivalent is precomputed *gather maps* with static shapes:

  * ``k3``  [N_l, 27]  — for each voxel, the row of the neighbor at each of the
    3x3x3 offsets (or -1 if absent). A stride-1 kernel-3 sparse conv is then a
    loop of 27 gathers + GEMMs (ops/sparse_conv.py).
  * ``k5``  [N_0, 125] — same for the 5x5x5 stem conv (res16unet stem,
    reference main.py:37 conv1_kernel_size=5), finest level only.
  * ``down`` [N_{l+1}, 8] — kernel-2 stride-2 conv: coarse voxel j gathers the
    fine voxels at 2*g_j + {0,1}^3 (ME even-kernel offsets are [0, k)).
  * ``up_parent`` [N_l], ``up_offset`` [N_l] — kernel-2 stride-2 transposed
    conv (reference models/modules/common.py:158-188): each fine voxel has
    exactly one coarse contributor, its parent floor(g/2), through kernel
    element ``up_offset`` = interleaved bits of (g mod 2). This exactness holds
    because every coarse voxel was created *from* the fine map by striding, so
    the UNet's up path lands back on the matching down path's coordinates.

Coordinates are stored as *grid* coordinates g_l = coordinate / 2^l; striding
is then g_{l+1} = floor(g_l / 2) (matches ME stride semantics where level-l
coords are multiples of 2^l).

Everything here is host-side numpy (branchy hash work the TPU is bad at); a
C++ fast path with the same contract lives in sparse/csrc.
"""

from __future__ import annotations

import dataclasses
import itertools

import numpy as np

from agile3d_tpu.sparse.quantize import pack_coords

# ---------------------------------------------------------------------------
# Kernel offset enumeration.
#
# ME enumerates hypercube kernel offsets with the FIRST spatial axis varying
# fastest for region iteration in its C++ kernel_region; the exact order only
# matters for checkpoint weight conversion (a fixed permutation of kernel
# slices). We pin itertools.product order (last axis fastest, like numpy
# C-order) and expose it as the single source of truth; the torch->jax
# converter (utils/ckpt.py) permutes checkpoint kernels through this table.
# ---------------------------------------------------------------------------


def kernel_offsets(kernel_size: int) -> np.ndarray:
    """Offsets [K, 3] for a cubic kernel. Odd sizes are centered
    ({-r..r}, r=(k-1)//2); even sizes span [0, k) (ME convention)."""
    if kernel_size % 2 == 1:
        r = (kernel_size - 1) // 2
        rng = range(-r, r + 1)
    else:
        rng = range(0, kernel_size)
    return np.array(list(itertools.product(rng, rng, rng)), dtype=np.int32)


KERNEL_OFFSETS_CACHE = {k: kernel_offsets(k) for k in (2, 3, 5)}


def me_kernel_perm(kernel_size: int) -> np.ndarray:
    """Permutation aligning MinkowskiEngine kernel-weight slices with our
    ``kernel_offsets`` enumeration: ``ours[i] = me_kernel[perm[i]]``.

    Derivation (ME source semantics, not empirical): ME's C++ region
    iterator (MinkowskiEngine ``src/kernel_region.hpp``,
    ``kernel_region_iterator::operator++`` for REGION_TYPE::HYPER_CUBE)
    increments the FIRST spatial axis each step and carries into later
    axes on overflow — i.e. kernel offsets enumerate column-major, first
    axis fastest, each axis running lower-bound..upper-bound (centered
    for odd sizes, [0, k) for even sizes). Our ``kernel_offsets`` uses
    itertools.product order (last axis fastest, C-order). The two are
    digit-reversals of each other, so perm[i] is our offset i's index in
    the column-major flattening.

    If a released reference checkpoint disagrees (e.g. a different ME
    version), tools/calibrate_kernel_order.py searches all 48 signed axis
    relabelings empirically and emits the corrected table.
    """
    offs = kernel_offsets(kernel_size)
    ix = offs - offs.min(axis=0)  # per-axis grid index in [0, k)
    k = kernel_size
    return (ix[:, 0] + ix[:, 1] * k + ix[:, 2] * k * k).astype(np.int64)


# kernel-volume -> perm table used by the checkpoint converter
# (utils/ckpt.convert_torch_state_dict); keys are K = kernel_size**3.
ME_KERNEL_PERM = {k ** 3: me_kernel_perm(k) for k in (2, 3, 5)}


@dataclasses.dataclass
class LevelMaps:
    """One pyramid level (stride 2^level)."""

    grid: np.ndarray          # int32 [N, 3] grid coords (coordinate / stride)
    batch: np.ndarray         # int32 [N]
    k3: np.ndarray            # int32 [N, 27] neighbor rows, -1 = absent
    k5: np.ndarray | None     # int32 [N, 125] finest level only
    # Maps to the NEXT (coarser) level; None at the coarsest level.
    down: np.ndarray | None       # int32 [N_coarse, 8] fine rows per coarse voxel
    up_parent: np.ndarray | None  # int32 [N] coarse row feeding this fine voxel
    up_offset: np.ndarray | None  # int32 [N] kernel element in [0, 8)
    # Factored-conv maps (see factored_maps): z-column gather for the
    # z-dilated set D + per-voxel (dx, dy) rows into D. The factored form
    # gathers ~2x fewer rows for k3 (and ~3.7x fewer for the k5 stem) than
    # the direct per-offset maps — the gather is row-rate bound on TPU.
    z3: np.ndarray | None = None     # int32 [Nd3, 3] rows into V
    b9: np.ndarray | None = None     # int32 [N, 9] rows into D3
    z5: np.ndarray | None = None     # int32 [Nd5, 5] finest level only
    b25: np.ndarray | None = None    # int32 [N, 25] rows into D5
    # z-complete dilated window maps for the stem (dilated_window_maps):
    # zero-select packed-window conv (ops/sparse_conv.sparse_conv_zdilated)
    zd_src: np.ndarray | None = None  # int32 [Nd] V row per D position, -1 pad
    zd_q0: np.ndarray | None = None   # int32 [N, k*k] window starts, -1 absent

    @property
    def num_voxels(self) -> int:
        return self.grid.shape[0]


@dataclasses.dataclass
class Pyramid:
    levels: list[LevelMaps]   # levels[0] = stride 1 (finest)


def _lookup(keys_sorted: np.ndarray, order: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Rows of `query` keys in the key set, -1 if absent."""
    pos = np.searchsorted(keys_sorted, query)
    pos = np.minimum(pos, keys_sorted.size - 1)
    hit = keys_sorted[pos] == query
    return np.where(hit, order[pos], -1).astype(np.int32)


def _neighbor_map(
    grid: np.ndarray, batch: np.ndarray, keys_sorted: np.ndarray, order: np.ndarray,
    offsets: np.ndarray,
) -> np.ndarray:
    n, k = grid.shape[0], offsets.shape[0]
    out = np.empty((n, k), dtype=np.int32)
    for j in range(k):
        q = pack_coords(grid + offsets[j][None, :], batch)
        out[:, j] = _lookup(keys_sorted, order, q)
    return out


def _sorted_index(grid: np.ndarray, batch: np.ndarray):
    keys = pack_coords(grid, batch)
    order = np.argsort(keys, kind="stable").astype(np.int64)
    return keys[order], order


def factored_maps(grid: np.ndarray, batch: np.ndarray,
                  keys_sorted: np.ndarray, order: np.ndarray, k: int):
    """Factor a k^3 cubic conv into a z-column stage + a (dx, dy) stage.

    The k^3-offset gather-GEMM conv is row-rate bound, so halving gathered
    ROWS is the lever. Exact two-stage form: define the z-dilated set
    D = { p : exists dz in [-r, r] with p + (0,0,dz) in V }, materialize
    h[p] = concat_dz x[p + (0,0,dz)]  (zeros where absent), then

        out[m] = sum_{dx,dy} h[m + (dx,dy,0)] @ W'[dx,dy]

    where W' stacks the k dz-slices of W — EXACT because
    (m + (dx,dy,0)) + (0,0,dz) == m + (dx,dy,dz) in the voxel grid, and
    D covers every (dx,dy,0) position whose z-column intersects V.
    Gathered rows: k*|D| + k^2*N  vs  k^3*N direct (k=3: ~14N vs 27N at
    the measured |D|=1.6N; k=5: ~34N vs 125N).

    Returns (zmap [Nd, k], b2 [N, k*k]); D rows are sorted by packed key.
    The conv consumes W reshaped [k*k, k*C_in, C_out] with NO permutation:
    kernel_offsets enumerates (dx, dy, dz) with dz fastest, matching the
    h layout [x(p-r*z) | ... | x(p+r*z)].
    """
    r = (k - 1) // 2
    n = grid.shape[0]

    # D = union of the k z-shifts of V, deduped on packed keys (sorted)
    shifted = []
    for dz in range(-r, r + 1):
        g2 = grid.copy()
        g2[:, 2] += dz
        shifted.append(pack_coords(g2, batch))
    all_keys = np.concatenate(shifted)
    dkeys, first = np.unique(all_keys, return_index=True)
    src_row = first % n
    src_dz = first // n - r
    dgrid = grid[src_row].copy()
    dgrid[:, 2] += src_dz.astype(grid.dtype)
    dbatch = batch[src_row]

    zmap = np.empty((len(dkeys), k), np.int32)
    for i, dz in enumerate(range(-r, r + 1)):
        q = dgrid.copy()
        q[:, 2] += dz
        zmap[:, i] = _lookup(keys_sorted, order, pack_coords(q, dbatch))

    b2 = np.empty((n, k * k), np.int32)
    col = 0
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            q = grid.copy()
            q[:, 0] += dx
            q[:, 1] += dy
            qk = pack_coords(q, batch)
            pos = np.minimum(np.searchsorted(dkeys, qk), len(dkeys) - 1)
            b2[:, col] = np.where(dkeys[pos] == qk, pos, -1).astype(np.int32)
            col += 1
    return zmap, b2


def dilated_window_maps(grid: np.ndarray, batch: np.ndarray,
                        keys_sorted: np.ndarray, order: np.ndarray, k: int):
    """Z-complete window maps for a k^3 conv: dilate V by +-(k-1) in z so
    every needed z-window is FULLY present in the dilated set D.

    Claim: if any cell (x+dx, y+dy, z+dz'), |dz'| <= r (r=(k-1)/2) is in V,
    then ALL positions z-r..z+r of that column are in D = V (+) z*[-2r, 2r]:
    a V-cell at z+a (|a| <= r) dilates to [z+a-2r, z+a+2r] which covers
    [z-r, z+r]. D is sorted, so those k positions are CONSECUTIVE D rows
    and cell dz' sits at EXACTLY q0 + (dz'+r) — no per-row compaction, the
    property the packed-strip conv's masked selects exist to work around.

    Returns:
      src [Nd] int32 — V row of each D position, -1 where the position is
        z-dilation padding (feature value 0);
      q0  [N, k*k] int32 — for each (dx, dy) offset (enumerated like
        kernel_offsets' (dx, dy) majors), the D row of position
        (x+dx, y+dy, z-r); -1 when the whole window is absent from V.
    """
    r = (k - 1) // 2
    n = grid.shape[0]

    shifted = []
    for dz in range(-2 * r, 2 * r + 1):
        g2 = grid.copy()
        g2[:, 2] += dz
        shifted.append(pack_coords(g2, batch))
    dkeys = np.unique(np.concatenate(shifted))
    # src: D position -> V row (D ⊇ V, and both share the key order)
    pos = np.minimum(np.searchsorted(keys_sorted, dkeys),
                     keys_sorted.size - 1)
    src = np.where(keys_sorted[pos] == dkeys, order[pos], -1).astype(np.int32)

    q0 = np.empty((n, k * k), np.int32)
    col = 0
    rng = range(-r, r + 1)
    for dx in rng:
        for dy in rng:
            # window start = position (x+dx, y+dy, z-r) in D
            q = grid.copy()
            q[:, 0] += dx
            q[:, 1] += dy
            q[:, 2] -= r
            qk = pack_coords(q, batch)
            p = np.minimum(np.searchsorted(dkeys, qk), len(dkeys) - 1)
            p_end = np.minimum(p + (k - 1), len(dkeys) - 1)
            # FULL window must be in D: start and end keys present exactly
            # k-1 rows apart (sorted unique ints => the rows between are
            # exactly the intermediate positions). A partial window (possible
            # when only far-away cells dilated into it) contains no V cell,
            # so dropping it to -1 is exact. z steps add directly onto the
            # packed key (z is the low field; MARGIN guards the carry).
            hit = ((dkeys[p] == qk) & (p_end == p + (k - 1))
                   & (dkeys[p_end] == qk + (k - 1)))
            q0[:, col] = np.where(hit, p, -1).astype(np.int32)
            col += 1
    return src, q0


def build_pyramid(
    voxel_coords: np.ndarray,
    batch: np.ndarray | None = None,
    num_levels: int = 5,
    stem_kernel: int = 5,
    factored: bool = False,
    dilated_stem: bool = False,
) -> Pyramid:
    """Build the full UNet coordinate pyramid + all gather maps.

    Args:
      voxel_coords: int [N, 3] quantized voxel coordinates (stride-1 grid).
      batch: optional int [N] batch ids (multi-scene batches).
      num_levels: pyramid depth (5 for Res16UNet: strides 1,2,4,8,16).
      stem_kernel: kernel size of the stem conv (5 in the canonical config).
    """
    from agile3d_tpu.sparse.native import (
        native_neighbor_map,
        native_stride_down,
    )

    grid = np.ascontiguousarray(voxel_coords, dtype=np.int32)
    if batch is None:
        batch = np.zeros(grid.shape[0], dtype=np.int32)
    batch = batch.astype(np.int32)

    # Enforce the sorted-row invariant (sparse/quantize.py module docstring):
    # rows strictly increasing by packed (batch,x,y,z) key. Coarser levels
    # re-establish it below; the strip-gather convs
    # (ops/sparse_conv.sparse_conv_strips) are silently WRONG without it.
    keys0 = pack_coords(grid, batch)
    if grid.shape[0] > 1 and not (np.diff(keys0) > 0).all():
        raise ValueError(
            "build_pyramid: voxel rows must be sorted by packed "
            "(batch,x,y,z) key (z fastest) and unique — sort with "
            "np.argsort(pack_coords(grid, batch)); sparse_quantize already "
            "emits this order")

    levels: list[LevelMaps] = []
    # Bit weights turning (g mod 2) into the kernel-2 element index,
    # consistent with kernel_offsets(2) enumeration order.
    k2_weight = np.array([4, 2, 1], dtype=np.int32)  # product order: x slowest

    def nbr_map(grid, batch, offsets, keys_sorted, order):
        out = native_neighbor_map(grid, batch, offsets)
        if out is not None:
            return out
        return _neighbor_map(grid, batch, keys_sorted, order, offsets)

    use_native = native_neighbor_map(np.zeros((1, 3), np.int32),
                                     np.zeros(1, np.int32),
                                     np.zeros((1, 3), np.int32)) is not None

    for lvl in range(num_levels):
        keys_sorted = order = None
        if not use_native:
            keys_sorted, order = _sorted_index(grid, batch)
        k3 = nbr_map(grid, batch, KERNEL_OFFSETS_CACHE[3], keys_sorted, order)
        k5 = None
        if lvl == 0 and stem_kernel != 3:
            k5 = nbr_map(grid, batch, KERNEL_OFFSETS_CACHE[stem_kernel],
                         keys_sorted, order)
        z3 = b9 = z5 = b25 = None
        if factored:
            if keys_sorted is None:
                keys_sorted, order = _sorted_index(grid, batch)
            z3, b9 = factored_maps(grid, batch, keys_sorted, order, 3)
            if lvl == 0 and stem_kernel == 5:
                z5, b25 = factored_maps(grid, batch, keys_sorted, order, 5)
        zd_src = zd_q0 = None
        if dilated_stem and lvl == 0:
            if keys_sorted is None:
                keys_sorted, order = _sorted_index(grid, batch)
            zd_src, zd_q0 = dilated_window_maps(grid, batch, keys_sorted,
                                                order, stem_kernel)
        levels.append(
            LevelMaps(grid=grid, batch=batch, k3=k3, k5=k5,
                      down=None, up_parent=None, up_offset=None,
                      z3=z3, b9=b9, z5=z5, b25=b25,
                      zd_src=zd_src, zd_q0=zd_q0)
        )
        if lvl == num_levels - 1:
            break

        # --- stride to the next level ---
        native = native_stride_down(grid, batch)
        if native is not None:
            coarse_grid, coarse_batch, parent, child_offset, down = native
        else:
            coarse_of_fine = grid >> 1  # floor(g/2) incl. negatives
            ckeys = pack_coords(coarse_of_fine, batch)
            # np.unique emits unique keys in sorted order — the coarse level
            # inherits the sorted-row invariant (strip gathers; see
            # sparse/quantize.py module docstring). floor(g/2) is NOT
            # lex-monotone, so the re-sort here is load-bearing.
            _, first_idx, inv_sorted = np.unique(
                ckeys, return_index=True, return_inverse=True)
            coarse_grid = coarse_of_fine[first_idx]
            coarse_batch = batch[first_idx]
            parent = inv_sorted.astype(np.int32)            # fine -> coarse row

            # down map: coarse j gathers fine voxels at 2*g_j + {0,1}^3
            n_coarse = coarse_grid.shape[0]
            down = np.full((n_coarse, 8), -1, dtype=np.int32)
            child_offset = ((grid & 1) * k2_weight[None, :]).sum(axis=1)
            down[parent, child_offset] = np.arange(grid.shape[0],
                                                   dtype=np.int32)
            child_offset = child_offset.astype(np.int32)

        levels[-1].down = down
        levels[-1].up_parent = parent
        levels[-1].up_offset = child_offset

        grid, batch = coarse_grid, coarse_batch

    return Pyramid(levels=levels)
