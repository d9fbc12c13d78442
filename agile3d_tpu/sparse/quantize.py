"""Voxel quantization — TPU-native replacement for ME.utils.sparse_quantize.

The reference calls ``ME.utils.sparse_quantize(coords, quantization_size,
return_index=True, return_inverse=True)`` (reference
datasets/InterMultiObj3DSegDataset.py:67-71) which hashes floored voxel
coordinates in C++/CUDA and returns one representative point per voxel.

This implementation runs host-side in numpy (the TPU does not want to do
pointer-chasing hash maps); a C++ fast path lives in sparse/csrc. Voxel order
is *sorted by packed (x,y,z) key* (z-minor lexicographic) — deterministic,
unlike ME's hash-map order, and a load-bearing invariant: with z the fastest
key axis, the occupied cells of any voxel's z-column are CONSECUTIVE rows,
which turns the per-offset gathers of the sparse convolutions into contiguous
strip gathers (ops/sparse_conv.sparse_conv_strips). kernel_maps.build_pyramid
re-establishes the same order at every coarser level.
"""

from __future__ import annotations

import numpy as np

# 19 bits per spatial coordinate (signed range +-2^18), 6 bits batch.
_COORD_BITS = 19
_COORD_OFFSET = 1 << (_COORD_BITS - 1)
_COORD_MAX = (1 << _COORD_BITS) - 1
# Guard band at the field edges so adding a small kernel offset (or the
# dilation key arithmetic's qk + (k-1)) can never carry into the adjacent
# bit field — MUST match MARGIN in csrc/sparse_index.cpp so the numpy and
# native paths accept/reject identical inputs.
_MARGIN = 4


def pack_coords(coords: np.ndarray, batch: np.ndarray | None = None) -> np.ndarray:
    """Pack int coords [N,3] (+ optional batch ids [N]) into int64 keys."""
    c = coords.astype(np.int64) + _COORD_OFFSET
    if c.min() < _MARGIN or c.max() > _COORD_MAX - _MARGIN:
        raise ValueError(
            f"coordinates out of packable range "
            f"+-{_COORD_OFFSET - _MARGIN}: [{coords.min()}, {coords.max()}]"
        )
    key = (c[:, 0] << (2 * _COORD_BITS)) | (c[:, 1] << _COORD_BITS) | c[:, 2]
    if batch is not None:
        key = key | (batch.astype(np.int64) << (3 * _COORD_BITS))
    return key


def sparse_quantize(
    coords: np.ndarray, quantization_size: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quantize float points to voxels.

    Args:
      coords: float [N, 3] point coordinates.
      quantization_size: voxel edge length (0.05 m in the canonical config).

    Returns:
      (voxel_coords int32 [M, 3], unique_map int64 [M], inverse_map int64 [N])
      such that ``voxel_coords == floor(coords/qsize)[unique_map]`` and
      ``inverse_map[i]`` is the voxel row of point i. Voxels are ordered by
      packed coordinate key (z-minor lexicographic — see module docstring);
      ``unique_map`` still picks each voxel's FIRST point in point order.
    """
    from agile3d_tpu.sparse.native import native_quantize

    res = native_quantize(np.asarray(coords, np.float32), quantization_size)
    if res is not None:
        return res

    vox = np.floor(coords / quantization_size).astype(np.int32)
    keys = pack_coords(vox)
    # np.unique returns unique keys in sorted order and first_idx the first
    # occurrence of each — exactly the sorted-voxel contract.
    _, first_idx, inverse_map = np.unique(keys, return_index=True,
                                          return_inverse=True)
    return (vox[first_idx], first_idx.astype(np.int64),
            inverse_map.astype(np.int64))


def batched_coordinates(coords_list: list[np.ndarray]) -> np.ndarray:
    """Prepend a batch-index column (ME.utils.batched_coordinates,
    reference datasets/InterMultiObj3DSegDataset.py:129)."""
    rows = []
    for b, c in enumerate(coords_list):
        bcol = np.full((c.shape[0], 1), b, dtype=np.int32)
        rows.append(np.hstack([bcol, c.astype(np.int32)]))
    return np.vstack(rows)
