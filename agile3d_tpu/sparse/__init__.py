from agile3d_tpu.sparse.quantize import sparse_quantize, batched_coordinates
from agile3d_tpu.sparse.kernel_maps import (
    KERNEL_OFFSETS_CACHE,
    kernel_offsets,
    build_pyramid,
    LevelMaps,
    Pyramid,
)
from agile3d_tpu.sparse.grid import pad_pyramid, PaddedPyramid

__all__ = [
    "sparse_quantize",
    "batched_coordinates",
    "kernel_offsets",
    "KERNEL_OFFSETS_CACHE",
    "build_pyramid",
    "LevelMaps",
    "Pyramid",
    "pad_pyramid",
    "PaddedPyramid",
]
