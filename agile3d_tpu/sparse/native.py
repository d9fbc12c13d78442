"""ctypes loader for the native sparse-index runtime (csrc/sparse_index.cpp).

Builds the shared library on first use with g++ (cached beside the source;
rebuilt when the source is newer). Set AGILE3D_NATIVE=0 to force the numpy
fallback. The native and numpy paths are bit-identical (tested in
tests/test_native.py)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "sparse_index.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "csrc", "libsparse_index.so")

_lib = None
_load_failed = False


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """The loaded native library, or None if unavailable/disabled."""
    global _lib, _load_failed
    if os.environ.get("AGILE3D_NATIVE", "1") == "0":
        return None
    if _lib is not None or _load_failed:
        return _lib
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        i64, i32p, i64p, f32p = (
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        )
        lib.agile3d_quantize.restype = i64
        lib.agile3d_quantize.argtypes = [f32p, i64, ctypes.c_double, i32p,
                                         i64p, i64p]
        lib.agile3d_neighbor_map.restype = i64
        lib.agile3d_neighbor_map.argtypes = [i32p, i32p, i64, i32p, i64, i32p]
        lib.agile3d_stride_down.restype = i64
        lib.agile3d_stride_down.argtypes = [i32p, i32p, i64, i32p, i32p,
                                            i32p, i32p, i32p]
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
        lib.agile3d_band_plan.restype = i64
        lib.agile3d_band_plan.argtypes = [i32p, i64, i64, i64, i64, i64,
                                          i32p, i64, i64, i32p, i32p, i32p]
        lib.agile3d_stem_prep.restype = i64
        lib.agile3d_stem_prep.argtypes = [i32p, i64, i64, i64, i64, i64,
                                          i64, i32p, i64, i32p, i32p, i32p,
                                          i8p, i32p]
        _lib = lib
    except (subprocess.CalledProcessError, OSError) as e:  # pragma: no cover
        import warnings

        warnings.warn(f"native sparse index unavailable ({e}); "
                      "falling back to numpy")
        _load_failed = True
    return _lib


def native_quantize(coords: np.ndarray, qsize: float):
    lib = get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, np.float32)
    n = len(coords)
    vox = np.empty((n, 3), np.int32)
    umap = np.empty(n, np.int64)
    imap = np.empty(n, np.int64)
    m = lib.agile3d_quantize(coords, n, qsize, vox, umap, imap)
    if m < 0:
        raise ValueError("coordinates out of packable range +-262144")
    return vox[:m].copy(), umap[:m].copy(), imap


def native_neighbor_map(grid, batch, offsets):
    lib = get_lib()
    if lib is None:
        return None
    grid = np.ascontiguousarray(grid, np.int32)
    batch = np.ascontiguousarray(batch, np.int32)
    offsets = np.ascontiguousarray(offsets, np.int32)
    n, k = len(grid), len(offsets)
    out = np.empty((n, k), np.int32)
    if lib.agile3d_neighbor_map(grid, batch, n, offsets, k, out) < 0:
        raise ValueError("coordinates out of packable range +-262144")
    return out


def native_band_plan(nbr, block_m, sub, w_eff, sub_ws, exc_cap):
    """C++ band planning (ops/banded_conv.banded_prep fast path).

    Returns (w0_t, lo_p, exc, n_exc) or None when the native library is
    unavailable. n_exc is the TOTAL count (may exceed exc_cap) or a
    negative error code; the caller applies the same fallback rules as the
    numpy path."""
    lib = get_lib()
    if lib is None:
        return None
    nbr = np.ascontiguousarray(nbr, np.int32)
    sub_ws = np.ascontiguousarray(sub_ws, np.int32)
    n, k = nbr.shape
    kpad = ((k + 31) // 32) * 32
    w0_t = np.empty(n // (block_m * sub), np.int32)
    lo_p = np.empty((n // block_m, kpad), np.int32)
    exc = np.empty((exc_cap, 2), np.int32)
    n_exc = lib.agile3d_band_plan(nbr, n, k, block_m, sub, w_eff, sub_ws,
                                  kpad, exc_cap, w0_t, lo_p, exc)
    return w0_t, lo_p, exc, int(n_exc)


def native_stem_prep(k5, ng, kz, block_m, sub, w_eff, sub_ws, exc_cap):
    """C++ strip/band planning (ops/banded_stem.stem_banded_prep fast
    path). Returns (w0_t, lo_p, r0_p, rank_p, exc, n_exc) or None when the
    native library is unavailable; n_exc semantics as native_band_plan
    (-2 = non-consecutive strip, like numpy's rank >= K check)."""
    lib = get_lib()
    if lib is None:
        return None
    k5 = np.ascontiguousarray(k5, np.int32)
    sub_ws = np.ascontiguousarray(sub_ws, np.int32)
    n = k5.shape[0]
    w0_t = np.empty(n // (block_m * sub), np.int32)
    lo_p = np.empty((n // block_m, 32), np.int32)
    r0_p = np.empty((n, 32), np.int32)
    rank_p = np.empty((n, 32 * 16), np.int8)
    exc = np.empty((exc_cap, 2 + kz), np.int32)
    n_exc = lib.agile3d_stem_prep(k5, n, ng, kz, block_m, sub, w_eff,
                                  sub_ws, exc_cap, w0_t, lo_p, r0_p,
                                  rank_p, exc)
    return w0_t, lo_p, r0_p, rank_p, exc, int(n_exc)


def native_stride_down(grid, batch):
    lib = get_lib()
    if lib is None:
        return None
    grid = np.ascontiguousarray(grid, np.int32)
    batch = np.ascontiguousarray(batch, np.int32)
    n = len(grid)
    coarse_grid = np.empty((n, 3), np.int32)
    coarse_batch = np.empty(n, np.int32)
    parent = np.empty(n, np.int32)
    child_off = np.empty(n, np.int32)
    down = np.empty((n, 8), np.int32)
    m = lib.agile3d_stride_down(grid, batch, n, coarse_grid, coarse_batch,
                                parent, child_off, down)
    if m < 0:
        raise ValueError("coordinates out of packable range +-262144")
    return (coarse_grid[:m].copy(), coarse_batch[:m].copy(), parent,
            child_off, down[:m].copy())
