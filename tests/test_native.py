"""Native (C++) sparse index vs numpy fallback: bit-identical results."""

import os

import numpy as np
import pytest

from agile3d_tpu.sparse import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def _numpy_env(fn, *args, **kw):
    os.environ["AGILE3D_NATIVE"] = "0"
    try:
        return fn(*args, **kw)
    finally:
        os.environ["AGILE3D_NATIVE"] = "1"


def test_native_quantize_matches_numpy(lib):
    from agile3d_tpu.sparse.quantize import sparse_quantize

    rng = np.random.default_rng(0)
    pts = (rng.random((20000, 3)).astype(np.float32) * 12 - 3)
    nat = sparse_quantize(pts, 0.05)
    ref = _numpy_env(sparse_quantize, pts, 0.05)
    for a, b in zip(nat, ref):
        np.testing.assert_array_equal(a, b)


def test_native_pyramid_matches_numpy(lib):
    from agile3d_tpu.sparse.kernel_maps import build_pyramid

    rng = np.random.default_rng(1)
    vox = rng.integers(-20, 20, size=(3000, 3)).astype(np.int32)
    batch = rng.integers(0, 3, size=3000).astype(np.int32)
    key = np.stack([batch, vox[:, 0], vox[:, 1], vox[:, 2]], 1)
    # build_pyramid requires the sorted-row invariant (rows sorted by
    # packed (batch,x,y,z) key — what sparse_quantize emits)
    _, keep = np.unique(key, axis=0, return_index=True)
    vox, batch = vox[keep], batch[keep]

    nat = build_pyramid(vox, batch)
    ref = _numpy_env(build_pyramid, vox, batch)
    assert len(nat.levels) == len(ref.levels)
    for ln, lr in zip(nat.levels, ref.levels):
        np.testing.assert_array_equal(ln.grid, lr.grid)
        np.testing.assert_array_equal(ln.batch, lr.batch)
        np.testing.assert_array_equal(ln.k3, lr.k3)
        if lr.k5 is not None:
            np.testing.assert_array_equal(ln.k5, lr.k5)
        for field in ("down", "up_parent", "up_offset"):
            a, b = getattr(ln, field), getattr(lr, field)
            if b is None:
                assert a is None
            else:
                np.testing.assert_array_equal(a, b)


def test_native_out_of_range_raises(lib):
    from agile3d_tpu.sparse.native import native_quantize

    with pytest.raises(ValueError):
        native_quantize(np.array([[1e9, 0, 0]], np.float32), 0.05)


def test_margin_guard_parity(lib):
    """The numpy pack_coords must reject the same MARGIN guard band at the
    bit-field edges as csrc/sparse_index.cpp (ADVICE r2): coordinates
    within MARGIN of the packable edge raise in BOTH paths; the last
    accepted coordinate is accepted by both."""
    from agile3d_tpu.sparse.quantize import (
        _COORD_OFFSET, _MARGIN, pack_coords, sparse_quantize)

    edge = _COORD_OFFSET - _MARGIN          # first rejected magnitude
    for bad in (edge, -_COORD_OFFSET + _MARGIN - 1):
        pts = np.array([[bad * 0.05, 0, 0]], np.float32)
        with pytest.raises(ValueError):
            sparse_quantize(pts, 0.05)      # native path
        with pytest.raises(ValueError):
            _numpy_env(sparse_quantize, pts, 0.05)
        with pytest.raises(ValueError):
            pack_coords(np.array([[bad, 0, 0]], np.int64))
    ok = np.array([[edge - 1, 0, 0]], np.int64)
    assert pack_coords(ok).shape == (1,)
    nat = sparse_quantize(ok.astype(np.float32) * 0.05, 0.05)
    ref = _numpy_env(sparse_quantize, ok.astype(np.float32) * 0.05, 0.05)
    np.testing.assert_array_equal(nat[0], ref[0])


def test_native_speedup(lib):
    import time

    from agile3d_tpu.sparse.kernel_maps import build_pyramid

    rng = np.random.default_rng(2)
    vox = np.unique(rng.integers(0, 60, size=(50000, 3)).astype(np.int32),
                    axis=0)

    def best_of(fn, reps=3):
        # min over reps: single samples are poisoned by transient host load
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return best

    t_native = best_of(lambda: build_pyramid(vox))
    t_numpy = best_of(lambda: _numpy_env(build_pyramid, vox))
    # the native path must be decisively faster (typically 10-30x)
    assert t_native < t_numpy, (t_native, t_numpy)
