"""Native (C++) banded prep + sorted neighbor map vs numpy: bit-identical.

The C++ fast paths (sparse/csrc agile3d_band_plan / agile3d_stem_prep /
the sorted-input neighbor-map layout) replace multi-pass numpy planning
that dominated the host pipeline at KITTI scale (PERF.md round 3). These
tests pin the contract: every output array identical to the numpy
fallback, on scenes WITH out-of-band exceptions and without, plus the
fallback conditions (exc_cap overflow) agreeing.
"""

import os

import numpy as np
import pytest

from agile3d_tpu.config import Config
from agile3d_tpu.ops import banded_conv as bc
from agile3d_tpu.ops import banded_stem as bs
from agile3d_tpu.sparse import build_pyramid, pad_pyramid
from agile3d_tpu.sparse import native
from agile3d_tpu.sparse.quantize import sparse_quantize
from tests.synthetic import make_scene


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


@pytest.fixture(scope="module")
def level0():
    rng = np.random.default_rng(7)
    coords, _, _ = make_scene(rng, n_points=60000, num_obj=5, extent=6.0)
    coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
    vox, _, _ = sparse_quantize(coords, Config().model.voxel_size)
    return pad_pyramid(build_pyramid(vox), buckets=Config().buckets).levels[0]


def _assert_prep_equal(nat, ref):
    assert nat[-1] == ref[-1]
    for i, (a, b) in enumerate(zip(nat[:-1], ref[:-1])):
        if a is None or b is None:
            assert a is b, f"field {i}: {type(a)} vs {type(b)}"
        else:
            np.testing.assert_array_equal(a, b, err_msg=f"field {i}")


def test_band_plan_matches_numpy(lib, level0):
    nat = bc.banded_prep(level0.k3)
    ref = _numpy_env(bc.banded_prep, level0.k3)
    assert nat[-1], "scene must be banded-eligible"
    _assert_prep_equal(nat, ref)


def test_band_plan_exceptions_match(lib, level0):
    # squeeze the dx=+-1 bands until out-of-band neighbors appear, so the
    # exception list path is exercised (values AND ascending-row order)
    for w1 in (128, 96, 64, 32):
        sub_ws = tuple(64 if j // 9 == 1 else w1 for j in range(27))
        ref = _numpy_env(bc.banded_prep, level0.k3, sub_ws=sub_ws)
        nat = bc.banded_prep(level0.k3, sub_ws=sub_ws)
        _assert_prep_equal(nat, ref)
        if ref[-1] and ref[2] is not None:
            rows = ref[2][ref[2][:, 0] >= 0][:, 0]
            assert (np.diff(rows) >= 0).all()
            return
    pytest.skip("no width profile produced exceptions on this scene")


def test_band_plan_exc_cap_fallback_matches(lib, level0):
    sub_ws = tuple(32 for _ in range(27))
    ref = _numpy_env(bc.banded_prep, level0.k3, sub_ws=sub_ws, exc_cap=1)
    nat = bc.banded_prep(level0.k3, sub_ws=sub_ws, exc_cap=1)
    assert nat[-1] == ref[-1]  # both fall back (or both survive) identically


def test_stem_prep_matches_numpy(lib, level0):
    nat = bs.stem_banded_prep(level0.k5)
    ref = _numpy_env(bs.stem_banded_prep, level0.k5)
    assert nat[-1], "scene must satisfy the stem band profile"
    _assert_prep_equal(nat, ref)


def test_stem_prep_exc_cap_fallback_matches(lib, level0):
    ref = _numpy_env(bs.stem_banded_prep, level0.k5, exc_cap=0)
    nat = bs.stem_banded_prep(level0.k5, exc_cap=0)
    assert nat[-1] == ref[-1]


def test_sorted_neighbor_map_matches_legacy(lib):
    # sorted input exercises the grouped z-run co-scan; a shuffled copy of
    # the same voxels exercises the legacy sort path — identical answers
    # modulo the row relabeling.
    rng = np.random.default_rng(3)
    vox = rng.integers(-30, 30, size=(5000, 3)).astype(np.int32)
    batch = rng.integers(0, 2, size=5000).astype(np.int32)
    key = np.stack([batch, vox[:, 0], vox[:, 1], vox[:, 2]], 1)
    _, keep = np.unique(key, axis=0, return_index=True)
    vox, batch = vox[keep], batch[keep]  # sorted by (b,x,y,z)
    from agile3d_tpu.sparse.kernel_maps import (KERNEL_OFFSETS_CACHE,
                                                _neighbor_map,
                                                _sorted_index)
    for k in (3, 5):
        offs = KERNEL_OFFSETS_CACHE[k]
        nat = native.native_neighbor_map(vox, batch, offs)
        ks, order = _sorted_index(vox, batch)
        ref = _neighbor_map(vox, batch, ks, order, offs)
        np.testing.assert_array_equal(nat, ref)

        perm = rng.permutation(len(vox))
        nat_shuf = native.native_neighbor_map(vox[perm], batch[perm], offs)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))  # sorted row -> shuffled row
        relabeled = np.where(ref >= 0, inv[np.maximum(ref, 0)], -1)
        np.testing.assert_array_equal(nat_shuf[inv], relabeled)
