"""ME kernel-offset permutation table (sparse/kernel_maps.me_kernel_perm).

The analytic derivation (ME kernel_region.hpp iterates column-major,
first spatial axis fastest; ours is product order, last axis fastest)
implies the perm is the base-k digit reversal: an involution fixing the
center. The calibration tool's identity candidate must coincide with it.
"""

import importlib.util
import pathlib

import numpy as np

from agile3d_tpu.sparse.kernel_maps import (
    ME_KERNEL_PERM,
    kernel_offsets,
    me_kernel_perm,
)


def test_perm_structure():
    for k in (2, 3, 5):
        perm = me_kernel_perm(k)
        n = k ** 3
        assert sorted(perm.tolist()) == list(range(n))      # permutation
        np.testing.assert_array_equal(perm[perm], np.arange(n))  # involution
        if k % 2 == 1:
            center = (n - 1) // 2
            assert perm[center] == center
        # definition: perm[i] is our offset i's column-major index
        offs = kernel_offsets(k)
        ix = offs - offs.min(0)
        np.testing.assert_array_equal(
            perm, ix[:, 0] + ix[:, 1] * k + ix[:, 2] * k * k)
        assert np.array_equal(ME_KERNEL_PERM[n], perm)


def test_calibration_identity_candidate_matches_default():
    tool = pathlib.Path(__file__).parent.parent / "tools" / "calibrate_kernel_order.py"
    spec = importlib.util.spec_from_file_location("calib", tool)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for k in (2, 3, 5):
        cands = mod.candidate_perms(k)
        ident = cands[((0, 1, 2), (1, 1, 1))]
        np.testing.assert_array_equal(ident, me_kernel_perm(k))
        # and every candidate is a valid permutation
        for perm in cands.values():
            assert sorted(perm.tolist()) == list(range(k ** 3))
