"""Unit tests for the voxelizer and kernel-map builder against brute force."""

import numpy as np
import pytest

from agile3d_tpu.sparse import (
    sparse_quantize,
    batched_coordinates,
    build_pyramid,
    kernel_offsets,
    pad_pyramid,
)


def rand_coords(n, rng, extent=20.0):
    return (rng.random((n, 3)) * extent - extent / 4).astype(np.float32)


def test_quantize_brute_force():
    rng = np.random.default_rng(0)
    pts = rand_coords(5000, rng)
    vox, umap, imap = sparse_quantize(pts, 0.5)

    ref = np.floor(pts / 0.5).astype(np.int32)
    # contract: voxel rows sorted lexicographically by (x, y, z), z minor;
    # unique_map picks each voxel's FIRST point in point order
    first = {}
    for i, v in enumerate(map(tuple, ref)):
        first.setdefault(v, i)
    exp_vox = sorted(first)
    exp_umap = [first[v] for v in exp_vox]
    rank = {v: r for r, v in enumerate(exp_vox)}
    exp_imap = np.array([rank[tuple(v)] for v in ref], dtype=np.int64)
    np.testing.assert_array_equal(vox, np.array(exp_vox, dtype=np.int32))
    np.testing.assert_array_equal(umap, np.array(exp_umap))
    np.testing.assert_array_equal(imap, exp_imap)
    # representative points round-trip
    np.testing.assert_array_equal(ref[umap], vox)
    np.testing.assert_array_equal(vox[imap], ref)


def test_quantize_negative_coords():
    pts = np.array([[-0.01, 0.0, 0.0], [-0.49, 0.0, 0.0], [-0.51, 0.0, 0.0]],
                   dtype=np.float32)
    vox, _, imap = sparse_quantize(pts, 0.5)
    # floor semantics: -0.01/-0.49 -> -1, -0.51 -> -2 (rows key-sorted)
    np.testing.assert_array_equal(vox[:, 0], [-2, -1])
    np.testing.assert_array_equal(imap, [1, 1, 0])


def test_batched_coordinates():
    a = np.zeros((3, 3), np.int32)
    b = np.ones((2, 3), np.int32)
    out = batched_coordinates([a, b])
    assert out.shape == (5, 4)
    np.testing.assert_array_equal(out[:, 0], [0, 0, 0, 1, 1])


def _brute_neighbors(grid, batch, offsets):
    table = {(b, *g): i for i, (b, g) in enumerate(zip(batch, map(tuple, grid)))}
    out = np.full((len(grid), len(offsets)), -1, dtype=np.int32)
    for i in range(len(grid)):
        for j, off in enumerate(offsets):
            out[i, j] = table.get((batch[i], *(grid[i] + off)), -1)
    return out


@pytest.mark.parametrize("batched", [False, True])
def test_pyramid_neighbor_maps(batched):
    rng = np.random.default_rng(1)
    vox = rng.integers(-8, 8, size=(400, 3)).astype(np.int32)
    batch = rng.integers(0, 3, size=400).astype(np.int32) if batched else None
    # dedup within batch; np.unique's lex order == the sorted-row invariant
    key = [tuple([batch[i] if batched else 0, *vox[i]]) for i in range(400)]
    _, keep = np.unique(key, axis=0, return_index=True)
    vox = vox[keep]
    batch = batch[keep] if batched else None

    pyr = build_pyramid(vox, batch, num_levels=3)
    b0 = pyr.levels[0].batch
    np.testing.assert_array_equal(
        pyr.levels[0].k3, _brute_neighbors(pyr.levels[0].grid, b0, kernel_offsets(3))
    )
    np.testing.assert_array_equal(
        pyr.levels[0].k5, _brute_neighbors(pyr.levels[0].grid, b0, kernel_offsets(5))
    )

    for lvl in range(2):
        fine, coarse = pyr.levels[lvl], pyr.levels[lvl + 1]
        # coarse grid is the dedup of floor(fine/2), parent points at it
        floored = fine.grid >> 1
        np.testing.assert_array_equal(coarse.grid[fine.up_parent], floored)
        np.testing.assert_array_equal(coarse.batch[fine.up_parent], fine.batch)
        # coarse coords unique per batch
        ckey = [(coarse.batch[i], *coarse.grid[i]) for i in range(len(coarse.grid))]
        assert len(set(ckey)) == len(ckey)
        # down map is the inverse: each fine voxel appears exactly once
        flat = fine.down[fine.down >= 0]
        assert sorted(flat.tolist()) == list(range(len(fine.grid)))
        for j in range(len(coarse.grid)):
            for k, off in enumerate(kernel_offsets(2)):
                fi = fine.down[j, k]
                if fi >= 0:
                    np.testing.assert_array_equal(fine.grid[fi], 2 * coarse.grid[j] + off)
                    assert fine.batch[fi] == coarse.batch[j]
        # up_offset consistent with down
        for i in range(len(fine.grid)):
            assert fine.down[fine.up_parent[i], fine.up_offset[i]] == i


def test_pad_pyramid():
    rng = np.random.default_rng(2)
    vox = np.unique(rng.integers(0, 10, size=(300, 3)).astype(np.int32), axis=0)
    pyr = build_pyramid(vox, num_levels=3)
    pp = pad_pyramid(pyr, buckets=(256, 512, 1024))
    for lvl, plvl in zip(pyr.levels, pp.levels):
        assert plvl.num_valid == lvl.num_voxels
        assert plvl.valid.sum() == lvl.num_voxels
        np.testing.assert_array_equal(plvl.grid[: lvl.num_voxels], lvl.grid)
        np.testing.assert_array_equal(plvl.k3[: lvl.num_voxels], lvl.k3)
        assert (plvl.k3[lvl.num_voxels:] == -1).all()
