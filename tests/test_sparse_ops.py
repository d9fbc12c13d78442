"""Sparse conv ops vs dense torch conv / brute force on tiny grids
(SURVEY.md section 7 build order stage 1-2 test strategy)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import torch

from agile3d_tpu.sparse import build_pyramid, kernel_offsets
from agile3d_tpu.ops.sparse_conv import (
    sparse_conv,
    sparse_conv_transpose,
    avg_pool_down,
    sum_pool_down,
    avg_unpool_up,
    linear,
)
from agile3d_tpu.ops.norm import batch_norm, init_bn, layer_norm, init_layer_norm


def _random_scene(rng, n=250, lo=0, hi=8):
    vox = np.unique(rng.integers(lo, hi, size=(n, 3)).astype(np.int32), axis=0)
    return vox


def test_sparse_conv_matches_dense_torch():
    """A sparse conv over a voxel set equals a dense conv over the same
    voxels scattered into a zero grid, evaluated at occupied sites."""
    rng = np.random.default_rng(0)
    vox = _random_scene(rng)
    n = len(vox)
    cin, cout, ksize = 4, 6, 3
    feats = rng.standard_normal((n, cin)).astype(np.float32)
    w = rng.standard_normal((ksize**3, cin, cout)).astype(np.float32) * 0.2

    pyr = build_pyramid(vox, num_levels=1)
    out = sparse_conv(jnp.asarray(feats), jnp.asarray(pyr.levels[0].k3), jnp.asarray(w))

    # dense reference: torch cross-correlation with our offset enumeration
    g = 8
    dense = np.zeros((1, cin, g, g, g), np.float32)
    dense[0, :, vox[:, 0], vox[:, 1], vox[:, 2]] = feats
    tw = np.zeros((cout, cin, ksize, ksize, ksize), np.float32)
    r = (ksize - 1) // 2
    for k, off in enumerate(kernel_offsets(ksize)):
        tw[:, :, off[0] + r, off[1] + r, off[2] + r] = w[k].T
    ref = torch.nn.functional.conv3d(
        torch.from_numpy(dense), torch.from_numpy(tw), padding=r
    ).numpy()[0]
    ref_at_vox = ref[:, vox[:, 0], vox[:, 1], vox[:, 2]].T
    np.testing.assert_allclose(np.asarray(out), ref_at_vox, rtol=1e-4, atol=1e-4)


def test_strided_conv_and_transpose_brute_force():
    rng = np.random.default_rng(1)
    vox = _random_scene(rng, n=300, lo=-6, hi=6)
    pyr = build_pyramid(vox, num_levels=2)
    fine, coarse = pyr.levels[0], pyr.levels[1]
    cin, cout = 3, 5
    feats = rng.standard_normal((len(vox), cin)).astype(np.float32)
    w = rng.standard_normal((8, cin, cout)).astype(np.float32)

    out = np.asarray(sparse_conv(jnp.asarray(feats), jnp.asarray(fine.down), jnp.asarray(w)))

    table = {tuple(g): i for i, g in enumerate(map(tuple, fine.grid))}
    ref = np.zeros((len(coarse.grid), cout), np.float32)
    for j, cg in enumerate(coarse.grid):
        for k, off in enumerate(kernel_offsets(2)):
            fi = table.get(tuple(2 * cg + off))
            if fi is not None:
                ref[j] += feats[fi] @ w[k]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    # transpose: fine voxel f gets coarse[parent] @ w[offset(f)]
    cfeats = rng.standard_normal((len(coarse.grid), cin)).astype(np.float32)
    wt = rng.standard_normal((8, cin, cout)).astype(np.float32)
    tout = np.asarray(
        sparse_conv_transpose(
            jnp.asarray(cfeats), jnp.asarray(fine.up_parent),
            jnp.asarray(fine.up_offset), jnp.asarray(wt),
        )
    )
    tref = np.zeros((len(fine.grid), cout), np.float32)
    for i, fg in enumerate(fine.grid):
        parent = table_c = None
        for j, cg in enumerate(coarse.grid):
            if (cg == (fg >> 1)).all():
                parent = j
                break
        off = fg - 2 * (fg >> 1)
        k = off[0] * 4 + off[1] * 2 + off[2]
        tref[i] = cfeats[parent] @ wt[k]
    np.testing.assert_allclose(tout, tref, rtol=1e-4, atol=1e-5)


def test_avg_pool_down():
    rng = np.random.default_rng(2)
    vox = _random_scene(rng, n=200, lo=0, hi=6)
    pyr = build_pyramid(vox, num_levels=2)
    fine, coarse = pyr.levels[0], pyr.levels[1]
    x = rng.standard_normal((len(vox), 3)).astype(np.float32)
    out = np.asarray(avg_pool_down(jnp.asarray(x), jnp.asarray(fine.down)))
    for j in range(len(coarse.grid)):
        members = fine.down[j][fine.down[j] >= 0]
        np.testing.assert_allclose(out[j], x[members].mean(0), rtol=1e-5, atol=1e-6)


def test_sum_pool_down_and_avg_unpool_up():
    """ME MinkowskiSumPooling / MinkowskiAvgUnpooling semantics
    (reference models/modules/common.py:240-258 and 219-237): sum over
    present children on the way down; copy the parent's value to every
    child on the way up."""
    rng = np.random.default_rng(7)
    vox = _random_scene(rng, n=200, lo=0, hi=6)
    pyr = build_pyramid(vox, num_levels=2)
    fine, coarse = pyr.levels[0], pyr.levels[1]
    x = rng.standard_normal((len(vox), 3)).astype(np.float32)
    out = np.asarray(sum_pool_down(jnp.asarray(x), jnp.asarray(fine.down)))
    for j in range(len(coarse.grid)):
        members = fine.down[j][fine.down[j] >= 0]
        np.testing.assert_allclose(out[j], x[members].sum(0), rtol=1e-5,
                                   atol=1e-6)

    xc = rng.standard_normal((len(coarse.grid), 3)).astype(np.float32)
    up = np.asarray(avg_unpool_up(jnp.asarray(xc),
                                  jnp.asarray(fine.up_parent)))
    for i, fg in enumerate(fine.grid):
        parent = np.flatnonzero((coarse.grid == (fg >> 1)).all(1))[0]
        np.testing.assert_allclose(up[i], xc[parent], rtol=1e-6, atol=0)


def test_batch_norm_matches_torch():
    rng = np.random.default_rng(3)
    n, c = 64, 7
    x = rng.standard_normal((n + 16, c)).astype(np.float32)
    x[n:] = 0.0
    valid = np.zeros(n + 16, bool)
    valid[:n] = True

    params, state = init_bn(c)
    params = {"scale": jnp.asarray(rng.standard_normal(c).astype(np.float32)),
              "bias": jnp.asarray(rng.standard_normal(c).astype(np.float32))}

    tbn = torch.nn.BatchNorm1d(c, momentum=0.02)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(np.asarray(params["scale"])))
        tbn.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))

    # training step
    y, new_state = batch_norm(jnp.asarray(x), jnp.asarray(valid), params, state,
                              training=True, momentum=0.02)
    tbn.train()
    ty = tbn(torch.from_numpy(x[:n])).detach().numpy()
    np.testing.assert_allclose(np.asarray(y)[:n], ty, rtol=1e-4, atol=1e-5)
    assert (np.asarray(y)[n:] == 0).all()
    np.testing.assert_allclose(np.asarray(new_state.mean),
                               tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state.var),
                               tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)

    # eval step with the updated running stats
    y2, _ = batch_norm(jnp.asarray(x), jnp.asarray(valid), params, new_state,
                       training=False)
    tbn.eval()
    ty2 = tbn(torch.from_numpy(x[:n])).detach().numpy()
    np.testing.assert_allclose(np.asarray(y2)[:n], ty2, rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((10, 16)).astype(np.float32)
    p = init_layer_norm(16)
    p = {"scale": jnp.asarray(rng.standard_normal(16).astype(np.float32)),
         "bias": jnp.asarray(rng.standard_normal(16).astype(np.float32))}
    tln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        tln.weight.copy_(torch.from_numpy(np.asarray(p["scale"])))
        tln.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
    np.testing.assert_allclose(
        np.asarray(layer_norm(jnp.asarray(x), p)),
        tln(torch.from_numpy(x)).detach().numpy(), rtol=1e-4, atol=1e-5)


def test_linear_masks_pad_rows():
    x = jnp.ones((4, 3))
    w = jnp.ones((3, 2))
    b = jnp.ones((2,))
    valid = jnp.array([True, True, False, False])
    y = linear(x, w, b, valid)
    assert (np.asarray(y)[2:] == 0).all()
    assert (np.asarray(y)[:2] == 4).all()


def test_im2col_matches_loop_conv():
    from agile3d_tpu.ops.sparse_conv import sparse_conv_im2col

    rng = np.random.default_rng(5)
    vox = _random_scene(rng)
    pyr = build_pyramid(vox, num_levels=1)
    feats = rng.standard_normal((len(vox), 3)).astype(np.float32)
    w = rng.standard_normal((125, 3, 32)).astype(np.float32) * 0.1
    a = sparse_conv(jnp.asarray(feats), jnp.asarray(pyr.levels[0].k5),
                    jnp.asarray(w))
    b = sparse_conv_im2col(jnp.asarray(feats), jnp.asarray(pyr.levels[0].k5),
                           jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-4)


import pytest

@pytest.mark.slow
def test_backbone_bf16_mode_close_to_f32():
    import jax
    from agile3d_tpu.config import BackboneConfig
    from agile3d_tpu.models.backbone import backbone_forward, init_backbone
    from agile3d_tpu.sparse import pad_pyramid
    from agile3d_tpu.sparse.grid import pad_features

    rng = np.random.default_rng(6)
    vox = _random_scene(rng, n=400, lo=0, hi=12)
    pyr = pad_pyramid(build_pyramid(vox), buckets=(512, 1024))
    cfg = BackboneConfig()
    params, state = init_backbone(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(pad_features(
        rng.random((len(vox), 3)).astype(np.float32),
        pyr.levels[0].grid.shape[0]))
    f32, _ = backbone_forward(params, state, pyr, x, cfg=cfg)
    bf16, _ = backbone_forward(params, state, pyr, x, cfg=cfg,
                               compute_dtype=jnp.bfloat16)
    a = np.asarray(f32[-1])
    b = np.asarray(bf16[-1]).astype(np.float32)
    # bf16 drift stays small relative to activation scale
    denom = np.abs(a).mean() + 1e-6
    assert np.abs(a - b).mean() / denom < 0.1


def test_factored_conv_matches_direct():
    """sparse_conv_factored == sparse_conv with the full k^3 map (exact
    two-stage factorization; sparse/kernel_maps.factored_maps)."""
    import jax.numpy as jnp

    from agile3d_tpu.ops.sparse_conv import sparse_conv, sparse_conv_factored
    from agile3d_tpu.sparse.kernel_maps import (
        KERNEL_OFFSETS_CACHE, _neighbor_map, _sorted_index, factored_maps)

    rng = np.random.default_rng(3)
    for k, n_pts, hi in ((3, 700, 12), (5, 900, 14)):
        grid = np.unique(rng.integers(0, hi, (n_pts, 3)).astype(np.int32),
                         axis=0)
        # two batch samples sharing the coordinate space
        batch = (rng.random(len(grid)) < 0.5).astype(np.int32)
        keys_sorted, order = _sorted_index(grid, batch)
        nbr = _neighbor_map(grid, batch, keys_sorted, order,
                            KERNEL_OFFSETS_CACHE[k])
        zmap, b2 = factored_maps(grid, batch, keys_sorted, order, k)

        cin, cout = 6, 8
        x = jnp.asarray(rng.standard_normal((len(grid), cin)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((k ** 3, cin, cout)).astype(np.float32))
        ref = np.asarray(sparse_conv(x, jnp.asarray(nbr), w))
        got = np.asarray(sparse_conv_factored(x, jnp.asarray(zmap),
                                              jnp.asarray(b2), w))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

        # gather-row accounting: the factored form must actually be leaner
        rows_direct = k ** 3 * len(grid)
        rows_factored = k * len(zmap) + k * k * len(grid)
        assert rows_factored < 0.75 * rows_direct, (rows_factored, rows_direct)


@pytest.mark.slow
def test_factored_conv_config_plumbing():
    """BackboneConfig.factored_conv must either run the factored path
    (pyramid built with factored=True) or fail loudly — never silently fall
    back to the direct conv (round-2 review finding)."""
    import jax
    import pytest

    from agile3d_tpu.config import BackboneConfig, Config, ModelConfig
    from agile3d_tpu.data.datasets import SceneSample, collate_scenes
    from agile3d_tpu.models.backbone import backbone_forward, init_backbone
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from tests.synthetic import make_scene

    rng = np.random.default_rng(11)
    coords, colors, labels = make_scene(rng, n_points=900, num_obj=2)
    vox, umap, imap = sparse_quantize(coords, 0.05)
    sample = SceneSample(
        vox_coords=vox, raw_coords=coords[umap],
        feats=colors[umap].astype(np.float32) / 255.0,
        labels=labels[umap].astype(np.int32),
        labels_full=labels.astype(np.int32), inverse_map=imap,
        click_idx={}, scene_name="t", num_obj=2)
    buckets = (512, 1024, 2048, 4096)

    bcfg = BackboneConfig(layers=(1, 1, 1, 1, 1, 1, 1, 1),
                          factored_conv=True)
    params, state = init_backbone(jax.random.PRNGKey(0), bcfg)

    plain = collate_scenes([sample], buckets)
    with pytest.raises(ValueError, match="factored"):
        backbone_forward(params, state, plain.pyramid,
                         jnp.asarray(plain.feats), cfg=bcfg)

    fac = collate_scenes([sample], buckets, factored=True)
    assert fac.pyramid.levels[0].z3 is not None
    fmaps, _ = backbone_forward(params, state, fac.pyramid,
                                jnp.asarray(fac.feats), cfg=bcfg)
    ref, _ = backbone_forward(params, state, plain.pyramid,
                              jnp.asarray(plain.feats),
                              cfg=dataclasses.replace(bcfg,
                                                      factored_conv=False))
    np.testing.assert_allclose(np.asarray(fmaps[-1]), np.asarray(ref[-1]),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_sparse_conv_strips_matches_scan():
    """Strip-gather conv == direct gather-GEMM conv on k3, k5 and down maps
    (same math, 3-5x fewer gather descriptors; needs the sorted-row
    invariant which build_pyramid enforces)."""
    from agile3d_tpu.ops.sparse_conv import sparse_conv_strips

    rng = np.random.default_rng(7)
    vox = _random_scene(rng, n=900, lo=-8, hi=8)
    pyr = build_pyramid(vox, num_levels=2, stem_kernel=5)
    lvl, coarse = pyr.levels[0], pyr.levels[1]
    n = len(vox)

    for nbr, k, cin, cout in ((lvl.k3, 3, 9, 13), (lvl.k5, 5, 3, 32)):
        feats = rng.standard_normal((n, cin)).astype(np.float32)
        w = rng.standard_normal((k ** 3, cin, cout)).astype(np.float32) * 0.2
        ref = np.asarray(sparse_conv(jnp.asarray(feats), jnp.asarray(nbr),
                                     jnp.asarray(w)))
        for gs in (None, 1, 4):
            out = np.asarray(sparse_conv_strips(
                jnp.asarray(feats), jnp.asarray(nbr), jnp.asarray(w), k,
                group_size=gs))
            np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    # down map: strips of 2 (kernel_offsets(2) also enumerates z fastest)
    feats = rng.standard_normal((n, 6)).astype(np.float32)
    w = rng.standard_normal((8, 6, 10)).astype(np.float32)
    ref = np.asarray(sparse_conv(jnp.asarray(feats), jnp.asarray(lvl.down),
                                 jnp.asarray(w)))
    out = np.asarray(sparse_conv_strips(
        jnp.asarray(feats), jnp.asarray(lvl.down), jnp.asarray(w), 2))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    # padded rows + grad path: pad features with zero rows beyond n
    npad = n + 64
    k3p = np.concatenate([lvl.k3, np.full((64, 27), -1, np.int32)])
    fp = np.concatenate(
        [rng.standard_normal((n, 9)).astype(np.float32), np.zeros((64, 9), np.float32)])
    w = rng.standard_normal((27, 9, 13)).astype(np.float32) * 0.2
    ref = np.asarray(sparse_conv(jnp.asarray(fp), jnp.asarray(k3p),
                                 jnp.asarray(w)))
    out = np.asarray(sparse_conv_strips(jnp.asarray(fp), jnp.asarray(k3p),
                                        jnp.asarray(w), 3))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    import jax

    def loss_strips(w_):
        return sparse_conv_strips(jnp.asarray(fp), jnp.asarray(k3p), w_, 3).sum()

    def loss_scan(w_):
        return sparse_conv(jnp.asarray(fp), jnp.asarray(k3p), w_).sum()

    g1 = np.asarray(jax.grad(loss_strips)(jnp.asarray(w)))
    g2 = np.asarray(jax.grad(loss_scan)(jnp.asarray(w)))
    np.testing.assert_allclose(g1, g2, rtol=2e-4, atol=2e-4)


def test_sparse_conv_zdilated_matches_scan():
    """Zero-select z-dilated window conv == direct gather-GEMM conv for the
    k5 stem and a k3 map (exact same math; windows are z-complete in the
    dilated set so cells sit at fixed offsets)."""
    from agile3d_tpu.ops.sparse_conv import sparse_conv_zdilated
    from agile3d_tpu.sparse.kernel_maps import (
        _sorted_index, dilated_window_maps)

    rng = np.random.default_rng(11)
    vox = _random_scene(rng, n=900, lo=-8, hi=8)
    pyr = build_pyramid(vox, num_levels=1, stem_kernel=5)
    lvl = pyr.levels[0]
    n = len(vox)
    batch = np.zeros(n, np.int32)
    ks, order = _sorted_index(lvl.grid, batch)

    for nbr, k, cin, cout in ((lvl.k5, 5, 3, 32), (lvl.k3, 3, 7, 11)):
        src, q0 = dilated_window_maps(lvl.grid, batch, ks, order, k)
        feats = rng.standard_normal((n, cin)).astype(np.float32)
        w = rng.standard_normal((k ** 3, cin, cout)).astype(np.float32) * 0.2
        ref = np.asarray(sparse_conv(jnp.asarray(feats), jnp.asarray(nbr),
                                     jnp.asarray(w)))
        for gs in (None, 1, 4):
            out = np.asarray(sparse_conv_zdilated(
                jnp.asarray(feats), jnp.asarray(src), jnp.asarray(q0),
                jnp.asarray(w), k, group_size=gs))
            np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    # padded rows keep the zero-pad invariant (pyramid-level padding)
    from agile3d_tpu.sparse.grid import pad_pyramid
    pp = pad_pyramid(build_pyramid(vox, stem_kernel=5, dilated_stem=True),
                     buckets=(1024, 2048))
    l0 = pp.levels[0]
    feats = np.zeros((l0.grid.shape[0], 3), np.float32)
    feats[:n] = rng.standard_normal((n, 3)).astype(np.float32)
    w = rng.standard_normal((125, 3, 8)).astype(np.float32) * 0.2
    out = np.asarray(sparse_conv_zdilated(
        jnp.asarray(feats), jnp.asarray(l0.zd_src), jnp.asarray(l0.zd_q0),
        jnp.asarray(w), 5))
    ref = np.asarray(sparse_conv(jnp.asarray(feats), jnp.asarray(l0.k5),
                                 jnp.asarray(w), unroll=False))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
    assert (out[n:] == 0).all()
