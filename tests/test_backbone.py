"""Res16UNet34C backbone: shapes, zero-pad invariant, BN state plumbing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # minutes-scale on a 1-core host (fast tier: -m 'not slow')

from agile3d_tpu.config import BackboneConfig, ModelConfig
from agile3d_tpu.models.backbone import backbone_forward, init_backbone
from agile3d_tpu.models.agile3d import forward_backbone, init_agile3d
from agile3d_tpu.sparse import build_pyramid, pad_pyramid
from agile3d_tpu.sparse.grid import pad_features


def _scene(rng, n=600, hi=16):
    vox = np.unique(rng.integers(0, hi, size=(n, 3)).astype(np.int32), axis=0)
    raw = (vox + rng.random((len(vox), 3))).astype(np.float32) * 0.05
    feats = rng.random((len(vox), 3)).astype(np.float32)
    return vox, raw, feats


def test_backbone_shapes_and_padding():
    rng = np.random.default_rng(0)
    vox, raw, feats = _scene(rng)
    pyr = build_pyramid(vox)
    pp = pad_pyramid(pyr, buckets=(512, 1024, 2048))
    cfg = BackboneConfig()
    params, state = init_backbone(jax.random.PRNGKey(0), cfg)

    x = jnp.asarray(pad_features(feats, pp.levels[0].grid.shape[0]))
    fmaps, new_state = backbone_forward(params, state, pp, x, training=False,
                                        cfg=cfg)
    assert len(fmaps) == 5
    # channels: stride16..stride1 per PLANES (reference res16unet.py:372)
    chans = [f.shape[1] for f in fmaps]
    assert chans == [256, 256, 128, 96, 96]
    # fmap levels run coarse->fine: 4,3,2,1,0
    for f, lvl in zip(fmaps, [4, 3, 2, 1, 0]):
        plvl = pp.levels[lvl]
        assert f.shape[0] == plvl.grid.shape[0]
        out = np.asarray(f)
        assert np.isfinite(out).all()
        assert (out[~plvl.valid] == 0).all(), f"pad rows dirty at level {lvl}"
        assert np.abs(out[plvl.valid]).sum() > 0

    # eval mode must not touch BN state
    flat_old = jax.tree_util.tree_leaves(state)
    flat_new = jax.tree_util.tree_leaves(new_state)
    for a, b in zip(flat_old, flat_new):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # training mode must update running stats
    _, tstate = backbone_forward(params, state, pp, x, training=True, cfg=cfg)
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(flat_old, jax.tree_util.tree_leaves(tstate))
    )
    assert changed


def test_forward_backbone_scene_features():
    rng = np.random.default_rng(1)
    vox, raw, feats = _scene(rng)
    pyr = build_pyramid(vox)
    pp = pad_pyramid(pyr, buckets=(512, 1024, 2048))
    n0 = pp.levels[0].grid.shape[0]
    cfg = ModelConfig(max_clicks=32)
    params, buffers, state = init_agile3d(jax.random.PRNGKey(1), cfg)

    n_valid = len(vox)
    sample_idx = np.full((1, n0), -1, np.int32)
    sample_idx[0, :n_valid] = np.arange(n_valid)

    scene, _ = forward_backbone(
        params, buffers, state, pp,
        jnp.asarray(pad_features(feats, n0)),
        jnp.asarray(pad_features(raw, n0)),
        jnp.asarray(sample_idx), training=False, cfg=cfg)

    assert scene.mask_feat.shape == (1, n0, cfg.hidden_dim)
    assert scene.pos_pcd.shape == (1, n0, cfg.hidden_dim)
    assert bool(scene.vox_valid.sum() == n_valid)
    np.testing.assert_allclose(np.asarray(scene.cmin[0]), raw.min(0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.cmax[0]), raw.max(0), rtol=1e-6)
    # pos enc range: sin/cos in [-1, 1]
    assert np.abs(np.asarray(scene.pos_pcd)).max() <= 1.0 + 1e-5
