"""Generality knobs (VERDICT round-1 item 10): dropout in attention/FFN and
the repeated-finest multi-hlevel decoder path.

The reference's coarse-hlevel path cannot run (pos-enc/memory length
mismatch, reference agile3d.py:280-290); repeated-finest (e.g. [4, 4]) is
its whole reachable space, so that is what forward_mask supports, with
per-(decoder, slot) weights and aux rounds = num_decoders*len(hlevels)-1.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # minutes-scale on a 1-core host (fast tier: -m 'not slow')

from agile3d_tpu.config import Config, ModelConfig
from agile3d_tpu.models.agile3d import (
    ClickState, forward_backbone, forward_mask, init_agile3d)
from agile3d_tpu.sparse import build_pyramid, pad_pyramid
from agile3d_tpu.sparse.grid import pad_features
from agile3d_tpu.utils.ckpt import convert_torch_state_dict, export_torch_state_dict


def _scene_setup(cfg, seed=0):
    rng = np.random.default_rng(seed)
    vox = np.unique(rng.integers(0, 16, (700, 3)).astype(np.int32), axis=0)
    raw = (vox + rng.random((len(vox), 3))).astype(np.float32) * 0.05
    feats = rng.random((len(vox), 3)).astype(np.float32)
    pp = pad_pyramid(build_pyramid(vox), buckets=(512, 1024))
    n0 = pp.levels[0].grid.shape[0]
    sample_idx = np.full((1, n0), -1, np.int32)
    sample_idx[0, : len(vox)] = np.arange(len(vox))
    params, buffers, state = init_agile3d(jax.random.PRNGKey(1), cfg)
    scene, _ = forward_backbone(
        params, buffers, state, pp, jnp.asarray(pad_features(feats, n0)),
        jnp.asarray(pad_features(raw, n0)), jnp.asarray(sample_idx),
        training=False, cfg=cfg)
    mc = cfg.max_clicks
    voxc = np.full((1, mc), -1, np.int32)
    obj = np.zeros((1, mc), np.int32)
    tim = np.zeros((1, mc), np.int32)
    voxc[0, :4] = [3, 50, 100, 200]
    obj[0, :4] = [1, 2, 0, 1]
    tim[0, :4] = np.arange(4)
    clicks = ClickState(jnp.asarray(voxc), jnp.asarray(obj),
                        jnp.asarray(tim))
    return params, buffers, scene, clicks


def test_dropout_train_vs_eval():
    cfg = ModelConfig(max_clicks=16, dropout=0.3)
    params, buffers, scene, clicks = _scene_setup(cfg)
    num_obj = jnp.asarray([2], jnp.int32)

    # eval (no rng): deterministic and identical to dropout=0
    out_eval = forward_mask(params, buffers, scene, clicks, num_obj, cfg=cfg)
    cfg0 = ModelConfig(max_clicks=16, dropout=0.0)
    out_d0 = forward_mask(params, buffers, scene, clicks, num_obj, cfg=cfg0)
    np.testing.assert_array_equal(np.asarray(out_eval["pred_masks"]),
                                  np.asarray(out_d0["pred_masks"]))

    # train rngs: stochastic, different keys give different logits
    o1 = forward_mask(params, buffers, scene, clicks, num_obj, cfg=cfg,
                      train_rng=jax.random.PRNGKey(0))
    o2 = forward_mask(params, buffers, scene, clicks, num_obj, cfg=cfg,
                      train_rng=jax.random.PRNGKey(1))
    a1, a2 = np.asarray(o1["pred_masks"]), np.asarray(o2["pred_masks"])
    assert np.isfinite(a1).all() and np.isfinite(a2).all()
    assert not np.allclose(a1, a2)
    assert not np.allclose(a1, np.asarray(out_eval["pred_masks"]))
    # same key reproduces
    o1b = forward_mask(params, buffers, scene, clicks, num_obj, cfg=cfg,
                       train_rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(a1, np.asarray(o1b["pred_masks"]))


def test_repeated_hlevels():
    cfg = ModelConfig(max_clicks=16, hlevels=(4, 4))
    params, buffers, scene, clicks = _scene_setup(cfg)
    assert len(params["decoders"]) == cfg.num_decoders * 2
    out = forward_mask(params, buffers, scene, clicks,
                       jnp.asarray([2], jnp.int32), cfg=cfg)
    # rounds = num_decoders * len(hlevels); aux = rounds - 1
    assert out["all_masks"].shape[0] == cfg.num_decoders * 2
    assert out["aux_masks"].shape[0] == cfg.num_decoders * 2 - 1
    assert np.isfinite(np.asarray(out["pred_masks"])).all()

    # converter round-trip covers the {d}.{i} key space
    _, _, bn = init_agile3d(jax.random.PRNGKey(0), cfg)
    sd = export_torch_state_dict(params, buffers, cfg, bn)
    assert "c2s_attention.2.1.multihead_attn.in_proj_weight" in sd
    p2, _, _ = convert_torch_state_dict(sd, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(params["decoders"]),
                    jax.tree_util.tree_leaves(p2["decoders"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_coarse_hlevel_rejected():
    cfg = ModelConfig(max_clicks=16, hlevels=(3,))
    params, buffers, scene, clicks = _scene_setup(
        ModelConfig(max_clicks=16))
    with pytest.raises(NotImplementedError, match="structurally broken"):
        forward_mask(params, buffers, scene, clicks,
                     jnp.asarray([1], jnp.int32), cfg=cfg)
