"""forward_mask parity: JAX padded decoder vs the torch reference harness
with identical weights (SURVEY.md section 7 hard part #2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agile3d_tpu.config import ModelConfig
from agile3d_tpu.models.agile3d import (
    ClickState,
    SceneFeatures,
    forward_mask,
    init_agile3d,
)
from agile3d_tpu.ops.pos_enc import fourier_pos, positional_encoding_1d
from tests.torch_ref import TorchRefDecoder, fourier_pos_torch


CFG = ModelConfig(max_clicks=32, max_fg_objects=10)


def make_scene(rng, n_valid, n_pad, c=128):
    raw = rng.random((n_pad, 3)).astype(np.float32) * 5
    raw[n_valid:] = 0
    feat = rng.standard_normal((n_pad, c)).astype(np.float32) * 0.5
    feat[n_valid:] = 0
    return raw, feat


def build_scene_features(raw, feat, n_valid, buffers):
    valid = np.zeros(raw.shape[0], bool)
    valid[:n_valid] = True
    cmin = raw[:n_valid].min(0)
    cmax = raw[:n_valid].max(0)
    pos = np.array(fourier_pos(
        jnp.asarray(raw), buffers["gauss_B"],
        jnp.asarray(cmin), jnp.asarray(cmax)))
    pos[~valid] = 0
    return SceneFeatures(
        mask_feat=jnp.asarray(feat)[None],
        pos_pcd=jnp.asarray(pos)[None],
        vox_valid=jnp.asarray(valid)[None],
        raw=jnp.asarray(raw)[None],
        cmin=jnp.asarray(cmin)[None],
        cmax=jnp.asarray(cmax)[None],
    )


def clicks_from_dicts(click_idx, click_time_idx, cfg):
    vox = np.full((1, cfg.max_clicks), -1, np.int32)
    obj = np.zeros((1, cfg.max_clicks), np.int32)
    tim = np.zeros((1, cfg.max_clicks), np.int32)
    slot = 0
    for o, ids in click_idx.items():
        for i, t in zip(ids, click_time_idx[o]):
            vox[0, slot] = i
            obj[0, slot] = int(o)
            tim[0, slot] = t
            slot += 1
    return ClickState(vox=jnp.asarray(vox), obj=jnp.asarray(obj),
                      time=jnp.asarray(tim))


@pytest.mark.parametrize("with_bg_clicks", [False, True])
@pytest.mark.slow
def test_forward_mask_matches_torch(with_bg_clicks):
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    params, buffers, _ = init_agile3d(key, CFG)

    n_valid, n_pad = 300, 384
    raw, feat = make_scene(rng, n_valid, n_pad)
    scene = build_scene_features(raw, feat, n_valid, buffers)

    click_idx = {"0": [5, 17] if with_bg_clicks else [],
                 "1": [40, 40, 77], "2": [120], "3": [200, 250]}
    click_time_idx = {"0": [3, 6] if with_bg_clicks else [],
                      "1": [0, 4, 5], "2": [1], "3": [2, 7]}
    clicks = clicks_from_dicts(click_idx, click_time_idx, CFG)
    num_obj = jnp.asarray([3], jnp.int32)

    out = forward_mask(params, buffers, scene, clicks, num_obj, cfg=CFG)
    jax_preds = np.asarray(out["all_masks"])  # [R, 1, N, 1+K]

    tref = TorchRefDecoder(params, buffers, CFG)
    torch_preds = tref.forward_mask(feat[:n_valid], np.asarray(scene.pos_pcd[0])[:n_valid],
                                    raw[:n_valid], click_idx, click_time_idx)

    for r in range(CFG.num_decoders):
        got = jax_preds[r, 0, :n_valid, : 1 + 3]
        np.testing.assert_allclose(got, torch_preds[r], rtol=2e-3, atol=2e-3)
    # padded object columns are NEG_INF
    assert (jax_preds[:, 0, :, 4:] < -1e8).all()


def test_fourier_pos_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    xyz = rng.random((50, 3)).astype(np.float32) * 4
    b = rng.standard_normal((3, 64)).astype(np.float32)
    cmin, cmax = xyz.min(0), xyz.max(0)
    mine = np.asarray(fourier_pos(jnp.asarray(xyz), jnp.asarray(b),
                                  jnp.asarray(cmin), jnp.asarray(cmax)))
    ref = fourier_pos_torch(torch.from_numpy(xyz), b,
                            torch.from_numpy(cmin), torch.from_numpy(cmax))
    np.testing.assert_allclose(mine, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_time_table_matches_reference_formula():
    pe = positional_encoding_1d(128, 200)
    import math
    # spot check a few entries against the closed form
    for t in (0, 1, 57, 199):
        for i in (0, 2, 126):
            w = math.exp(i * -(math.log(10000.0) / 128))
            assert abs(pe[t, i] - math.sin(t * w)) < 1e-5
            assert abs(pe[t, i + 1] - math.cos(t * w)) < 1e-5
