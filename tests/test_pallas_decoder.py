"""Pallas fused decoder path vs the XLA reference path (interpreter mode on
CPU; the real kernels run on TPU in bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agile3d_tpu.config import ModelConfig
from agile3d_tpu.models.agile3d import ClickState, forward_mask, init_agile3d
from agile3d_tpu.models.agile3d_pallas import forward_mask_pallas
from tests.test_decoder_parity import build_scene_features, make_scene

CFG = ModelConfig(max_clicks=32)


@pytest.mark.parametrize("with_bg_clicks", [False, True])
def test_pallas_decoder_matches_xla(with_bg_clicks):
    rng = np.random.default_rng(0)
    params, buffers, _ = init_agile3d(jax.random.PRNGKey(0), CFG)

    n_valid, n_pad = 1500, 2048
    raw, feat = make_scene(rng, n_valid, n_pad)
    scene = build_scene_features(raw, feat, n_valid, buffers)

    vox = np.full((1, CFG.max_clicks), -1, np.int32)
    obj = np.zeros((1, CFG.max_clicks), np.int32)
    tim = np.zeros((1, CFG.max_clicks), np.int32)
    picks = [(40, 1), (77, 1), (320, 2), (600, 3), (1100, 2)]
    if with_bg_clicks:
        picks += [(5, 0), (900, 0)]
    for i, (v, o) in enumerate(picks):
        vox[0, i], obj[0, i], tim[0, i] = v, o, i
    clicks = ClickState(jnp.asarray(vox), jnp.asarray(obj), jnp.asarray(tim))
    num_obj = jnp.asarray([3], jnp.int32)

    ref = forward_mask(params, buffers, scene, clicks, num_obj, cfg=CFG)
    got = forward_mask_pallas(params, buffers, scene, clicks, num_obj,
                              cfg=CFG, interpret=True)

    valid = np.asarray(scene.vox_valid[0])
    a = np.asarray(ref["all_masks"])[:, 0][:, valid][..., :4]
    b = np.asarray(got["all_masks"])[:, 0][:, valid][..., :4]
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)

    pa = np.asarray(ref["pred_masks"])[0, valid].argmax(-1)
    pb = np.asarray(got["pred_masks"])[0, valid].argmax(-1)
    assert (pa == pb).mean() > 0.999, (pa != pb).sum()
