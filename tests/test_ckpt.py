"""Checkpoint conversion round-trip + orbax save/load."""

import jax
import numpy as np

from agile3d_tpu.config import ModelConfig
from agile3d_tpu.models.agile3d import init_agile3d
from agile3d_tpu.utils.ckpt import (
    convert_torch_state_dict,
    export_torch_state_dict,
    load_checkpoint,
    save_checkpoint,
)

CFG = ModelConfig()


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_torch_conversion_round_trip():
    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0), CFG)
    sd = export_torch_state_dict(params, buffers, CFG, bn_state)
    # every tensor of the reference's state_dict surface is covered
    assert "backbone.conv0p1s1.kernel" in sd
    assert "c2s_attention.2.0.multihead_attn.in_proj_weight" in sd
    assert sd["mask_embed_head.0.weight"].shape == (128, 128)
    assert sd["backbone.block4.0.downsample.0.kernel"].shape == (128, 256)

    p2, b2, s2 = convert_torch_state_dict(sd, CFG)
    _tree_equal(params, p2)
    np.testing.assert_allclose(np.asarray(buffers["gauss_B"]),
                               b2["gauss_B"], rtol=1e-6)
    _tree_equal(bn_state, s2)


def test_orbax_save_load(tmp_path):
    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(1), CFG)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, params, buffers, bn_state, epoch=7)
    template = {"params": params, "buffers": buffers, "bn_state": bn_state,
                "epoch": np.asarray(0)}
    restored = load_checkpoint(path, template)
    _tree_equal(params, restored["params"])
    _tree_equal(bn_state, restored["bn_state"])
    assert int(restored["epoch"]) == 7


def test_orbax_restore_lands_on_template_device(tmp_path):
    """Restored arrays must be committed to the TEMPLATE leaf's device,
    not wherever orbax puts them (host): a jit fed committed-CPU inputs
    lowers for the CPU platform, which crashed --resume on the TPU host
    (Mosaic kernels refuse CPU lowering). Pin placement on a non-default
    device of the 8-device CPU mesh."""
    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs >= 2 devices")
    dev = jax.devices()[3]
    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(1), CFG)
    params_d = jax.device_put(params, dev)
    path = str(tmp_path / "ckpt_dev")
    save_checkpoint(path, params_d, buffers, bn_state, epoch=1)
    template = {"params": params_d, "buffers": buffers,
                "bn_state": bn_state, "epoch": np.asarray(0)}
    restored = load_checkpoint(path, template)
    leaf = jax.tree_util.tree_leaves(restored["params"])[0]
    assert leaf.devices() == {dev}, leaf.devices()
