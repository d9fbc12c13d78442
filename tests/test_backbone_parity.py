"""Full-backbone activation parity: JAX Res16UNet34C vs a pure-torch
sparse-conv-over-kernel-maps emulation with shared weights routed through
the checkpoint converter (VERDICT round-1 item 2; SURVEY.md hard part #2).

The torch side consumes the exported ME-layout state_dict and indexes
kernel slices through sparse/kernel_maps.ME_KERNEL_PERM, so this closes
the chain: init -> export (inverse perm) -> convert (perm) -> identical
activations. A wrong perm table, converter rename, BN semantic, or UNet
wiring difference all fail here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # minutes-scale on a 1-core host (fast tier: -m 'not slow')

from agile3d_tpu.config import ModelConfig
from agile3d_tpu.models.agile3d import init_agile3d
from agile3d_tpu.models.backbone import backbone_forward
from agile3d_tpu.sparse import build_pyramid, pad_pyramid
from agile3d_tpu.sparse.grid import pad_features
from agile3d_tpu.utils.ckpt import convert_torch_state_dict, export_torch_state_dict
from tests.torch_ref import TorchRefBackbone

CFG = ModelConfig()


def _scene(rng, n=2500, hi=40):
    # hi=40 keeps the stride-16 level at >=8 voxels so training-mode BN is
    # well defined on the torch side too
    vox = np.unique(rng.integers(0, hi, size=(n, 3)).astype(np.int32), axis=0)
    feats = rng.random((len(vox), 3)).astype(np.float32)
    return vox, feats


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    vox, feats = _scene(rng)
    pyr = build_pyramid(vox)
    pp = pad_pyramid(pyr, buckets=(64, 512, 1024, 4096))

    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(3), CFG)
    # randomize BN affine + running stats so BN isn't identity in eval mode
    sd = export_torch_state_dict(params, buffers, CFG, bn_state)
    for k in list(sd):
        if k.endswith(".bn.weight"):
            c = sd[k].shape[0]
            sd[k] = 0.5 + rng.random(c).astype(np.float32)
            sd[k[:-6] + "bias"] = rng.standard_normal(c).astype(np.float32) * 0.1
            sd[k[:-9] + "running_mean"] = (
                rng.standard_normal(c).astype(np.float32) * 0.05)
            sd[k[:-9] + "running_var"] = (
                0.5 + rng.random(c).astype(np.float32))
    params, buffers, bn_state = convert_torch_state_dict(sd, CFG)
    return vox, feats, pyr, pp, params, bn_state, sd


@pytest.mark.parametrize("training", [False, True])
def test_backbone_activation_parity(setup, training):
    vox, feats, pyr, pp, params, bn_state, sd = setup
    torch_bb = TorchRefBackbone(sd)
    ref_fmaps, _ = torch_bb.forward(feats, pyr, training=training)

    x = jnp.asarray(pad_features(feats, pp.levels[0].grid.shape[0]))
    fmaps, _ = backbone_forward(
        params["backbone"], bn_state, pp, x, training=training,
        cfg=CFG.backbone)

    lvls = [4, 3, 2, 1, 0]
    for ref, got, lvl in zip(ref_fmaps, fmaps, lvls):
        n = pyr.levels[lvl].num_voxels
        got = np.asarray(got)[:n]
        np.testing.assert_allclose(
            got, ref, rtol=5e-4, atol=2e-4,
            err_msg=f"level {lvl} (training={training})")
