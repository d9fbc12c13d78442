"""Res16UNet34C sparse-voxel UNet backbone, TPU-native.

Re-implements the capability of the reference backbone (reference
models/res16unet.py:222-295, models/resnet.py:96-149,
models/modules/resnet_block.py:48-64) over the gather-GEMM sparse ops:

  stem conv k=5 at stride 1 -> 4 down stages (k=2 s=2 conv + BasicBlocks)
  -> 4 up stages (k=2 s=2 transposed conv + skip-concat + BasicBlocks),
  emitting 5 feature maps at strides 16/8/4/2/1.

Canonical variant Res16UNet34C: PLANES=(32,64,128,256,256,128,96,96),
LAYERS=(2,3,4,6,2,2,2,2), INIT_DIM=32 (reference res16unet.py:310,371-372).
Param names mirror the reference module names (conv0p1s1, bn0, block1, ...,
convtr7p2s2, block8) so the torch->jax checkpoint converter is a direct
rename (utils/ckpt.py).

All functions are pure: (params, state, pyramid, feats) -> (outputs, state').
``state`` holds BatchNorm running stats.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from agile3d_tpu.config import BackboneConfig
from agile3d_tpu.ops.norm import batch_norm, init_bn
from agile3d_tpu.ops.sparse_conv import linear, sparse_conv, sparse_conv_transpose
from agile3d_tpu.sparse.grid import PaddedPyramid


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _conv_init(key, k_vol: int, cin: int, cout: int, fan: int | None = None):
    """ME MinkowskiConvolution default init: uniform(+-1/sqrt(fan_in * K))."""
    fan = fan if fan is not None else cin
    stdv = 1.0 / math.sqrt(fan * k_vol)
    shape = (k_vol, cin, cout) if k_vol > 1 else (cin, cout)
    return jax.random.uniform(key, shape, jnp.float32, -stdv, stdv)


def _init_basic_block(key, cin: int, planes: int):
    """BasicBlock: conv k3 -> BN -> relu -> conv k3 -> BN (+ 1x1 downsample
    when cin != planes) -> add residual -> relu."""
    ks = jax.random.split(key, 3)
    p = {
        "conv1": {"w": _conv_init(ks[0], 27, cin, planes)},
        "conv2": {"w": _conv_init(ks[1], 27, planes, planes)},
    }
    s = {}
    p["norm1"], s["norm1"] = init_bn(planes)
    p["norm2"], s["norm2"] = init_bn(planes)
    if cin != planes:
        p["downsample"] = {"conv": {"w": _conv_init(ks[2], 1, cin, planes)}}
        p["downsample"]["norm"], s["downsample_norm"] = init_bn(planes)
    return p, s


def _init_stage(key, cin: int, planes: int, num_blocks: int):
    ks = jax.random.split(key, num_blocks)
    blocks_p, blocks_s = [], []
    for i in range(num_blocks):
        bp, bs = _init_basic_block(ks[i], cin if i == 0 else planes, planes)
        blocks_p.append(bp)
        blocks_s.append(bs)
    return blocks_p, blocks_s


def init_backbone(key, cfg: BackboneConfig = BackboneConfig()):
    planes, layers, d0 = cfg.planes, cfg.layers, cfg.init_dim
    kvol_stem = cfg.conv1_kernel_size ** 3
    ks = iter(jax.random.split(key, 32))
    p, s = {}, {}

    p["conv0p1s1"] = {"w": _conv_init(next(ks), kvol_stem, cfg.in_channels, d0)}
    p["bn0"], s["bn0"] = init_bn(d0)

    # down path: conv{i}p*s2 (k2 s2) + block{i}
    down_in = d0
    for i in range(4):
        p[f"conv{i+1}"] = {"w": _conv_init(next(ks), 8, down_in, down_in)}
        p[f"bn{i+1}"], s[f"bn{i+1}"] = init_bn(down_in)
        p[f"block{i+1}"], s[f"block{i+1}"] = _init_stage(
            next(ks), down_in, planes[i], layers[i]
        )
        down_in = planes[i]

    # up path: convtr{4..7} + block{5..8}; skip channels from the down path
    skips = [planes[2], planes[1], planes[0], d0]
    tr_in = planes[3]
    for j in range(4):
        i = 4 + j
        p[f"convtr{i}"] = {"w": _conv_init(next(ks), 8, tr_in, planes[i])}
        p[f"bntr{i}"], s[f"bntr{i}"] = init_bn(planes[i])
        cat_ch = planes[i] + skips[j]
        p[f"block{i+1}"], s[f"block{i+1}"] = _init_stage(
            next(ks), cat_ch, planes[i], layers[i]
        )
        tr_in = planes[i]

    return p, s


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _basic_block(p, s, x, k3, valid, *, training: bool, momentum: float):
    s_new = {}
    out = sparse_conv(x, k3, p["conv1"]["w"])
    out, s_new["norm1"] = batch_norm(out, valid, p["norm1"], s["norm1"],
                                     training=training, momentum=momentum)
    out = jax.nn.relu(out)
    out = sparse_conv(out, k3, p["conv2"]["w"])
    out, s_new["norm2"] = batch_norm(out, valid, p["norm2"], s["norm2"],
                                     training=training, momentum=momentum)
    if "downsample" in p:
        residual = linear(x, p["downsample"]["conv"]["w"])
        residual, s_new["downsample_norm"] = batch_norm(
            residual, valid, p["downsample"]["norm"], s["downsample_norm"],
            training=training, momentum=momentum)
    else:
        residual = x
    return jax.nn.relu(out + residual), s_new


def _stage(p_list, s_list, x, k3, valid, *, training, momentum):
    s_new = []
    for bp, bs in zip(p_list, s_list):
        x, ns = _basic_block(bp, bs, x, k3, valid, training=training,
                             momentum=momentum)
        s_new.append(ns)
    return x, s_new


def backbone_forward(
    params,
    state,
    pyr: PaddedPyramid,
    feats: jax.Array,
    *,
    training: bool = False,
    cfg: BackboneConfig = BackboneConfig(),
):
    """Run the UNet. Returns (feature_maps, new_state) where feature_maps is
    the 5-level FPN [stride16, 8, 4, 2, 1] exactly as the reference's
    ``forward(..., out_fpn=True)`` (res16unet.py:250-295); feature_maps[-1]
    is the stride-1 output fed to the decoder."""
    mom = cfg.bn_momentum
    lv = pyr.levels
    ns = {}

    def bn(name, x, valid):
        y, ns[name] = batch_norm(x, valid, params[name], state[name],
                                 training=training, momentum=mom)
        return y

    # stem at stride 1
    out = sparse_conv(feats, lv[0].k5, params["conv0p1s1"]["w"])
    out_p1 = jax.nn.relu(bn("bn0", out, lv[0].valid))

    # down path
    skips = [out_p1]
    out = out_p1
    for i in range(4):
        out = sparse_conv(out, lv[i].down, params[f"conv{i+1}"]["w"])
        out = jax.nn.relu(bn(f"bn{i+1}", out, lv[i + 1].valid))
        out, ns[f"block{i+1}"] = _stage(
            params[f"block{i+1}"], state[f"block{i+1}"], out,
            lv[i + 1].k3, lv[i + 1].valid, training=training, momentum=mom)
        skips.append(out)

    feature_maps = [out]  # stride 16

    # up path
    for j in range(4):
        i = 4 + j
        tgt = 3 - j  # target level index (3, 2, 1, 0)
        out = sparse_conv_transpose(
            out, lv[tgt].up_parent, lv[tgt].up_offset, params[f"convtr{i}"]["w"])
        out = jax.nn.relu(bn(f"bntr{i}", out, lv[tgt].valid))
        out = jnp.concatenate([out, skips[tgt]], axis=1)
        out, ns[f"block{i+1}"] = _stage(
            params[f"block{i+1}"], state[f"block{i+1}"], out,
            lv[tgt].k3, lv[tgt].valid, training=training, momentum=mom)
        feature_maps.append(out)

    return feature_maps, ns
