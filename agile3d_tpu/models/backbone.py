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

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from agile3d_tpu.config import BackboneConfig
from agile3d_tpu.ops.norm import batch_norm, init_bn
from agile3d_tpu.ops.sparse_conv import (
    linear,
    sparse_conv,
    sparse_conv_factored,
    sparse_conv_strips,
    sparse_conv_transpose,
    sparse_conv_zdilated,
)
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
    when cin != planes) -> add residual -> relu
    (reference resnet_block.py:7-64)."""
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


def _init_bottleneck_block(key, cin: int, planes: int):
    """Bottleneck (expansion 4): 1x1 -> k3 -> 1x1 with BNs
    (reference resnet_block.py:79-137)."""
    ks = jax.random.split(key, 4)
    out = planes * 4
    p = {
        "conv1": {"w": _conv_init(ks[0], 1, cin, planes)},
        "conv2": {"w": _conv_init(ks[1], 27, planes, planes)},
        "conv3": {"w": _conv_init(ks[2], 1, planes, out)},
    }
    s = {}
    p["norm1"], s["norm1"] = init_bn(planes)
    p["norm2"], s["norm2"] = init_bn(planes)
    p["norm3"], s["norm3"] = init_bn(out)
    if cin != out:
        p["downsample"] = {"conv": {"w": _conv_init(ks[3], 1, cin, out)}}
        p["downsample"]["norm"], s["downsample_norm"] = init_bn(out)
    return p, s


def _init_stage(key, cin: int, planes: int, num_blocks: int,
                block: str = "basic"):
    init_fn = (_init_bottleneck_block if block == "bottleneck"
               else _init_basic_block)
    expansion = 4 if block == "bottleneck" else 1
    ks = jax.random.split(key, num_blocks)
    blocks_p, blocks_s = [], []
    for i in range(num_blocks):
        bp, bs = init_fn(ks[i], cin if i == 0 else planes * expansion, planes)
        blocks_p.append(bp)
        blocks_s.append(bs)
    return blocks_p, blocks_s


# ---------------------------------------------------------------------------
# Model-family registry: the reference's Res16UNet variants differ only in
# (BLOCK, LAYERS, PLANES) class attributes (reference res16unet.py:298-423).
# Express each as a BackboneConfig preset; `block` selects BasicBlock or
# Bottleneck (reference models/modules/resnet_block.py:7-149).
# ---------------------------------------------------------------------------

import dataclasses as _dc


def _variant(layers, planes, block="basic"):
    return BackboneConfig(layers=tuple(layers), planes=tuple(planes),
                          block=block)


_L14 = (1, 1, 1, 1, 1, 1, 1, 1)
_L18 = (2, 2, 2, 2, 2, 2, 2, 2)
_L34 = (2, 3, 4, 6, 2, 2, 2, 2)
_P_BASE = (32, 64, 128, 256, 256, 256, 256, 256)

BACKBONE_VARIANTS = {
    "Res16UNet14": _variant(_L14, _P_BASE),
    "Res16UNet18": _variant(_L18, _P_BASE),
    "Res16UNet34": _variant(_L34, _P_BASE),
    "Res16UNet50": _variant(_L34, _P_BASE, block="bottleneck"),
    "Res16UNet101": _variant((2, 3, 4, 23, 2, 2, 2, 2), _P_BASE,
                             block="bottleneck"),
    "Res16UNet14A": _variant(_L14, (32, 64, 128, 256, 128, 128, 96, 96)),
    "Res16UNet14A2": _variant((1, 1, 1, 1, 2, 2, 2, 2),
                              (32, 64, 128, 256, 128, 128, 96, 96)),
    "Res16UNet14B": _variant(_L14, (32, 64, 128, 256, 128, 128, 128, 128)),
    "Res16UNet14B2": _variant((1, 1, 1, 1, 2, 2, 2, 2),
                              (32, 64, 128, 256, 128, 128, 128, 128)),
    "Res16UNet14B3": _variant((2, 2, 2, 2, 1, 1, 1, 1),
                              (32, 64, 128, 256, 128, 128, 128, 128)),
    "Res16UNet14C": _variant(_L14, (32, 64, 128, 256, 192, 192, 128, 128)),
    "Res16UNet14D": _variant(_L14, (32, 64, 128, 256, 384, 384, 384, 384)),
    "Res16UNet18A": _variant(_L18, (32, 64, 128, 256, 128, 128, 96, 96)),
    "Res16UNet18B": _variant(_L18, (32, 64, 128, 256, 128, 128, 128, 128)),
    "Res16UNet18D": _variant(_L18, (32, 64, 128, 256, 384, 384, 384, 384)),
    "Res16UNet34A": _variant(_L34, (32, 64, 128, 256, 256, 128, 64, 64)),
    "Res16UNet34B": _variant(_L34, (32, 64, 128, 256, 256, 128, 64, 32)),
    "Res16UNet34C": _variant(_L34, (32, 64, 128, 256, 256, 128, 96, 96)),
    "Res16UNet34D": _variant(_L34, (32, 64, 128, 256, 256, 128, 96, 128)),
    "Custom30M": _variant(_L34, (32, 64, 128, 256, 128, 64, 64, 32)),
}


def backbone_config(name: str) -> BackboneConfig:
    """Canonical variant lookup; the flagship is Res16UNet34C (reference
    models/backbone.py:5-7)."""
    return BACKBONE_VARIANTS[name]


def init_backbone(key, cfg: BackboneConfig = BackboneConfig()):
    planes, layers, d0 = cfg.planes, cfg.layers, cfg.init_dim
    exp = cfg.expansion
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
            next(ks), down_in, planes[i], layers[i], cfg.block
        )
        down_in = planes[i] * exp

    # up path: convtr{4..7} + block{5..8}; skip channels from the down path
    # carry the block expansion exactly as the reference's inplanes updates
    # (reference res16unet.py:140,163,186,209)
    skips = [planes[2] * exp, planes[1] * exp, planes[0] * exp, d0]
    tr_in = planes[3] * exp
    for j in range(4):
        i = 4 + j
        p[f"convtr{i}"] = {"w": _conv_init(next(ks), 8, tr_in, planes[i])}
        p[f"bntr{i}"], s[f"bntr{i}"] = init_bn(planes[i])
        cat_ch = planes[i] + skips[j]
        p[f"block{i+1}"], s[f"block{i+1}"] = _init_stage(
            next(ks), cat_ch, planes[i], layers[i], cfg.block
        )
        tr_in = planes[i] * exp

    return p, s


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _strips_wins(k: int, cin: int) -> bool:
    """Packed-strip gathers beat per-offset row gathers only when a packed
    strip row fits one HBM transaction granule: k*C_in*itemsize <= ~512 B.
    The itemsize is the RESOLVED packed dtype (ops/sparse_conv.
    _packed_default_dtype): bf16 under default matmul precision on TPU,
    but f32 when the user raises the precision or off-TPU — the routing
    must follow, or it picks strips outside the measured win region
    (ADVICE r2). Measured (tools/probe_packed_bf16.py, 185k-voxel scene):
    k5 stem 73.9 -> 19.3 ms; 96-ch k3 (576 B rows) regresses 20 -> 36 ms.

    AGILE3D_STRIPS_KS (perf sweeps): kernel sizes allowed to use strips,
    e.g. "5" = stem only, "53" = stem + k3, "" = none."""
    import os

    import jax.numpy as jnp

    from agile3d_tpu.ops.sparse_conv import _packed_default_dtype

    ks = os.environ.get("AGILE3D_STRIPS_KS")
    if ks is not None and str(k) not in ks:
        return False
    itemsize = jnp.dtype(_packed_default_dtype(jnp.float32)).itemsize
    return k * cin * itemsize <= 512


def stem_banded_active(cfg, level0, training: bool) -> bool:
    """True when the eval stem will route through the banded Mosaic kernel
    (ops/banded_stem.py) for this level. The SINGLE source of truth for
    that routing decision — engine/eval.device_batch keys the k5 transfer
    drop on it, so the two must never drift."""
    import os as _os

    use_banded = cfg.banded_conv
    if use_banded is None:
        use_banded = jax.default_backend() == "tpu"
    return (use_banded and not training and cfg.conv1_kernel_size == 5
            and getattr(level0, "sb_r0", None) is not None
            and _os.environ.get("AGILE3D_STEM_BANDED", "1") != "0")


def _conv3(x, k3, zb, w, strips=False, bnd=None):
    """k3 conv: packed-strip gathers where they win (strips=True and narrow
    C_in), the banded Mosaic kernel for wide channels when the level carries
    banded aux (bnd=(blo, bw0) — eval path on TPU, ops/banded_conv.py),
    factored two-stage form when the maps exist (zb tuple), else the direct
    27-offset gather-GEMM."""
    if strips and _strips_wins(3, x.shape[1]):
        return sparse_conv_strips(x, k3, w, 3)
    if bnd is not None:
        from agile3d_tpu.ops.banded_conv import banded_conv

        return banded_conv(x, k3, bnd[0], bnd[1], w,
                           exc=bnd[2]).astype(x.dtype)
    if zb is not None:
        return sparse_conv_factored(x, zb[0], zb[1], w)
    return sparse_conv(x, k3, w)


def _residual_block(p, s, x, k3, valid, zb=None, *, training: bool,
                    momentum: float, strips: bool = False, bnd=None):
    """BasicBlock or Bottleneck, distinguished by the presence of conv3."""
    s_new = {}

    def bn(name, y):
        out, s_new[name] = batch_norm(y, valid, p[name], s[name],
                                      training=training, momentum=momentum)
        return out

    if "conv3" in p:  # bottleneck (reference resnet_block.py:117-137)
        out = jax.nn.relu(bn("norm1", linear(x, p["conv1"]["w"])))
        out = jax.nn.relu(bn("norm2", _conv3(out, k3, zb, p["conv2"]["w"],
                                             strips, bnd)))
        out = bn("norm3", linear(out, p["conv3"]["w"]))
    else:             # basic block (reference resnet_block.py:48-64)
        out = jax.nn.relu(bn("norm1", _conv3(x, k3, zb, p["conv1"]["w"],
                                             strips, bnd)))
        out = bn("norm2", _conv3(out, k3, zb, p["conv2"]["w"], strips, bnd))

    if "downsample" in p:
        residual = linear(x, p["downsample"]["conv"]["w"])
        residual, s_new["downsample_norm"] = batch_norm(
            residual, valid, p["downsample"]["norm"], s["downsample_norm"],
            training=training, momentum=momentum)
    else:
        residual = x
    return jax.nn.relu(out + residual), s_new


def _stage(p_list, s_list, x, k3, valid, zb=None, *, training, momentum,
           scan_blocks=False, strips=False, bnd=None):
    # per-block rematerialization: the backward pass recomputes each block's
    # activations instead of keeping all 26 blocks' intermediates alive
    # (jax.checkpoint, SURVEY.md TPU design notes on HBM)
    blk = jax.checkpoint(
        functools.partial(_residual_block, training=training,
                          momentum=momentum, strips=strips, bnd=bnd))
    if not scan_blocks:
        s_new = []
        for bp, bs in zip(p_list, s_list):
            x, ns = blk(bp, bs, x, k3, valid, zb)
            s_new.append(ns)
        return x, s_new

    # cfg.scan_blocks (auto: on for TPU): first block has unique shapes
    # (channel change + downsample); the identical tail blocks run as ONE
    # lax.scan over stacked params, shrinking the stage HLO to 2 block
    # bodies. TPU cold compile 223s -> 172s at identical steady state;
    # XLA:CPU compiles this form 3.5x SLOWER, hence the backend switch.
    x, ns0 = blk(p_list[0], s_list[0], x, k3, valid, zb)
    s_new = [ns0]
    tail_p, tail_s = list(p_list[1:]), list(s_list[1:])
    if not tail_p:
        return x, s_new
    stacked_p = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *tail_p)
    stacked_s = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *tail_s)

    def body(h, ps):
        p, s = ps
        h, ns = blk(p, s, h, k3, valid, zb)
        return h, ns

    x, ns_stacked = jax.lax.scan(body, x, (stacked_p, stacked_s))
    for i in range(len(tail_p)):
        s_new.append(jax.tree_util.tree_map(lambda a, i=i: a[i], ns_stacked))
    return x, s_new


def backbone_forward(
    params,
    state,
    pyr: PaddedPyramid,
    feats: jax.Array,
    *,
    training: bool = False,
    cfg: BackboneConfig = BackboneConfig(),
    compute_dtype=None,
):
    """Run the UNet. Returns (feature_maps, new_state) where feature_maps is
    the 5-level FPN [stride16, 8, 4, 2, 1] exactly as the reference's
    ``forward(..., out_fpn=True)`` (res16unet.py:250-295); feature_maps[-1]
    is the stride-1 output fed to the decoder.

    compute_dtype (e.g. jnp.bfloat16) halves the gather/GEMM HBM traffic;
    BatchNorm statistics stay float32 either way.
    """
    mom = cfg.bn_momentum
    lv = pyr.levels
    ns = {}
    cd = compute_dtype
    scan_blocks = cfg.scan_blocks
    if scan_blocks is None:  # auto per backend (see BackboneConfig)
        scan_blocks = jax.default_backend() == "tpu"

    def bn(name, x, valid):
        y, ns[name] = batch_norm(x.astype(jnp.float32), valid, params[name],
                                 state[name], training=training, momentum=mom)
        return y.astype(cd) if cd else y

    if cd:
        feats = feats.astype(cd)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(cd) if x.dtype == jnp.float32 else x, params)

    if cfg.factored_conv and getattr(lv[0], "z3", None) is None:
        raise ValueError(
            "BackboneConfig.factored_conv=True but the pyramid carries no "
            "factored maps — build it with build_pyramid(..., factored=True) "
            "or collate_scenes(..., factored=True)")

    def zb_of(level):
        if cfg.factored_conv and getattr(level, "z3", None) is not None:
            return (level.z3, level.b9)
        return None

    # banded Mosaic kernel: auto-on for TPU (training too — the kernel
    # carries a custom VJP: dX via the stencil-transpose identity, dW via
    # the accumulating kernel), and only for levels whose host prep
    # produced aux (see ops/banded_conv.py). Training additionally caps
    # the level size: the remat backward at the canonical 524k-voxel train
    # bucket measured 20.3 G HBM (52% allocator fragmentation around the
    # kernel's padded operands) vs the 15.75 G v5e budget, while the scan
    # conv's XLA-native VJP fits — so big-batch training falls back per
    # level and smaller batches keep the banded win.
    import os as _os

    banded_train_max = int(_os.environ.get("AGILE3D_BANDED_TRAIN_MAX",
                                           262144))
    use_banded = cfg.banded_conv
    if use_banded is None:
        use_banded = jax.default_backend() == "tpu"

    def bnd_of(level):
        if not use_banded or getattr(level, "blo", None) is None:
            return None
        if training and level.k3.shape[0] > banded_train_max:
            return None
        return (level.blo, level.bw0, getattr(level, "bexc", None))

    # stem at stride 1: strip gathers (k^2 column strips vs k^3 row
    # gathers), else factored two-stage when maps exist, else grouped scan
    # over the 125 offsets
    stem_w = params["conv0p1s1"]["w"]
    if cfg.stem_zdilated and getattr(lv[0], "zd_q0", None) is None:
        raise ValueError(
            "BackboneConfig.stem_zdilated=True but the pyramid carries no "
            "dilated window maps — build it with "
            "build_pyramid(..., dilated_stem=True) or "
            "collate_scenes(..., dilated_stem=True)")
    if stem_banded_active(cfg, lv[0], training):
        # banded Mosaic stem: 25 windowed one-hot strip gathers + in-kernel
        # compaction replace the XLA strips path's random-access gathers
        # and lane-padded selects (ops/banded_stem.py). Eval only — the
        # stem is the first layer, training keeps the strips conv whose
        # VJP is XLA-native.
        from agile3d_tpu.ops.banded_stem import banded_stem_conv

        out = banded_stem_conv(feats, lv[0].sb_r0, lv[0].sb_rank,
                               lv[0].sb_w0, lv[0].sb_lo, lv[0].sb_exc,
                               stem_w).astype(feats.dtype)
    elif (cfg.strip_conv and cfg.stem_zdilated
            and getattr(lv[0], "zd_q0", None) is not None
            and _strips_wins(cfg.conv1_kernel_size, cfg.in_channels)):
        # zero-select packed windows over the z-dilated set — measured
        # SLOWER than strips on v5e (gather cost grows with operand
        # footprint, |D| ~= 2.7N; PERF.md zdilated postmortem): opt-in only
        out = sparse_conv_zdilated(feats, lv[0].zd_src, lv[0].zd_q0,
                                   stem_w, cfg.conv1_kernel_size)
    elif cfg.strip_conv and _strips_wins(cfg.conv1_kernel_size,
                                         cfg.in_channels):
        out = sparse_conv_strips(feats, lv[0].k5, stem_w,
                                 cfg.conv1_kernel_size)
    elif (cfg.factored_conv and cfg.conv1_kernel_size == 5
            and getattr(lv[0], "z5", None) is not None):
        out = sparse_conv_factored(feats, lv[0].z5, lv[0].b25, stem_w,
                                   unroll=False)
    else:
        out = sparse_conv(feats, lv[0].k5, stem_w, unroll=False)
    out_p1 = jax.nn.relu(bn("bn0", out, lv[0].valid))

    # down path
    skips = [out_p1]
    out = out_p1
    for i in range(4):
        if cfg.strip_conv and _strips_wins(2, out.shape[1]):
            out = sparse_conv_strips(out, lv[i].down,
                                     params[f"conv{i+1}"]["w"], 2)
        else:
            out = sparse_conv(out, lv[i].down, params[f"conv{i+1}"]["w"])
        out = jax.nn.relu(bn(f"bn{i+1}", out, lv[i + 1].valid))
        out, ns[f"block{i+1}"] = _stage(
            params[f"block{i+1}"], state[f"block{i+1}"], out,
            lv[i + 1].k3, lv[i + 1].valid, zb_of(lv[i + 1]),
            training=training, momentum=mom, scan_blocks=scan_blocks,
            strips=cfg.strip_conv, bnd=bnd_of(lv[i + 1]))
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
            lv[tgt].k3, lv[tgt].valid, zb_of(lv[tgt]),
            training=training, momentum=mom, scan_blocks=scan_blocks,
            strips=cfg.strip_conv, bnd=bnd_of(lv[tgt]))
        feature_maps.append(out)

    return feature_maps, ns
