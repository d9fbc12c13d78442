"""Canonical configuration for the AGILE3D-TPU framework.

The reference duplicates an identical argparse flag set across four entry
points (main.py:24-84, eval_multi_obj.py:28-72, eval_single_obj.py:28-75,
run_UI.py:21-56). Here the model/loss/training hyper-parameters live in one
typed config consumed by every entry point; CLIs construct one of these.

Reference values: /root/reference/main.py:36-80.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    """Res16UNet34C (reference models/res16unet.py:371-372, models/backbone.py:5-7)."""

    in_channels: int = 3
    init_dim: int = 32
    planes: Sequence[int] = (32, 64, 128, 256, 256, 128, 96, 96)
    layers: Sequence[int] = (2, 3, 4, 6, 2, 2, 2, 2)
    conv1_kernel_size: int = 5          # main.py:37
    bn_momentum: float = 0.02           # main.py:38
    dilations: Sequence[int] = (1, 1, 1, 1)
    block: str = "basic"                # 'basic' | 'bottleneck'
    # Run each stage's identical tail blocks as one lax.scan over stacked
    # params (smaller HLO). None = auto per backend: ON for TPU (cold
    # compile 223s -> 172s at identical 196ms steady state, measured on
    # the 185k-voxel bench scene), OFF for CPU (the same change makes
    # XLA:CPU compile 3.5x slower). tools/bench_backbone_sweep.py re-runs
    # the A/B.
    scan_blocks: bool | None = None
    # Two-stage factored cubic convs (z-column concat + (dx,dy) gathers):
    # exact same math with ~2x fewer gathered ROWS — but measured 1.5x
    # SLOWER on the chip (295 vs 196 ms on the 185k-voxel scene). Explained
    # by the granule cost model (see strip_conv below): gathers pay per
    # ~512 B HBM transaction, so halving 384 B-row fetches saves nothing
    # while the wider stage-B rows (3x C_in) cost 3x granules each.
    # Kept as an op + maps (ops/sparse_conv.sparse_conv_factored); default
    # OFF. See PERF.md.
    factored_conv: bool = False
    # Strip-gather convs (ops/sparse_conv.sparse_conv_strips): each (dx,dy)
    # column group of k z-offsets becomes ONE contiguous [k, C] gather
    # (the sorted-row invariant makes present z-column cells consecutive —
    # sparse/quantize.py module docstring). Measured on-chip: gathers are
    # HBM-granule-bound (~512 B min transaction), NOT descriptor-bound, so
    # multi-row slices only pay when they shrink granule count. Routed
    # per conv by models/backbone._strips_wins (packed bf16 strip row must
    # fit one ~512 B granule): the k5 stem drops 73.9 -> 19.3 ms and the
    # narrow-channel k3/k2 convs ~3x; wide (>=96ch) convs keep the
    # per-offset scan. Measured in tools/probe_packed_bf16.py.
    strip_conv: bool = True
    # Zero-select z-dilated stem (sparse_conv_zdilated): exact and
    # select-free, but measured SLOWER than the packed strips on v5e —
    # per-row gather cost grows ~3x when the gather operand spans the
    # dilated set (|D| ~= 2.7N): 48.7 ms (f32) / 87.2 (bf16) vs 19.3 for
    # strips on the 185k-voxel stem. Kept as an opt-in + maps for
    # hardware where footprint matters less. PERF.md zdilated postmortem.
    stem_zdilated: bool = False
    # Banded windowed-gather Mosaic kernel (ops/banded_conv.py) for the
    # wide (>=96ch) k3 convs where strips lose and the scan conv runs at
    # the HBM random-access floor: one-hot band matmuls gather through the
    # MXU (backbone 186 -> 139 ms on the 185k-voxel bench scene, PERF.md
    # r3). Differentiable (custom VJP: dX via the stencil-transpose
    # identity, dW via an accumulating kernel), so it serves training and
    # eval alike. None = auto: ON for TPU, OFF on CPU (interpreter-only).
    # Scenes whose band spans exceed the static profile fall back to the
    # scan conv per level (banded aux fields stay None — see
    # ops/banded_conv.banded_prep).
    banded_conv: bool | None = None

    @property
    def expansion(self) -> int:
        return 4 if self.block == "bottleneck" else 1


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Click-as-query decoder (reference models/agile3d.py:399-421, main.py:42-53)."""

    hidden_dim: int = 128
    dim_feedforward: int = 1024
    num_heads: int = 8
    num_decoders: int = 3
    num_bg_queries: int = 10
    dropout: float = 0.0
    pre_norm: bool = False
    normalize_pos_enc: bool = True
    positional_encoding_type: str = "fourier"
    gauss_scale: float = 1.0
    hlevels: Sequence[int] = (4,)
    shared_decoder: bool = False
    aux: bool = True
    voxel_size: float = 0.05            # main.py:39
    backbone: BackboneConfig = dataclasses.field(default_factory=BackboneConfig)

    # --- TPU static-shape policy (no reference analogue; replaces ragged dims) ---
    max_fg_objects: int = 10            # engine.py:65 caps sampled objects at 10
    max_clicks: int = 256               # >= 21 * max_fg_objects eval click budget
    time_table_len: int = 256           # >= max_clicks (reference table is 200,
                                        # position_embedding.py:210; sized up so the
                                        # padded click budget can never index OOB)
    # Max chunk for the online-softmax scanned attention; the actual chunk
    # is the largest power-of-two divisor of N giving >= 6 scan steps
    # (models/agile3d._pick_attn_chunk). Measured on v5e (PERF.md): the
    # scan beats dense attention whenever the [B, H, Q, N] logits volume
    # exceeds ~10M elements (15.0 -> 10.0 ms on the 185k-voxel bench scene)
    # because the decoder is HBM-bound on those logits, not MXU-bound.
    xla_attn_chunk: int = 32768
    # dense attention below this b*Q*N*heads logits volume (break-even
    # measured at ~8M; perf knob: sweep with tools/probe_decoder_bf16.py)
    xla_attn_dense_threshold: int = 10_000_000
                                        # when N >= 2*chunk (0 disables);
                                        # bounds XLA-path HBM at large N
    backbone_dtype: str = "float32"     # 'bfloat16' halves backbone HBM
                                        # traffic (BN stats stay f32);
                                        # float32 preserves checkpoint parity
    decoder_dtype: str = "float32"      # 'bfloat16' halves the decoder's
                                        # N-scale HBM traffic (src/K/V/pos
                                        # reads; softmax stats stay f32 via
                                        # promotion) — measured 34.3 -> 27.4
                                        # ms/click at 670k voxels
                                        # (stress_kitti, PERF.md round 4);
                                        # float32 preserves exact torch
                                        # parity

    @property
    def max_queries(self) -> int:
        return self.num_bg_queries + self.max_clicks


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """main.py:56-59, criterion.py:135-150; click weights utils/seg.py:72."""

    losses: Sequence[str] = ("bce", "dice")
    bce_loss_coef: float = 1.0
    dice_loss_coef: float = 2.0
    aux: bool = True
    w_alpha: float = 0.8
    w_beta: float = 2.0
    w_tita: float = 0.3


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """main.py:62-80."""

    lr: float = 1e-4
    weight_decay: float = 1e-4
    lr_drop: Sequence[int] = (1000,)
    lr_drop_gamma: float = 0.1
    epochs: int = 1100
    val_epochs: int = 50
    batch_size: int = 5
    val_batch_size: int = 1
    clip_max_norm: float = 0.1
    seed: int = 42
    max_num_clicks: int = 20            # per-object eval click budget
    num_workers: int = 2
    # host-pipeline prefetch depth (batches assembled ahead of the device
    # step, data/prefetch.py; 0 = synchronous). The reference's 2-worker
    # DataLoader analogue (reference main.py:118-123).
    prefetch: int = 2


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    # voxel-count padding buckets (one jit compilation per bucket)
    buckets: Sequence[int] = None  # default set in __post_init__

    def __post_init__(self):
        if self.buckets is None:
            object.__setattr__(self, "buckets", DEFAULT_VOXEL_BUCKETS)


# Voxel-count buckets: scenes are padded up to the nearest bucket so jit
# compiles once per bucket instead of once per scene (SURVEY.md section 7).
# Power-of-two rungs plus 1.5x midpoints cap padding waste at ~33%; every
# rung >= 8192 is a multiple of 8192 (chunked-attention divisibility) and
# of the Pallas BLOCK_N=512.
DEFAULT_VOXEL_BUCKETS = (
    2048, 4096, 8192, 16384, 24576, 32768, 49152, 65536, 98304, 131072,
    196608, 262144, 393216, 524288, 786432, 1048576,
)


def bucket_size(n: int, buckets: Sequence[int] = DEFAULT_VOXEL_BUCKETS) -> int:
    """Smallest bucket >= n; beyond the ladder, auto-extend so arbitrarily
    large scenes pad and compile instead of crashing in collation (the
    reference's answer to huge scans is "crop", demo.md:39,70; this
    framework's is: run it, and let the engine's HBM pre-check route truly
    over-budget scenes to --sp or an actionable error —
    engine/eval.check_single_chip_rows).

    Extension quantum: voxel-style ladders (top rung a multiple of 8192)
    grow in 8192 steps, preserving chunked-attention and Pallas BLOCK_N=512
    divisibility; other ladders (e.g. the round-count buckets in
    engine/device_eval.py, top rung 224) grow in top-rung multiples so a
    224-round scan never pads to 8192 rounds."""
    for b in buckets:
        if n <= b:
            return b
    q = 8192 if buckets[-1] % 8192 == 0 else buckets[-1]
    return -(-n // q) * q
