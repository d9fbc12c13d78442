"""Analytic FLOPs / bytes accounting for the model (VERDICT r4 task 2).

Walks the real parameter tree + the real per-scene kernel maps, so the
counts reflect the actual sparse topology (nnz gather pairs), not a dense
approximation. Three cost axes per op, matching the three rooflines that
bind on TPU v5e (PERF.md "HBM-granule" model):

  flops          2 * pairs * Cin * Cout per sparse conv / 2*M*N*K per
                 matmul — MXU work
  stream_bytes   compulsory streaming traffic: read every input once +
                 write every output once (+ weights) — the classic
                 bandwidth roofline
  gather_rows    randomly-gathered rows (sparse-conv neighbor gathers);
                 each row costs >= 1 HBM transaction granule regardless of
                 width, so gather-bound ops are limited by the measured
                 granule rate, not by bytes (PERF.md: ~512 B granule at
                 ~275 M granules/s ~= 140 GB/s effective)

Chip peaks (TPU v5e, public spec + this repo's measurements):
  PEAK_BF16_FLOPS  197e12   (MXU bf16; f32 runs as 3-pass bf16 ~ 1/3)
  PEAK_HBM_BPS     819e9    (HBM bandwidth)
  GRANULE_RATE     275e6    (measured random-gather granules/s, PERF.md)

The reference has no counterpart (it publishes no perf accounting at all,
SURVEY.md section 6); this module is how "matching-or-beating on perf" is
proven rather than asserted.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from agile3d_tpu.config import BackboneConfig, ModelConfig

PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BPS = 819e9
GRANULE_RATE = 275e6
GRANULE_BYTES = 512

# Single-chip capacity model for the eval pre-check (engine/eval.
# check_single_chip_rows). Anchored on a measurement, not a guess:
# the full eval backbone held 14.58 GiB live at the 1,572,864-row padded
# bucket (PERF.md / tools/measure_sp_hbm.py), i.e. ~9.7 KiB per padded
# stride-1 row across activations + kernel maps + FPN outputs.
SINGLE_CHIP_HBM_GIB = 15.75          # TPU v5e per-chip HBM
EVAL_BYTES_PER_ROW = 14.58 * 2**30 / 1_572_864


def eval_hbm_gib(n_rows: int) -> float:
    """Estimated peak device footprint of the eval backbone at a padded
    stride-1 row count (linear in rows; see EVAL_BYTES_PER_ROW anchor)."""
    return n_rows * EVAL_BYTES_PER_ROW / 2**30


class OpCost(NamedTuple):
    name: str
    flops: int
    stream_bytes: int
    gather_rows: int

    def roofline_s(self) -> float:
        """HARDWARE lower bound: the binding roofline between MXU peak and
        compulsory HBM streaming. This is implementation-independent — no
        program computing these flops over these bytes can beat it — so
        frac_of_roofline <= ~1 by construction. Random-gather cost is NOT
        part of the floor: it models one implementation strategy
        (gather-GEMM), and this stack's banded/Mosaic route streams rows
        in coordinate bands instead of gathering them (ops/banded_conv.py),
        legitimately beating the granule model (measured: 61 ms backbone vs
        138 ms gather-model prediction at 185k voxels)."""
        t_mxu = self.flops / PEAK_BF16_FLOPS
        t_hbm = self.stream_bytes / PEAK_HBM_BPS
        return max(t_mxu, t_hbm)

    def gather_model_s(self) -> float:
        """The HBM-granule cost model's prediction for a gather-GEMM
        implementation of this op (PERF.md: ~512 B granule at ~275 M
        granules/s): every neighbor-gathered row costs one granule. An
        explanatory model for the gather route, not a bound."""
        return max(self.roofline_s(), self.gather_rows / GRANULE_RATE)


def _nnz(kernel_map: np.ndarray | None) -> int:
    return 0 if kernel_map is None else int((np.asarray(kernel_map) >= 0).sum())


def _conv_cost(name, pairs, n_in, n_out, cin, cout, k_vol,
               dtype_bytes=4) -> OpCost:
    return OpCost(
        name=name,
        flops=2 * pairs * cin * cout,
        stream_bytes=(n_in * cin + n_out * cout) * dtype_bytes
        + k_vol * cin * cout * dtype_bytes,
        gather_rows=pairs if k_vol > 1 else 0,
    )


def _bn_relu_cost(name, n, c, dtype_bytes=4) -> OpCost:
    # read + write the activations once (BN + ReLU fuse into one pass)
    return OpCost(name, flops=0, stream_bytes=2 * n * c * dtype_bytes,
                  gather_rows=0)


def backbone_costs(pyr, cfg: BackboneConfig = BackboneConfig(),
                   dtype_bytes: int = 4, padded: bool = False) -> list[OpCost]:
    """Per-stage costs of backbone_forward on this scene's padded pyramid.

    Mirrors models/backbone.backbone_forward stage by stage: stem k5 conv,
    4x (k2 s2 down conv + BasicBlock stage), 4x (k2 s2 transpose conv +
    skip concat + BasicBlock stage). Pair counts come from the pyramid's
    actual kernel maps (nnz of k5/k3/down; the transpose conv has exactly
    one parent per fine voxel).

    padded=False (default) counts USEFUL work — valid rows and present
    neighbor pairs — the numerator of an honest MFU. padded=True counts the
    work the compiled program actually issues (every gather-GEMM runs dense
    over the bucket-padded rows x all K offsets; ops/sparse_conv.py), which
    is what XLA's cost analysis reports and what the MXU physically
    executes; the padded/useful ratio IS the bucket-padding overhead."""
    lv = pyr.levels
    planes, layers, d0, exp = cfg.planes, cfg.layers, cfg.init_dim, cfg.expansion
    if padded:
        n = [l.grid.shape[0] for l in lv]
        k3_nnz = [27 * nn for nn in n]
    else:
        n = [l.num_valid for l in lv]
        k3_nnz = [_nnz(l.k3) for l in lv]
    costs: list[OpCost] = []

    # stem (banded/strips/scan route identically in pairs and bytes)
    kvol = cfg.conv1_kernel_size ** 3
    stem_pairs = kvol * n[0] if padded else _nnz(lv[0].k5)
    costs.append(_conv_cost("stem/conv0p1s1", stem_pairs, n[0], n[0],
                            cfg.in_channels, d0, kvol, dtype_bytes))
    costs.append(_bn_relu_cost("stem/bn0+relu", n[0], d0, dtype_bytes))

    def block_costs(tag, level, cin, p, num_blocks, block):
        out: list[OpCost] = []
        pairs = k3_nnz[level]
        nn = n[level]
        ch_in = cin
        exp_out = p * (4 if block == "bottleneck" else 1)
        for b in range(num_blocks):
            if block == "bottleneck":
                out.append(_conv_cost(f"{tag}/b{b}/conv1x1a", nn, nn, nn,
                                      ch_in, p, 1, dtype_bytes))
                out.append(_conv_cost(f"{tag}/b{b}/conv3", pairs, nn, nn,
                                      p, p, 27, dtype_bytes))
                out.append(_conv_cost(f"{tag}/b{b}/conv1x1b", nn, nn, nn,
                                      p, exp_out, 1, dtype_bytes))
            else:
                out.append(_conv_cost(f"{tag}/b{b}/conv1", pairs, nn, nn,
                                      ch_in, p, 27, dtype_bytes))
                out.append(_conv_cost(f"{tag}/b{b}/conv2", pairs, nn, nn,
                                      p, p, 27, dtype_bytes))
            if ch_in != exp_out:
                out.append(_conv_cost(f"{tag}/b{b}/downsample", nn, nn, nn,
                                      ch_in, exp_out, 1, dtype_bytes))
            out.append(_bn_relu_cost(f"{tag}/b{b}/bn+relu", nn,
                                     2 * exp_out, dtype_bytes))
            ch_in = exp_out
        return out

    # down path
    down_in = d0
    for i in range(4):
        pairs_down = 8 * n[i + 1] if padded else _nnz(lv[i].down)
        costs.append(_conv_cost(f"down{i+1}/conv", pairs_down, n[i],
                                n[i + 1], down_in, down_in, 8, dtype_bytes))
        costs.append(_bn_relu_cost(f"down{i+1}/bn+relu", n[i + 1], down_in,
                                   dtype_bytes))
        costs.extend(block_costs(f"down{i+1}/block{i+1}", i + 1, down_in,
                                 planes[i], layers[i], cfg.block))
        down_in = planes[i] * exp

    # up path
    skips = [planes[2] * exp, planes[1] * exp, planes[0] * exp, d0]
    tr_in = planes[3] * exp
    for j in range(4):
        i = 4 + j
        tgt = 3 - j
        # transpose conv: exactly one coarse parent per fine voxel (useful);
        # the compiled form runs all 8 per-offset GEMMs over every fine row
        pairs_up = (8 * n[tgt] if padded
                    else int((np.asarray(lv[tgt].up_parent) >= 0).sum()))
        costs.append(_conv_cost(f"up{i}/convtr", pairs_up, n[tgt + 1],
                                n[tgt], tr_in, planes[i], 8, dtype_bytes))
        costs.append(_bn_relu_cost(f"up{i}/bn+relu", n[tgt], planes[i],
                                   dtype_bytes))
        cat_ch = planes[i] + skips[j]
        # concat: write the concatenated activations once
        costs.append(OpCost(f"up{i}/concat", 0,
                            n[tgt] * cat_ch * dtype_bytes, 0))
        costs.extend(block_costs(f"up{i}/block{i+1}", tgt, cat_ch,
                                 planes[i], layers[i], cfg.block))
        tr_in = planes[i] * exp

    return costs


def decoder_costs(n: int, q: int, cfg: ModelConfig = ModelConfig(),
                  dtype_bytes: int = 4) -> list[OpCost]:
    """Per-component costs of ONE forward_mask call (all refinement
    rounds): c2s cross-attn, c2c self-attn, FFN, s2c cross-attn, mask head
    — models/agile3d.forward_mask round_body x num_decoders*len(hlevels).

    n = padded voxel count, q = padded query count (bg + click bucket)."""
    c = cfg.hidden_dim
    f = cfg.dim_feedforward
    rounds = cfg.num_decoders * len(cfg.hlevels)
    ds = dtype_bytes
    costs: list[OpCost] = []
    for r in range(rounds):
        # c2s: q/k/v/out projections + QK^T + PV over N keys
        costs.append(OpCost(
            f"r{r}/c2s",
            flops=2 * (q * c * c * 2 + n * c * c * 2) + 4 * q * n * c,
            stream_bytes=(2 * n * c * 2 + q * c * 2) * ds,  # src+pos read,
            gather_rows=0))                                  # q read/write
        costs.append(OpCost(
            f"r{r}/c2c", flops=2 * q * c * c * 4 + 4 * q * q * c,
            stream_bytes=3 * q * c * ds, gather_rows=0))
        costs.append(OpCost(
            f"r{r}/ffn", flops=2 * q * c * f * 2,
            stream_bytes=3 * q * c * ds, gather_rows=0))
        # s2c: queries are the N voxels
        costs.append(OpCost(
            f"r{r}/s2c",
            flops=2 * (n * c * c * 2 + q * c * c * 2) + 4 * n * q * c,
            stream_bytes=(3 * n * c * 2) * ds, gather_rows=0))
        # mask head: 2-layer MLP on queries + [N, Q] logits + per-object max
        n_cols = 1 + cfg.max_fg_objects
        costs.append(OpCost(
            f"r{r}/mask_head",
            flops=2 * q * c * c * 2 + 2 * n * q * c,
            stream_bytes=(n * c + n * q + n * n_cols) * ds, gather_rows=0))
    return costs


def summarize(costs: list[OpCost], measured_s: float | None = None,
              dtype_bytes: int = 4) -> dict:
    """Aggregate + roofline position. Keys match bench.py's JSON contract
    (model_flops / achieved_tflops / achieved_gbps / frac_of_peak)."""
    flops = sum(c.flops for c in costs)
    stream = sum(c.stream_bytes for c in costs)
    rows = sum(c.gather_rows for c in costs)
    t_floor = sum(c.roofline_s() for c in costs)
    t_model = sum(c.gather_model_s() for c in costs)
    out = {
        "model_flops": int(flops),
        "stream_bytes": int(stream),
        "gather_rows": int(rows),
        "roofline_floor_ms": round(1e3 * t_floor, 3),
        "gather_model_ms": round(1e3 * t_model, 3),
    }
    if measured_s:
        out["achieved_tflops"] = round(flops / measured_s / 1e12, 3)
        out["achieved_gbps"] = round(stream / measured_s / 1e9, 2)
        out["achieved_grows_per_s"] = round(rows / measured_s / 1e9, 4)
        out["frac_of_peak_mxu"] = round(flops / measured_s / PEAK_BF16_FLOPS,
                                        4)
        # position vs the per-op summed roofline floor: 1.0 = speed of light
        out["frac_of_roofline"] = round(t_floor / measured_s, 4)
    return out


def stage_table(costs: list[OpCost], group=lambda name: name.split("/")[0]):
    """Aggregate per stage (stem / down1..4 / up4..7) for the PERF.md
    roofline table."""
    agg: dict[str, list[int]] = {}
    for c in costs:
        g = group(c.name)
        a = agg.setdefault(g, [0, 0, 0, 0.0, 0.0])
        a[0] += c.flops
        a[1] += c.stream_bytes
        a[2] += c.gather_rows
        a[3] += c.roofline_s()
        a[4] += c.gather_model_s()
    return {g: {"gflops": round(v[0] / 1e9, 2),
                "stream_mb": round(v[1] / 1e6, 1),
                "gather_mrows": round(v[2] / 1e6, 2),
                "floor_ms": round(1e3 * v[3], 2),
                "gather_model_ms": round(1e3 * v[4], 2)}
            for g, v in agg.items()}
