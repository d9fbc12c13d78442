"""Pallas-kernel inference path for forward_mask.

Same contract and semantics as models.agile3d.forward_mask (tested for
numerical parity in tests/test_pallas_decoder.py), but each decoder round
runs two fused kernels (ops/pallas/decoder_kernels.py) that stream the voxel
axis through VMEM instead of materializing [heads, Q, N] logits — the
per-click serving hot path (<50 ms p50 target, BASELINE.json).

Inference-only (the kernels define no VJP); training uses the XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from agile3d_tpu.config import ModelConfig
from agile3d_tpu.models.agile3d import ClickState, SceneFeatures, _pos_enc
from agile3d_tpu.ops.attention import NEG_INF, ffn_layer, self_attention_layer
from agile3d_tpu.ops.norm import layer_norm
from agile3d_tpu.ops.pallas.decoder_kernels import c2s_flash, s2c_mask_fused


def _round_up(x, m):
    return (x + m - 1) // m * m


def forward_mask_pallas(
    params,
    buffers,
    scene: SceneFeatures,
    clicks: ClickState,
    num_obj: jax.Array,
    *,
    cfg: ModelConfig = ModelConfig(),
    interpret: bool = False,
):
    """Batched wrapper: runs the fused per-sample path for each batch row."""
    b = scene.mask_feat.shape[0]
    outs = []
    for i in range(b):
        outs.append(_forward_mask_pallas_single(
            params, buffers,
            jax.tree_util.tree_map(lambda x: x[i], scene),
            jax.tree_util.tree_map(lambda x: x[i], clicks),
            num_obj[i], cfg=cfg, interpret=interpret))
    stack = lambda *xs: jnp.stack(xs, axis=1)
    all_masks = jax.tree_util.tree_map(stack, *outs) if b > 1 else (
        outs[0][:, None])
    return {
        "pred_masks": all_masks[-1],
        "aux_masks": all_masks[:-1] if all_masks.shape[0] > 1 else None,
        "all_masks": all_masks,
    }


def _forward_mask_pallas_single(params, buffers, scene, clicks, num_obj, *,
                                cfg: ModelConfig, interpret: bool):
    n, c = scene.mask_feat.shape
    nbq, heads = cfg.num_bg_queries, cfg.num_heads
    mc = clicks.vox.shape[0]
    n_cols = 1 + cfg.max_fg_objects
    qn = _round_up(nbq + mc, 8)

    # ---- query assembly (identical to the XLA path, agile3d.forward_mask) --
    click_valid = clicks.vox >= 0
    safe_vox = jnp.clip(clicks.vox, 0, n - 1)
    cfeat = jnp.where(click_valid[:, None], scene.mask_feat[safe_vox], 0)
    cxyz = scene.raw[safe_vox]
    cpos = _pos_enc(cxyz, buffers, scene.cmin[None, :], scene.cmax[None, :],
                    cfg)
    t_safe = jnp.clip(clicks.time, 0, buffers["time_pe"].shape[0] - 1)
    cpos = jnp.where(click_valid[:, None],
                     cpos + buffers["time_pe"][t_safe], 0)

    pad = qn - nbq - mc
    queries = jnp.concatenate(
        [params["bg_query_feat"], cfeat, jnp.zeros((pad, c))], axis=0)
    query_pos = jnp.concatenate(
        [params["bg_query_pos"], cpos, jnp.zeros((pad, c))], axis=0)
    query_obj = jnp.concatenate(
        [jnp.zeros(nbq, jnp.int32), clicks.obj,
         jnp.zeros(pad, jnp.int32)], axis=0)
    query_valid = jnp.concatenate(
        [jnp.ones(nbq, bool), click_valid, jnp.zeros(pad, bool)], axis=0)

    qbias = jnp.where(query_valid, 0.0, NEG_INF)
    col_valid = jnp.arange(n_cols) <= num_obj
    objmask = ((query_obj[:, None] == jnp.arange(n_cols)[None, :])
               & query_valid[:, None] & col_valid[None, :]).astype(jnp.float32)

    vox_valid8 = scene.vox_valid.astype(jnp.int32)
    src = scene.mask_feat
    labels = jnp.zeros(n, jnp.int32)
    open_row = jnp.ones(qn, jnp.int32)
    mh = params["mask_embed_head"]

    preds = []
    for r in range(cfg.num_decoders):
        dp = params["decoders"][0 if cfg.shared_decoder else r]
        a = dp["c2s"]["attn"]
        hd = c // heads
        qh = ((queries + query_pos) @ a["q_w"] + a["q_b"]) * (hd ** -0.5)
        ctx = c2s_flash(qh, src, scene.pos_pcd, labels, query_obj, open_row,
                        vox_valid8, a["k_w"], a["k_b"], a["v_w"], a["v_b"],
                        num_heads=heads, use_mask=(r > 0),
                        interpret=interpret)
        q2 = layer_norm(queries + (ctx @ a["out_w"] + a["out_b"]),
                        dp["c2s"]["norm"])
        q2 = self_attention_layer(
            dp["c2c"], q2[None], heads, query_pos=query_pos[None],
            attn_bias=qbias[None, None, :], pre_norm=cfg.pre_norm)[0]
        q2 = ffn_layer(dp["ffn"], q2, pre_norm=cfg.pre_norm)
        queries = q2

        s = dp["s2c"]["attn"]
        kq = (queries + query_pos) @ s["k_w"] + s["k_b"]
        vq = queries @ s["v_w"] + s["v_b"]
        emb_in = layer_norm(queries, params["decoder_norm"])
        emb = jax.nn.relu(emb_in @ mh["linear1"]["w"] + mh["linear1"]["b"])
        emb = emb @ mh["linear2"]["w"] + mh["linear2"]["b"]

        src, masks, labels, counts = s2c_mask_fused(
            kq, vq, qbias, emb, objmask, src, scene.pos_pcd, vox_valid8,
            s["q_w"], s["q_b"], s["out_w"], s["out_b"],
            dp["s2c"]["norm"]["scale"], dp["s2c"]["norm"]["bias"],
            num_heads=heads, n_cols=n_cols, interpret=interpret)

        present = counts > 0
        open_row = (~present[jnp.clip(query_obj, 0, n_cols - 1)]).astype(
            jnp.int32)
        preds.append(masks)

    return jnp.stack(preds)  # [R, N, n_cols]
