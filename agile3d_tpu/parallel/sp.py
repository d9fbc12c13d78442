"""Voxel-axis ("sequence") parallel decoder over the mesh's ``sp`` axis.

The scaling axis of this workload is voxels per scene (SURVEY.md section
5.7): attention is N x Q with tiny Q, so the clean parallel layout shards
the voxel axis and replicates the queries —

  * click-to-scene attention: keys/values sharded; softmax over the sharded
    axis via max/sum collectives (pmax/psum over 'sp');
  * click-to-click attention + FFN: replicated (queries are tiny);
  * scene-to-click attention and the mask head: row-parallel, local;
  * click-feature gathers and the mask-reset "object present" test are the
    only other cross-shard reductions (one psum each).

Memory per chip drops from O(N * Q) to O(N/n_sp * Q) for the attention
bias/logits — the term that dominates for KITTI-360-scale scans.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from agile3d_tpu.config import ModelConfig
from agile3d_tpu.models.agile3d import (
    ClickState, SceneFeatures, _pick_attn_chunk, _pos_enc,
    _round_bias_chunk, cast_decoder_bf16)
from agile3d_tpu.ops.attention import NEG_INF, cross_attention_layer, ffn_layer, self_attention_layer
from agile3d_tpu.ops.norm import layer_norm


def _mha_sharded_keys(params, q_in, k_in, v_in, num_heads, bias_local, axis,
                      chunk: int = 0, bias_fn=None):
    """MHA with keys/values sharded over `axis`: distributed softmax.

    The per-shard contribution is reduced to (running max m, denominator l,
    numerator acc) — locally either in one dense pass or, when ``chunk``
    divides the local key count, by the same online-softmax scan as the
    single-chip mha_chunked_keys (ops/attention.py), so the [B,H,Q,N_l]
    logits are never materialized inside a shard either. The cross-shard
    softmax is then a pmax/psum combine of (m, l, acc).

    ``bias_fn(start, size)`` (shard-LOCAL key offsets) computes the bias
    slice on the fly so the [B, Q, N_l] bias never touches HBM either —
    same compact-round-bias scheme as the single-chip decoder."""
    b, lq, e = q_in.shape
    lk = k_in.shape[1]
    hd = e // num_heads

    def proj(x, w, bias):
        return (x @ w + bias).reshape(x.shape[0], x.shape[1], num_heads, hd)

    q = proj(q_in, params["q_w"], params["q_b"]) * (hd ** -0.5)
    k = proj(k_in, params["k_w"], params["k_b"])
    v = proj(v_in, params["v_w"], params["v_b"])

    if chunk and lk % chunk == 0 and lk > chunk:
        nc = lk // chunk
        k_c = k.reshape(b, nc, chunk, num_heads, hd).transpose(1, 0, 2, 3, 4)
        v_c = v.reshape(b, nc, chunk, num_heads, hd).transpose(1, 0, 2, 3, 4)
        if bias_fn is not None:
            bias_c = jnp.arange(nc, dtype=jnp.int32) * chunk
            get_bias = lambda bc: bias_fn(bc, chunk)
        else:
            bias_c = bias_local.reshape(b, lq, nc, chunk).transpose(2, 0, 1, 3)
            get_bias = lambda bc: bc

        def step(carry, inp):
            m0, l0, acc0 = carry
            kc, vc, bc = inp
            logits = (jnp.einsum("bqhd,bkhd->bhqk", q, kc)
                      + get_bias(bc)[:, None])
            m1 = jnp.maximum(m0, jnp.max(logits, axis=-1))
            scale = jnp.exp(m0 - m1)
            p = jnp.exp(logits - m1[..., None])
            l1 = l0 * scale + jnp.sum(p, axis=-1)
            acc1 = acc0 * scale[..., None] + jnp.einsum(
                "bhqk,bkhd->bhqd", p, vc)
            return (m1, l1, acc1), None

        init = (jnp.full((b, num_heads, lq), NEG_INF),
                jnp.zeros((b, num_heads, lq)),
                jnp.zeros((b, num_heads, lq, hd)))
        (m_loc, l_loc, acc_loc), _ = jax.lax.scan(
            step, init, (k_c, v_c, bias_c))
    else:
        if bias_fn is not None:
            bias_local = bias_fn(0, lk)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) + bias_local[:, None]
        m_loc = jnp.max(logits, axis=-1)                       # [b,h,q]
        ex = jnp.exp(logits - m_loc[..., None])
        l_loc = jnp.sum(ex, axis=-1)
        acc_loc = jnp.einsum("bhqk,bkhd->bhqd", ex, v)

    m = jax.lax.pmax(m_loc, axis)                              # [b,h,q]
    corr = jnp.exp(m_loc - m)
    denom = jax.lax.psum(l_loc * corr, axis)
    num = jax.lax.psum(acc_loc * corr[..., None], axis)
    out = (num / jnp.maximum(denom, 1e-30)[..., None])
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, e)
    return out @ params["out_w"] + params["out_b"]


def _cross_attn_sharded_keys(layer_params, tgt, memory_local, num_heads, *,
                             pos_local, query_pos, bias_local, axis,
                             chunk: int = 0, bias_fn=None):
    """Post-norm CrossAttentionLayer with the memory axis sharded."""
    q = tgt + query_pos
    k = memory_local + pos_local
    out = _mha_sharded_keys(layer_params["attn"], q, k, memory_local,
                            num_heads, bias_local, axis, chunk=chunk,
                            bias_fn=bias_fn)
    return layer_norm(tgt + out, layer_params["norm"])


def _sp_mask_module(params, queries, src_local, query_obj, query_valid,
                    col_valid, vox_valid_local, axis):
    """Row-parallel mask head. Returns (out [B, Nl, 1+K] shard-local,
    labels_local [B, Nl], present [B, 1+K] GLOBAL — the one cross-shard
    psum). The [B, Q, Nl] round bias is reconstructed lazily from
    (labels_local, present) inside the attention, same compact scheme as
    the single-chip _mask_module (models/agile3d.py)."""
    mh = params["mask_embed_head"]
    qn = layer_norm(queries, params["decoder_norm"])
    emb = jax.nn.relu(qn @ mh["linear1"]["w"] + mh["linear1"]["b"])
    emb = emb @ mh["linear2"]["w"] + mh["linear2"]["b"]
    # f32 logits even under the bf16 decoder, matching _mask_module
    logits = jnp.einsum("bnc,bqc->bnq", src_local, emb,
                        preferred_element_type=jnp.float32)

    n_cols = col_valid.shape[1]
    cols = []
    for o in range(n_cols):
        sel = (query_obj == o) & query_valid
        cols.append(jnp.max(jnp.where(sel[:, None, :], logits, NEG_INF),
                            axis=-1))
    out = jnp.stack(cols, axis=-1)
    out = jnp.where(col_valid[:, None, :], out, NEG_INF)

    labels = jnp.argmax(out, axis=-1)
    labels = jnp.where(vox_valid_local, labels, -1)
    obj_ids = jnp.arange(n_cols)
    present_local = jnp.any(labels[:, None, :] == obj_ids[None, :, None],
                            axis=-1)
    present = jax.lax.psum(present_local.astype(jnp.int32), axis) > 0
    return out, labels, present


def forward_mask_local(params, buffers, mask_feat_l, pos_pcd_l, valid_l,
                       raw_l, cmin, cmax, clicks, num_obj, *,
                       cfg: ModelConfig, axis: str = "sp"):
    """Shard-LOCAL decoder body: one forward_mask pass with the voxel axis
    sharded over ``axis``. Must run inside a shard_map over that axis (it
    issues psum/pmax collectives). Returns the per-round mask stack
    [R, B, Nl, 1+K], shard-local in Nl.

    Exposed at module level so other shard_mapped programs — the SP
    device-rollout scan (parallel/sp_rollout.py) — can reuse the exact same
    decoder body instead of re-deriving it."""
    nbq, heads = cfg.num_bg_queries, cfg.num_heads
    n_cols = 1 + cfg.max_fg_objects
    b, nl, c = mask_feat_l.shape
    shard = jax.lax.axis_index(axis)
    lo = shard * nl

    # assemble click features/coords across shards (one psum each)
    click_valid = clicks.vox >= 0
    local_idx = clicks.vox - lo
    in_shard = click_valid & (local_idx >= 0) & (local_idx < nl)
    safe = jnp.clip(local_idx, 0, nl - 1)
    cfeat = jnp.where(
        in_shard[..., None],
        jnp.take_along_axis(mask_feat_l, safe[..., None], axis=1), 0)
    cxyz = jnp.where(
        in_shard[..., None],
        jnp.take_along_axis(raw_l, safe[..., None], axis=1), 0)
    cfeat = jax.lax.psum(cfeat, axis)
    cxyz = jax.lax.psum(cxyz, axis)

    cpos = _pos_enc(cxyz, buffers, cmin[:, None, :], cmax[:, None, :],
                    cfg)
    t_safe = jnp.clip(clicks.time, 0, buffers["time_pe"].shape[0] - 1)
    cpos = jnp.where(click_valid[..., None],
                     cpos + buffers["time_pe"][t_safe], 0)
    cfeat = jnp.where(click_valid[..., None], cfeat, 0)

    bg_feat = jnp.broadcast_to(params["bg_query_feat"][None], (b, nbq, c))
    bg_pos = jnp.broadcast_to(params["bg_query_pos"][None], (b, nbq, c))
    queries = jnp.concatenate([bg_feat, cfeat], axis=1)
    query_pos = jnp.concatenate([bg_pos, cpos], axis=1)
    query_obj = jnp.concatenate(
        [jnp.zeros((b, nbq), jnp.int32), clicks.obj], axis=1)
    query_valid = jnp.concatenate(
        [jnp.ones((b, nbq), bool), click_valid], axis=1)

    q_key_bias = jnp.where(query_valid, 0.0, NEG_INF)[:, None, :]
    col_valid = jnp.arange(n_cols)[None, :] <= num_obj[:, None]
    safe_obj = jnp.clip(query_obj, 0, n_cols - 1)

    src = mask_feat_l
    # compact round-bias state (labels shard-local, present global)
    labels_l = jnp.zeros((b, nl), jnp.int32)
    present = jnp.zeros((b, n_cols), bool)
    preds = []
    # Same (decoder, hlevel-slot) weight schedule as the single-chip
    # forward_mask (models/agile3d.py:356-359, reference
    # agile3d.py:273-276); chunk picked from the PER-SHARD voxel count
    # so intra-shard logits stay bounded too.
    n_slots = len(cfg.hlevels)
    chunk = _pick_attn_chunk(nl, b * queries.shape[1] * nl * heads, cfg)
    for r in range(cfg.num_decoders):
        d_idx = 0 if cfg.shared_decoder else r
        for i in range(n_slots):
            dp = params["decoders"][d_idx * n_slots + i]
            bias_fn = _round_bias_chunk(labels_l, present, safe_obj,
                                        valid_l)
            queries = _cross_attn_sharded_keys(
                dp["c2s"], queries, src, heads, pos_local=pos_pcd_l,
                query_pos=query_pos,
                bias_local=None, bias_fn=bias_fn, axis=axis,
                chunk=chunk)
            queries = self_attention_layer(
                dp["c2c"], queries, heads, query_pos=query_pos,
                attn_bias=q_key_bias, pre_norm=cfg.pre_norm)
            queries = ffn_layer(dp["ffn"], queries,
                                pre_norm=cfg.pre_norm)
            src = cross_attention_layer(
                dp["s2c"], src, queries, heads, pos=query_pos,
                query_pos=pos_pcd_l,
                attn_bias=q_key_bias,  # [B, 1, Q] shared key row
                pre_norm=cfg.pre_norm, chunk_queries=chunk)
            masks, labels_l, present = _sp_mask_module(
                params, queries, src, query_obj, query_valid, col_valid,
                valid_l, axis)
            # pin the round carry to the decoder compute dtype, exactly
            # as the single-chip round_body does (models/agile3d.py):
            # the f32 pos/bias terms otherwise promote rounds 2+ to f32
            queries = queries.astype(mask_feat_l.dtype)
            src = src.astype(mask_feat_l.dtype)
            preds.append(masks)
    return jnp.stack(preds)  # [R, B, Nl, 1+K] sharded over Nl


def make_forward_mask_sp(mesh: Mesh, cfg: ModelConfig):
    """Returns a jitted forward_mask whose voxel axis is sharded over the
    mesh's 'sp' axis. Inputs use the same SceneFeatures/ClickState as the
    single-chip path; outputs match it numerically (tests/test_parallel.py)."""
    if any(h != 4 for h in cfg.hlevels):
        raise NotImplementedError(
            "hlevels entries must all be 4 (same constraint as the "
            "single-chip forward_mask, models/agile3d.py:302-307)")
    axis = "sp"

    local_fn = functools.partial(forward_mask_local, cfg=cfg, axis=axis)

    sharded = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None), P(None, axis, None),
                  P(None, axis), P(None, axis, None), P(), P(),
                  ClickState(P(), P(), P()), P()),
        out_specs=P(None, None, axis, None),
        check_vma=False,
    )

    @jax.jit
    def forward_mask_sp(params, buffers, scene: SceneFeatures,
                        clicks: ClickState, num_obj):
        if cfg.decoder_dtype == "bfloat16":
            params, buffers, scene = cast_decoder_bf16(
                params, buffers, scene)
        all_masks = sharded(params, buffers, scene.mask_feat, scene.pos_pcd,
                            scene.vox_valid, scene.raw, scene.cmin,
                            scene.cmax, clicks, num_obj)
        return {"pred_masks": all_masks[-1],
                "aux_masks": all_masks[:-1],
                "all_masks": all_masks}

    def shard_scene(scene: SceneFeatures) -> SceneFeatures:
        """Place scene features with the voxel axis sharded over sp."""
        sh = lambda spec: NamedSharding(mesh, spec)
        return SceneFeatures(
            mask_feat=jax.device_put(scene.mask_feat, sh(P(None, axis, None))),
            pos_pcd=jax.device_put(scene.pos_pcd, sh(P(None, axis, None))),
            vox_valid=jax.device_put(scene.vox_valid, sh(P(None, axis))),
            raw=jax.device_put(scene.raw, sh(P(None, axis, None))),
            cmin=jax.device_put(scene.cmin, sh(P())),
            cmax=jax.device_put(scene.cmax, sh(P())),
        )

    return forward_mask_sp, shard_scene
