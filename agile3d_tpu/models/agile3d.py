"""AGILE3D model: two-phase click-as-query transformer decoder, TPU-native.

Re-implements the reference model contract (reference models/agile3d.py):

  forward_backbone  — expensive sparse UNet, run ONCE per scene
                      (reference agile3d.py:163-181)
  forward_mask      — cheap decoder, re-run once per click round
                      (reference agile3d.py:183-339)

The reference's ragged Python structures become static padded tensors:
clicks are a [B, MAX_CLICKS] (voxel, object, time) table instead of a
dict-of-lists (reference engine.py:73-75), objects are padded to
1 + max_fg_objects mask columns, and the per-sample Python loop
(agile3d.py:192) becomes batched masked ops, so the whole per-round pass is
one jit-compiled XLA program.

Query layout: slots [0, num_bg_queries) are the learned background queries
(agile3d.py:47-48); slots [num_bg_queries, num_bg_queries + MAX_CLICKS) are
click queries in insertion order. Background *clicks* are click slots with
obj == 0 (the reference concatenates them behind the learned bg queries,
agile3d.py:256-264; attention is permutation-invariant given the masks, and
the per-object max in the mask head is order-free, so insertion order is
equivalent).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from agile3d_tpu.config import ModelConfig
from agile3d_tpu.models.backbone import backbone_forward, init_backbone
from agile3d_tpu.ops.attention import (
    NEG_INF,
    cross_attention_layer,
    ffn_layer,
    init_attention_layer,
    init_ffn_layer,
    self_attention_layer,
)
from agile3d_tpu.ops.norm import init_layer_norm, layer_norm
from agile3d_tpu.ops.pos_enc import fourier_pos, positional_encoding_1d, sine_pos
from agile3d_tpu.ops.sparse_conv import linear
from agile3d_tpu.sparse.grid import PaddedPyramid


class ClickState(NamedTuple):
    """Padded click table; the static-shape analogue of the reference's
    click_idx / click_time_idx dict-of-lists."""

    vox: jax.Array   # int32 [B, MAX_CLICKS] voxel slot in the sample, -1 unused
    obj: jax.Array   # int32 [B, MAX_CLICKS] object id, 0 = background
    time: jax.Array  # int32 [B, MAX_CLICKS] global click-order index


class SceneFeatures(NamedTuple):
    """Cached output of forward_backbone, consumed by every click round."""

    mask_feat: jax.Array  # [B, Ns, C] squeezed stride-1 features
    pos_pcd: jax.Array    # [B, Ns, C] fourier pos enc of raw coords
    vox_valid: jax.Array  # bool [B, Ns]
    raw: jax.Array        # [B, Ns, 3] raw (float) coords
    cmin: jax.Array       # [B, 3] per-sample coord min
    cmax: jax.Array       # [B, 3]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _torch_linear_init(key, fan_in, fan_out):
    kw, kb = jax.random.split(key)
    lim = 1.0 / (fan_in ** 0.5)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -lim, lim),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -lim, lim),
    }


def init_agile3d(key, cfg: ModelConfig = ModelConfig()):
    """Returns (params, buffers, bn_state). ``buffers`` are non-trainable
    (the Gaussian fourier matrix — a registered buffer in the reference,
    position_embedding.py:70-72 — and the click-time table).

    Runs on the host CPU backend when one exists: the init is ~100 tiny
    PRNG programs, each a separate compile+dispatch — measured 50 s through
    the axon TPU relay vs half that on CPU, and checkpoint saves of the
    CPU-resident result drop 57 -> 4 s. Wrapping the whole init in one jit
    measured WORSE in this environment (47 s compile; 430 s with the
    persistent cache enabled) — eager stays. Arrays transfer to the
    accelerator on first use."""
    if jax.default_backend() != "cpu":
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None:
            # jax.default_backend() ignores the default_device context, so
            # re-entering here would recurse — delegate to the body instead.
            with jax.default_device(cpu):
                return _init_agile3d_body(key, cfg)
    return _init_agile3d_body(key, cfg)


def _init_agile3d_body(key, cfg: ModelConfig):
    c = cfg.hidden_dim
    keys = iter(jax.random.split(key, 16))

    params = {}
    bparams, bstate = init_backbone(next(keys), cfg.backbone)
    params["backbone"] = bparams

    # 1x1 conv 96 -> 128 with bias (reference agile3d.py:43-45)
    fan = cfg.backbone.planes[7]
    lim = 1.0 / (fan ** 0.5)
    kw, kb = jax.random.split(next(keys))
    params["lin_squeeze"] = {
        "w": jax.random.uniform(kw, (fan, c), jnp.float32, -lim, lim),
        "b": jax.random.uniform(kb, (c,), jnp.float32, -lim, lim),
    }

    # learned background queries (nn.Embedding default init: N(0,1))
    params["bg_query_feat"] = jax.random.normal(next(keys), (cfg.num_bg_queries, c))
    params["bg_query_pos"] = jax.random.normal(next(keys), (cfg.num_bg_queries, c))

    k1, k2 = jax.random.split(next(keys))
    params["mask_embed_head"] = {
        "linear1": _torch_linear_init(k1, c, c),
        "linear2": _torch_linear_init(k2, c, c),
    }
    params["decoder_norm"] = init_layer_norm(c)

    # one layer set per (decoder, hlevel slot) exactly as the reference's
    # nested ModuleLists (reference agile3d.py:88-131: c2s_attention[d][i])
    num_sets = 1 if cfg.shared_decoder else cfg.num_decoders
    decoders = []
    for _ in range(num_sets * len(cfg.hlevels)):
        kd = jax.random.split(next(keys), 4)
        decoders.append({
            "c2s": init_attention_layer(kd[0], c),
            "c2c": init_attention_layer(kd[1], c),
            "ffn": init_ffn_layer(kd[2], c, cfg.dim_feedforward),
            "s2c": init_attention_layer(kd[3], c),
        })
    params["decoders"] = decoders

    buffers = {
        "gauss_B": jax.random.normal(next(keys), (3, c // 2)) * cfg.gauss_scale,
        "time_pe": jnp.asarray(positional_encoding_1d(c, cfg.time_table_len)),
    }
    return params, buffers, bstate


# ---------------------------------------------------------------------------
# Phase 1: backbone
# ---------------------------------------------------------------------------


def _pos_enc(xyz, buffers, cmin, cmax, cfg: ModelConfig):
    if cfg.positional_encoding_type == "fourier":
        return fourier_pos(xyz, buffers["gauss_B"], cmin, cmax,
                           normalize=cfg.normalize_pos_enc)
    if cfg.positional_encoding_type == "sine":
        return sine_pos(xyz, cfg.hidden_dim, cmin, cmax,
                        normalize=cfg.normalize_pos_enc)
    raise ValueError(cfg.positional_encoding_type)


def forward_backbone(
    params,
    buffers,
    bn_state,
    pyr: PaddedPyramid,
    feats: jax.Array,       # [N0, 3] flat voxel colors
    raw_coords: jax.Array,  # [N0, 3] flat raw float coords
    sample_idx: jax.Array,  # int32 [B, Ns] flat rows per sample slot, -1 pad
    *,
    training: bool = False,
    cfg: ModelConfig = ModelConfig(),
):
    """Run the UNet once per scene and cache everything the per-click decoder
    needs (reference agile3d.py:163-181). Returns (SceneFeatures, bn_state')."""
    cd = (jnp.bfloat16 if cfg.backbone_dtype == "bfloat16" else None)
    fmaps, new_bn_state = backbone_forward(
        params["backbone"], bn_state, pyr, feats,
        training=training, cfg=cfg.backbone, compute_dtype=cd)
    squeezed = linear(fmaps[-1].astype(jnp.float32),
                      params["lin_squeeze"]["w"],
                      params["lin_squeeze"]["b"], valid=pyr.levels[0].valid)

    # flat -> per-sample padded gather
    vox_valid = sample_idx >= 0
    safe = jnp.clip(sample_idx, 0, squeezed.shape[0] - 1)
    mask_feat = jnp.where(vox_valid[..., None], squeezed[safe], 0)
    raw_b = jnp.where(vox_valid[..., None], raw_coords[safe], 0)

    big = jnp.asarray(3.4e38, raw_b.dtype)
    cmin = jnp.min(jnp.where(vox_valid[..., None], raw_b, big), axis=1)
    cmax = jnp.max(jnp.where(vox_valid[..., None], raw_b, -big), axis=1)

    pos_pcd = _pos_enc(raw_b, buffers, cmin[:, None, :], cmax[:, None, :], cfg)
    pos_pcd = jnp.where(vox_valid[..., None], pos_pcd, 0)

    if cfg.decoder_dtype == "bfloat16":
        # cast ONCE per scene (the scene is reused for ~100 clicks) so the
        # decoder's N-scale reads (src, pos) ride half the HBM bandwidth
        mask_feat = mask_feat.astype(jnp.bfloat16)
        pos_pcd = pos_pcd.astype(jnp.bfloat16)
    scene = SceneFeatures(mask_feat=mask_feat, pos_pcd=pos_pcd,
                          vox_valid=vox_valid, raw=raw_b, cmin=cmin, cmax=cmax)
    return scene, new_bn_state


# ---------------------------------------------------------------------------
# Phase 2: per-click-round decoder
# ---------------------------------------------------------------------------


def _mask_module(params, queries, src, query_obj, query_valid, col_valid,
                 vox_valid):
    """Mask head (reference agile3d.py:342-384): LayerNorm -> 2-layer MLP ->
    voxel-query dot products -> per-object max over that object's click
    queries -> [bg | fg] logits; plus the next round's attention-bias state.

    Returns (out [B, N, 1+K] with invalid object columns at NEG_INF,
             labels [B, N] current per-voxel argmax (-1 on pad rows),
             present [B, 1+K] whether any voxel is argmax'd to that object).

    (labels, present) is the COMPACT form of the reference's per-round
    attention mask (agile3d.py:363-382): click queries of object o attend
    only to voxels currently argmax'd to o; objects with no argmax'd voxel
    get fully-open rows. The dense [B, Q, N] bias is reconstructed lazily —
    per key-chunk inside the scanned attention (_round_bias_chunk) or in
    one piece for the small-N dense path (_round_bias_dense) — so the
    [B, Q, N] array is never carried across rounds (at 670k voxels and 266
    queries that carried array alone was ~713 MB of HBM write+read per
    round; see PERF.md round 4)."""
    mh = params["mask_embed_head"]
    qn = layer_norm(queries, params["decoder_norm"])
    emb = jax.nn.relu(qn @ mh["linear1"]["w"] + mh["linear1"]["b"])
    emb = emb @ mh["linear2"]["w"] + mh["linear2"]["b"]          # [B, Q, C]
    # f32 accumulation/output: mask logits feed argmax ties, CE/dice loss,
    # and the returned predictions — keep them f32 even when the decoder
    # computes in bf16 (the MXU contraction still takes bf16 inputs)
    logits = jnp.einsum("bnc,bqc->bnq", src, emb,
                        preferred_element_type=jnp.float32)       # [B, N, Q]

    n_cols = col_valid.shape[1]
    cols = []
    for o in range(n_cols):
        sel = (query_obj == o) & query_valid                      # [B, Q]
        cols.append(jnp.max(
            jnp.where(sel[:, None, :], logits, NEG_INF), axis=-1))
    out = jnp.stack(cols, axis=-1)                                # [B, N, 1+K]
    out = jnp.where(col_valid[:, None, :], out, NEG_INF)

    labels = jnp.argmax(out, axis=-1)                             # [B, N]
    labels = jnp.where(vox_valid, labels, -1)
    obj_ids = jnp.arange(n_cols)
    present = jnp.any(
        labels[:, None, :] == obj_ids[None, :, None], axis=-1)    # [B, 1+K]
    return out, labels, present


def cast_decoder_bf16(params, buffers, scene):
    """The decoder_dtype='bfloat16' cast policy, shared by the single-chip
    (forward_mask) and SP (parallel/sp.py) decoders: f32 leaves of
    params/buffers -> bf16 (ints and bools pass through; unused subtrees
    such as the backbone's weights are dead code under jit and cost
    nothing), scene mask features + positional encodings -> bf16.
    ``scene.raw``/``cmin``/``cmax`` stay f32, so softmax statistics and
    LayerNorm moments promote to f32 via the f32 bias/pos terms."""
    _bf = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    return _bf(params), _bf(buffers), scene._replace(
        mask_feat=scene.mask_feat.astype(jnp.bfloat16),
        pos_pcd=scene.pos_pcd.astype(jnp.bfloat16))


def _round_bias_dense(labels, present, safe_obj, vox_valid):
    """Materialized [B, Q, N] bias == the reference's round mask + key-pad
    mask (numerics identical to the previous carried-round_bias form:
    masked entries are NEG_INF + NEG_INF on pad rows)."""
    sel_present = jnp.take_along_axis(present, safe_obj, axis=1)  # [B, Q]
    mismatch = labels[:, None, :] != safe_obj[:, :, None]         # [B, Q, N]
    bias = jnp.where(sel_present[:, :, None] & mismatch, NEG_INF, 0.0)
    return bias + jnp.where(vox_valid, 0.0, NEG_INF)[:, None, :]


def _round_bias_chunk(labels, present, safe_obj, vox_valid):
    """bias_fn(start, size) for mha_chunked_keys: reconstructs the [B, Q,
    size] bias slice from the compact (labels, present) state so the full
    [B, Q, N] bias never touches HBM."""
    sel_present = jnp.take_along_axis(present, safe_obj, axis=1)  # [B, Q]

    def bias_fn(start, size):
        lab_c = jax.lax.dynamic_slice_in_dim(labels, start, size, axis=1)
        val_c = jax.lax.dynamic_slice_in_dim(vox_valid, start, size, axis=1)
        mismatch = lab_c[:, None, :] != safe_obj[:, :, None]      # [B, Q, s]
        bias = jnp.where(sel_present[:, :, None] & mismatch, NEG_INF, 0.0)
        return bias + jnp.where(val_c, 0.0, NEG_INF)[:, None, :]

    return bias_fn


def _pick_attn_chunk(n: int, logits_volume: int, cfg: ModelConfig) -> int:
    """Chunk size for the online-softmax scanned attention, 0 = dense.

    Measured on v5e (tools/probe_decoder_bf16.py, PERF.md): the decoder is
    HBM-bound on the materialized [B, H, Q, N] logits, so the scan wins
    whenever that volume exceeds ~10M elements; the optimal chunk keeps
    ~6-8 scan steps (fewer steps under-amortize nothing, more steps pay
    per-step dispatch)."""
    if not cfg.xla_attn_chunk or logits_volume <= cfg.xla_attn_dense_threshold:
        return 0
    c = cfg.xla_attn_chunk
    while c >= 4096:
        if n % c == 0 and n // c >= 6:
            return c
        c //= 2
    return 0


def forward_mask(
    params,
    buffers,
    scene: SceneFeatures,
    clicks: ClickState,
    num_obj: jax.Array,  # int32 [B]
    *,
    cfg: ModelConfig = ModelConfig(),
    train_rng=None,
    scan_rounds: bool = False,
):
    """One decoder pass over all click rounds' queries (reference
    agile3d.py:183-339). Returns dict with:

      pred_masks  [B, N, 1 + max_fg_objects] — final round logits
      aux_masks   [R-1, B, N, 1 + max_fg_objects] — intermediate rounds
                  (reference 'aux_outputs', agile3d.py:336-337)

    ``train_rng`` enables dropout (cfg.dropout, reference
    attention_block.py:16,73,130) — pass None for eval.

    hlevels: refinement rounds run over num_decoders x len(hlevels) with
    per-(decoder, slot) weights, matching the reference's nested loop
    (agile3d.py:273-276). Every hlevel entry must be 4 (the finest level):
    for any other value the REFERENCE ITSELF cannot run — it feeds the
    coarse level's positional encodings (len N_coarse) as `pos` for the
    full-resolution src_pcd (len N) into torch MHA (agile3d.py:280-290),
    a shape error. So repeated-finest (e.g. [4, 4]) is the entire
    reachable configuration space, and that is what's supported here.
    """
    if any(h != 4 for h in cfg.hlevels):
        raise NotImplementedError(
            "hlevels entries must all be 4: the reference's coarse-hlevel "
            "path is structurally broken (pos-enc/memory length mismatch, "
            "reference agile3d.py:280-290), so only repeated-finest "
            "configurations are reachable and supported")
    if cfg.decoder_dtype == "bfloat16":
        params, buffers, scene = cast_decoder_bf16(params, buffers, scene)
    b, n, c = scene.mask_feat.shape
    nbq = cfg.num_bg_queries
    heads = cfg.num_heads

    click_valid = clicks.vox >= 0                                 # [B, MC]
    safe_vox = jnp.clip(clicks.vox, 0, n - 1)

    cfeat = jnp.take_along_axis(
        scene.mask_feat, safe_vox[..., None], axis=1)
    cfeat = jnp.where(click_valid[..., None], cfeat, 0)

    cxyz = jnp.take_along_axis(scene.raw, safe_vox[..., None], axis=1)
    cpos = _pos_enc(cxyz, buffers, scene.cmin[:, None, :],
                    scene.cmax[:, None, :], cfg)
    t_safe = jnp.clip(clicks.time, 0, buffers["time_pe"].shape[0] - 1)
    cpos = cpos + buffers["time_pe"][t_safe]
    cpos = jnp.where(click_valid[..., None], cpos, 0)

    bg_feat = jnp.broadcast_to(params["bg_query_feat"][None], (b, nbq, c))
    bg_pos = jnp.broadcast_to(params["bg_query_pos"][None], (b, nbq, c))

    queries = jnp.concatenate([bg_feat, cfeat], axis=1)           # [B, Q, C]
    query_pos = jnp.concatenate([bg_pos, cpos], axis=1)
    query_obj = jnp.concatenate(
        [jnp.zeros((b, nbq), jnp.int32), clicks.obj], axis=1)
    query_valid = jnp.concatenate(
        [jnp.ones((b, nbq), bool), click_valid], axis=1)

    # static key-padding biases
    q_key_bias = jnp.where(query_valid, 0.0, NEG_INF)[:, None, :]        # [B,1,Q]

    n_cols = 1 + cfg.max_fg_objects
    col_valid = (jnp.arange(n_cols)[None, :] <= num_obj[:, None])  # [B, 1+K]

    src = scene.mask_feat
    # compact round-bias state: no object "present" yet -> fully-open rows
    # (== the reference's zero initial attention mask, agile3d.py:256)
    labels0 = jnp.zeros((b, n), jnp.int32)
    present0 = jnp.zeros((b, n_cols), bool)
    safe_obj = jnp.clip(query_obj, 0, n_cols - 1)
    q_total = queries.shape[1]
    drop = cfg.dropout if train_rng is not None else 0.0
    chunk = _pick_attn_chunk(n, b * q_total * n * heads, cfg)
    if drop > 0:
        # the scanned paths skip attention-probability dropout; training
        # with dropout must keep the dense attention for exact semantics
        chunk = 0
    n_slots = len(cfg.hlevels)
    rngs = (jax.random.split(train_rng, cfg.num_decoders * n_slots * 4)
            if train_rng is not None and cfg.dropout > 0 else None)
    # per-round rematerialization: the backward pass recomputes each
    # round's attention/FFN intermediates ([B, N, C]-scale, several per
    # round) instead of keeping all rounds' alive — same policy as the
    # backbone's per-block remat. Inert in eval. (Without it the canonical
    # 524k-voxel train batch measured 20 G HBM vs the 15.75 G budget.)
    def round_body(dp, rng4, queries, src, labels, present):
        rk = ((lambda j: rng4[j]) if rng4 is not None
              else (lambda j: None))
        if chunk:
            c2s_bias, c2s_bias_fn = None, _round_bias_chunk(
                labels, present, safe_obj, scene.vox_valid)
        else:
            c2s_bias, c2s_bias_fn = _round_bias_dense(
                labels, present, safe_obj, scene.vox_valid), None
        queries = cross_attention_layer(
            dp["c2s"], queries, src, heads, pos=scene.pos_pcd,
            query_pos=query_pos,
            attn_bias=c2s_bias, attn_bias_fn=c2s_bias_fn,
            pre_norm=cfg.pre_norm, chunk_keys=chunk,
            dropout_rate=drop, rng=rk(0))
        queries = self_attention_layer(
            dp["c2c"], queries, heads, query_pos=query_pos,
            attn_bias=q_key_bias, pre_norm=cfg.pre_norm,
            dropout_rate=drop, rng=rk(1))
        queries = ffn_layer(dp["ffn"], queries, pre_norm=cfg.pre_norm,
                            dropout_rate=drop, rng=rk(2))
        src = cross_attention_layer(
            dp["s2c"], src, queries, heads, pos=query_pos,
            query_pos=scene.pos_pcd,
            attn_bias=q_key_bias,  # [B, 1, Q]: one key row for all voxels
            pre_norm=cfg.pre_norm, chunk_queries=chunk,
            dropout_rate=drop, rng=rk(3))
        masks, labels, present = _mask_module(
            params, queries, src, query_obj, query_valid, col_valid,
            scene.vox_valid)
        # pin the carry to the decoder compute dtype: the f32 pos/bias
        # terms promote the attention outputs, which under bf16 would
        # (a) run rounds 2+ in f32 and (b) break the lax.scan carry-dtype
        # contract in the training form. Identity under f32.
        cdt = scene.mask_feat.dtype
        return queries.astype(cdt), src.astype(cdt), labels, present, masks

    round_params = [params["decoders"][(0 if cfg.shared_decoder else r)
                                       * n_slots + i]
                    for r in range(cfg.num_decoders)
                    for i in range(n_slots)]
    n_rounds = len(round_params)

    if scan_rounds:
        # training form: the refinement rounds run as ONE lax.scan over
        # stacked per-round weights (identical shapes per round) — the
        # traced program carries one round body instead of
        # num_decoders * n_slots copies, so the train step's HLO stays
        # small enough for the axon compile relay and compiles faster.
        # NOT used for eval: the scan's carried [B, N, C] src copies cost
        # ~2 ms/click on the bench scene (10.0 vs 8.2 ms measured).
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                         *round_params)
        rngs_stacked = (rngs.reshape(n_rounds, 4, *rngs.shape[1:])
                        if rngs is not None else None)

        def scan_body(carry, xs):
            queries, src, labels, present = carry
            dp = xs[0]
            rng4 = xs[1] if rngs is not None else None
            queries, src, labels, present, masks = jax.checkpoint(
                round_body)(dp, rng4, queries, src, labels, present)
            return (queries, src, labels, present), masks

        xs = (stacked, rngs_stacked) if rngs is not None else (stacked,)
        _, all_masks = jax.lax.scan(
            scan_body, (queries, src, labels0, present0), xs)
    else:
        preds = []
        labels, present = labels0, present0
        for r in range(n_rounds):
            rng4 = (rngs.reshape(n_rounds, 4, *rngs.shape[1:])[r]
                    if rngs is not None else None)
            queries, src, labels, present, masks = jax.checkpoint(
                round_body)(round_params[r], rng4, queries, src, labels,
                            present)
            preds.append(masks)
        all_masks = jnp.stack(preds)

    return {
        "pred_masks": all_masks[-1],
        "aux_masks": all_masks[:-1] if n_rounds > 1 else None,
        "all_masks": all_masks,
    }
