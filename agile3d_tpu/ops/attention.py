"""Multi-head attention + DETR-style layers, torch-parity semantics.

Replaces torch nn.MultiheadAttention as used by the reference decoder blocks
(reference models/modules/attention_block.py:5-166): additive positional
embeddings on q/k only, post-norm residual blocks (pre_norm=False in the
canonical config, main.py:48), additive attention bias (torch bool masks
become -inf logits; we use a large finite negative so fully-masked rows
degrade gracefully — the reference explicitly resets fully-masked rows
before they reach the attention, agile3d.py:369,375).

Parameter convention: matrices are stored [in, out] (jax convention); the
torch->jax checkpoint converter transposes. MHA keeps torch's packed
in_proj layout split into q/k/v.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from agile3d_tpu.ops.norm import init_layer_norm, layer_norm

NEG_INF = -1e9


def init_mha(key, d_model: int):
    """Xavier-uniform matrices, zero biases (torch nn.MultiheadAttention
    init, then the reference re-xavier's every >1-dim param,
    attention_block.py:20-23)."""
    ks = jax.random.split(key, 4)
    lim = (6.0 / (2 * d_model)) ** 0.5

    def xav(k):
        return jax.random.uniform(k, (d_model, d_model), jnp.float32, -lim, lim)

    return {
        "q_w": xav(ks[0]), "k_w": xav(ks[1]), "v_w": xav(ks[2]),
        "q_b": jnp.zeros(d_model), "k_b": jnp.zeros(d_model),
        "v_b": jnp.zeros(d_model),
        "out_w": xav(ks[3]), "out_b": jnp.zeros(d_model),
    }


def dropout(x, rate: float, rng):
    """Inverted dropout; identity when rate == 0 or rng is None (eval —
    torch nn.Dropout semantics)."""
    if rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0)


def mha(params, q_in, k_in, v_in, num_heads: int, attn_bias=None,
        dropout_rate: float = 0.0, rng=None):
    """Batched MHA. q_in [B, Lq, E]; k_in/v_in [B, Lk, E];
    attn_bias [B, Lq, Lk] additive (broadcast over heads, like torch's 2D
    attn_mask). dropout_rate/rng apply torch MHA's attention-probability
    dropout (train mode only — pass rng=None for eval)."""
    b, lq, e = q_in.shape
    lk = k_in.shape[1]
    hd = e // num_heads

    def proj(x, w, bias):
        return (x @ w + bias).reshape(x.shape[0], x.shape[1], num_heads, hd)

    q = proj(q_in, params["q_w"], params["q_b"]) * (hd ** -0.5)
    k = proj(k_in, params["k_w"], params["k_b"])
    v = proj(v_in, params["v_w"], params["v_b"])

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
    if attn_bias is not None:
        logits = logits + attn_bias[:, None, :, :]
    w = jax.nn.softmax(logits, axis=-1)
    w = dropout(w, dropout_rate, rng)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, lq, e)
    return out @ params["out_w"] + params["out_b"]


def mha_chunked_keys(params, q_in, k_in, v_in, num_heads: int,
                     attn_bias=None, chunk: int = 8192, bias_fn=None):
    """MHA with an online-softmax scan over key chunks: never materializes
    the [B, H, Lq, Lk] logits (the XLA-path memory hog for voxel-axis
    attention). Differentiable (plain lax.scan), numerics match ``mha``.

    attn_bias [B, Lq, Lk] is consumed chunk-by-chunk. Alternatively
    ``bias_fn(start, size) -> [B, Lq, size]`` computes the bias for keys
    [start, start+size) on the fly inside each scan step — at voxel-scale
    Lk this removes the [B, Lq, Lk] HBM materialization entirely (the
    dominant decoder traffic at >500k voxels; see PERF.md round 4).
    """
    b, lq, e = q_in.shape
    lk = k_in.shape[1]
    if lk % chunk != 0:
        if bias_fn is not None:
            attn_bias = bias_fn(0, lk)
        return mha(params, q_in, k_in, v_in, num_heads, attn_bias)
    hd = e // num_heads
    nc = lk // chunk

    def proj(x, w, bias):
        return (x @ w + bias).reshape(x.shape[0], x.shape[1], num_heads, hd)

    q = proj(q_in, params["q_w"], params["q_b"]) * (hd ** -0.5)
    k = proj(k_in, params["k_w"], params["k_b"])
    v = proj(v_in, params["v_w"], params["v_b"])

    k_c = k.reshape(b, nc, chunk, num_heads, hd).transpose(1, 0, 2, 3, 4)
    v_c = v.reshape(b, nc, chunk, num_heads, hd).transpose(1, 0, 2, 3, 4)
    if bias_fn is not None:
        bias_c = jnp.arange(nc, dtype=jnp.int32) * chunk
        get_bias = lambda bc: bias_fn(bc, chunk)
    elif attn_bias is not None:
        bias_c = attn_bias.reshape(b, lq, nc, chunk).transpose(2, 0, 1, 3)
        get_bias = lambda bc: bc
    else:
        bias_c = jnp.zeros((nc, 1, 1, chunk), q_in.dtype)
        get_bias = lambda bc: bc

    def step(carry, inp):
        m, l, acc = carry
        kc, vc, bc = inp
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, kc) + get_bias(bc)[:, None]
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        scale = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        l_new = l * scale + jnp.sum(p, axis=-1)
        acc_new = acc * scale[..., None] + jnp.einsum("bhqk,bkhd->bhqd", p, vc)
        return (m_new, l_new, acc_new), None

    init = (jnp.full((b, num_heads, lq), NEG_INF),
            jnp.zeros((b, num_heads, lq)),
            jnp.zeros((b, num_heads, lq, hd)))
    (m, l, acc), _ = jax.lax.scan(step, init, (k_c, v_c, bias_c))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, e)
    return out @ params["out_w"] + params["out_b"]


def mha_chunked_queries(params, q_in, k_in, v_in, num_heads: int,
                        attn_bias=None, chunk: int = 8192):
    """MHA scanned over ROW (query) chunks — for the scene-to-click
    direction where softmax runs over the tiny key axis but the query axis
    is the voxel count. attn_bias [B, Lq, Lk], or [B, 1, Lk] to apply one
    key-bias row to every query without materializing the [B, Lq, Lk]
    broadcast (the voxel-as-query direction always uses this form)."""
    b, lq, e = q_in.shape
    if lq % chunk != 0:
        return mha(params, q_in, k_in, v_in, num_heads, attn_bias)
    nc = lq // chunk

    q_c = q_in.reshape(b, nc, chunk, e).transpose(1, 0, 2, 3)
    if attn_bias is not None and attn_bias.shape[1] == 1 and lq != 1:
        shared_bias = attn_bias

        def step(_, qc):
            return None, mha(params, qc, k_in, v_in, num_heads, shared_bias)

        _, out = jax.lax.scan(step, None, q_c)
        return out.transpose(1, 0, 2, 3).reshape(b, lq, e)
    bias_c = (attn_bias.reshape(b, nc, chunk, -1).transpose(1, 0, 2, 3)
              if attn_bias is not None else
              jnp.zeros((nc, 1, 1, k_in.shape[1]), q_in.dtype))

    def step(_, inp):
        qc, bc = inp
        return None, mha(params, qc, k_in, v_in, num_heads, bc)

    _, out = jax.lax.scan(step, None, (q_c, bias_c))
    return out.transpose(1, 0, 2, 3).reshape(b, lq, e)


def _xavier_linear(key, fan_in, fan_out):
    lim = (6.0 / (fan_in + fan_out)) ** 0.5
    kw, kb = jax.random.split(key)
    blim = 1.0 / (fan_in ** 0.5)  # torch Linear bias default
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -lim, lim),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -blim, blim),
    }


def init_attention_layer(key, d_model: int):
    """Self/CrossAttentionLayer: MHA + residual + LayerNorm."""
    return {"attn": init_mha(key, d_model), "norm": init_layer_norm(d_model)}


def init_ffn_layer(key, d_model: int, dim_feedforward: int):
    k1, k2 = jax.random.split(key)
    p = {
        "linear1": _xavier_linear(k1, d_model, dim_feedforward),
        "linear2": _xavier_linear(k2, dim_feedforward, d_model),
        "norm": init_layer_norm(d_model),
    }
    return p


def _split3(rng):
    if rng is None:
        return None, None
    return jax.random.split(rng)


def self_attention_layer(params, tgt, num_heads, *, query_pos=None,
                         attn_bias=None, pre_norm=False,
                         dropout_rate: float = 0.0, rng=None):
    """reference attention_block.py:28-50 (q = k = tgt + query_pos,
    value = tgt; attn-prob dropout inside MHA + residual dropout)."""
    r_attn, r_res = _split3(rng)
    if pre_norm:
        t2 = layer_norm(tgt, params["norm"])
        q = t2 if query_pos is None else t2 + query_pos
        out = mha(params["attn"], q, q, t2, num_heads, attn_bias,
                  dropout_rate, r_attn)
        return tgt + dropout(out, dropout_rate, r_res)
    q = tgt if query_pos is None else tgt + query_pos
    out = mha(params["attn"], q, q, tgt, num_heads, attn_bias,
              dropout_rate, r_attn)
    return layer_norm(tgt + dropout(out, dropout_rate, r_res),
                      params["norm"])


def cross_attention_layer(params, tgt, memory, num_heads, *, pos=None,
                          query_pos=None, attn_bias=None, attn_bias_fn=None,
                          pre_norm=False, chunk_keys=0, chunk_queries=0,
                          dropout_rate: float = 0.0, rng=None):
    """reference attention_block.py:86-113 (q = tgt + query_pos,
    k = memory + pos, value = memory). chunk_keys/chunk_queries select the
    memory-lean scanned attention for long key/query axes (these skip the
    attn-prob dropout — they only engage at eval-scale voxel counts; the
    residual dropout still applies). attn_bias_fn(start, size) computes the
    key-chunk bias on the fly (chunk_keys path only)."""
    r_attn, r_res = _split3(rng)
    if chunk_keys:
        attend = lambda q, k, v, b: mha_chunked_keys(
            params["attn"], q, k, v, num_heads, b, chunk_keys,
            bias_fn=attn_bias_fn)
    elif chunk_queries:
        attend = lambda q, k, v, b: mha_chunked_queries(
            params["attn"], q, k, v, num_heads, b, chunk_queries)
    else:
        attend = lambda q, k, v, b: mha(params["attn"], q, k, v, num_heads,
                                        b, dropout_rate, r_attn)
    if pre_norm:
        t2 = layer_norm(tgt, params["norm"])
        q = t2 if query_pos is None else t2 + query_pos
        k = memory if pos is None else memory + pos
        out = attend(q, k, memory, attn_bias)
        return tgt + dropout(out, dropout_rate, r_res)
    q = tgt if query_pos is None else tgt + query_pos
    k = memory if pos is None else memory + pos
    out = attend(q, k, memory, attn_bias)
    return layer_norm(tgt + dropout(out, dropout_rate, r_res),
                      params["norm"])


def ffn_layer(params, tgt, *, pre_norm=False, dropout_rate: float = 0.0,
              rng=None):
    """reference attention_block.py:151-161 (relu activation; dropout after
    the activation and on the residual)."""
    r_in, r_res = _split3(rng)

    def inner(x):
        t2 = jax.nn.relu(x @ params["linear1"]["w"] + params["linear1"]["b"])
        t2 = dropout(t2, dropout_rate, r_in)
        return t2 @ params["linear2"]["w"] + params["linear2"]["b"]

    if pre_norm:
        t2 = inner(layer_norm(tgt, params["norm"]))
        return tgt + dropout(t2, dropout_rate, r_res)
    t2 = inner(tgt)
    return layer_norm(tgt + dropout(t2, dropout_rate, r_res), params["norm"])
