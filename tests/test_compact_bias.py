"""Compact round-bias state and decoder-dtype coverage.

The decoder carries the reference's per-round attention mask
(reference models/agile3d.py:363-382) as compact (labels, present)
state and reconstructs the [B, Q, N] bias lazily — per key chunk in the
scanned attention, or in one piece on the dense path. These tests pin:

  * bias_fn-driven chunked attention == dense-bias chunked attention,
  * the [B, 1, Lk] shared-key-row fast path in mha_chunked_queries,
  * _round_bias_chunk slices == _round_bias_dense,
  * forward_mask: forced-chunked route == dense route (f32, exact-ish),
  * decoder_dtype='bfloat16' smoke (finite, label-agreement with f32).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agile3d_tpu.config import ModelConfig
from agile3d_tpu.models.agile3d import (
    _round_bias_chunk,
    _round_bias_dense,
    forward_mask,
    init_agile3d,
)
from agile3d_tpu.ops.attention import (
    init_mha,
    mha,
    mha_chunked_keys,
    mha_chunked_queries,
)
from tests.test_decoder_parity import (
    build_scene_features,
    clicks_from_dicts,
    make_scene,
)


def test_bias_fn_matches_dense_bias():
    rng = np.random.default_rng(0)
    params = init_mha(jax.random.PRNGKey(0), 64)
    q = jnp.asarray(rng.standard_normal((2, 24, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 512, 64)), jnp.float32)
    bias = jnp.where(jnp.asarray(rng.random((2, 24, 512))) < 0.2, -1e9, 0.0)

    def bias_fn(start, size):
        return jax.lax.dynamic_slice_in_dim(bias, start, size, axis=2)

    ref = mha_chunked_keys(params, q, k, k, 4, bias, chunk=128)
    got = mha_chunked_keys(params, q, k, k, 4, None, chunk=128,
                           bias_fn=bias_fn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # non-divisible fallback materializes bias_fn(0, lk) once
    got_nd = mha_chunked_keys(params, q, k[:, :300], k[:, :300], 4, None,
                              chunk=128,
                              bias_fn=lambda s, z: bias[:, :, s:s + z])
    ref_nd = mha(params, q, k[:, :300], k[:, :300], 4, bias[:, :, :300])
    np.testing.assert_allclose(np.asarray(got_nd), np.asarray(ref_nd),
                               rtol=1e-5, atol=1e-6)


def test_chunked_queries_shared_key_row():
    rng = np.random.default_rng(1)
    params = init_mha(jax.random.PRNGKey(1), 64)
    q = jnp.asarray(rng.standard_normal((2, 512, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 24, 64)), jnp.float32)
    row = jnp.where(jnp.asarray(rng.random((2, 1, 24))) < 0.2, -1e9, 0.0)

    ref = mha_chunked_queries(params, q, k, k, 4,
                              jnp.broadcast_to(row, (2, 512, 24)), chunk=128)
    got = mha_chunked_queries(params, q, k, k, 4, row, chunk=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_round_bias_chunk_matches_dense():
    rng = np.random.default_rng(2)
    b, q, n, n_cols = 2, 12, 256, 5
    labels = jnp.asarray(rng.integers(-1, n_cols, (b, n)), jnp.int32)
    present = jnp.asarray(rng.random((b, n_cols)) < 0.6)
    safe_obj = jnp.asarray(rng.integers(0, n_cols, (b, q)), jnp.int32)
    vox_valid = jnp.asarray(rng.random((b, n)) < 0.9)

    dense = _round_bias_dense(labels, present, safe_obj, vox_valid)
    fn = _round_bias_chunk(labels, present, safe_obj, vox_valid)
    rebuilt = jnp.concatenate(
        [fn(s, 64) for s in range(0, n, 64)], axis=2)
    np.testing.assert_array_equal(np.asarray(rebuilt), np.asarray(dense))
    # whole-axis call == dense (the non-divisible fallback path)
    np.testing.assert_array_equal(np.asarray(fn(0, n)), np.asarray(dense))


def _decoder_inputs(n_valid, n_pad, cfg, seed=0):
    rng = np.random.default_rng(seed)
    params, buffers, _ = init_agile3d(jax.random.PRNGKey(seed), cfg)
    raw, feat = make_scene(rng, n_valid, n_pad)
    scene = build_scene_features(raw, feat, n_valid, buffers)
    click_idx = {"0": [5, 17], "1": [40, 41, 77], "2": [120], "3": [200, 250]}
    click_time_idx = {"0": [3, 6], "1": [0, 4, 5], "2": [1], "3": [2, 7]}
    clicks = clicks_from_dicts(click_idx, click_time_idx, cfg)
    num_obj = jnp.asarray([3], jnp.int32)
    return params, buffers, scene, clicks, num_obj


@pytest.mark.slow
def test_forward_mask_chunked_matches_dense():
    """The chunked decoder (scanned attention + _round_bias_chunk) must
    match the dense decoder (materialized _round_bias_dense) — same f32
    numerics, different memory schedule. N=24576 is the smallest count
    the chunk picker accepts (6 x 4096 scan steps)."""
    base = dict(max_clicks=32, max_fg_objects=10, num_decoders=2)
    cfg_dense = ModelConfig(**base, xla_attn_chunk=0)
    cfg_chunk = ModelConfig(**base, xla_attn_chunk=4096,
                            xla_attn_dense_threshold=0)
    params, buffers, scene, clicks, num_obj = _decoder_inputs(
        24000, 24576, cfg_dense)
    out_d = forward_mask(params, buffers, scene, clicks, num_obj,
                         cfg=cfg_dense)["all_masks"]
    out_c = forward_mask(params, buffers, scene, clicks, num_obj,
                         cfg=cfg_chunk)["all_masks"]
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_d),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_sp_decoder_bf16_matches_single_chip():
    """The SP decoder honors decoder_dtype='bfloat16' (same cast points as
    the single-chip path) and its predictions agree with the single-chip
    bf16 decoder. Cross-shard (m, l, acc) combine order differs from the
    single-chip chunk scan, so bf16 rounding can flip near-tied argmaxes —
    assert close logits + overwhelming argmax agreement."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import dataclasses

    from agile3d_tpu.parallel import make_mesh
    from agile3d_tpu.parallel.sp import make_forward_mask_sp
    from tests.test_parallel import _scene_and_clicks

    cfg = dataclasses.replace(ModelConfig(max_clicks=32),
                              decoder_dtype="bfloat16")
    rng = np.random.default_rng(3)
    params, buffers, scene, clicks = _scene_and_clicks(rng, cfg=cfg)
    num_obj = jnp.asarray([3], jnp.int32)

    ref = forward_mask(params, buffers, scene, clicks, num_obj, cfg=cfg)
    mesh = make_mesh(n_dp=1, n_sp=8)
    fm_sp, shard_scene = make_forward_mask_sp(mesh, cfg)
    got = fm_sp(params, buffers, shard_scene(scene), clicks, num_obj)

    valid = np.asarray(scene.vox_valid[0])
    a = np.asarray(ref["pred_masks"], np.float32)[0, valid][:, :4]
    b = np.asarray(got["pred_masks"], np.float32)[0, valid][:, :4]
    np.testing.assert_allclose(a, b, rtol=0.05, atol=0.05)
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree > 0.99, agree


def test_decoder_bf16_smoke():
    cfg_f32 = ModelConfig(max_clicks=32, max_fg_objects=10, num_decoders=2)
    import dataclasses
    cfg_bf16 = dataclasses.replace(cfg_f32, decoder_dtype="bfloat16")
    params, buffers, scene, clicks, num_obj = _decoder_inputs(
        300, 384, cfg_f32)
    out_f32 = np.asarray(forward_mask(params, buffers, scene, clicks,
                                      num_obj, cfg=cfg_f32)["pred_masks"])
    out_bf16 = np.asarray(forward_mask(params, buffers, scene, clicks,
                                       num_obj, cfg=cfg_bf16)["pred_masks"])
    assert out_bf16.dtype == np.float32  # logits head returns f32-compatible
    assert np.isfinite(out_bf16[np.isfinite(out_f32)]).all()
    # per-voxel argmax labels should overwhelmingly agree with f32
    # (random-init logits are near-tied, so a few bf16 rounding flips are
    # expected; trained-weight agreement is far higher — PERF.md round 4)
    lab_f32 = out_f32.argmax(-1)[:, :300]
    lab_bf16 = out_bf16.argmax(-1)[:, :300]
    assert (lab_f32 == lab_bf16).mean() > 0.90


def test_decoder_bf16_scan_rounds():
    """The training form (scan_rounds=True) must run under the bf16
    decoder: without the round_body carry-dtype pin, the f32 pos/bias
    terms promote queries/src to f32 after round 1 and lax.scan rejects
    the carry (code-review round 4). Also pins that the eval rounds loop
    and the scanned rounds agree — both now keep the carry in bf16."""
    import dataclasses
    cfg = dataclasses.replace(
        ModelConfig(max_clicks=32, max_fg_objects=10, num_decoders=2),
        decoder_dtype="bfloat16")
    params, buffers, scene, clicks, num_obj = _decoder_inputs(300, 384, cfg)
    out_scan = forward_mask(params, buffers, scene, clicks, num_obj,
                            cfg=cfg, scan_rounds=True)["all_masks"]
    out_loop = forward_mask(params, buffers, scene, clicks, num_obj,
                            cfg=cfg)["all_masks"]
    assert out_scan.dtype == jnp.float32
    assert np.isfinite(np.asarray(out_scan)[:, :, :300, :4]).all()
    np.testing.assert_allclose(np.asarray(out_scan)[:, :, :300, :4],
                               np.asarray(out_loop)[:, :, :300, :4],
                               rtol=2e-2, atol=2e-2)
