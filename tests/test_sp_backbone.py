"""Voxel-sharded backbone (parallel/sp_backbone.py) vs the single-chip
backbone on the virtual CPU mesh (SURVEY.md section 7 stage 8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agile3d_tpu.config import Config, ModelConfig
from agile3d_tpu.data.datasets import collate_scenes, SceneSample
from agile3d_tpu.models.agile3d import forward_backbone, init_agile3d
from agile3d_tpu.parallel import make_mesh
from agile3d_tpu.parallel.sp_backbone import (
    make_forward_backbone_sp,
    partition_pyramid,
)
from agile3d_tpu.sparse.quantize import sparse_quantize
from tests.synthetic import make_scene

pytestmark = pytest.mark.slow  # 8-device mesh compiles (minutes on 1 core)

BUCKETS = (512, 1024, 2048, 4096, 8192)


def _scene_batch(cfg, n_points=6000, seed=3):
    rng = np.random.default_rng(seed)
    coords, colors, labels = make_scene(rng, n_points=n_points, num_obj=3)
    vox, umap, imap = sparse_quantize(coords, cfg.model.voxel_size)
    sample = SceneSample(
        vox_coords=vox, raw_coords=coords[umap],
        feats=colors[umap].astype(np.float32) / 255.0,
        labels=labels[umap].astype(np.int32),
        labels_full=labels.astype(np.int32), inverse_map=imap,
        click_idx={}, scene_name="sp", num_obj=3)
    return collate_scenes([sample], BUCKETS), sample


def _small_cfg():
    import dataclasses

    from agile3d_tpu.config import BackboneConfig

    backbone = BackboneConfig(
        init_dim=8, planes=(8, 16, 16, 16, 16, 16, 8, 8),
        layers=(1, 1, 1, 1, 1, 1, 1, 1))
    model = dataclasses.replace(
        ModelConfig(), hidden_dim=32, dim_feedforward=64, num_heads=2,
        num_decoders=2, num_bg_queries=2, max_clicks=8, max_fg_objects=4,
        backbone=backbone)
    return Config(model=model, buckets=BUCKETS)


@pytest.mark.parametrize("n_sp", [2, 8])
def test_sp_backbone_matches_single_chip(n_sp):
    cfg = _small_cfg()
    batch, sample = _scene_batch(cfg)
    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0), cfg.model)

    ref_scene, _ = jax.jit(
        lambda p, bf, bs, f, r, si: forward_backbone(
            p, bf, bs, batch.pyramid, f, r, si, training=False,
            cfg=cfg.model))(params, buffers, bn_state,
                            jnp.asarray(batch.feats), jnp.asarray(batch.raw),
                            jnp.asarray(batch.sample_idx))

    mesh = make_mesh(n_dp=1, n_sp=n_sp)
    sp_pyr = partition_pyramid(batch.pyramid, n_sp)
    fwd_sp = make_forward_backbone_sp(mesh, cfg.model)
    scene, new_bn = fwd_sp(params, buffers, bn_state, sp_pyr,
                           jnp.asarray(batch.feats), jnp.asarray(batch.raw))

    np.testing.assert_allclose(np.asarray(scene.cmin),
                               np.asarray(ref_scene.cmin), atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.cmax),
                               np.asarray(ref_scene.cmax), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(scene.vox_valid),
                                  np.asarray(ref_scene.vox_valid))
    np.testing.assert_allclose(np.asarray(scene.mask_feat),
                               np.asarray(ref_scene.mask_feat),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(scene.pos_pcd),
                               np.asarray(ref_scene.pos_pcd),
                               atol=1e-5, rtol=1e-5)


def test_sp_backbone_training_moments_match():
    """Training-mode BN: cross-shard (count, sum, sumsq) psum must produce
    the same running-stat updates as single-chip masked moments."""
    cfg = _small_cfg()
    batch, _ = _scene_batch(cfg, n_points=3000, seed=5)
    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(1), cfg.model)

    _, ref_bn = jax.jit(
        lambda p, bf, bs, f, r, si: forward_backbone(
            p, bf, bs, batch.pyramid, f, r, si, training=True,
            cfg=cfg.model))(params, buffers, bn_state,
                            jnp.asarray(batch.feats), jnp.asarray(batch.raw),
                            jnp.asarray(batch.sample_idx))

    mesh = make_mesh(n_dp=1, n_sp=4)
    sp_pyr = partition_pyramid(batch.pyramid, 4)
    fwd_sp = make_forward_backbone_sp(mesh, cfg.model)
    _, sp_bn = fwd_sp(params, buffers, bn_state, sp_pyr,
                      jnp.asarray(batch.feats), jnp.asarray(batch.raw),
                      training=True)

    flat_ref = jax.tree_util.tree_leaves(ref_bn)
    flat_sp = jax.tree_util.tree_leaves(sp_bn)
    assert len(flat_ref) == len(flat_sp)
    for a, b in zip(flat_ref, flat_sp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-4, rtol=2e-3)


def test_sp_backbone_feeds_sp_decoder():
    """End-to-end SP: sharded backbone output drives the sharded decoder
    without resharding; result matches the fully single-chip pipeline."""
    from agile3d_tpu.models.agile3d import ClickState, forward_mask
    from agile3d_tpu.parallel.sp import make_forward_mask_sp

    cfg = _small_cfg()
    batch, sample = _scene_batch(cfg)
    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0), cfg.model)

    n_valid = len(sample.vox_coords)
    rng = np.random.default_rng(0)
    mc = cfg.model.max_clicks
    vox = np.full((1, mc), -1, np.int32)
    vox[0, :5] = rng.integers(0, n_valid, 5)
    obj = np.zeros((1, mc), np.int32)
    obj[0, :5] = [1, 2, 3, 0, 1]
    tim = np.zeros((1, mc), np.int32)
    tim[0, :5] = np.arange(5)
    clicks = ClickState(jnp.asarray(vox), jnp.asarray(obj), jnp.asarray(tim))
    num_obj = jnp.asarray([3], jnp.int32)

    ref_scene, _ = forward_backbone(
        params, buffers, bn_state, batch.pyramid, jnp.asarray(batch.feats),
        jnp.asarray(batch.raw), jnp.asarray(batch.sample_idx),
        training=False, cfg=cfg.model)
    ref_out = forward_mask(params, buffers, ref_scene, clicks, num_obj,
                           cfg=cfg.model)

    mesh = make_mesh(n_dp=1, n_sp=8)
    sp_pyr = partition_pyramid(batch.pyramid, 8)
    fwd_sp = make_forward_backbone_sp(mesh, cfg.model)
    scene, _ = fwd_sp(params, buffers, bn_state, sp_pyr,
                      jnp.asarray(batch.feats), jnp.asarray(batch.raw))
    fm_sp, _ = make_forward_mask_sp(mesh, cfg.model)
    out = fm_sp(params, buffers, scene, clicks, num_obj)

    ref_pred = np.asarray(jnp.argmax(ref_out["pred_masks"], -1))
    sp_pred = np.asarray(jnp.argmax(out["pred_masks"], -1))
    valid = np.asarray(ref_scene.vox_valid)
    # logits match to fp tolerance; argmax agreement on valid rows
    agree = (ref_pred == sp_pred)[valid].mean()
    assert agree > 0.999, f"pred agreement {agree}"
    np.testing.assert_allclose(
        np.asarray(out["pred_masks"])[valid],
        np.asarray(ref_out["pred_masks"])[valid], atol=5e-3, rtol=1e-3)


def test_engine_sp_backbone_rollout(tmp_path):
    """Engine wiring: InteractiveEngine(sp=8, sp_backbone=True) must produce
    the same eval CSV as the single-chip engine on the host rollout."""
    from agile3d_tpu.data.datasets import InterMultiObjDataset
    from agile3d_tpu.engine.eval import InteractiveEngine, evaluate_dataset
    from tests.synthetic import write_benchmark

    cfg = _small_cfg()
    scans, val_list = write_benchmark(str(tmp_path / "bench"), num_scenes=1,
                                      num_obj=3, seed=9, n_points=3000)
    ds = InterMultiObjDataset(scans, val_list, cfg.model.voxel_size)
    params, buffers, state = init_agile3d(jax.random.PRNGKey(0), cfg.model)

    csv_ref = str(tmp_path / "ref.csv")
    evaluate_dataset(InteractiveEngine(cfg), params, buffers, state, ds,
                     csv_ref, mode="multi", max_num_clicks=2, seed=7,
                     log=lambda *a: None)

    csv_sp = str(tmp_path / "sp.csv")
    evaluate_dataset(InteractiveEngine(cfg, sp=8, sp_backbone=True),
                     params, buffers, state, ds, csv_sp, mode="multi",
                     max_num_clicks=2, seed=7, log=lambda *a: None)

    ref = [r.split(" ") for r in open(csv_ref).read().strip().split("\n")]
    got = [r.split(" ") for r in open(csv_sp).read().strip().split("\n")]
    assert len(ref) == len(got)
    for r, g in zip(ref, got):
        assert r[:4] == g[:4]
        np.testing.assert_allclose(float(g[4]), float(r[4]), atol=2e-3)


def test_halo_bucket_ladder():
    """~1.5x-geometric, 128-granular, monotone, covers n (code-review
    round 4: exact 128-rounding recompiled the sharded UNet per scene)."""
    from agile3d_tpu.parallel.sp_backbone import _halo_bucket

    vals = sorted({_halo_bucket(n) for n in range(0, 200_000, 37)})
    assert all(v % 128 == 0 for v in vals)
    assert all(_halo_bucket(n) >= n for n in range(0, 5000, 13))
    # O(log) distinct shapes across a 200k range, not one per scene
    assert len(vals) < 25, vals
    ratios = [b / a for a, b in zip(vals, vals[1:])]
    assert max(ratios) <= 2.0, ratios  # 128->256 is the coarsest step


def test_sp_backbone_bf16_matches_single_chip_bf16():
    """backbone_dtype='bfloat16' follows the same cast policy on the
    sharded path as on the single-chip path (code-review round 4: the SP
    backbone silently ignored it)."""
    import dataclasses

    cfg = _small_cfg()
    model_bf = dataclasses.replace(cfg.model, backbone_dtype="bfloat16")
    batch, _ = _scene_batch(cfg)
    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0), model_bf)

    ref_scene, _ = jax.jit(
        lambda p, bf, bs, f, r, si: forward_backbone(
            p, bf, bs, batch.pyramid, f, r, si, training=False,
            cfg=model_bf))(params, buffers, bn_state,
                           jnp.asarray(batch.feats), jnp.asarray(batch.raw),
                           jnp.asarray(batch.sample_idx))

    mesh = make_mesh(n_dp=1, n_sp=2)
    sp_pyr = partition_pyramid(batch.pyramid, 2)
    fwd_sp = make_forward_backbone_sp(mesh, model_bf)
    scene, _ = fwd_sp(params, buffers, bn_state, sp_pyr,
                      jnp.asarray(batch.feats), jnp.asarray(batch.raw))

    # bf16 accumulates differently across the shard boundary -> looser band
    np.testing.assert_allclose(np.asarray(scene.mask_feat, np.float32),
                               np.asarray(ref_scene.mask_feat, np.float32),
                               atol=0.05, rtol=0.05)
