"""Training engine smoke test: rollout + supervised step decrease loss and
update params/BN state on a tiny synthetic benchmark."""

import random

import jax
import numpy as np
import pytest

from agile3d_tpu.config import Config, LossConfig, ModelConfig, TrainConfig
from agile3d_tpu.data.datasets import InterMultiObjDataset
from agile3d_tpu.engine.eval import InteractiveEngine
from agile3d_tpu.engine.train import (
    make_optimizer,
    make_train_step,
    subsample_objects,
    train_one_epoch,
)
from agile3d_tpu.models.agile3d import init_agile3d
from tests.synthetic import write_benchmark

CFG = Config(
    model=ModelConfig(max_clicks=64),
    train=TrainConfig(batch_size=2, clip_max_norm=0.1),
    buckets=(1024, 2048, 4096),
)


def test_subsample_objects():
    rng = np.random.default_rng(0)
    labels = np.array([0, 1, 1, 5, 5, 5, 9, -1, -1], np.int32)
    # reference semantics (engine.py:60-61): only -1 is excluded from the
    # candidate pool, so label 0 (background) is itself samplable — the
    # pool here is {0, 1, 5, 9}
    seen_zero = False
    for _ in range(20):
        out, k = subsample_objects(labels, rng)
        assert 1 <= k <= 4
        assert set(np.unique(out[:7])) <= set(range(k + 1))
        assert (out[7:] == -1).all()
        # remapped ids are contiguous 1..k, each mapping one original object
        for o in range(1, k + 1):
            src = labels[out == o]
            assert len(np.unique(src)) == 1 and src[0] in (0, 1, 5, 9)
            seen_zero |= src[0] == 0
    assert seen_zero  # the background region does get sampled


@pytest.mark.slow
def test_train_steps_reduce_loss(tmp_path):
    scans, val_list = write_benchmark(str(tmp_path), num_scenes=2, num_obj=2,
                                      n_points=1200)
    ds = InterMultiObjDataset(scans, val_list, 0.05, augment=False)
    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0), CFG.model)
    engine = InteractiveEngine(CFG)
    tx, _ = make_optimizer(CFG, steps_per_epoch=1)
    opt_state = tx.init(params)
    train_step = make_train_step(CFG, tx)

    np_rng = np.random.default_rng(42)
    py_rng = random.Random(42)

    losses = []
    p0 = jax.tree_util.tree_leaves(params)[0].copy()
    for epoch in range(2):
        params, bn_state, opt_state, stats = train_one_epoch(
            engine, params, buffers, bn_state, opt_state, train_step, ds,
            CFG, epoch, np_rng=np_rng, py_rng=py_rng, log=lambda *a: None)
        losses.append(stats["loss"])
        assert np.isfinite(stats["loss"])
        assert 0 <= stats["mIoU"] <= 1

    # params changed
    p1 = jax.tree_util.tree_leaves(params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


@pytest.mark.slow
def test_prefetch_depth_does_not_change_trajectory(tmp_path):
    """The prefetcher's determinism contract: per-batch seeds are pre-drawn,
    so the training trajectory is bit-identical at every prefetch depth
    (data/prefetch.py; depth 0 = fully synchronous)."""
    import dataclasses

    scans, val_list = write_benchmark(str(tmp_path), num_scenes=2, num_obj=2,
                                      n_points=1200)

    def run(depth):
        cfg = dataclasses.replace(
            CFG, train=dataclasses.replace(CFG.train, prefetch=depth))
        ds = InterMultiObjDataset(scans, val_list, 0.05, augment=False)
        params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0),
                                                 cfg.model)
        engine = InteractiveEngine(cfg)
        tx, _ = make_optimizer(cfg, steps_per_epoch=1)
        opt_state = tx.init(params)
        step = make_train_step(cfg, tx)
        params, bn_state, opt_state, stats = train_one_epoch(
            engine, params, buffers, bn_state, opt_state, step, ds, cfg, 0,
            np_rng=np.random.default_rng(7), py_rng=random.Random(7),
            log=lambda *a: None)
        return params, stats

    p_sync, s_sync = run(0)
    p_pre, s_pre = run(2)
    assert s_sync["loss"] == s_pre["loss"]
    for a, b in zip(jax.tree_util.tree_leaves(p_sync),
                    jax.tree_util.tree_leaves(p_pre)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_batch_keeps_k5_for_training_consumers(monkeypatch):
    """The k5-transfer drop is keyed on the EVAL stem routing, but the same
    device pyramid feeds the training-mode supervised forward, where the
    banded stem (eval-only) cannot serve and the strips/scan route needs
    k5. Regression for the bench_train crash at ScanNet-scale batches:
    AttributeError 'NoneType' has no 'shape' in sparse_conv_strips."""
    from agile3d_tpu.config import Config
    from agile3d_tpu.data.datasets import SceneSample, collate_scenes
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from tests.synthetic import make_scene

    cfg = Config(buckets=(1024, 2048, 4096))
    rng = np.random.default_rng(0)
    coords, colors, labels = make_scene(rng, n_points=1200, num_obj=2)
    vox, umap, imap = sparse_quantize(coords, cfg.model.voxel_size)
    s = SceneSample(vox_coords=vox, raw_coords=coords[umap],
                    feats=colors[umap].astype(np.float32) / 255.0,
                    labels=labels[umap].astype(np.int32),
                    labels_full=labels.astype(np.int32), inverse_map=imap,
                    click_idx={}, scene_name="t", num_obj=2)
    batch = collate_scenes([s], cfg.buckets)

    monkeypatch.setattr("agile3d_tpu.models.backbone.stem_banded_active",
                        lambda *a, **k: True)
    eng = InteractiveEngine(cfg)
    pyr, *_ = eng.device_batch(batch)
    assert pyr.levels[0].k5 is None      # eval consumer: drop saves HBM

    eng2 = InteractiveEngine(cfg)
    pyr2, *_ = eng2.device_batch(batch, will_train=True)
    assert pyr2.levels[0].k5 is not None  # training consumer keeps it
