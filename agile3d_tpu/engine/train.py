"""Training engine: iterative-click training loop (reference engine.py:26-179).

Per batch (reference structure preserved):
  1. collate scenes; per sample draw a random object subset (1..10 objects)
     and remap labels (engine.py:56-76);
  2. run the backbone once and roll out a random number (0..19) of
     simulated-click rounds without gradients (engine.py:82-115);
  3. one supervised forward with gradients through BOTH the decoder and the
     backbone (the reference keeps the backbone graph alive from step 1;
     in JAX the loss closure recomputes the backbone forward — one extra
     ~ms-scale forward on TPU), click-weighted CE + dice + aux losses,
     global-norm clip 0.1, AdamW step (engine.py:118-152).
"""

from __future__ import annotations

import functools
import random as pyrandom

import jax
import jax.numpy as jnp
import numpy as np
import optax

from agile3d_tpu.config import Config
from agile3d_tpu.data.datasets import SceneBatch, collate_scenes
from agile3d_tpu.engine.clicks import HostClicks, simulate_clicks
from agile3d_tpu.engine.eval import InteractiveEngine
from agile3d_tpu.models.agile3d import ClickState, forward_backbone, forward_mask
from agile3d_tpu.models.criterion import (
    click_loss_weights,
    criterion_forward,
    loss_weight_dict,
    model_num_aux_rounds,
    total_loss,
)
from agile3d_tpu.utils.misc import MetricLogger


def make_optimizer(cfg: Config, steps_per_epoch: int):
    """AdamW + MultiStepLR(gamma=0.1 at lr_drop epochs) + global-norm clip
    (reference main.py:125-127, engine.py:148-149)."""
    boundaries = {
        int(e) * steps_per_epoch: cfg.train.lr_drop_gamma
        for e in cfg.train.lr_drop
    }
    schedule = optax.piecewise_constant_schedule(cfg.train.lr, boundaries)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.train.clip_max_norm),
        optax.adamw(schedule, weight_decay=cfg.train.weight_decay),
    )
    return tx, schedule


def make_train_step(cfg: Config, tx):
    wd = loss_weight_dict(
        cfg.loss, num_aux_rounds=model_num_aux_rounds(cfg.model))

    @jax.jit
    def train_step(params, buffers, bn_state, opt_state, pyr, feats, raw,
                   sample_idx, clicks, labels, num_obj, dropout_rng=None):
        def loss_fn(p):
            scene, new_bn = forward_backbone(
                p, buffers, bn_state, pyr, feats, raw, sample_idx,
                training=True, cfg=cfg.model)
            out = forward_mask(p, buffers, scene, clicks, num_obj,
                               cfg=cfg.model, train_rng=dropout_rng,
                               scan_rounds=True)
            target = jnp.maximum(labels, 0)
            vox_valid = scene.vox_valid & (labels >= 0)
            weights = click_loss_weights(
                scene.raw, vox_valid, clicks.vox, clicks.vox >= 0, cfg.loss)
            losses = criterion_forward(out["all_masks"], target, weights,
                                       vox_valid, cfg.loss)
            tot = total_loss(losses, wd)
            pred = jnp.argmax(out["pred_masks"], -1)
            return tot, (losses, new_bn, pred, vox_valid)

        (tot, (losses, new_bn, pred, vox_valid)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(params))
        gnorm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # training mIoU (reference engine.py:155-158)
        miou = _batch_miou(pred, jnp.maximum(labels, 0), vox_valid, num_obj,
                           cfg.model.max_fg_objects)
        return new_params, new_bn, new_opt, tot, losses, gnorm, miou

    return train_step


def _per_sample_iou(pred, labels, valid, num_obj, max_obj):
    """Per-sample foreground mean IoU [B] (reference utils/seg.py:20-42)."""
    ious = []
    for o in range(1, max_obj + 1):
        p = (pred == o) & valid
        g = (labels == o) & valid
        inter = jnp.sum(p & g, axis=-1)
        union = jnp.sum(p, -1) + jnp.sum(g, -1) - inter
        ious.append(jnp.where(union > 0, inter / jnp.maximum(union, 1), 0.0))
    ious = jnp.stack(ious, -1)                       # [B, max_obj]
    present = jnp.arange(1, max_obj + 1)[None, :] <= num_obj[:, None]
    return jnp.sum(jnp.where(present, ious, 0), -1) / jnp.maximum(num_obj, 1)


def _batch_miou(pred, labels, valid, num_obj, max_obj):
    """reference utils/seg.py:20-42 mean_iou over the batch."""
    return _per_sample_iou(pred, labels, valid, num_obj, max_obj).mean()


def subsample_objects(labels_row: np.ndarray, rng: np.random.Generator,
                      max_obj: int = 10):
    """Random object subset + label remap (reference engine.py:56-76);
    labels_row uses -1 for pad slots.

    Matches the reference's sampling distribution exactly: only -1 is
    excluded from the candidate pool (reference engine.py:60-61), so the
    background region (label 0) CAN be drawn as a foreground object —
    unselected ids fall back to background in the remapped labels either
    way (engine.py:67-71)."""
    valid_ids = np.unique(labels_row)
    valid_ids = valid_ids[valid_ids != -1]
    if len(valid_ids) == 0:
        return np.where(labels_row >= 0, 0, -1).astype(np.int32), 0
    k = rng.integers(1, min(max_obj, len(valid_ids)) + 1)
    chosen = valid_ids[rng.permutation(len(valid_ids))[:k]]
    out = np.where(labels_row >= 0, 0, -1).astype(np.int32)
    for i, obj in enumerate(chosen):
        out[labels_row == obj] = i + 1
    return out, int(k)


def rollout_clicks(engine: InteractiveEngine, params, buffers, scene,
                   labels: np.ndarray, num_obj: np.ndarray,
                   raw_per_sample: list, n_valid: list,
                   rng: pyrandom.Random, cfg: Config):
    """Pre-interactive sampling (reference engine.py:80-115): a random-length
    no-gradient rollout that accumulates simulated clicks."""
    b = labels.shape[0]
    clicks = [HostClicks(cfg.model.max_clicks) for _ in range(b)]
    num_iters = rng.randint(0, 19)
    current = 0
    while current <= num_iters:
        if current == 0:
            preds = [np.zeros(n_valid[i], np.int32) for i in range(b)]
        else:
            mc = engine._click_bucket(max(c.count for c in clicks))
            cs = ClickState(
                vox=jnp.asarray(np.stack([c.vox[:mc] for c in clicks])),
                obj=jnp.asarray(np.stack([c.obj[:mc] for c in clicks])),
                time=jnp.asarray(np.stack([c.time[:mc] for c in clicks])))
            _, pred_dev = engine._mask(params, buffers, scene, cs,
                                       jnp.asarray(num_obj))
            pred_host = np.asarray(pred_dev)
            preds = []
            for i in range(b):
                p = pred_host[i, : n_valid[i]].copy()
                v = clicks[i].vox[: clicks[i].count]
                p[v] = clicks[i].obj[: clicks[i].count]
                preds.append(p)
        for i in range(b):
            new = simulate_clicks(
                preds[i], labels[i, : n_valid[i]], raw_per_sample[i],
                num_obj=int(num_obj[i]), training=True,
                current_num_clicks=current, rng=rng,
                max_label=cfg.model.max_fg_objects)
            if new is not None:
                clicks[i].extend(new)
        current += 1
    return clicks


def prepare_batch(dataset, batch_ids, cfg: Config, seed: int):
    """Host-side batch assembly (the prefetchable unit): load + quantize the
    scenes, collate into a padded pyramid, and draw the per-sample object
    subsets from a seed-local generator (so the result is independent of
    WHEN it runs — the basis for the prefetcher's determinism contract)."""
    samples = [dataset[int(j)] for j in batch_ids]
    batch = collate_scenes(samples, cfg.buckets, stem_banded=False)
    b = len(samples)
    n_valid = [int((batch.sample_idx[i] >= 0).sum()) for i in range(b)]
    rng = np.random.default_rng(seed)
    labels_new = batch.labels.copy()
    num_obj = np.zeros(b, np.int32)
    for i in range(b):
        labels_new[i], num_obj[i] = subsample_objects(
            batch.labels[i], rng, cfg.model.max_fg_objects)
    return batch, labels_new, num_obj, n_valid


def train_one_epoch(engine, params, buffers, bn_state, opt_state, train_step,
                    dataset, cfg: Config, epoch: int, *,
                    np_rng: np.random.Generator, py_rng: pyrandom.Random,
                    order: np.ndarray | None = None, log=print,
                    print_freq: int = 10, device_rollout: bool = False):
    """One epoch over the dataset with batch assembly on host.

    device_rollout=True replaces the host click-rollout loop (one decoder
    dispatch + host simulation per round) with a single on-device lax.scan
    (engine/device_train.py); the resulting click table feeds the supervised
    step without leaving the device.

    Batch assembly (load -> quantize -> pyramid -> collate -> object
    subsets) runs on a background prefetch thread (data/prefetch.py,
    depth cfg.train.prefetch) so batch N+1 is built while batch N trains —
    the reference's 2-worker DataLoader analogue (reference main.py:
    118-123). Per-batch subsample seeds are pre-drawn from np_rng, so the
    trajectory is identical at every prefetch depth (tests/test_train.py).
    """
    from agile3d_tpu.data.prefetch import BatchPrefetcher

    logger = MetricLogger(log=log)
    bs = cfg.train.batch_size
    n = len(dataset)
    if order is None:
        order = np_rng.permutation(n)
    batches = [order[i: i + bs] for i in range(0, n, bs)]
    seeds = np_rng.integers(2 ** 31, size=len(batches))
    work = [(ids, int(s)) for ids, s in zip(batches, seeds)]
    fetcher = BatchPrefetcher(
        lambda w: prepare_batch(dataset, w[0], cfg, w[1]),
        work, depth=cfg.train.prefetch)

    for batch, labels_new, num_obj, n_valid in logger.log_every(
            fetcher, print_freq, f"Epoch: [{epoch}]"):
        b = labels_new.shape[0]

        # rollout (backbone in train mode: same normalization the
        # supervised pass will use, reference engine.py:53 + :86)
        scene, _ = engine.run_backbone(params, buffers, bn_state, batch,
                                       training=True)
        if device_rollout:
            from agile3d_tpu.engine.device_train import (
                make_device_train_rollout, round_bucket)

            num_iters = py_rng.randint(0, 19)
            rb = round_bucket(num_iters + 1)
            cache = getattr(engine, "_train_rollouts", None)
            if cache is None:
                cache = engine._train_rollouts = {}
            if rb not in cache:
                cache[rb] = make_device_train_rollout(cfg, rb)
            cs_full, counts = cache[rb](
                params, buffers, scene, jnp.asarray(labels_new),
                jnp.asarray(num_obj), jnp.asarray(num_iters, jnp.int32),
                jax.random.PRNGKey(int(np_rng.integers(2 ** 31))))
            max_count = int(np.asarray(counts).max())
            mc = 64 if max_count <= 64 else cfg.model.max_clicks
            cs = ClickState(vox=cs_full.vox[:, :mc], obj=cs_full.obj[:, :mc],
                            time=cs_full.time[:, :mc])
        else:
            raw_per_sample = []
            off = 0
            for i in range(b):
                raw_per_sample.append(batch.raw[off: off + n_valid[i]])
                off += n_valid[i]
            clicks = rollout_clicks(engine, params, buffers, scene,
                                    labels_new, num_obj, raw_per_sample,
                                    n_valid, py_rng, cfg)

            # 3. supervised step (coarse click buckets so the expensive
            # train-step jit compiles at most twice)
            mc = 64 if max(c.count for c in clicks) <= 64 else \
                cfg.model.max_clicks
            cs = ClickState(
                vox=jnp.asarray(np.stack([c.vox[:mc] for c in clicks])),
                obj=jnp.asarray(np.stack([c.obj[:mc] for c in clicks])),
                time=jnp.asarray(np.stack([c.time[:mc] for c in clicks])))
        pyr_dev, feats_dev, raw_dev, si_dev = engine.device_batch(
            batch, will_train=True)
        drng = (jax.random.PRNGKey(int(np_rng.integers(2 ** 31)))
                if cfg.model.dropout > 0 else None)
        params, bn_state, opt_state, tot, losses, gnorm, miou = train_step(
            params, buffers, bn_state, opt_state, pyr_dev, feats_dev,
            raw_dev, si_dev, cs, jnp.asarray(labels_new),
            jnp.asarray(num_obj), drng)

        tot = float(tot)
        if not np.isfinite(tot):
            raise FloatingPointError(
                f"Loss is {tot}, stopping training "
                f"(reference engine.py:139-142 guard)")
        # only the configured loss keys exist (--losses bce / dice drops
        # the other; criterion_forward emits exactly cfg.loss.losses)
        logger.update(loss=tot, grad_norm=float(gnorm), mIoU=float(miou),
                      **{k: float(v) for k, v in losses.items()
                         if k in ("loss_bce", "loss_dice")})

    log(f"Averaged stats: {logger}")
    stats = {k: m.global_avg for k, m in logger.meters.items()}
    return params, bn_state, opt_state, stats
