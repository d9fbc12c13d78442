"""Interactive evaluation rollout (reference eval_multi_obj.py:76-173,
eval_single_obj.py:76-167, engine.py:183-307).

Per scene: run the backbone ONCE, then iterate click rounds — decoder
forward, clicked-voxel gt-override, full-resolution IoU, click simulation —
until the click budget is spent, writing one ``id scene obj clicks iou`` CSV
row per round. The model passes, IoU, and boundary distances run jitted on
device; the loop control and CSV writing stay on host (one dispatch per
round; see bench.py for the per-round latency).
"""

from __future__ import annotations

import functools
import random

import jax
import jax.numpy as jnp
import numpy as np

from agile3d_tpu.config import Config, bucket_size
from agile3d_tpu.data.datasets import SceneBatch, collate_scenes
from agile3d_tpu.engine.clicks import (
    HostClicks,
    apply_click_override,
    iou_per_object,
    simulate_clicks,
)
from agile3d_tpu.models.agile3d import ClickState, forward_backbone, forward_mask


class SceneTooLargeError(ValueError):
    """A scene's padded voxel count exceeds the single-chip HBM budget.

    Raised by check_single_chip_rows with the remedies in the message; the
    eval CLIs catch it and exit with the one-line message instead of a
    traceback (the reference's answer is "crop", demo.md:39,70)."""


def check_single_chip_rows(n_rows: int) -> None:
    """Actionable pre-check before a single-chip backbone run: estimate the
    eval footprint at this padded row count (utils/costs.eval_hbm_gib,
    measured anchor) against one chip's HBM, so an over-budget scene fails
    with the remedies in one line instead of a device OOM mid-UNet.
    Budget override for tests / other chips: AGILE3D_HBM_GIB."""
    import os

    from agile3d_tpu.utils.costs import SINGLE_CHIP_HBM_GIB, eval_hbm_gib

    budget = float(os.environ.get("AGILE3D_HBM_GIB", SINGLE_CHIP_HBM_GIB))
    est = eval_hbm_gib(n_rows)
    if est > budget:
        raise SceneTooLargeError(
            f"scene pads to {n_rows} voxel rows (~{est:.1f} GiB estimated "
            f"eval footprint > {budget:.2f} GiB single-chip HBM): rerun "
            f"with --sp N --sp_backbone to shard the voxel axis over N "
            f"chips, crop the scan (reference demo.md guidance), or raise "
            f"the voxel size")


class InteractiveEngine:
    """Holds jitted model entry points (weights are donated per call so the
    same engine serves training checkpoints as they evolve).

    The decoder is the pure-XLA path (chunked attention + query bucketing).
    A fused Pallas decoder was built and benched in round 1 and DELETED in
    round 2: at head_dim=16 every per-head matmul pads its 16-lane
    contraction to the MXU's 128, so both implementations are bounded by
    the same 8x-padded matmul work (measured 15.04 ms XLA vs 15.28 ms
    Pallas on the 185k-voxel bench scene) — the fusion cannot buy >=20%
    and the kernels carried Mosaic-fragility cost. See PERF.md.
    """

    def __init__(self, cfg: Config, decoder_impl: str = "xla", sp: int = 1,
                 sp_backbone: bool = False):
        if decoder_impl not in ("xla", "auto"):
            raise ValueError(
                f"decoder_impl={decoder_impl!r} is gone: the Pallas decoder "
                "was deleted in round 2 (see PERF.md); only 'xla' remains")
        self.cfg = cfg
        self.decoder_impl = "xla"
        # sp > 1: voxel-axis sequence parallelism for the decoder
        # (parallel/sp.py, SURVEY section 5.7) — scenes whose padded voxel
        # count exceeds one chip's HBM shard the attention/mask-head over
        # the mesh's 'sp' axis. Used by the host-rollout eval path
        # (run_mask). sp_backbone=True additionally shards the BACKBONE's
        # voxel axis (parallel/sp_backbone.py — SURVEY section 7 stage 8),
        # removing the single-chip HBM ceiling on the UNet itself.
        self.sp = sp
        self.sp_backbone = sp_backbone
        if sp_backbone and sp <= 1:
            raise ValueError("sp_backbone requires sp > 1")
        if sp > 1:
            from agile3d_tpu.parallel import make_mesh
            from agile3d_tpu.parallel.sp import make_forward_mask_sp

            self._sp_mesh = make_mesh(n_dp=1, n_sp=sp)
            self._fm_sp, self._shard_scene = make_forward_mask_sp(
                self._sp_mesh, cfg.model)
            self._sp_scene_key = None
            self._sp_scene = None
            if sp_backbone:
                from agile3d_tpu.parallel.sp_backbone import (
                    make_forward_backbone_sp)

                self._bb_sp = make_forward_backbone_sp(self._sp_mesh,
                                                       cfg.model)
                self._sp_pyr_key = None
                self._sp_pyr = None

        @functools.partial(jax.jit, static_argnames=("training",))
        def _backbone(params, buffers, bn_state, pyr, feats, raw, sample_idx,
                      training=False):
            return forward_backbone(params, buffers, bn_state, pyr, feats,
                                    raw, sample_idx, training=training,
                                    cfg=cfg.model)

        @jax.jit
        def _mask(params, buffers, scene, clicks, num_obj):
            out = forward_mask(params, buffers, scene, clicks, num_obj,
                               cfg=cfg.model)
            pred = jnp.argmax(out["pred_masks"], axis=-1).astype(jnp.int32)
            return out, pred

        @jax.jit
        def _val_losses(all_masks, scene, labels, clicks):
            """Per-round validation losses (reference engine.py:236-246)."""
            from agile3d_tpu.models.criterion import (
                click_loss_weights, criterion_forward)

            target = jnp.maximum(labels, 0)
            vox_valid = scene.vox_valid & (labels >= 0)
            weights = click_loss_weights(scene.raw, vox_valid, clicks.vox,
                                         clicks.vox >= 0, cfg.loss)
            return criterion_forward(all_masks, target, weights, vox_valid,
                                     cfg.loss)

        @functools.partial(jax.jit, static_argnames=("max_obj",))
        def _scene_iou(pred_full, labels_full, valid, max_obj):
            ious, present = iou_per_object(pred_full, labels_full, valid,
                                           max_obj=max_obj)
            return jnp.sum(jnp.where(present, ious, 0.0)) / jnp.maximum(
                present.sum(), 1)

        self._backbone = _backbone
        self._mask = _mask
        self._scene_iou = _scene_iou
        self._val_losses = _val_losses
        self._dev_cache_key = None
        self._dev_cache = None

    def device_batch(self, batch: SceneBatch, *, will_train: bool = False):
        """Device-resident (pyramid, feats, raw, sample_idx) for a batch,
        cached so the ~100 MB of kernel maps upload once per batch, not once
        per model call.

        When the banded Mosaic stem will serve this batch (the routing
        decision is mirrored from models/backbone.stem_banded_active), the
        padded k5 map is dropped from the transfer — exception strips carry
        their own cell rows (stem_banded_prep), so the only consumer of k5
        on device is the strips/scan fallback the banded path replaces.
        At the 1M-voxel bucket that is ~500 MB of HBM + upload saved.

        ``will_train``: the SAME device pyramid feeds both the eval-mode
        rollout forward and the training-mode supervised forward inside a
        train step, and the banded stem is eval-only — a training consumer
        still needs k5 whenever the training route would fall back to
        strips/scan (caught by bench_train at ScanNet-scale batches: the
        eval-keyed drop crashed the supervised forward with k5=None)."""
        if self._dev_cache_key is not batch:
            from agile3d_tpu.models.backbone import stem_banded_active

            pyr = batch.pyramid
            if (stem_banded_active(self.cfg.model.backbone, pyr.levels[0],
                                   training=False)
                    and not will_train):
                pyr = pyr._replace(levels=(
                    pyr.levels[0]._replace(k5=None),) + pyr.levels[1:])
            self._dev_cache = jax.device_put(
                (pyr, jnp.asarray(batch.feats),
                 jnp.asarray(batch.raw), jnp.asarray(batch.sample_idx)))
            self._dev_cache_key = batch
        return self._dev_cache

    def run_backbone(self, params, buffers, bn_state, batch: SceneBatch,
                     training=False):
        if self.sp_backbone and not training:
            return self._run_backbone_sp(params, buffers, bn_state, batch)
        check_single_chip_rows(batch.pyramid.levels[0].grid.shape[0])
        pyr, feats, raw, sample_idx = self.device_batch(
            batch, will_train=training)
        return self._backbone(params, buffers, bn_state, pyr, feats, raw,
                              sample_idx, training=training)

    def _run_backbone_sp(self, params, buffers, bn_state, batch: SceneBatch):
        """Voxel-sharded backbone (parallel/sp_backbone.py): partition the
        padded pyramid over the sp mesh (cached per batch — the same role
        as device_batch's transfer cache) and run the halo-exchange UNet.
        Output SceneFeatures are already sharded for run_mask's SP decoder."""
        from agile3d_tpu.parallel.sp_backbone import partition_pyramid

        if batch.sample_idx.shape[0] != 1:
            raise ValueError("sp_backbone is single-scene (B=1) — the "
                             "over-HBM eval case it exists for")
        nv = batch.pyramid.levels[0].num_valid
        si = batch.sample_idx[0]
        if not (np.array_equal(si[:nv], np.arange(nv, dtype=si.dtype))
                and (si[nv:] == -1).all()):
            raise ValueError("sp_backbone requires identity sample_idx "
                             "(single-scene collation)")
        if self._sp_pyr_key is not batch:
            # host-side partition cached per batch; the jitted forward
            # transfers each leaf straight to its shard placement
            self._sp_pyr = partition_pyramid(batch.pyramid, self.sp)
            self._sp_pyr_key = batch
        scene, new_bn = self._bb_sp(params, buffers, bn_state, self._sp_pyr,
                                    jnp.asarray(batch.feats),
                                    jnp.asarray(batch.raw))
        # already sharded exactly as _shard_scene would place it
        self._sp_scene = scene
        self._sp_scene_key = scene
        return scene, new_bn

    CLICK_BUCKETS = (32, 64, 128, 256)

    def _click_bucket(self, count: int) -> int:
        for b in self.CLICK_BUCKETS:
            if count <= b <= self.cfg.model.max_clicks:
                return b
        return self.cfg.model.max_clicks

    def run_mask(self, params, buffers, scene, clicks: HostClicks, num_obj):
        # Query-axis bucketing: the attention/mask-head cost scales with the
        # padded click table, so slice it to the smallest bucket holding the
        # live clicks (one extra jit cache entry per bucket).
        mc = self._click_bucket(clicks.count)
        cs = ClickState(vox=jnp.asarray(clicks.vox[None, :mc]),
                        obj=jnp.asarray(clicks.obj[None, :mc]),
                        time=jnp.asarray(clicks.time[None, :mc]))
        num_obj_dev = jnp.asarray([num_obj], jnp.int32)
        if self.sp > 1:
            if self._sp_scene_key is not scene:
                self._sp_scene = self._shard_scene(scene)
                self._sp_scene_key = scene
            out = self._fm_sp(params, buffers, self._sp_scene, cs,
                              num_obj_dev)
            pred = jnp.argmax(out["pred_masks"], axis=-1).astype(jnp.int32)
            return out, pred
        return self._mask(params, buffers, scene, cs, num_obj_dev)

    def scene_iou(self, pred_vox: np.ndarray, inverse_map: np.ndarray,
                  labels_full: np.ndarray) -> float:
        """Devoxelized mean IoU (reference eval loop: pred[inverse_map] vs
        labels_full through mean_iou_scene, eval_multi_obj.py:145-148)."""
        pred_full = pred_vox[inverse_map]
        n = len(pred_full)
        npad = bucket_size(n)
        valid = np.zeros(npad, bool)
        valid[:n] = True
        pf = np.zeros(npad, np.int32)
        pf[:n] = pred_full
        lf = np.zeros(npad, np.int32)
        lf[:n] = labels_full
        return float(self._scene_iou(jnp.asarray(pf), jnp.asarray(lf),
                                     jnp.asarray(valid),
                                     self.cfg.model.max_fg_objects))


def evaluate_scene(
    engine: InteractiveEngine,
    params, buffers, bn_state,
    batch: SceneBatch,
    *,
    mode: str,                 # 'multi' | 'single'
    instance_id: int,
    rng: random.Random,
    max_num_clicks: int = 20,
    skip_converged: bool = True,
    loss_meter=None,
) -> list[str]:
    """Run the full click rollout for one scene (batch size 1). Returns CSV
    rows ``id scene obj clicks iou``. When ``loss_meter`` (a MetricLogger)
    is given, per-round validation losses are accumulated into it
    (reference engine.py:236-246)."""
    assert len(batch.scene_names) == 1, "eval runs val_batch_size=1"
    cfg = engine.cfg
    scene, _ = engine.run_backbone(params, buffers, bn_state, batch)

    n_valid = int((batch.sample_idx[0] >= 0).sum())
    labels_v = batch.labels[0, :n_valid]
    raw_v = batch.raw[:n_valid]
    num_obj = int(batch.num_obj[0])
    tag = batch.obj_tags[0]
    scene_name = batch.scene_names[0].replace("scene", "")

    clicks = HostClicks(cfg.model.max_clicks)
    budget = num_obj * max_num_clicks if mode == "multi" else max_num_clicks
    current = 0
    rows = []
    converged_iou = None

    while current <= budget:
        if current == 0:
            pred = np.zeros(n_valid, np.int32)
        elif converged_iou is None:
            out, pred_dev = engine.run_mask(params, buffers, scene, clicks,
                                            num_obj)
            pred = np.asarray(pred_dev[0])[:n_valid].copy()
            pred = apply_click_override(pred, clicks)
            if loss_meter is not None:
                mc = engine._click_bucket(clicks.count)
                cs = ClickState(vox=jnp.asarray(clicks.vox[None, :mc]),
                                obj=jnp.asarray(clicks.obj[None, :mc]),
                                time=jnp.asarray(clicks.time[None, :mc]))
                labels_pad = np.full(scene.mask_feat.shape[1], -1, np.int32)
                labels_pad[:n_valid] = labels_v
                losses = engine._val_losses(
                    out["all_masks"], scene, jnp.asarray(labels_pad[None]),
                    cs)
                from agile3d_tpu.models.criterion import (
                    loss_weight_dict, model_num_aux_rounds, total_loss)

                wd = loss_weight_dict(
                    cfg.loss,
                    num_aux_rounds=model_num_aux_rounds(cfg.model))
                loss_meter.update(
                    loss=float(total_loss(losses, wd)),
                    **{k: float(v) for k, v in losses.items()
                       if k in ("loss_bce", "loss_dice")})

        if converged_iou is None:
            iou = engine.scene_iou(pred, batch.inverse_map[0],
                                   batch.labels_full[0])
        else:
            iou = converged_iou

        clicks_col = (current / num_obj) if mode == "multi" else current
        rows.append(f"{instance_id} {scene_name} {tag} {clicks_col} {iou}")

        if converged_iou is None:
            new = simulate_clicks(
                pred, labels_v, raw_v, num_obj=num_obj, training=False,
                current_num_clicks=current, rng=rng,
                max_label=cfg.model.max_fg_objects)
            if new is not None:
                clicks.extend(new)
            elif skip_converged:
                # No errors left: every further round reproduces the same
                # prediction (click state is frozen), so freeze the IoU too.
                converged_iou = iou

        if mode == "multi":
            current += num_obj if current == 0 else 1
        else:
            current += 1

    return rows


def evaluate_dataset(
    engine: InteractiveEngine,
    params, buffers, bn_state,
    dataset,
    results_file: str,
    *,
    mode: str,
    max_num_clicks: int = 20,
    seed: int = 42,
    log=print,
    progress_every: int = 10,
    loss_meter=None,
    device_rollout: bool = False,
):
    """Reference Evaluate() driver: sequential scenes, one CSV, then the
    offline evaluator is run by the caller. device_rollout=True runs the
    click rounds as one on-device lax.scan per scene
    (engine/device_eval.py) instead of the host loop.

    Scene loading + quantization + pyramid building prefetches on a
    background thread (data/prefetch.py) so scene i+1's host work overlaps
    scene i's rollout; val datasets draw no RNG during loading, so results
    are unchanged."""
    from agile3d_tpu.data.prefetch import BatchPrefetcher

    rng = random.Random(seed)
    fetcher = BatchPrefetcher(
        lambda i: (i, collate_scenes([dataset[i]], engine.cfg.buckets)),
        range(len(dataset)), depth=2)
    with open(results_file, "w") as f:
        for i, batch in fetcher:
            if device_rollout:
                from agile3d_tpu.engine.device_eval import (
                    evaluate_scene_device)

                rows = evaluate_scene_device(
                    engine, params, buffers, bn_state, batch, mode=mode,
                    instance_id=i, rng=rng, max_num_clicks=max_num_clicks)
            else:
                rows = evaluate_scene(
                    engine, params, buffers, bn_state, batch, mode=mode,
                    instance_id=i, rng=rng, max_num_clicks=max_num_clicks,
                    loss_meter=loss_meter)
            f.write("\n".join(rows) + "\n")
            if progress_every and i % progress_every == 0:
                last = rows[-1].split(" ")
                log(f"[{i + 1}/{len(dataset)}] {batch.scene_names[0]} "
                    f"final IoU {float(last[4]):.4f}")
    return results_file


def evaluate_dataset_parallel(
    cfg: Config,
    params, buffers, bn_state,
    dataset,
    results_file: str,
    *,
    mode: str,
    devices=None,
    max_num_clicks: int = 20,
    seed: int = 42,
    log=print,
):
    """Scene-parallel evaluation: scenes are embarrassingly parallel across
    chips (SURVEY.md section 2 parallelism item b), so each device runs its
    own rollout worker thread. Per-scene RNG seeding (seed + scene index)
    keeps results independent of the device count; CSV rows are written in
    dataset order. Weights are placed on each device ONCE up front (not
    re-transferred per model call), and result collection is lock-guarded."""
    import concurrent.futures
    import threading

    devices = devices if devices is not None else jax.devices()
    results: dict[int, list[str]] = {}
    results_lock = threading.Lock()

    def worker(dev, indices):
        with jax.default_device(dev):
            engine = InteractiveEngine(cfg)
            p, b, s = jax.device_put((params, buffers, bn_state), dev)
            for i in indices:
                batch = collate_scenes([dataset[i]], cfg.buckets)
                rows = evaluate_scene(
                    engine, p, b, s, batch, mode=mode,
                    instance_id=i, rng=random.Random(seed + i),
                    max_num_clicks=max_num_clicks)
                with results_lock:
                    results[i] = rows
                log(f"[dev {dev.id}] scene {i + 1}/{len(dataset)} done")

    shards = [list(range(d, len(dataset), len(devices)))
              for d in range(len(devices))]
    with concurrent.futures.ThreadPoolExecutor(len(devices)) as ex:
        futures = [ex.submit(worker, dev, idxs)
                   for dev, idxs in zip(devices, shards)]
        for fu in futures:
            fu.result()

    with open(results_file, "w") as f:
        for i in range(len(dataset)):
            f.write("\n".join(results[i]) + "\n")
    return results_file
