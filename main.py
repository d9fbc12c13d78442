"""Multi-object iterative-click training CLI.

TPU-native counterpart of the reference main.py (reference main.py:24-258):
builds the model/criterion/datasets/AdamW+MultiStepLR, runs the epoch loop
with per-epoch checkpointing (orbax; archival copies every 20 epochs and
before LR drops), periodic interactive validation with NoC/IoU metrics, and
optional wandb logging (no-op when wandb is unavailable).
"""

import argparse
import datetime
import os
import random
import time
from pathlib import Path

import jax
import numpy as np

from agile3d_tpu.cli import (
    add_reference_model_flags, apply_device_arg, model_config_from_args)
from agile3d_tpu.config import Config, LossConfig, TrainConfig
from agile3d_tpu.data.datasets import build_dataset
from agile3d_tpu.engine.eval import InteractiveEngine, evaluate_dataset
from agile3d_tpu.engine.train import (
    make_optimizer, make_train_step, train_one_epoch)
from agile3d_tpu.evaluation import EvaluatorMO
from agile3d_tpu.models.agile3d import init_agile3d
from agile3d_tpu.utils.ckpt import (
    load_checkpoint, load_model_weights, save_checkpoint)


def get_args_parser():
    p = argparse.ArgumentParser("AGILE3D", add_help=False)
    # dataset
    p.add_argument("--dataset_mode", default="multi_obj")
    p.add_argument("--scan_folder", default="data/ScanNet/scans", type=str)
    p.add_argument("--train_list", default="data/ScanNet/train_list.json")
    p.add_argument("--val_list", default="data/ScanNet/val_list.json")
    # model (the reference's shared flag block, registered once —
    # agile3d_tpu/cli.py)
    add_reference_model_flags(p)
    # loss
    p.add_argument("--losses", default=["bce", "dice"], nargs="+",
                   choices=["bce", "dice"])
    p.add_argument("--bce_loss_coef", default=1.0, type=float)
    p.add_argument("--dice_loss_coef", default=2.0, type=float)
    # training
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--weight_decay", default=1e-4, type=float)
    p.add_argument("--lr_drop", default=[1000], type=int, nargs="+")
    p.add_argument("--epochs", default=1100, type=int)
    p.add_argument("--val_epochs", default=50, type=int)
    p.add_argument("--batch_size", default=5, type=int)
    p.add_argument("--clip_max_norm", default=0.1, type=float)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--output_dir", default="output")
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--resume", default="", help="resume from checkpoint")
    p.add_argument("--max_num_clicks", default=20, type=int)
    p.add_argument("--job_name", default="test", type=str)
    p.add_argument("--num_workers", default=2, type=int,
                   help="host input-pipeline prefetch depth (the "
                        "reference's DataLoader workers, main.py:118-123)")
    p.add_argument("--val_batch_size", default=1, type=int)
    # TPU-native additions (no reference counterpart): data-parallel mesh
    # width and the on-device click-rollout scan
    p.add_argument("--num_dp", default=1, type=int,
                   help="data-parallel mesh width (scenes/step = "
                        "batch_size * num_dp); supersedes the reference's "
                        "vestigial NCCL path (utils/misc.py:337-375)")
    p.add_argument("--device_rollout", action="store_true",
                   help="run the training click rollout as one on-device "
                        "lax.scan instead of the per-round host loop")
    p.add_argument("--ckpt_epochs", default=1, type=int,
                   help="rolling-checkpoint cadence. 1 = the reference's "
                        "per-epoch save (main.py:190-195). Raising it "
                        "trades restart granularity for wall time where "
                        "device->host readback is expensive (a remote-"
                        "tunnel chip pays ~60 s per 157 MB save — "
                        "RUNBOOK.md); archival epoch-20/LR-drop copies "
                        "are unaffected")
    return p


def build_config(args) -> Config:
    return Config(
        model=model_config_from_args(args),
        loss=LossConfig(losses=tuple(args.losses),
                        bce_loss_coef=args.bce_loss_coef,
                        dice_loss_coef=args.dice_loss_coef, aux=args.aux),
        train=TrainConfig(
            lr=args.lr, weight_decay=args.weight_decay,
            lr_drop=tuple(args.lr_drop), epochs=args.epochs,
            val_epochs=args.val_epochs, batch_size=args.batch_size,
            val_batch_size=args.val_batch_size,
            clip_max_norm=args.clip_max_norm, seed=args.seed,
            max_num_clicks=args.max_num_clicks,
            num_workers=args.num_workers, prefetch=args.num_workers))


def _wandb():
    try:
        import wandb
    except ImportError:
        wandb = None
    if wandb is not None:
        from agile3d_tpu.utils.misc import setup_wandb

        if setup_wandb():  # reference utils/misc.py:388-403 key bootstrap
            return wandb

    class _Noop:
        def init(self, *a, **k): pass
        def log(self, *a, **k): pass
    return _Noop()


def main(args):
    if args.ckpt_epochs < 1:
        raise SystemExit(f"--ckpt_epochs must be >= 1, got "
                         f"{args.ckpt_epochs}")
    apply_device_arg(args)

    from agile3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    wandb = _wandb()
    wandb.init(project="AGILE3D")

    cfg = build_config(args)
    seed = args.seed + jax.process_index()
    np.random.seed(seed)
    random.seed(seed)
    np_rng = np.random.default_rng(seed)
    py_rng = random.Random(seed)

    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(seed),
                                             cfg.model)
    n_params = sum(int(np.prod(np.shape(x)))
                   for x in jax.tree_util.tree_leaves(params))
    print("number of params:", n_params)

    dataset_train = build_dataset("train", args.dataset_mode,
                                  scan_folder=args.scan_folder,
                                  scene_list=args.train_list,
                                  voxel_size=args.voxel_size, seed=seed)
    dataset_val = build_dataset("val", args.dataset_mode,
                                scan_folder=args.scan_folder,
                                scene_list=args.val_list,
                                voxel_size=args.voxel_size)

    steps_per_epoch = max(
        1, len(dataset_train) // (cfg.train.batch_size * args.num_dp))
    tx, _ = make_optimizer(cfg, steps_per_epoch)
    opt_state = tx.init(params)
    engine = InteractiveEngine(cfg)
    if args.num_dp > 1:
        from agile3d_tpu.parallel import make_mesh
        from agile3d_tpu.parallel.train import make_dp_train_step

        mesh = make_mesh(n_dp=args.num_dp, n_sp=1)
        dp_step, dp_shard_fn, _ = make_dp_train_step(cfg, tx, mesh)
    else:
        train_step = make_train_step(cfg, tx)

    output_dir = Path(args.output_dir)
    val_dir = output_dir / "valResults"
    val_dir.mkdir(parents=True, exist_ok=True)

    if args.resume:
        if args.resume.endswith(".pth"):
            params, buffers, bn_state = load_model_weights(
                args.resume, cfg.model)
        else:
            restored = load_checkpoint(args.resume, {
                "params": params, "buffers": buffers, "bn_state": bn_state,
                "opt_state": opt_state, "epoch": np.asarray(0)})
            params, buffers = restored["params"], restored["buffers"]
            bn_state, opt_state = restored["bn_state"], restored["opt_state"]
            args.start_epoch = int(restored["epoch"]) + 1

    print("Start training")
    start_time = time.time()
    for epoch in range(args.start_epoch, args.epochs):
        if args.num_dp > 1:
            from agile3d_tpu.parallel.train import dp_train_one_epoch

            params, bn_state, opt_state, stats = dp_train_one_epoch(
                cfg, mesh, params, buffers, bn_state, opt_state, dp_step,
                dp_shard_fn, dataset_train, epoch, np_rng=np_rng,
                py_rng=py_rng)
        else:
            params, bn_state, opt_state, stats = train_one_epoch(
                engine, params, buffers, bn_state, opt_state, train_step,
                dataset_train, cfg, epoch, np_rng=np_rng, py_rng=py_rng,
                device_rollout=args.device_rollout)
        epoch_log = {"train/epoch": epoch, "train/loss_epoch": stats["loss"]}
        if "mIoU" in stats:
            epoch_log["train/mIoU_epoch"] = stats["mIoU"]
        wandb.log(epoch_log)

        if jax.process_index() == 0:
            # rolling ckpt every --ckpt_epochs (reference: every epoch,
            # main.py:190-195) + archival copies every 20 epochs / before
            # LR drops, exactly as the reference
            paths = []
            # always refresh the rolling checkpoint at the final epoch so a
            # completed run never ends with stale resumable state when
            # --ckpt_epochs does not divide --epochs
            if ((epoch + 1) % args.ckpt_epochs == 0
                    or epoch + 1 == args.epochs):
                paths.append(output_dir / "checkpoint")
            if (epoch + 1) in args.lr_drop or (epoch + 1) % 20 == 0:
                paths.append(output_dir / f"checkpoint{epoch:04d}")
            for path in paths:
                save_checkpoint(str(path.absolute()), params, buffers,
                                bn_state, opt_state, epoch)

        if (epoch + 1) % args.val_epochs == 0:
            from agile3d_tpu.utils.misc import MetricLogger

            csv = str(val_dir / f"val_results_epoch_{epoch}.csv")
            val_meter = MetricLogger()
            evaluate_dataset(engine, params, buffers, bn_state, dataset_val,
                             csv, mode="multi",
                             max_num_clicks=args.max_num_clicks,
                             seed=args.seed, loss_meter=val_meter)
            res = EvaluatorMO(args.val_list, csv,
                              [0.5, 0.65, 0.8, 0.85, 0.9]).eval_results()
            print(res, str(val_meter))
            wandb.log({f"val_metrics/{k.replace('@', '_')}": v
                       for k, v in res.items()})
            wandb.log({f"val/{k}_epoch": m.global_avg
                       for k, m in val_meter.meters.items()})

    total = str(datetime.timedelta(seconds=int(time.time() - start_time)))
    print(f"Training time {total}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser("AGILE3D training script",
                                     parents=[get_args_parser()])
    args = parser.parse_args()
    run_id = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    args.output_dir = os.path.join(args.output_dir, run_id)
    main(args)
