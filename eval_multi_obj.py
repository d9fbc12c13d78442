"""Interactive multi-object 3D segmentation benchmark eval CLI.

TPU-native counterpart of the reference eval_multi_obj.py (reference
eval_multi_obj.py:28-213): loads a checkpoint (reference .pth or orbax),
runs the 20-clicks-per-object rollout over the validation list, writes the
per-round IoU CSV, and reports NoC@tau / IoU@k through EvaluatorMO.
"""

import argparse
import os
import random
import sys
from pathlib import Path

import numpy as np

from agile3d_tpu.cli import (
    add_reference_model_flags, apply_device_arg, model_config_from_args)
from agile3d_tpu.config import Config, TrainConfig
from agile3d_tpu.data.datasets import build_dataset
from agile3d_tpu.engine.eval import (
    InteractiveEngine, SceneTooLargeError, evaluate_dataset)
from agile3d_tpu.evaluation import EvaluatorMO
from agile3d_tpu.utils.ckpt import load_model_weights


def get_args_parser():
    p = argparse.ArgumentParser("Evaluation", add_help=False)
    p.add_argument("--dataset_mode", default="multi_obj")
    p.add_argument("--scan_folder", required=True, type=str)
    p.add_argument("--val_list", required=True, type=str)
    # the reference's shared model flag block (agile3d_tpu/cli.py), plus
    # the loader flags its eval CLI also accepts
    # (reference eval_multi_obj.py:33-62)
    add_reference_model_flags(p)
    p.add_argument("--train_list", default="", type=str,
                   help="accepted for reference-script compatibility; "
                        "unused by eval (as in the reference)")
    p.add_argument("--num_workers", default=2, type=int,
                   help="accepted for reference-script compatibility; the "
                        "eval pipeline loads scenes synchronously")
    p.add_argument("--val_batch_size", default=1, type=int,
                   help="must be 1 (per-scene rollout — the reference's "
                        "only shipped configuration)")
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--output_dir", default="results", type=str)
    p.add_argument("--checkpoint", default="checkpoints/checkpoint1099.pth")
    p.add_argument("--max_num_clicks", default=20, type=int)
    p.add_argument("--max_clicks_budget", default=256, type=int,
                   help="static click-table capacity (padded)")
    # Device rollout is the DEFAULT: the whole click loop runs as one
    # lax.scan per scene — 6.6x faster end to end with metric deltas
    # bounded at 0.000 NoC / <=0.005 IoU@k vs the host loop (PERF.md,
    # tools/compare_rollout_paths.py). --host_rollout restores the
    # reference-style per-round host loop (bit-faithful replay).
    p.add_argument("--host_rollout", action="store_true",
                   help="per-round host loop instead of the on-device scan")
    p.add_argument("--device_rollout", action="store_true",
                   help=argparse.SUPPRESS)  # legacy alias of the default
    # TPU-native addition: voxel-axis sequence parallelism over sp chips
    # (parallel/sp.py, SURVEY section 5.7) for scenes beyond one chip's
    # HBM (KITTI-360 scale). Composes with the on-device rollout scan
    # (parallel/sp_rollout.py) — the default path either way.
    p.add_argument("--sp", default=1, type=int,
                   help="shard the decoder's voxel axis over this many "
                        "devices (1 = single chip)")
    p.add_argument("--sp_backbone", action="store_true",
                   help="with --sp > 1: also shard the BACKBONE's voxel "
                        "axis (halo-exchange UNet, parallel/sp_backbone.py) "
                        "— removes the single-chip HBM ceiling entirely")
    p.add_argument("--scene_parallel", default=0, type=int,
                   help="evaluate scenes in parallel across this many "
                        "devices (embarrassingly parallel; per-scene "
                        "seeding makes results independent of the device "
                        "count)")
    p.add_argument("--decoder_dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="bfloat16 halves decoder HBM traffic — 34.3 -> 27.4 "
                        "ms/click at 670k voxels (PERF.md round 4); float32 "
                        "preserves exact reference parity")
    return p


def main(args):
    if args.val_batch_size != 1:
        raise SystemExit("--val_batch_size must be 1: eval rolls out one "
                         "scene at a time (the reference's only shipped "
                         "configuration, eval_multi_obj.py:94)")
    apply_device_arg(args)

    from agile3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    np.random.seed(args.seed)
    random.seed(args.seed)

    cfg = Config(model=model_config_from_args(
                     args, max_clicks=args.max_clicks_budget,
                     decoder_dtype=args.decoder_dtype),
                 train=TrainConfig(seed=args.seed,
                                   max_num_clicks=args.max_num_clicks))
    params, buffers, bn_state = load_model_weights(args.checkpoint, cfg.model)

    dataset = build_dataset("val", "multi_obj", scan_folder=args.scan_folder,
                            scene_list=args.val_list,
                            voxel_size=args.voxel_size)

    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    results_file = os.path.join(args.output_dir, "val_results_multi.csv")

    if args.scene_parallel > 1:
        import jax

        from agile3d_tpu.engine.eval import evaluate_dataset_parallel

        evaluate_dataset_parallel(
            cfg, params, buffers, bn_state, dataset, results_file,
            mode="multi", devices=jax.devices()[: args.scene_parallel],
            max_num_clicks=args.max_num_clicks, seed=args.seed)
    else:
        engine = InteractiveEngine(cfg, sp=args.sp,
                                   sp_backbone=args.sp_backbone)
        evaluate_dataset(engine, params, buffers, bn_state, dataset,
                         results_file, mode="multi",
                         max_num_clicks=args.max_num_clicks, seed=args.seed,
                         device_rollout=not args.host_rollout)

    evaluator = EvaluatorMO(args.val_list, results_file,
                            [0.5, 0.65, 0.8, 0.85, 0.9])
    results = evaluator.eval_results()
    print(results)
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        "Evaluation script for interactive multi-object segmentation",
        parents=[get_args_parser()])
    try:
        main(parser.parse_args())
    except SceneTooLargeError as e:
        sys.exit(f"error: {e}")
