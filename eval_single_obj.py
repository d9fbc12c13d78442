"""Interactive single-object 3D segmentation benchmark eval CLI
(InterObject3D protocol).

TPU-native counterpart of the reference eval_single_obj.py (reference
eval_single_obj.py:28-206): binary masks, +1 click per round up to
max_num_clicks, CSV rows with absolute click counts, EvaluatorSO metrics
(per-class aggregation over the object-class list).
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
from agile3d_tpu.evaluation import EvaluatorSO
from agile3d_tpu.utils.ckpt import load_model_weights


def get_args_parser():
    p = argparse.ArgumentParser("Evaluation", add_help=False)
    p.add_argument("--dataset_mode", default="single_obj")
    p.add_argument("--dataset", default="scannet40",
                   choices=["scannet40", "s3dis", "kitti360"])
    p.add_argument("--scan_folder", required=True, type=str)
    p.add_argument("--val_list", required=True, type=str,
                   help="npy file of (scene, object_id) rows")
    p.add_argument("--val_list_classes", default="", type=str,
                   help="txt file of per-object class names")
    p.add_argument("--crop", action="store_true",
                   help="use pre-cropped per-object scans")
    # the reference's shared model flag block (agile3d_tpu/cli.py), plus
    # the loader flags its eval CLI also accepts
    # (reference eval_single_obj.py:33-65)
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
    p.add_argument("--decoder_dtype", default="float32",
                   choices=("float32", "bfloat16"),
                   help="bfloat16 halves decoder HBM traffic (PERF.md "
                        "round 4); float32 preserves exact parity")
    p.add_argument("--host_rollout", action="store_true",
                   help="per-round host loop instead of the on-device scan "
                        "(see eval_multi_obj.py / PERF.md)")
    return p


def main(args):
    if args.val_batch_size != 1:
        raise SystemExit("--val_batch_size must be 1: eval rolls out one "
                         "scene at a time (the reference's only shipped "
                         "configuration)")
    apply_device_arg(args)

    from agile3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    np.random.seed(args.seed)
    random.seed(args.seed)

    cfg = Config(model=model_config_from_args(
                     args, max_clicks=64,
                     decoder_dtype=args.decoder_dtype),
                 train=TrainConfig(seed=args.seed,
                                   max_num_clicks=args.max_num_clicks))
    params, buffers, bn_state = load_model_weights(args.checkpoint, cfg.model)

    dataset = build_dataset("val", "single_obj", scan_folder=args.scan_folder,
                            scene_list=args.val_list,
                            voxel_size=args.voxel_size, crop=args.crop)

    Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    results_file = os.path.join(args.output_dir, "val_results_single.csv")

    engine = InteractiveEngine(cfg)
    evaluate_dataset(engine, params, buffers, bn_state, dataset, results_file,
                     mode="single", max_num_clicks=args.max_num_clicks,
                     seed=args.seed, device_rollout=not args.host_rollout)

    objects = np.load(args.val_list)
    classes = (np.loadtxt(args.val_list_classes, dtype=str)
               if args.val_list_classes
               else np.array(["unknown"] * len(objects)))
    evaluator = EvaluatorSO(args.dataset, objects, classes, results_file,
                            [0.5, 0.65, 0.8, 0.85, 0.9])
    results = evaluator.eval_results()
    print(results)
    return results


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        "Evaluation script for interactive single-object segmentation",
        parents=[get_args_parser()])
    try:
        main(parser.parse_args())
    except SceneTooLargeError as e:
        sys.exit(f"error: {e}")
