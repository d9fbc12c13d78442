"""Miniature full-regime training run (VERDICT r3 item 8).

Reproduces the SHAPE of the reference's training recipe
(reference main.py:184-207: 1100 epochs, AdamW lr 1e-4, MultiStepLR drop
x0.1 at epoch 1000, batch 5, 20-click budget) scaled down 10x in epochs
(110 epochs, lr drop at 100) on a 200-scene synthetic benchmark with a
20-scene held-out val set, driving the REAL training CLI end-to-end
(main.py --device_rollout) with periodic interactive validation.

The point is evidence that the *recipe* works — LR schedule, click
sampling, periodic NoC/IoU@k validation, checkpointing — not just that a
single step descends (tests/test_dp_train.py) or that a short loop learns
(tools/train_evidence.py). DP-vs-single-chip trajectory equivalence is
pinned separately (tests/test_dp_train.py::
test_dp_trajectory_matches_single_chip_20_steps), so this run uses the
one real TPU chip.

Usage: python tools/train_regime.py [workdir] [--epochs 110] [--scenes 200]
Writes workdir/summary.json: per-val-epoch NoC/IoU@k curves + wall time.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agile3d_tpu.data.synthetic import write_benchmark


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/train_regime")
    ap.add_argument("--epochs", type=int, default=110)
    ap.add_argument("--lr_drop_frac", type=float, default=1000 / 1100,
                    help="reference drops lr at epoch 1000/1100")
    ap.add_argument("--scenes", type=int, default=200)
    ap.add_argument("--val_scenes", type=int, default=20)
    ap.add_argument("--n_points", type=int, default=30000)
    ap.add_argument("--num_obj", type=int, default=6)
    ap.add_argument("--val_epochs", type=int, default=10)
    ap.add_argument("--resume", default="",
                    help="resume a crashed run from this orbax checkpoint")
    ap.add_argument("--max_seconds", type=float, default=0,
                    help="wall-clock bound: TERM (then KILL) main.py at "
                    "this budget and post-process whatever epochs "
                    "completed. Keeps the one-TPU-client-at-a-time rule "
                    "(RUNBOOK.md): a bounded run can never collide with a "
                    "later bench/eval client.")
    args = ap.parse_args()

    work = args.workdir
    os.makedirs(work, exist_ok=True)
    scans_t, list_t = write_benchmark(os.path.join(work, "train"),
                                      num_scenes=args.scenes,
                                      num_obj=args.num_obj, seed=11,
                                      n_points=args.n_points)
    scans_v, list_v = write_benchmark(os.path.join(work, "val"),
                                      num_scenes=args.val_scenes,
                                      num_obj=args.num_obj, seed=999,
                                      n_points=args.n_points)
    for f in os.listdir(scans_v):  # val scans live in the same scan folder
        dst = os.path.join(scans_t, f)
        if not os.path.exists(dst):
            # abspath: a relative target would resolve relative to the
            # symlink's own directory (train/scans/), producing dangling
            # links whenever workdir is given as a relative path
            os.symlink(os.path.abspath(os.path.join(scans_v, f)), dst)

    out_dir = os.path.join(work, "out")
    lr_drop = max(1, int(round(args.epochs * args.lr_drop_frac)))
    cmd = [
        sys.executable, "main.py",
        "--scan_folder", scans_t,
        "--train_list", list_t,
        "--val_list", list_v,
        "--output_dir", out_dir,
        "--epochs", str(args.epochs),
        "--lr_drop", str(lr_drop),
        "--val_epochs", str(args.val_epochs),
        # the reference regime's own hyperparameters (main.py:56-67 defaults
        # == reference main.py:184-207): lr 1e-4, batch 5, 20-click budget
        "--batch_size", "5",
        "--lr", "1e-4",
        "--max_num_clicks", "20",
        "--device_rollout",
        "--job_name", "regime",
    ] + (["--resume", args.resume] if args.resume else [])
    print("lr_drop at epoch", lr_drop, "| running:", " ".join(cmd),
          flush=True)
    t0 = time.time()
    log_path = os.path.join(work, "train_log.txt")
    with open(log_path, "a") as log:
        # unbuffered child stdout: per-epoch lines land in train_log.txt as
        # they happen, so a bounded/killed run still shows its progress
        env = dict(os.environ, PYTHONUNBUFFERED="1")
        proc = subprocess.Popen(cmd, env=env, stdout=log,
                                stderr=subprocess.STDOUT)
        try:
            rc = proc.wait(timeout=args.max_seconds or None)
        except subprocess.TimeoutExpired:
            print(f"wall-clock budget ({args.max_seconds:.0f}s) reached; "
                  "terminating main.py (per-epoch checkpoints make this "
                  "resumable)", flush=True)
            proc.terminate()
            try:
                rc = proc.wait(timeout=60)
            except subprocess.TimeoutExpired:
                proc.kill()
                rc = proc.wait()
    wall = time.time() - t0
    print(f"main.py exit: {rc} after {wall:.0f}s", flush=True)

    # post-process: recompute NoC/IoU@k for every val CSV main.py wrote
    from agile3d_tpu.evaluation import EvaluatorMO

    curves = {}
    # main.py appends a timestamped run_id to --output_dir (main.py:229-230,
    # mirroring the reference); collect CSVs from every run dir under out/.
    for run_dir in sorted(os.listdir(out_dir)) if os.path.isdir(out_dir) else []:
        val_dir = os.path.join(out_dir, run_dir, "valResults")
        if not os.path.isdir(val_dir):
            continue
        for f in sorted(os.listdir(val_dir)):
            m = re.match(r"val_results_epoch_(\d+)\.csv$", f)
            if not m:
                continue
            res = EvaluatorMO(list_v, os.path.join(val_dir, f),
                              [0.5, 0.65, 0.8, 0.85, 0.9]).eval_results()
            curves[int(m.group(1))] = {k: float(v) for k, v in res.items()}
    summary = {"exit": rc, "wall_s": wall, "epochs": args.epochs,
               "lr_drop": lr_drop, "scenes": args.scenes,
               "val_scenes": args.val_scenes, "n_points": args.n_points,
               "val_curves": curves}
    with open(os.path.join(work, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps(summary, sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
