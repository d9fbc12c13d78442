"""Quantify host-loop vs device-scan eval rollout divergence at metric level.

The two rollout implementations (engine/eval.evaluate_scene — reference
protocol, one dispatch per click round — and engine/device_eval — the whole
click loop as one lax.scan) agree row-for-row until floating-point chaos in
the iterated argmax system separates trajectories. This tool measures what
that divergence does to the *benchmark metrics* (NoC@{50..90}, IoU@k,
reference evaluator_MO.py:90-133) over a pool of synthetic scenes at
realistic voxel counts, plus per-scene first-divergence rounds and wall
clock. Random weights are the adversarial case: predictions are weak, so
error clusters abound and near-ties in cluster ranking are maximally
common.

Usage:  python tools/compare_rollout_paths.py --out /tmp/rollout_cmp
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import time


def run_group(engine, params, buffers, state, ds, csv, device, clicks, seed):
    from agile3d_tpu.engine.eval import evaluate_dataset

    t0 = time.perf_counter()
    evaluate_dataset(engine, params, buffers, state, ds, csv,
                     mode="multi", max_num_clicks=clicks, seed=seed,
                     device_rollout=device, log=lambda *a: None)
    return time.perf_counter() - t0


def first_divergence(host_csv, dev_csv, tol=1e-5):
    """Per (scene, obj) trajectory: first round index where IoU differs."""
    def parse(path):
        out = collections.defaultdict(list)
        for line in open(path):
            _id, scene, obj, clicks, iou = line.split()
            out[(scene, obj)].append(float(iou))
        return out

    h, d = parse(host_csv), parse(dev_csv)
    firsts = {}
    for key in h:
        hs, dvs = h[key], d.get(key, [])
        div = None
        for r, (a, b) in enumerate(zip(hs, dvs)):
            if abs(a - b) > tol:
                div = r
                break
        firsts[key] = (div, len(hs))
    return firsts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/rollout_cmp")
    ap.add_argument("--clicks", type=int, default=20)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--groups", default="12x4x50000,8x7x80000",
                    help="scenes x num_obj x n_points, comma-separated")
    ap.add_argument("--checkpoint", default=None,
                    help="optional orbax/pth weights; default random init")
    args = ap.parse_args()

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax

    from agile3d_tpu.config import Config, ModelConfig
    from agile3d_tpu.data.datasets import InterMultiObjDataset
    from agile3d_tpu.engine.eval import InteractiveEngine
    from agile3d_tpu.evaluation import EvaluatorMO
    from agile3d_tpu.models.agile3d import init_agile3d
    from agile3d_tpu.data.synthetic import write_benchmark

    os.makedirs(args.out, exist_ok=True)
    cfg = Config(model=ModelConfig(max_clicks=256))
    if args.checkpoint:
        from agile3d_tpu.utils.ckpt import load_model_weights

        params, buffers, state = load_model_weights(args.checkpoint,
                                                    cfg.model)
    else:
        params, buffers, state = init_agile3d(jax.random.PRNGKey(0),
                                              cfg.model)
    engine = InteractiveEngine(cfg)

    merged_list = {}
    datasets = []
    for gi, spec in enumerate(args.groups.split(",")):
        n_scenes, num_obj, n_points = map(int, spec.split("x"))
        gdir = os.path.join(args.out, f"group{gi}")
        scans, val_list = write_benchmark(
            gdir, num_scenes=n_scenes, num_obj=num_obj, seed=100 + gi,
            n_points=n_points)
        with open(val_list) as f:
            merged_list.update(json.load(f))
        datasets.append(InterMultiObjDataset(scans, val_list, 0.05))

    host_csv = os.path.join(args.out, "host.csv")
    dev_csv = os.path.join(args.out, "dev.csv")
    times = {"host": 0.0, "dev": 0.0}
    for name, device, csv in (("host", False, host_csv),
                              ("dev", True, dev_csv)):
        parts = []
        for gi, ds in enumerate(datasets):
            part = csv + f".g{gi}"
            times[name] += run_group(engine, params, buffers, state, ds,
                                     part, device, args.clicks, args.seed)
            parts.append(open(part).read())
            print(f"{name} group{gi} done ({times[name]:.1f}s cum)",
                  flush=True)
        with open(csv, "w") as f:
            f.write("".join(parts))

    res = {}
    for name, csv in (("host", host_csv), ("dev", dev_csv)):
        res[name] = EvaluatorMO(merged_list, csv,
                                [0.5, 0.65, 0.8, 0.85, 0.9]).eval_results()

    print(f"\n{'metric':<10} {'host':>10} {'device':>10} {'delta':>10}")
    deltas = {}
    for k in res["host"]:
        h, d = res["host"][k], res["dev"][k]
        deltas[k] = d - h
        print(f"{k:<10} {h:>10.4f} {d:>10.4f} {d - h:>+10.4f}")
    print(f"\nwall clock: host {times['host']:.1f}s "
          f"dev {times['dev']:.1f}s ({times['host'] / times['dev']:.2f}x)")

    firsts = first_divergence(host_csv, dev_csv)
    diverged = {k: v for k, v in firsts.items() if v[0] is not None}
    print(f"trajectories diverged: {len(diverged)}/{len(firsts)}")
    for k, (r, total) in sorted(diverged.items()):
        print(f"  {k}: first differing round {r}/{total}")

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump({"host": res["host"], "dev": res["dev"],
                   "deltas": deltas, "times": times,
                   "n_diverged": len(diverged), "n_traj": len(firsts)},
                  f, indent=1)


if __name__ == "__main__":
    main()
