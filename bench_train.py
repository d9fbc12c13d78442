"""Training throughput benchmark: scenes/sec/chip for the full supervised
step (backbone + decoder + losses + AdamW) at the canonical batch size.

The reference publishes no training throughput (SURVEY.md section 6);
BASELINE.md asks to measure & report. Prints one JSON line to stdout.
Separate from bench.py so the driver's latency benchmark stays fast.
"""

import json
import sys
import time

import numpy as np


def main(batch_size=5, n_points=150000, out_path=None):
    import jax
    import jax.numpy as jnp

    from agile3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()  # TPU only; CPU AOT cache is host-unsafe

    from agile3d_tpu.config import Config, TrainConfig
    from agile3d_tpu.data.datasets import SceneSample, collate_scenes
    from agile3d_tpu.engine.eval import InteractiveEngine
    from agile3d_tpu.engine.train import make_optimizer, make_train_step
    from agile3d_tpu.models.agile3d import ClickState, init_agile3d
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from agile3d_tpu.data.synthetic import make_scene

    def fence(x):
        return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0]
                     .astype("float32"))

    cfg = Config(train=TrainConfig(batch_size=batch_size))
    rng = np.random.default_rng(0)
    samples = []
    for i in range(batch_size):
        coords, colors, labels = make_scene(rng, n_points=n_points,
                                            num_obj=6, extent=6.0)
        coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
        vox, umap, imap = sparse_quantize(coords, 0.05)
        samples.append(SceneSample(
            vox, coords[umap], colors[umap].astype(np.float32) / 255,
            labels[umap].astype(np.int32), labels.astype(np.int32), imap,
            {}, f"s{i}", 6))
    batch = collate_scenes(samples, cfg.buckets)
    total_vox = int(sum(len(s.vox_coords) for s in samples))
    print(f"train batch: {batch_size} scenes, {total_vox} voxels "
          f"(flat bucket {batch.pyramid.levels[0].grid.shape[0]})",
          file=sys.stderr)

    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0), cfg.model)
    tx, _ = make_optimizer(cfg, steps_per_epoch=100)
    opt_state = tx.init(params)
    train_step = make_train_step(cfg, tx)
    engine = InteractiveEngine(cfg)
    pyr, feats, raw, si = engine.device_batch(batch, will_train=True)

    mc = 64
    vox_c = np.full((batch_size, mc), -1, np.int32)
    obj_c = np.zeros((batch_size, mc), np.int32)
    tim_c = np.zeros((batch_size, mc), np.int32)
    for i in range(batch_size):
        nv = int((batch.sample_idx[i] >= 0).sum())
        vox_c[i, :12] = rng.integers(0, nv, 12)
        # every object gets at least one click (the training rollout
        # guarantees this; an unclicked object's NEG mask column under its
        # own gt points would blow up the CE)
        obj_c[i, :12] = (np.arange(12) % 6) + 1
        obj_c[i, 11] = 0
        tim_c[i, :12] = np.arange(12)
    clicks = ClickState(jnp.asarray(vox_c), jnp.asarray(obj_c),
                        jnp.asarray(tim_c))
    labels = jnp.asarray(batch.labels)
    num_obj = jnp.asarray(batch.num_obj)

    t0 = time.time()
    out = train_step(params, buffers, bn_state, opt_state, pyr, feats, raw,
                     si, clicks, labels, num_obj)
    fence(out[3])
    print(f"train step compile+first: {time.time() - t0:.1f}s",
          file=sys.stderr)

    # Steady state via the dispatch-overhead extrapolation (bench.py /
    # PERF.md round 3): per-fenced-dispatch overhead scales with executable
    # size, so the step is timed inside ONE executable at two TRACED trip
    # counts and T = (n2*t2 - n1*t1)/(n2 - n1) removes it. The optimizer/
    # BN/param carry provides the inter-iteration data dependency.
    from bench import min_over_draws

    def make_train_loop(draw):
        eps = 1e-38 + draw * 1e-40

        # every device operand is a jit ARGUMENT: closure-captured device
        # arrays serialize into the lowered MLIR as literal constants (the
        # kernel maps alone blow the program from ~5 MB to ~750 MB of
        # stablehlo and the axon compile relay rejects it with HTTP 413)
        @jax.jit
        def loop(p0, bs0, os0, buffers, pyr, feats, raw, si, clicks,
                 labels, num_obj, n):
            def body(_, c):
                p, bs, os_ = c
                p, bs, os_, tot, *_ = train_step(
                    p, buffers, bs, os_, pyr, feats, raw, si, clicks,
                    labels, num_obj)
                return (p, bs, os_)

            p, bs, os_ = jax.lax.fori_loop(
                0, n, body, (p0, bs0, os0))
            return (jax.tree_util.tree_leaves(p)[0].reshape(-1)[0]
                    * (1.0 + eps))

        return loop, (params, bn_state, opt_state, buffers, pyr, feats,
                      raw, si, clicks, labels, num_obj)

    step_ms = min_over_draws(make_train_loop, "train_step", 1, 4)
    step_s = step_ms / 1000
    print(f"train step steady (dispatch-extrapolated): {step_ms:.1f} ms",
          file=sys.stderr)
    p, bs, os_ = params, bn_state, opt_state

    # --- host-pipeline overlap (VERDICT r2 missing #2): with the prefetch
    # thread (data/prefetch.py) assembling batch N+1 during device step N,
    # epoch stepping should cost ~max(host, device), not host + device.
    from agile3d_tpu.data.prefetch import BatchPrefetcher

    K = 4
    raw_scenes = []
    for i in range(K * batch_size):
        c, col, lab = make_scene(rng, n_points=n_points, num_obj=6,
                                 extent=6.0)
        c += rng.standard_normal(c.shape).astype(np.float32) * 0.03
        raw_scenes.append((c, col, lab))

    def prepare(bi):
        group = []
        for c, col, lab in raw_scenes[bi * batch_size:(bi + 1) * batch_size]:
            vox, umap, imap = sparse_quantize(c, 0.05)
            group.append(SceneSample(
                vox, c[umap], col[umap].astype(np.float32) / 255,
                lab[umap].astype(np.int32), lab.astype(np.int32), imap,
                {}, "s", 6))
        return collate_scenes(group, cfg.buckets)

    t0 = time.time()
    prepare(0)
    t_host = time.time() - t0
    print(f"host batch assembly: {t_host * 1000:.0f} ms "
          f"(quantize + pyramid + collate, {batch_size} scenes)",
          file=sys.stderr)

    def run_epoch(depth):
        nonlocal p, bs, os_
        t0 = time.time()
        for b in BatchPrefetcher(prepare, range(K), depth=depth):
            pyr_b, feats_b, raw_b, si_b = engine.device_batch(
                b, will_train=True)
            p, bs, os_, tot, *_ = train_step(
                p, buffers, bs, os_, pyr_b, feats_b, raw_b, si_b, clicks,
                jnp.asarray(b.labels), jnp.asarray(b.num_obj))
            fence(tot)
        return (time.time() - t0) / K

    run_epoch(0)                 # warm any per-bucket recompiles
    serial_s = run_epoch(0)      # host and device strictly alternate
    overlap_s = run_epoch(2)     # prefetch thread hides host assembly
    print(f"epoch stepping: serial {serial_s * 1000:.0f} ms/step, "
          f"prefetch {overlap_s * 1000:.0f} ms/step "
          f"(host wait hidden: "
          f"{(serial_s - overlap_s) * 1000:.0f} ms/step of "
          f"{t_host * 1000:.0f})", file=sys.stderr)

    # Training MFU (VERDICT r4 task 7): forward FLOPs from the analytic
    # cost model on this batch's real kernel maps; backward ~ 2x forward
    # (each matmul differentiates into two), so step flops ~ 3x fwd.
    # The rollout phase (0-19 extra no-grad decoder forwards in the real
    # engine) is excluded here: this benchmark times the supervised step,
    # the regime run (tools/train_regime.py) carries rollout-inclusive
    # epoch times.
    from agile3d_tpu.utils.costs import (
        PEAK_BF16_FLOPS, backbone_costs, decoder_costs, summarize)

    n_rows = batch.pyramid.levels[0].grid.shape[0]
    fwd = (summarize(backbone_costs(batch.pyramid, cfg.model.backbone))
           ["model_flops"]
           + summarize(decoder_costs(n_rows, cfg.model.num_bg_queries + mc,
                                     cfg.model))["model_flops"])
    step_flops = 3 * fwd
    train_mfu = step_flops / step_s / PEAK_BF16_FLOPS
    print(f"training MFU: {step_flops / step_s / 1e12:.2f} TFLOP/s useful "
          f"({train_mfu:.1%} of bf16 peak)", file=sys.stderr)

    result = {
        "metric": "train_scenes_per_sec_per_chip",
        "value": round(batch_size / step_s, 2),
        "unit": "scenes/s",
        "vs_baseline": None,
        "breakdown": {
            "supervised_step_ms": round(step_ms, 1),
            "host_batch_assembly_ms": round(t_host * 1000, 1),
            "epoch_step_serial_ms": round(serial_s * 1000, 1),
            "epoch_step_prefetch_ms": round(overlap_s * 1000, 1),
            "batch_scenes": batch_size,
            "batch_voxels": total_vox,
            "padded_rows": int(n_rows),
        },
        "roofline": {
            "step_flops_3x_fwd": int(step_flops),
            "achieved_tflops": round(step_flops / step_s / 1e12, 3),
            "train_mfu_bf16_peak": round(train_mfu, 4),
        },
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=5)
    ap.add_argument("--n_points", type=int, default=150000)
    ap.add_argument("--out", default=None,
                    help="also write the JSON line to this path (per-round "
                         "artifact, e.g. BENCH_train_r05.json)")
    args = ap.parse_args()
    main(args.batch_size, args.n_points, args.out)
