"""Benchmark: p50 per-click forward_mask latency on a ScanNet-scale scene.

The driver-set north star (BASELINE.json) is <50 ms p50 per-click inference
with cached backbone features on one TPU chip. Prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"} where vs_baseline = 50 / p50_ms
(>1 means faster than the target).

Timing methodology (PERF.md round 3 "dispatch-overhead model"):

- On the axon tunnel, ``block_until_ready`` returns at dispatch, so each
  timing loop runs INSIDE one jitted program (``fori_loop`` with a
  denormal-scale data dependency between iterations) and the run is fenced
  with a single scalar readback — the loop cannot overlap or skip work.
- Every fenced dispatch additionally pays a per-dispatch overhead B that
  scales with EXECUTABLE size (measured: ~2.7 s for the backbone program,
  ~0.17 s for the decoder program — tools/probe_banded_integration.py).
  The per-iteration cost obeys t(N) = T + B/N to ~1% over N in
  {1, 4, 16, 48}; T is the true steady-state per-iteration time (what
  locally attached hardware pays once the executable is resident). The
  bench therefore times ONE executable at two loop lengths — the trip
  count is a TRACED argument, so both lengths run the SAME binary and
  compile nondeterminism cannot poison the subtraction — and reports
  T = (N2*t2 - N1*t1) / (N2 - N1).
- The axon remote compile service NONDETERMINISTICALLY emits 10-80x slower
  binaries for identical programs (PERF.md, round 2). Every timed program
  is therefore compiled >= 2 INDEPENDENT times (a draw-indexed denormal
  constant baked into the traced graph gives each draw a fresh cache key
  and hence a fresh binary), and the reported number is the MIN over
  draws. Drawing continues (up to 5) until two draws agree within 15%
  of the min, so a double-bad-draw coin flip cannot poison the scoreboard.
- Draw cache keys are unique per run: the persistent compilation cache
  (enabled for the untimed setup programs) must never replay a previous
  run's binaries into the timed draws, because a bad-binary draw recorded
  once would then repeat forever and min-over-draws could not recover.
  Reproducibility comes from draw agreement, not from cache hits.

Also reports (to stderr) backbone latency for context.
"""

import json
import os
import sys
import time

import numpy as np

MAX_DRAWS = 5
AGREE_RATIO = 1.15  # stop once >=2 draws sit within 15% of the min
# Shifts every draw's cache key. Default: unique per RUN (time-based), so
# every timed draw is a genuinely fresh compile. A stable salt (e.g. git
# HEAD) was tried and is a trap: the persistent compilation cache then
# replays whatever binaries the FIRST run at that salt happened to draw —
# measured here serving a 3052 ms backbone (bad draw recorded under a
# degraded process) for every subsequent bench at the same commit, which
# defeats min-over-draws entirely (all "draws" hit the same bad cache
# entries). Fresh compiles cost wall-clock (~1-4 min/program) but the
# scoreboard number they produce is a property of the code, not of cache
# history. Set AGILE3D_BENCH_SALT to pin a salt when reproducing a
# specific draw is the point. Kept < 9973 so every (salt, draw) maps to a
# distinct float32 eps constant (spacing 1e-40 > the f32 ulp at 1.6e-35).
SALT = int(os.environ.get("AGILE3D_BENCH_SALT",
                          str(int(time.time()) % 9973)))


def fence(x):
    """Force completion of x's producer with a 4-byte readback."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0].astype("float32"))


def min_over_draws(make_loop, label, n1, n2, stats=None):
    """Min over independent compiles of the dispatch-extrapolated T.

    ``make_loop(draw)`` returns ``(loop_fn, args)`` where
    ``loop_fn(*args, n)`` runs the timing loop with TRACED trip count n —
    one executable serves both lengths, so the t(N) = T + B/N subtraction
    compares the same binary against itself and compile nondeterminism
    cannot poison it. Per draw: 3 fenced reps at each length, medians
    FIRST (a single stalled dispatch cannot flip the subtraction's sign),
    then one T = (n2*t2 - n1*t1)/(n2 - n1) per draw, clamped to
    (0, t2] — t2 is a conservative upper bound that still amortizes the
    per-dispatch overhead B by 1/n2. Draws continue until two agree
    within AGREE_RATIO of the min (compile nondeterminism guard).
    """
    import jax.numpy as jnp

    n1_dev = jnp.asarray(n1, jnp.int32)
    n2_dev = jnp.asarray(n2, jnp.int32)
    per_draw = []
    draw = 0
    while True:
        loop_fn, args = make_loop(draw)
        t0 = time.time()
        fence(loop_fn(*args, n1_dev))  # compile + first
        compile_s = time.time() - t0

        def run(n_dev, n):
            t0 = time.time()
            fence(loop_fn(*args, n_dev))
            return 1000 * (time.time() - t0) / n

        pairs = [(run(n1_dev, n1), run(n2_dev, n2)) for _ in range(3)]
        t1 = float(np.median([p[0] for p in pairs]))
        t2 = float(np.median([p[1] for p in pairs]))
        t_fit = (n2 * t2 - n1 * t1) / (n2 - n1)
        steady = t2 if (t1 <= t2 or t_fit <= 0) else t_fit
        if stats is not None and t1 > t2:
            stats["B_ms"] = (t1 - t2) / (1.0 / n1 - 1.0 / n2)
        if stats is not None:
            # raw per-rep samples so the extrapolation is re-derivable
            # from the recorded BENCH json alone (VERDICT r3 next #7)
            stats.setdefault("draws", []).append({
                "compile_s": round(compile_s, 2),
                "t1_ms_reps": [round(p[0], 3) for p in pairs],
                "t2_ms_reps": [round(p[1], 3) for p in pairs],
                "t1_ms": round(t1, 3), "t2_ms": round(t2, 3),
                "T_ms": round(steady, 3),
            })
        per_draw.append(steady)
        print(f"{label} draw {draw}: compile+first {compile_s:.1f}s, "
              f"t({n1}) {t1:.2f} t({n2}) {t2:.2f} -> T {steady:.2f} ms",
              file=sys.stderr)
        draw += 1
        if draw >= MAX_DRAWS:
            break
        if draw >= 2:
            lo = min(per_draw)
            near_min = sum(1 for v in per_draw if v <= lo * AGREE_RATIO)
            if near_min >= 2:
                break
    best = min(per_draw)
    print(f"{label}: min over {draw} draws = {best:.2f} ms", file=sys.stderr)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from agile3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from agile3d_tpu.config import Config
    from agile3d_tpu.engine.eval import InteractiveEngine
    from agile3d_tpu.engine.clicks import HostClicks, NewClicks
    from agile3d_tpu.models.agile3d import init_agile3d
    from agile3d_tpu.data.datasets import SceneSample, collate_scenes
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from agile3d_tpu.data.synthetic import make_scene

    cfg = Config()
    rng = np.random.default_rng(0)

    # ~100k voxels: the upper end of ScanNet at 5 cm (reference
    # res16unet.py:224 shape trace)
    coords, colors, labels = make_scene(rng, n_points=400000, num_obj=8,
                                        extent=8.0)
    coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
    vox, umap, imap = sparse_quantize(coords, cfg.model.voxel_size)
    sample = SceneSample(
        vox_coords=vox, raw_coords=coords[umap],
        feats=colors[umap].astype(np.float32) / 255.0,
        labels=labels[umap].astype(np.int32),
        labels_full=labels.astype(np.int32), inverse_map=imap,
        click_idx={}, scene_name="bench", num_obj=8)
    n_valid = len(vox)
    print(f"bench scene: {n_valid} voxels", file=sys.stderr)

    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0), cfg.model)
    engine = InteractiveEngine(cfg)
    batch = collate_scenes([sample], cfg.buckets)

    from agile3d_tpu.models.agile3d import forward_backbone

    pyr, feats_dev, raw_dev, si_dev = engine.device_batch(batch)

    bb_stats = {}

    def make_backbone_loop(draw):
        # Draw-indexed denormal constant: changes the traced HLO so each
        # draw gets its own cache key => its own independent compile.
        eps = 1e-38 + (draw + 16 * SALT) * 1e-40

        @jax.jit
        def loop(params, buffers, bn_state, pyr, feats, raw, si, n):
            def body(_, f):
                scene, _ = forward_backbone(params, buffers, bn_state, pyr,
                                            f, raw, si, training=False,
                                            cfg=cfg.model)
                # full reduction: no element of the forward is dead code
                s = jnp.sum(scene.mask_feat.astype(jnp.float32))
                return f * (1.0 + s * eps)

            f = jax.lax.fori_loop(0, n, body, feats)
            return jnp.sum(f) * eps

        return loop, (params, buffers, bn_state, pyr, feats_dev, raw_dev,
                      si_dev)

    # N2 must keep the B/N2 dispatch tail well under T, or tunnel-load
    # drift in B between the two lengths dominates the subtraction
    # (measured: identical t(32) across runs but t(4) swinging the
    # extrapolated T by +-15 ms). B ~ 2.7 s here -> B/128 ~ 21 ms.
    bb_ms = min_over_draws(make_backbone_loop, "backbone", 16, 128, bb_stats)
    print(f"backbone per-dispatch overhead (tunnel artifact, extrapolated "
          f"out): ~{bb_stats.get('B_ms', float('nan')):.0f} ms",
          file=sys.stderr)
    scene, _ = engine._backbone(params, buffers, bn_state, pyr, feats_dev,
                                raw_dev, si_dev, training=False)

    # clicks: a realistic mid-session state (24 clicks over 8 objects)
    clicks = HostClicks(cfg.model.max_clicks)
    cl_vox = rng.integers(0, n_valid, 24).astype(np.int32)
    cl_obj = np.tile(np.arange(8, dtype=np.int32) + 1, 3)[:24]
    clicks.extend(NewClicks(cl_vox, cl_obj, np.arange(24, dtype=np.int32)))

    from agile3d_tpu.models.agile3d import ClickState, forward_mask

    cs = ClickState(vox=jnp.asarray(clicks.vox[None]),
                    obj=jnp.asarray(clicks.obj[None]),
                    time=jnp.asarray(clicks.time[None]))
    num_obj_dev = jnp.asarray([8], jnp.int32)

    mc = engine._click_bucket(clicks.count)
    cs_b = ClickState(vox=cs.vox[:, :mc], obj=cs.obj[:, :mc],
                      time=cs.time[:, :mc])
    fm_stats = {}

    def make_mask_loop(draw):
        eps = 1e-38 + (draw + 16 * SALT) * 1e-40

        @jax.jit
        def loop(params, buffers, scene, cs, num_obj, n):
            def body(_, feat):
                sc = scene._replace(mask_feat=feat)
                out = forward_mask(params, buffers, sc, cs, num_obj,
                                   cfg=cfg.model)
                pred = jnp.argmax(out["pred_masks"], -1)
                return feat + pred[..., :1].astype(jnp.float32) * eps

            return jax.lax.fori_loop(0, n, body, scene.mask_feat)

        return loop, (params, buffers, scene, cs_b, num_obj_dev)

    p50 = min_over_draws(make_mask_loop, "forward_mask", 20, 160, fm_stats)
    print(f"forward_mask per-call (same-binary two-length extrapolation, "
          f"min over independent compiles): {p50:.2f} ms; backbone "
          f"{bb_ms:.1f} ms; forward_mask per-dispatch overhead "
          f"~{fm_stats.get('B_ms', float('nan')):.0f} ms", file=sys.stderr)

    # the production serving config (decoder_dtype=bfloat16, golden-pinned
    # by tests/golden/rollout_multi_bf16.csv) measured alongside: halves
    # the decoder's HBM streams, which the roofline says is its binding
    # resource at this scale (VERDICT r4 task 9)
    import dataclasses

    cfg_bf16 = dataclasses.replace(cfg.model, decoder_dtype="bfloat16")
    fm16_stats = {}

    # Pre-cast once, as production does: forward_backbone casts the scene
    # per SCENE (models/agile3d.py "cast ONCE per scene"), so the timed
    # loop must not re-pay the N-scale f32->bf16 converts per click.
    # forward_mask's internal cast no-ops on already-bf16 leaves.
    from agile3d_tpu.models.agile3d import cast_decoder_bf16

    params16, buffers16, scene16 = cast_decoder_bf16(params, buffers, scene)

    def make_mask_loop_bf16(draw):
        eps = 1e-38 + (draw + 48 * SALT) * 1e-40

        @jax.jit
        def loop(params, buffers, scene, cs, num_obj, n):
            def body(_, feat):
                sc = scene._replace(mask_feat=feat)
                out = forward_mask(params, buffers, sc, cs, num_obj,
                                   cfg=cfg_bf16)
                pred = jnp.argmax(out["pred_masks"], -1)
                # bf16 shares f32's exponent range, so eps stays
                # representable: numerically ~no-op, structurally a carry
                # dependency that keeps every round live
                return feat + pred[..., :1].astype(feat.dtype) * eps

            return jax.lax.fori_loop(0, n, body, scene.mask_feat)

        return loop, (params16, buffers16, scene16, cs_b, num_obj_dev)

    p50_bf16 = min_over_draws(make_mask_loop_bf16, "forward_mask_bf16",
                              20, 160, fm16_stats)
    print(f"forward_mask serving config (bf16 decoder): {p50_bf16:.2f} ms",
          file=sys.stderr)

    # analytic FLOPs/bytes accounting -> MFU + roofline position
    # (utils/costs.py, cross-checked against XLA cost analysis in
    # tests/test_costs.py). 'useful' counts valid work (honest MFU);
    # 'padded' counts what the compiled gather-GEMMs actually issue.
    from agile3d_tpu.utils.costs import (
        backbone_costs, decoder_costs, stage_table, summarize)

    bb_costs = backbone_costs(batch.pyramid, cfg.model.backbone)
    bb_roof = summarize(bb_costs, measured_s=bb_ms / 1e3)
    bb_roof["padded_flops"] = summarize(
        backbone_costs(batch.pyramid, cfg.model.backbone,
                       padded=True))["model_flops"]
    fm_costs = decoder_costs(scene.mask_feat.shape[1],
                             cfg.model.num_bg_queries + mc, cfg.model)
    fm_roof = summarize(fm_costs, measured_s=p50 / 1e3)
    fm16_roof = summarize(
        decoder_costs(scene.mask_feat.shape[1],
                      cfg.model.num_bg_queries + mc, cfg.model,
                      dtype_bytes=2), measured_s=p50_bf16 / 1e3)
    print(f"roofline: forward_mask {fm_roof['achieved_tflops']} TFLOP/s "
          f"({fm_roof['frac_of_roofline']:.0%} of its per-op hardware "
          f"floor {fm_roof['roofline_floor_ms']} ms); backbone "
          f"{bb_roof['achieved_tflops']} TFLOP/s "
          f"({bb_roof['frac_of_roofline']:.0%} of floor "
          f"{bb_roof['roofline_floor_ms']} ms; gather-GEMM cost model "
          f"would predict {bb_roof['gather_model_ms']} ms)",
          file=sys.stderr)

    print(json.dumps({
        "metric": "per_click_forward_mask_p50_latency",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(50.0 / p50, 2),
        # raw per-length, per-rep wall-clock samples: T re-derives as
        # (n2*t2 - n1*t1)/(n2 - n1) per draw, min over draws
        "raw": {
            "n_voxels": n_valid,
            "backbone": {"n1": 16, "n2": 128, "T_ms": round(bb_ms, 3),
                         "draws": bb_stats.get("draws", [])},
            "forward_mask": {"n1": 20, "n2": 160,
                             "draws": fm_stats.get("draws", [])},
            "forward_mask_bf16": {"n1": 20, "n2": 160,
                                  "T_ms": round(p50_bf16, 3),
                                  "draws": fm16_stats.get("draws", [])},
        },
        # MFU/roofline accounting (VERDICT r4 task 2): model_flops,
        # achieved_tflops, achieved_gbps, frac_of_peak_mxu and position
        # vs the summed per-op roofline floor, per program; plus the
        # backbone's per-stage breakdown for the PERF.md table
        "roofline": {
            "backbone": bb_roof,
            "forward_mask": fm_roof,
            "forward_mask_bf16": fm16_roof,
            "backbone_stages": stage_table(bb_costs),
        },
    }))


if __name__ == "__main__":
    main()
