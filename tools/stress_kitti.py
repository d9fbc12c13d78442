"""KITTI-360-scale single-chip stress test (VERDICT round-1 item 9).

Pushes a 500k+-voxel outdoor-scale synthetic scene through backbone +
per-click decoder on one chip, recording HBM peaks
(utils/profiling.device_memory_stats) and verifying the chunked-attention
path engages (SURVEY.md section 5.7: the voxel axis is the long-context
analogue; this measures the single-chip ceiling that justifies voxel-axis
SP for anything larger).

Run: python tools/stress_kitti.py [--points 2000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(x):
    import jax

    return float(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0].astype("float32"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_200_000)
    ap.add_argument("--extent", type=float, default=22.0)
    ap.add_argument("--sp", type=int, default=1,
                    help="also run the voxel-axis sharded decoder "
                         "(parallel/sp.py) over an sp-wide mesh and check "
                         "agreement (needs >= sp devices; use the virtual "
                         "CPU mesh for correctness runs)")
    ap.add_argument("--skip_backbone", action="store_true",
                    help="decoder-only (e.g. giant SP correctness runs "
                         "where the CPU backbone would dominate)")
    ap.add_argument("--quick", action="store_true",
                    help="single compile draw + 1 timing rep per program "
                         "(for CPU-mesh correctness runs where each "
                         "forward takes minutes; timing loses the "
                         "min-over-compiles discipline)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on an 8-virtual-device CPU mesh (for --sp "
                         "correctness runs without a TPU pod)")
    ap.add_argument("--sp_only", action="store_true",
                    help="skip every single-chip timing loop (backbone "
                         "and forward_mask; one reference forward_mask "
                         "call remains for the SP agreement check) — for "
                         "CPU-mesh SP correctness runs at >= 1.5M voxels "
                         "where CPU timing is both meaningless and "
                         "minutes per iteration; requires --sp > 1")
    ap.add_argument("--decoder_dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="time the decoder in this dtype (bfloat16 = the "
                         "production eval config, eval_multi_obj "
                         "--decoder_dtype bfloat16)")
    args = ap.parse_args()
    if args.sp_only and args.sp <= 1:
        ap.error("--sp_only times nothing and checks nothing without an SP "
                 "branch; pass --sp > 1 (it exists only to make CPU-mesh SP "
                 "agreement runs affordable)")

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from agile3d_tpu.config import Config
    from agile3d_tpu.data.datasets import SceneSample, collate_scenes
    from agile3d_tpu.engine.clicks import HostClicks, NewClicks
    from agile3d_tpu.engine.eval import InteractiveEngine
    from agile3d_tpu.models.agile3d import ClickState, forward_mask, init_agile3d
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from agile3d_tpu.utils.profiling import device_memory_stats
    from agile3d_tpu.data.synthetic import make_scene

    from agile3d_tpu.config import DEFAULT_VOXEL_BUCKETS

    # two extra rungs beyond the standard ladder so >= 1.5M-voxel scenes
    # pad instead of truncating (SP stress territory)
    import dataclasses

    cfg = Config(buckets=tuple(DEFAULT_VOXEL_BUCKETS) + (1572864, 2097152))
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, decoder_dtype=args.decoder_dtype))
    rng = np.random.default_rng(0)
    coords, colors, labels = make_scene(rng, n_points=args.points,
                                        num_obj=10, extent=args.extent)
    coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.04
    t0 = time.time()
    vox, umap, imap = sparse_quantize(coords, cfg.model.voxel_size)
    sample = SceneSample(
        vox_coords=vox, raw_coords=coords[umap],
        feats=colors[umap].astype(np.float32) / 255.0,
        labels=labels[umap].astype(np.int32),
        labels_full=labels.astype(np.int32), inverse_map=imap,
        click_idx={}, scene_name="kitti_stress", num_obj=10)
    batch = collate_scenes([sample], cfg.buckets)
    n_valid = len(vox)
    n_pad = batch.pyramid.levels[0].grid.shape[0]
    print(f"scene: {n_valid} voxels (padded {n_pad}); host quantize+pyramid "
          f"{time.time()-t0:.1f}s", flush=True)
    chunk_engages = (cfg.model.xla_attn_chunk
                     and n_pad >= 2 * cfg.model.xla_attn_chunk
                     and n_pad % cfg.model.xla_attn_chunk == 0)
    print(f"chunked-attention gate at N={n_pad}: "
          f"{'engaged' if chunk_engages else 'dense'} "
          f"(chunk {cfg.model.xla_attn_chunk})", flush=True)

    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0), cfg.model)
    engine = InteractiveEngine(cfg)

    if args.skip_backbone:
        # Fabricate the decoder's SceneFeatures (random mask features +
        # real positional encodings): the point of --skip_backbone runs is
        # decoder-scale behavior (e.g. SP correctness at >= 1.5M voxels on
        # the CPU mesh), where a real CPU backbone pass would dominate.
        from agile3d_tpu.models.agile3d import SceneFeatures, _pos_enc

        raw_pad = np.zeros((n_pad, 3), np.float32)
        raw_pad[:n_valid] = coords[umap]
        valid = np.zeros(n_pad, bool)
        valid[:n_valid] = True
        cmin = raw_pad[:n_valid].min(0)
        cmax = raw_pad[:n_valid].max(0)
        feat = (np.random.default_rng(1)
                .standard_normal((n_pad, cfg.model.hidden_dim))
                .astype(np.float32) * 0.5)
        feat[n_valid:] = 0
        pos = np.array(_pos_enc(jnp.asarray(raw_pad), buffers,
                                jnp.asarray(cmin), jnp.asarray(cmax),
                                cfg.model))
        pos[~valid] = 0
        scene = SceneFeatures(
            mask_feat=jnp.asarray(feat)[None],
            pos_pcd=jnp.asarray(pos)[None],
            vox_valid=jnp.asarray(valid)[None],
            raw=jnp.asarray(raw_pad)[None],
            cmin=jnp.asarray(cmin)[None], cmax=jnp.asarray(cmax)[None])
        print("skip_backbone: fabricated SceneFeatures "
              f"[1, {n_pad}, {cfg.model.hidden_dim}]", flush=True)
        t_bb_cold = float("nan")
        mem_bb = device_memory_stats()
    else:
        t0 = time.time()
        scene, _ = engine.run_backbone(params, buffers, bn_state, batch)
        jax.block_until_ready(scene.mask_feat)
        t_bb_cold = time.time() - t0
        mem_bb = device_memory_stats()
    hbm_note = (f"HBM {mem_bb.get('bytes_in_use', 0)/2**30:.2f} GiB in use "
                f"/ peak {mem_bb.get('peak_bytes_in_use', 0)/2**30:.2f} GiB"
                if mem_bb.get('peak_bytes_in_use') else
                "HBM stats unavailable through the axon tunnel - "
                "analytic estimate printed at the end")
    print(f"backbone compile+first: {t_bb_cold:.1f}s; {hbm_note}",
          flush=True)

    if not args.skip_backbone and not args.sp_only:
        # steady-state backbone via the dispatch-overhead extrapolation
        # (PERF.md round 3): every fenced dispatch pays ~seconds of
        # executable-size-proportional tunnel overhead, so the loop runs
        # in-graph at two TRACED trip counts and T = (n2*t2 - n1*t1)/
        # (n2 - n1) removes it. (The round-2 per-call numbers at this
        # scale were dominated by that overhead — hence their 2-4x
        # "rerun variance", which was tunnel-day variance in B.)
        from bench import min_over_draws
        from agile3d_tpu.models.agile3d import forward_backbone

        pyr_d, feats_d, raw_d, si_d = engine.device_batch(batch)

        def make_bb_loop(draw):
            eps = 1e-38 + draw * 1e-40

            @jax.jit
            def loop(params, buffers, bn_state, pyr, feats, raw, si, n):
                def body(_, f):
                    sc, _ = forward_backbone(params, buffers, bn_state,
                                             pyr, f, raw, si,
                                             training=False, cfg=cfg.model)
                    s = jnp.sum(sc.mask_feat.astype(jnp.float32))
                    return f * (1.0 + s * eps)

                f = jax.lax.fori_loop(0, n, body, feats)
                return jnp.sum(f) * eps

            return loop, (params, buffers, bn_state, pyr_d, feats_d,
                          raw_d, si_d)

        bb_ms = min_over_draws(make_bb_loop, "backbone",
                               2, 8 if args.quick else 16)
        print(f"backbone steady: {bb_ms:.1f} ms (dispatch-extrapolated)",
              flush=True)

    # per-click decoder at this scale, mid-session click state
    clicks = HostClicks(cfg.model.max_clicks)
    cl_vox = rng.integers(0, n_valid, 30).astype(np.int32)
    cl_obj = np.tile(np.arange(10, dtype=np.int32) + 1, 3)
    clicks.extend(NewClicks(cl_vox, cl_obj, np.arange(30, dtype=np.int32)))
    mc = engine._click_bucket(clicks.count)
    cs = ClickState(vox=jnp.asarray(clicks.vox[None, :mc]),
                    obj=jnp.asarray(clicks.obj[None, :mc]),
                    time=jnp.asarray(clicks.time[None, :mc]))
    num_obj_dev = jnp.asarray([10], jnp.int32)

    # dispatch-extrapolated in-graph loop, min over >= 2 INDEPENDENT
    # compiles (the axon compile service nondeterministically emits
    # 10-80x slower binaries — PERF.md; a draw-indexed denormal constant
    # gives each draw a fresh cache key).
    from bench import min_over_draws

    per_click = float("nan")

    def make_fm_loop(draw):
        eps = 1e-38 + draw * 1e-40

        @jax.jit
        def loop(params, buffers, scene, cs, num_obj, n):
            def body(_, feat):
                sc = scene._replace(mask_feat=feat)
                out = forward_mask(params, buffers, sc, cs, num_obj,
                                   cfg=cfg.model)
                pred = jnp.argmax(out["pred_masks"], -1)
                return feat + pred[..., :1].astype(jnp.float32) * eps

            return jax.lax.fori_loop(0, n, body, scene.mask_feat)

        return loop, (params, buffers, scene, cs, num_obj_dev)

    if not args.sp_only:
        per_click = min_over_draws(make_fm_loop, "forward_mask",
                                   5, 20 if args.quick else 50)

    @jax.jit
    def fm_pred(params, buffers, scene, cs, num_obj):
        out = forward_mask(params, buffers, scene, cs, num_obj,
                           cfg=cfg.model)
        return jnp.argmax(out["pred_masks"], -1)

    pred_single = fm_pred(params, buffers, scene, cs, num_obj_dev)
    mem = device_memory_stats()
    timing = ("timing skipped (--sp_only)" if args.sp_only
              else f"{per_click:.1f} ms/click (min over independent compiles)")
    print(f"forward_mask at {n_valid} voxels: {timing}; HBM peak "
          f"{mem.get('peak_bytes_in_use', 0)/2**30:.2f} GiB", flush=True)

    if args.sp > 1:
        from agile3d_tpu.parallel import make_mesh
        from agile3d_tpu.parallel.sp import make_forward_mask_sp

        mesh = make_mesh(n_dp=1, n_sp=args.sp)
        fm_sp, shard_scene = make_forward_mask_sp(mesh, cfg.model)
        sscene = shard_scene(scene)
        t0 = time.time()
        out = fm_sp(params, buffers, sscene, cs, num_obj_dev)
        jax.block_until_ready(out["pred_masks"])
        t_cold = time.time() - t0
        reps = []
        for _ in range(1 if args.quick else 3):
            t0 = time.time()
            out = fm_sp(params, buffers, sscene, cs, num_obj_dev)
            jax.block_until_ready(out["pred_masks"])
            reps.append((time.time() - t0) * 1e3)
        pred_sp = jnp.argmax(out["pred_masks"], -1)
        agree = float(jnp.mean((pred_sp == pred_single)
                               [:, :n_valid].astype(jnp.float32)))
        print(f"SP decoder (sp={args.sp}) at {n_valid} voxels: "
              f"{min(reps):.1f} ms/click (compile {t_cold:.1f}s); "
              f"argmax agreement vs single-chip {agree:.6f}", flush=True)
        # sharded-HBM math: the decoder's per-chip residents shrink 1/sp
        per_chip = n_pad / args.sp * (128 + 128 + 3) * 4 / 2**30
        print(f"  per-chip decoder residents ~ {per_chip:.2f} GiB "
              f"(mask_feat+pos+raw over N/{args.sp}); chunked c2s/s2c "
              f"logits never materialize (parallel/sp.py)", flush=True)

        # --- SP x scan vs SP x host loop: the dispatch overhead the
        # composed rollout saves (VERDICT r4 task 1 done-criterion).
        # Same scene, same click budget, warmed compiles for both paths:
        # the host loop pays one dispatch per round; the composed scan
        # (parallel/sp_rollout.py) runs every round in ONE dispatch.
        import random as _random

        from agile3d_tpu.engine.device_eval import evaluate_scene_device
        from agile3d_tpu.engine.eval import evaluate_scene

        if not args.skip_backbone:
            sp_engine = InteractiveEngine(cfg, sp=args.sp)
            mc_budget = 2           # budget = num_obj*2 -> ~11 rounds
            for fn, tag2 in ((evaluate_scene_device, "scan"),
                             (evaluate_scene, "host-loop")):
                fn(sp_engine, params, buffers, bn_state, batch,
                   mode="multi", instance_id=0, rng=_random.Random(0),
                   max_num_clicks=mc_budget)   # warm compiles
                t0 = time.time()
                rows2 = fn(sp_engine, params, buffers, bn_state, batch,
                           mode="multi", instance_id=0,
                           rng=_random.Random(0),
                           max_num_clicks=mc_budget)
                wall = time.time() - t0
                n_rounds2 = len(rows2) - 1
                extra = ""
                if tag2 == "scan":
                    from agile3d_tpu.engine.device_eval import _ROUND_BUCKETS
                    from agile3d_tpu.config import bucket_size

                    rp = bucket_size(n_rounds2, _ROUND_BUCKETS)
                    extra = (f"; fixed trip count {rp} rounds — on hosts "
                             f"with ~zero dispatch cost (CPU mesh) the "
                             f"padding makes the scan SLOWER, the win is "
                             f"tunnel/dispatch-bound hardware")
                print(f"  sp={args.sp} rollout [{tag2}]: {n_rounds2} rounds "
                      f"in {wall:.2f}s ({wall / n_rounds2 * 1e3:.0f} "
                      f"ms/round incl. backbone amortized{extra})",
                      flush=True)
                if tag2 == "scan":
                    wall_scan, rounds_scan = wall, n_rounds2
            saved = (wall - wall_scan) / max(rounds_scan, 1) * 1e3
            print(f"  per-round dispatch overhead saved by the composed "
                  f"scan: ~{saved:.0f} ms/round at sp={args.sp} "
                  f"({wall:.2f}s host loop -> {wall_scan:.2f}s scan)",
                  flush=True)

    if mem.get("peak_bytes_in_use"):
        hbm_total = mem.get("bytes_limit", 16 * 2**30)
        print(f"single-chip ceiling: peak "
              f"{mem.get('peak_bytes_in_use',0)/2**30:.2f} GiB of "
              f"{hbm_total/2**30:.0f} GiB at {n_valid} voxels", flush=True)
    else:
        # analytic: dominant residents at N voxels (padded Np), C=96/128
        np_pad = n_pad
        maps = (np_pad * (27 + 8 + 2) + 125 * np_pad) * 4 / 2**30
        acts = np_pad * (96 + 128 + 128 + 3 + 3) * 4 / 2**30  # fmap+feat+pos
        scratch = np_pad * 4 * 96 * 4 / 2**30  # conv scan slab high-water
        print(f"single-chip estimate at {n_valid} voxels (padded {np_pad}):"
              f" kernel maps {maps:.2f} GiB + resident activations "
              f"{acts:.2f} GiB + conv scratch {scratch:.2f} GiB "
              f"~= {maps+acts+scratch:.2f} GiB of 16 GiB -> headroom to "
              f"~2-3M voxels; voxel-SP (parallel/sp.py) covers beyond",
              flush=True)


if __name__ == "__main__":
    main()
