"""Why is the banded Mosaic kernel 30x slower inside the full backbone?

BENCH (round 3, first run after wiring): backbone 2671 ms with banded ON
vs 190 ms for the round-2 scan path — yet the standalone probe measured
the kernel at 10.5 ms vs the scan conv's 20.1 on the SAME conv shape
(tools/probe_banded_kernel.py). This probe isolates the integration
factor on the real chip, min over >= 2 independent compiles per variant:

  A. backbone eval, banded OFF            (round-2 scan path; control)
  B. backbone eval, banded ON, scan_blocks ON   (wired default)
  C. backbone eval, banded ON, scan_blocks OFF  (kernels outside lax.scan)
  D. ONE banded conv standalone at the lv0 bench shape (sanity: ~10.5 ms)
  E. forward_mask (no banded anywhere)    (headline cross-check)

First findings (2026-08-17): A == B == C ~2.9 s — the slowdown is NOT the
banded kernel; it's the per-call program FORM. The timed jit closes over
the device-put pyramid, which traces its ~130 MB of kernel maps into the
jaxpr as CONSTANTS; on the axon proxy every fenced execution re-streams
executable constants host->device (~2.5 s at tunnel bandwidth). Production
(engine._backbone, device_eval) passes the pyramid as jit ARGUMENTS and
never pays this. Variants with pyr as arguments:

  F. scan path, pyr as jit args, per-call fence
  G. scan path, pyr as jit args, in-graph fori_loop x4
  H. banded ON,  pyr as jit args, per-call fence
  I. banded ON,  pyr as jit args, in-graph fori_loop x4 (Mosaic-in-loop)

Usage: python tools/probe_banded_integration.py [A B C D E F G H I ...]
"""

import dataclasses
import sys

import numpy as np

sys.path.insert(0, ".")
from bench import fence, SALT  # noqa: E402


def min_over_draws(make_timed, label, draws=2):
    """Legacy per-call timing harness (bench.py moved to the two-length
    traced-trip-count form; this tool's variants measure per-call forms on
    purpose, so it keeps the old protocol: make_timed(draw) -> timed())."""
    import time

    vals = []
    for draw in range(draws):
        timed = make_timed(draw)
        t0 = time.time()
        timed()
        print(f"{label} draw {draw}: compile+first {time.time() - t0:.1f}s",
              file=sys.stderr)
        reps = [timed() for _ in range(3)]
        vals.append(float(np.median(reps)))
        print(f"{label} draw {draw}: steady {vals[-1]:.2f} ms",
              file=sys.stderr)
    return min(vals)


def main():
    import jax
    import jax.numpy as jnp

    from agile3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from agile3d_tpu.config import Config
    from agile3d_tpu.engine.eval import InteractiveEngine
    from agile3d_tpu.engine.clicks import HostClicks, NewClicks
    from agile3d_tpu.models.agile3d import init_agile3d, forward_backbone
    from agile3d_tpu.data.datasets import SceneSample, collate_scenes
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from agile3d_tpu.data.synthetic import make_scene

    which = set(sys.argv[1:]) or {"A", "B", "C", "D", "E"}

    cfg = Config()
    rng = np.random.default_rng(0)
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
    print(f"scene: {n_valid} voxels", file=sys.stderr)

    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0), cfg.model)
    engine = InteractiveEngine(cfg)
    batch = collate_scenes([sample], cfg.buckets)
    pyr, feats_dev, raw_dev, si_dev = engine.device_batch(batch)

    def backbone_variant(label, banded, scan_blocks):
        bb = dataclasses.replace(cfg.model.backbone, banded_conv=banded,
                                 scan_blocks=scan_blocks)
        mcfg = dataclasses.replace(cfg.model, backbone=bb)

        def make_timed(draw):
            eps = 1e-38 + (draw + 16 * SALT) * 1e-40

            @jax.jit
            def once(params, buffers, bn_state, feats, raw, si):
                scene, _ = forward_backbone(params, buffers, bn_state, pyr,
                                            feats, raw, si, training=False,
                                            cfg=mcfg)
                return jnp.sum(scene.mask_feat.astype(jnp.float32)) * eps

            def timed():
                import time
                t0 = time.time()
                fence(once(params, buffers, bn_state, feats_dev, raw_dev,
                           si_dev))
                return 1000 * (time.time() - t0)

            return timed

        return min_over_draws(make_timed, label)

    def backbone_args_variant(label, banded, loop_iters):
        """pyr passed as jit arguments (production form, engine._backbone)."""
        bb = dataclasses.replace(cfg.model.backbone, banded_conv=banded,
                                 scan_blocks=None)
        mcfg = dataclasses.replace(cfg.model, backbone=bb)

        def make_timed(draw):
            eps = 1e-38 + (draw + 16 * SALT) * 1e-40

            @jax.jit
            def once(params, buffers, bn_state, pyr, feats, raw, si):
                scene, _ = forward_backbone(params, buffers, bn_state, pyr,
                                            feats, raw, si, training=False,
                                            cfg=mcfg)
                return jnp.sum(scene.mask_feat.astype(jnp.float32)) * eps

            @jax.jit
            def loop(params, buffers, bn_state, pyr, feats, raw, si):
                def body(_, f):
                    scene, _ = forward_backbone(params, buffers, bn_state,
                                                pyr, f, raw, si,
                                                training=False, cfg=mcfg)
                    s = jnp.sum(scene.mask_feat.astype(jnp.float32))
                    return f * (1.0 + s * eps)

                f = jax.lax.fori_loop(0, loop_iters, body, feats)
                return jnp.sum(f) * eps

            def timed():
                import time
                t0 = time.time()
                if loop_iters:
                    fence(loop(params, buffers, bn_state, pyr, feats_dev,
                               raw_dev, si_dev))
                    return 1000 * (time.time() - t0) / loop_iters
                fence(once(params, buffers, bn_state, pyr, feats_dev,
                           raw_dev, si_dev))
                return 1000 * (time.time() - t0)

            return timed

        return min_over_draws(make_timed, label)

    results = {}
    if "A" in which:
        results["A scan path (banded off)"] = backbone_variant(
            "A: banded OFF", False, None)
    if "B" in which:
        results["B banded + scan_blocks"] = backbone_variant(
            "B: banded ON, scan_blocks ON", True, True)
    if "C" in which:
        results["C banded, unrolled blocks"] = backbone_variant(
            "C: banded ON, scan_blocks OFF", True, False)

    if "F" in which:
        results["F scan, pyr args, per-call"] = backbone_args_variant(
            "F: scan, args, per-call", False, 0)
    if "G" in which:
        results["G scan, pyr args, loop x4"] = backbone_args_variant(
            "G: scan, args, loop x4", False, 4)
    if "H" in which:
        results["H banded, pyr args, per-call"] = backbone_args_variant(
            "H: banded, args, per-call", True, 0)
    if "I" in which:
        results["I banded, pyr args, loop x4"] = backbone_args_variant(
            "I: banded, args, loop x4", True, 4)
    # Kn: ASYNC-CHAINED host dispatches — n calls whose inputs chain via a
    # denormal eps, fenced ONCE at the end. If the runtime pipelines the
    # per-dispatch overhead under execution, per-iter ~= the in-graph T and
    # the form is valid for programs too big to wrap in fori_loop (the
    # train step overflows the compile relay's request limit at ~1 MB
    # MLIR, HTTP 413).
    for tok in sorted(which):
        if tok.startswith("K"):
            n_chain = int(tok[1:])

            def make_chain(draw):
                eps = 1e-38 + (draw + 16 * SALT) * 1e-40

                @jax.jit
                def once(params, buffers, bn_state, pyr, feats, raw, si):
                    scene, _ = forward_backbone(params, buffers, bn_state,
                                                pyr, feats, raw, si,
                                                training=False,
                                                cfg=cfg.model)
                    s = jnp.sum(scene.mask_feat.astype(jnp.float32))
                    return feats * (1.0 + s * eps)

                def timed():
                    import time
                    t0 = time.time()
                    f = feats_dev
                    for _ in range(n_chain):
                        f = once(params, buffers, bn_state, pyr, f,
                                 raw_dev, si_dev)
                    fence(f)
                    return 1000 * (time.time() - t0) / n_chain

                return timed

            # plain per-rep scalar: reuse min_over_draws is (loop_fn,args)
            # shaped now, so run draws inline here
            vals = []
            for draw in range(2):
                timed = make_chain(draw)
                import time as _t
                t0 = _t.time()
                timed()
                print(f"K{n_chain} draw {draw}: compile+first "
                      f"{_t.time() - t0:.1f}s", file=sys.stderr)
                reps = [timed() for _ in range(3)]
                vals.append(float(np.median(reps)))
                print(f"K{n_chain} draw {draw}: steady {vals[-1]:.2f} "
                      f"ms/iter (reps {[f'{r:.1f}' for r in reps]})",
                      file=sys.stderr)
            results[f"K async chain x{n_chain}"] = min(vals)

    # dispatch-cost model check: t(N) = T + B/N (B = per-dispatch overhead
    # ~ executable size / tunnel bandwidth; T = true steady per-iteration).
    # Jn / Ln sweep N for the scan / banded paths.
    for tok in sorted(which):
        if tok.startswith("J"):
            n = int(tok[1:])
            results[f"J scan, loop x{n}"] = backbone_args_variant(
                f"J: scan, args, loop x{n}", False, n)
        if tok.startswith("L"):
            n = int(tok[1:])
            results[f"L banded, loop x{n}"] = backbone_args_variant(
                f"L: banded, args, loop x{n}", True, n)

    if "D" in which:
        from agile3d_tpu.ops.banded_conv import banded_conv

        lv0 = pyr.levels[0]
        assert lv0.blo is not None, "bench scene lost its banded aux"
        cin = 96
        x = jnp.asarray(rng.standard_normal((lv0.k3.shape[0], cin)),
                        jnp.float32)
        w = jnp.asarray(rng.standard_normal((27, cin, cin)) * 0.05,
                        jnp.float32)
        k3 = jnp.asarray(lv0.k3)
        blo = jnp.asarray(lv0.blo)
        bw0 = jnp.asarray(lv0.bw0)

        def make_timed(draw):
            eps = 1e-38 + (draw + 16 * SALT) * 1e-40

            @jax.jit
            def once(x):
                return jnp.sum(banded_conv(x, k3, blo, bw0, w)) * eps

            def timed():
                import time
                t0 = time.time()
                fence(once(x))
                return 1000 * (time.time() - t0)

            return timed

        results["D one banded conv (lv0, 96ch)"] = min_over_draws(
            make_timed, "D: standalone banded conv")

    fm_iters = [20 if t == "E" else int(t[1:])
                for t in which if t.startswith("E")]
    if fm_iters:
        from agile3d_tpu.models.agile3d import ClickState, forward_mask

        scene, _ = engine._backbone(params, buffers, bn_state, pyr,
                                    feats_dev, raw_dev, si_dev,
                                    training=False)
        clicks = HostClicks(cfg.model.max_clicks)
        cl_vox = rng.integers(0, n_valid, 24).astype(np.int32)
        cl_obj = np.tile(np.arange(8, dtype=np.int32) + 1, 3)[:24]
        clicks.extend(NewClicks(cl_vox, cl_obj,
                                np.arange(24, dtype=np.int32)))
        mc = engine._click_bucket(clicks.count)
        cs = ClickState(vox=jnp.asarray(clicks.vox[None, :mc]),
                        obj=jnp.asarray(clicks.obj[None, :mc]),
                        time=jnp.asarray(clicks.time[None, :mc]))
        num_obj_dev = jnp.asarray([8], jnp.int32)

        def make_fm_timed(fm_n):
            def make_timed(draw):
                eps = 1e-38 + (draw + 16 * SALT) * 1e-40

                @jax.jit
                def loop(params, buffers, scene, cs, num_obj):
                    def body(_, feat):
                        sc = scene._replace(mask_feat=feat)
                        out = forward_mask(params, buffers, sc, cs, num_obj,
                                           cfg=cfg.model)
                        pred = jnp.argmax(out["pred_masks"], -1)
                        return feat + pred[..., :1].astype(jnp.float32) * eps

                    return jax.lax.fori_loop(0, fm_n, body, scene.mask_feat)

                def timed():
                    import time
                    t0 = time.time()
                    fence(loop(params, buffers, scene, cs, num_obj_dev))
                    return 1000 * (time.time() - t0) / fm_n

                return timed

            return make_timed

        for fm_n in fm_iters:
            results[f"E forward_mask x{fm_n}"] = min_over_draws(
                make_fm_timed(fm_n), f"E: forward_mask x{fm_n}")

    print("\n=== summary (min over independent compiles) ===")
    for k, v in results.items():
        print(f"  {k}: {v:.2f} ms")


if __name__ == "__main__":
    main()
