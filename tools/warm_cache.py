"""Pre-compile the backbone + decoder for every voxel-size bucket into the
persistent XLA compilation cache (VERDICT round-1 item 4a).

A fresh eval over a varied dataset pays one backbone compile (~172 s on
TPU) per bucket combination it encounters. This tool walks the level-0
bucket ladder once, synthesizing a scene near each bucket's capacity and
compiling backbone + the per-click decoder at the standard click buckets,
so subsequent runs hit the cache (tests/conftest.py and bench.py point
jax at the same .jax_cache).

Usage: python tools/warm_cache.py [--cache_dir .jax_cache] [--max_bucket N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache_dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    ap.add_argument("--max_bucket", type=int, default=262144,
                    help="largest level-0 bucket to warm")
    ap.add_argument("--min_bucket", type=int, default=16384)
    args = ap.parse_args()

    import jax

    if jax.default_backend() == "cpu":
        # XLA:CPU AOT cache entries are keyed without host CPU features and
        # abort on load after a host change (utils/cache.py) — and warming
        # the TPU bucket ladder on CPU is pointless anyway.
        raise SystemExit("warm_cache targets the TPU compile cache; "
                         "refusing to run on the CPU backend")
    jax.config.update("jax_compilation_cache_dir", args.cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from agile3d_tpu.config import Config
    from agile3d_tpu.data.datasets import SceneSample, collate_scenes
    from agile3d_tpu.engine.eval import InteractiveEngine
    from agile3d_tpu.models.agile3d import ClickState, init_agile3d
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from agile3d_tpu.data.synthetic import make_scene

    cfg = Config()
    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0), cfg.model)
    engine = InteractiveEngine(cfg)
    rng = np.random.default_rng(0)

    buckets = [b for b in cfg.buckets
               if args.min_bucket <= b <= args.max_bucket]
    print(f"warming {len(buckets)} level-0 buckets into {args.cache_dir}",
          flush=True)
    for b in buckets:
        # synthesize a scene landing just under bucket b (voxel yield of
        # make_scene at 5 cm is ~45-50% of points at these densities)
        target = int(b * 0.93)
        pts = int(target / 0.45)
        extent = max(4.0, (target * 0.12) ** (1 / 2))  # keep density sane
        coords, colors, labels = make_scene(rng, n_points=pts, num_obj=8,
                                            extent=extent)
        coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
        vox, umap, imap = sparse_quantize(coords, cfg.model.voxel_size)
        if len(vox) > b:
            vox, umap = vox[:b], umap[:b]  # clamp into the bucket
            imap = np.clip(imap, 0, b - 1)
        sample = SceneSample(
            vox_coords=vox, raw_coords=coords[umap],
            feats=colors[umap].astype(np.float32) / 255.0,
            labels=labels[umap].astype(np.int32),
            labels_full=labels.astype(np.int32), inverse_map=imap,
            click_idx={}, scene_name=f"warm{b}", num_obj=8)
        batch = collate_scenes([sample], cfg.buckets)
        got = batch.pyramid.levels[0].grid.shape[0]
        t0 = time.time()
        scene, _ = engine.run_backbone(params, buffers, bn_state, batch)
        jax.block_until_ready(scene.mask_feat)
        t_bb = time.time() - t0
        t0 = time.time()
        for mc in engine.CLICK_BUCKETS:
            if mc > cfg.model.max_clicks:
                break
            cs = ClickState(
                vox=jnp.zeros((1, mc), jnp.int32) - 1,
                obj=jnp.zeros((1, mc), jnp.int32),
                time=jnp.zeros((1, mc), jnp.int32))
            out, _ = engine._mask(params, buffers, scene, cs,
                                  jnp.asarray([8], jnp.int32))
            jax.block_until_ready(out["pred_masks"])
        print(f"bucket {b} (scene {len(vox)} -> padded {got}): backbone "
              f"{t_bb:.1f}s, decoder buckets {time.time()-t0:.1f}s",
              flush=True)
    print("cache warmed.", flush=True)


if __name__ == "__main__":
    main()
