"""Benchmark: p50 per-click forward_mask latency on a ScanNet-scale scene.

The driver-set north star (BASELINE.json) is <50 ms p50 per-click inference
with cached backbone features on one TPU chip. Prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"} where vs_baseline = 50 / p50_ms
(>1 means faster than the target).

Also reports (to stderr) backbone latency and scenes/sec for context.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from agile3d_tpu.config import Config
    from agile3d_tpu.engine.eval import InteractiveEngine
    from agile3d_tpu.engine.clicks import HostClicks, NewClicks
    from agile3d_tpu.models.agile3d import init_agile3d
    from agile3d_tpu.data.datasets import SceneSample, collate_scenes
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from tests.synthetic import make_scene

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

    # backbone (amortized once per scene)
    t0 = time.time()
    scene, _ = engine.run_backbone(params, buffers, bn_state, batch)
    jax.block_until_ready(scene.mask_feat)
    compile_s = time.time() - t0
    bb_times = []
    for _ in range(5):
        t0 = time.time()
        scene, _ = engine.run_backbone(params, buffers, bn_state, batch)
        jax.block_until_ready(scene.mask_feat)
        bb_times.append(time.time() - t0)
    print(f"backbone: compile+run {compile_s:.1f}s, steady "
          f"{1000 * np.median(bb_times):.1f} ms", file=sys.stderr)

    # clicks: a realistic mid-session state (24 clicks over 8 objects)
    clicks = HostClicks(cfg.model.max_clicks)
    cl_vox = rng.integers(0, n_valid, 24).astype(np.int32)
    cl_obj = np.tile(np.arange(8, dtype=np.int32) + 1, 3)[:24]
    clicks.extend(NewClicks(cl_vox, cl_obj, np.arange(24, dtype=np.int32)))

    out, pred = engine.run_mask(params, buffers, scene, clicks, 8)
    jax.block_until_ready(pred)
    times = []
    for _ in range(30):
        t0 = time.time()
        out, pred = engine.run_mask(params, buffers, scene, clicks, 8)
        jax.block_until_ready(pred)
        times.append((time.time() - t0) * 1000)
    p50 = float(np.percentile(times, 50))
    print(f"forward_mask p50 {p50:.2f} ms p90 "
          f"{float(np.percentile(times, 90)):.2f} ms", file=sys.stderr)

    print(json.dumps({
        "metric": "per_click_forward_mask_p50_latency",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(50.0 / p50, 2),
    }))


if __name__ == "__main__":
    main()
