"""Decoder dtype / precision / attention-chunk sweep on the real chip.

Findings (PERF.md round-2 "decoder is HBM-bound" section): default-
precision f32 matmuls already run single bf16 MXU passes, so the decoder's
cost is HBM traffic on the materialized [B, H, Q, N] logits — the chunked
online-softmax scan removes it (15.0 -> 10.1 ms at the 185k-voxel bench
scale) and _pick_attn_chunk now selects it by default. This probe measures
forward_mask under (a) f32 dense, (b) all-bf16 dense, (c) f32 at forced
matmul precisions, (d) the chunk-size ladder in both dtypes.

Usage: python tools/probe_decoder_bf16.py [n_points] [n_clicks] [extent]
       [chunks_only]

extent scales the synthetic scene footprint (8.0 = the 185k-voxel bench
scene at 400k points; 22.0 at 1.2M points = the 670k-voxel KITTI stress
scene). chunks_only=1 skips the dense variants — at >= 512k voxels the
dense [B,H,Q,N] logits are multi-GB and only the scan paths matter.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0].astype("float32"))


def main():
    import jax
    import jax.numpy as jnp

    from agile3d_tpu.config import Config
    from agile3d_tpu.engine.eval import InteractiveEngine
    from agile3d_tpu.engine.clicks import HostClicks, NewClicks
    from agile3d_tpu.models.agile3d import (ClickState, forward_mask,
                                            init_agile3d)
    from agile3d_tpu.data.datasets import SceneSample, collate_scenes
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from agile3d_tpu.data.synthetic import make_scene

    cfg = Config()
    rng = np.random.default_rng(0)
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
    n_clicks = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    extent = float(sys.argv[3]) if len(sys.argv) > 3 else 8.0
    chunks_only = len(sys.argv) > 4 and sys.argv[4] == "1"
    coords, colors, labels = make_scene(rng, n_points=n_points, num_obj=8,
                                        extent=extent)
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
    scene, _ = engine._backbone(params, buffers, bn_state, pyr, feats_dev,
                                raw_dev, si_dev, training=False)

    clicks = HostClicks(cfg.model.max_clicks)
    cl_vox = rng.integers(0, n_valid, n_clicks).astype(np.int32)
    cl_obj = np.tile(np.arange(8, dtype=np.int32) + 1,
                     (n_clicks + 7) // 8)[:n_clicks]
    clicks.extend(NewClicks(cl_vox, cl_obj,
                            np.arange(n_clicks, dtype=np.int32)))
    mc = engine._click_bucket(clicks.count)
    cs = ClickState(vox=jnp.asarray(clicks.vox[None, :mc]),
                    obj=jnp.asarray(clicks.obj[None, :mc]),
                    time=jnp.asarray(clicks.time[None, :mc]))
    num_obj_dev = jnp.asarray([8], jnp.int32)
    ITERS = 20

    def timed(tag, fm_params, fm_buffers, fm_scene, precision=None,
              mcfg=None):
        mcfg = mcfg or cfg.model

        def run(params_, buffers_, scene_, cs_, num_obj_):
            def body(_, feat):
                sc = scene_._replace(mask_feat=feat)
                out = forward_mask(params_, buffers_, sc, cs_, num_obj_,
                                   cfg=mcfg)
                pred = jnp.argmax(out["pred_masks"], -1)
                return feat + (pred[..., :1] % 2).astype(feat.dtype) * \
                    jnp.asarray(1e-30, feat.dtype)

            return jax.lax.fori_loop(0, ITERS, body, scene_.mask_feat)

        if precision:
            import functools

            orig = run

            def run(*a, _orig=orig):
                with jax.default_matmul_precision(precision):
                    return _orig(*a)

        loop = jax.jit(run)
        fence(loop(fm_params, fm_buffers, fm_scene, cs, num_obj_dev))
        reps = []
        for _ in range(3):
            t0 = time.time()
            fence(loop(fm_params, fm_buffers, fm_scene, cs, num_obj_dev))
            reps.append(1000 * (time.time() - t0) / ITERS)
        p50 = float(np.median(reps))
        print(f"{tag:32s} {[f'{t:.2f}' for t in reps]} -> {p50:.2f} ms")
        return p50

    if not chunks_only:
        timed("f32 dense", params, buffers, scene)

    to_bf16 = lambda t: jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
    scene_bf = scene._replace(mask_feat=scene.mask_feat.astype(jnp.bfloat16),
                              pos_pcd=scene.pos_pcd.astype(jnp.bfloat16))
    if not chunks_only:
        timed("bf16 dense", to_bf16(params), to_bf16(buffers), scene_bf)
        timed("f32 arrays, matmul bf16", params, buffers, scene,
              precision="bfloat16")
        timed("f32 arrays, matmul f32x3", params, buffers, scene,
              precision="float32")

    # chunked (never-materialize-logits) sweep: force the scan on by
    # zeroing the dense threshold
    import dataclasses

    chunk_ladder = ((16384, 32768, 65536, 131072) if chunks_only
                    else (4096, 8192, 16384, 32768, 65536))
    for chunk in chunk_ladder:
        mcfg = dataclasses.replace(cfg.model, xla_attn_chunk=chunk,
                                   xla_attn_dense_threshold=0)
        timed(f"f32 chunked {chunk}", params, buffers, scene, mcfg=mcfg)
        timed(f"bf16 chunked {chunk}", to_bf16(params), to_bf16(buffers),
              scene_bf, mcfg=mcfg)


if __name__ == "__main__":
    main()
