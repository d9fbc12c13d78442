"""Per-chip memory of the voxel-sharded backbone vs single-chip.

VERDICT r3 next #2 'done' criterion: a measured per-chip HBM reduction at
the 1M-voxel bucket. Both programs are COMPILED (not executed) on the same
backend and XLA's memory analysis reports per-device buffer requirements —
temp (activations/workspace) + arguments (weights, features, kernel maps)
+ output. On the 8-virtual-device CPU mesh the analysis is per PARTICIPANT,
i.e. what one chip of an 8-chip slice would hold.

    python tools/measure_sp_hbm.py --points 4000000 --extent 60 [--sp 8]
"""

import argparse
import os
import sys
import time


def fmt(b):
    return f"{b / 2**30:.2f} GiB"


def report(label, mem):
    tot = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
           + mem.output_size_in_bytes)
    print(f"{label}: temp {fmt(mem.temp_size_in_bytes)} + args "
          f"{fmt(mem.argument_size_in_bytes)} + out "
          f"{fmt(mem.output_size_in_bytes)} = {fmt(tot)} per device",
          flush=True)
    return tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=4_000_000)
    ap.add_argument("--extent", type=float, default=60.0)
    ap.add_argument("--sp", type=int, default=8)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.sp}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from agile3d_tpu.config import Config, DEFAULT_VOXEL_BUCKETS
    from agile3d_tpu.data.datasets import SceneSample, collate_scenes
    from agile3d_tpu.models.agile3d import forward_backbone, init_agile3d
    from agile3d_tpu.parallel import make_mesh
    from agile3d_tpu.parallel.sp_backbone import (
        make_forward_backbone_sp, partition_pyramid)
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from agile3d_tpu.data.synthetic import make_scene

    cfg = Config(buckets=tuple(DEFAULT_VOXEL_BUCKETS) + (1572864, 2097152))
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
        click_idx={}, scene_name="hbm", num_obj=10)
    batch = collate_scenes([sample], cfg.buckets)
    n_pad = batch.pyramid.levels[0].grid.shape[0]
    print(f"scene: {len(vox)} voxels (padded {n_pad}); host prep "
          f"{time.time() - t0:.1f}s", flush=True)

    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0), cfg.model)

    # --- single chip ---
    t0 = time.time()
    single = jax.jit(lambda p, bf, bs, f, r, si: forward_backbone(
        p, bf, bs, batch.pyramid, f, r, si, training=False, cfg=cfg.model))
    c_single = single.lower(
        params, buffers, bn_state, jnp.zeros((n_pad, 3), jnp.float32),
        jnp.zeros((n_pad, 3), jnp.float32),
        jnp.zeros((1, n_pad), jnp.int32)).compile()
    print(f"single-chip compile {time.time() - t0:.0f}s", flush=True)
    tot_single = report("single-chip backbone", c_single.memory_analysis())

    # --- sp sharded ---
    t0 = time.time()
    sp_pyr = partition_pyramid(batch.pyramid, args.sp)
    h0 = sp_pyr.levels[0].halo_src.reshape(args.sp, -1).shape[1]
    print(f"partition {time.time() - t0:.1f}s; level-0 halo {h0} rows "
          f"({100 * h0 / n_pad:.1f}% of N)", flush=True)
    mesh = make_mesh(n_dp=1, n_sp=args.sp)
    fwd_sp = make_forward_backbone_sp(mesh, cfg.model)
    t0 = time.time()
    c_sp = fwd_sp.lower(
        params, buffers, bn_state, sp_pyr,
        jnp.zeros((n_pad, 3), jnp.float32),
        jnp.zeros((n_pad, 3), jnp.float32)).compile()
    print(f"sp compile {time.time() - t0:.0f}s", flush=True)
    tot_sp = report(f"sp={args.sp} backbone", c_sp.memory_analysis())

    print(f"per-chip reduction: {tot_single / max(tot_sp, 1):.2f}x "
          f"({fmt(tot_single)} -> {fmt(tot_sp)})", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
