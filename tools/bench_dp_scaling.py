"""DP epoch-driver scaling table on the virtual CPU mesh (VERDICT r2 #6).

Weak scaling: each dp shard processes the same per-shard workload (1
scene/step), so ideal scaling is flat wall-clock per step as dp grows.
On the 8-virtual-device CPU mesh the devices timeshare the same cores, so
this CANNOT show real speedup — what it validates is that the dp workflow
itself (sharded collation, masked tails, on-device rollout, synchronized
step) adds no super-linear overhead as the mesh widens; the per-step
compute naturally grows ~linearly with dp on shared cores. Real scaling
numbers require a pod.

Run: python tools/bench_dp_scaling.py  (forces the 8-device CPU mesh)
"""

from __future__ import annotations

import os
import random as pyrandom
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    # no persistent cache on CPU: XLA:CPU AOT entries are keyed without
    # host CPU features and abort on load after a host change (conftest.py)

    from agile3d_tpu.config import BackboneConfig, Config, ModelConfig, TrainConfig
    from agile3d_tpu.data.datasets import SceneSample
    from agile3d_tpu.engine.train import make_optimizer
    from agile3d_tpu.models.agile3d import init_agile3d
    from agile3d_tpu.parallel import make_mesh
    from agile3d_tpu.parallel.train import dp_train_one_epoch, make_dp_train_step
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from agile3d_tpu.data.synthetic import make_scene

    small_bb = BackboneConfig(init_dim=8, planes=(8,) * 8, layers=(1,) * 8)
    cfg = Config(model=ModelConfig(max_clicks=32, hidden_dim=32,
                                   dim_feedforward=64, num_heads=2,
                                   backbone=small_bb),
                 train=TrainConfig(batch_size=1, prefetch=2),
                 buckets=(512, 1024, 2048))

    rng = np.random.default_rng(0)
    scenes = []
    for i in range(64):
        coords, colors, labels = make_scene(rng, n_points=900, num_obj=2)
        vox, umap, imap = sparse_quantize(coords, cfg.model.voxel_size)
        scenes.append(SceneSample(
            vox_coords=vox, raw_coords=coords[umap],
            feats=colors[umap].astype(np.float32) / 255.0,
            labels=labels[umap].astype(np.int32),
            labels_full=labels.astype(np.int32), inverse_map=imap,
            click_idx={}, scene_name=f"s{i}", num_obj=2))

    class FixedRng(pyrandom.Random):
        def randint(self, a, b):
            return 2  # fixed rollout length -> one jit variant

    print("dp | scenes/step | steps | epoch wall s | ms/step | scenes/s")
    for d in (1, 2, 4, 8):
        mesh = make_mesh(n_dp=d, n_sp=1)
        params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0),
                                                 cfg.model)
        tx, _ = make_optimizer(cfg, steps_per_epoch=4)
        opt_state = tx.init(params)
        step, shard_fn, _ = make_dp_train_step(cfg, tx, mesh)
        # weak scaling: 8 steps of d scenes each at every width
        steps = 8
        n_scenes = steps * d
        # warm epoch (compiles), then the timed epoch
        for timed in (False, True):
            t0 = time.time()
            params, bn_state, opt_state, stats = dp_train_one_epoch(
                cfg, mesh, params, buffers, bn_state, opt_state, step,
                shard_fn, scenes, epoch=0,
                np_rng=np.random.default_rng(1), py_rng=FixedRng(0),
                log=lambda *a: None, order=np.arange(n_scenes))
            wall = time.time() - t0
        print(f"{d:2d} | {d:11d} | {steps:5d} | {wall:12.1f} | "
              f"{wall / steps * 1000:7.0f} | {n_scenes / wall:8.2f}")


if __name__ == "__main__":
    main()
