"""Backbone perf sweep on the real chip: conv scan-group width x
scan-over-blocks, measuring cold compile and steady-state forward latency
(VERDICT round-1 item 4). Each configuration runs in a fresh subprocess so
jit caches and env overrides can't leak between points.

Usage: python tools/bench_backbone_sweep.py [--groups 4,9,14,27]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

CHILD = r"""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, os.environ["AGILE3D_REPO"])
from agile3d_tpu.config import BackboneConfig, Config
from agile3d_tpu.models.backbone import backbone_forward, init_backbone
from agile3d_tpu.sparse import build_pyramid, pad_pyramid
from agile3d_tpu.sparse.grid import pad_features
from agile3d_tpu.sparse.quantize import sparse_quantize
from agile3d_tpu.data.synthetic import make_scene

scan_blocks = os.environ.get("AGILE3D_SCAN_BLOCKS") == "1"
strip_conv = os.environ.get("AGILE3D_STRIP_CONV", "1") == "1"
cfg = BackboneConfig(scan_blocks=scan_blocks, strip_conv=strip_conv)
rng = np.random.default_rng(0)
coords, colors, labels = make_scene(rng, n_points=400000, num_obj=8,
                                    extent=8.0)
coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
vox, umap, _ = sparse_quantize(coords, 0.05)
pyr = pad_pyramid(build_pyramid(vox), buckets=Config().buckets)
n0 = pyr.levels[0].grid.shape[0]
x = jnp.asarray(pad_features(colors[umap].astype(np.float32) / 255.0, n0))
params, state = init_backbone(jax.random.PRNGKey(0), cfg)

ITERS = 5

@jax.jit
def loop(params, state, x):
    def body(i, f):
        fm, _ = backbone_forward(params, state, pyr,
                                 f * (1.0 + 1e-38), training=False, cfg=cfg)
        out = fm[-1]
        return x * (1.0 + out.reshape(-1)[0] * 1e-38)
    return jax.lax.fori_loop(0, ITERS, body, x)

def fence(v):
    return float(v.reshape(-1)[0].astype("float32"))

t0 = time.time(); fence(loop(params, state, x)); t1 = time.time()
ts = []
for _ in range(3):
    a = time.time(); fence(loop(params, state, x)); ts.append(
        (time.time() - a) / ITERS * 1e3)
print(f"RESULT group={os.environ.get('AGILE3D_SCAN_GROUP','4')} "
      f"scan_blocks={int(scan_blocks)} strips={int(strip_conv)} "
      f"strip_group={os.environ.get('AGILE3D_STRIP_GROUP','auto')} "
      f"voxels={len(vox)} "
      f"compile={t1-t0:.1f}s steady={min(ts):.1f}ms")
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", default="4,9,14")
    ap.add_argument("--scan_blocks", default="0,1")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for g in args.groups.split(","):
        for sb in args.scan_blocks.split(","):
            env = dict(os.environ)
            env.update(AGILE3D_SCAN_GROUP=g, AGILE3D_SCAN_BLOCKS=sb,
                       AGILE3D_REPO=repo)
            # throwaway compile cache: honest cold-compile numbers
            env.pop("JAX_COMPILATION_CACHE_DIR", None)
            r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                               cwd=repo, capture_output=True, text=True,
                               timeout=3000)
            for line in r.stdout.splitlines():
                if line.startswith("RESULT"):
                    print(line, flush=True)
            if r.returncode != 0:
                print(f"group={g} scan_blocks={sb} FAILED:\n"
                      + r.stderr[-2000:], flush=True)


if __name__ == "__main__":
    main()
