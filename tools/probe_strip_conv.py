"""On-chip A/B of one k3 sparse conv: direct gather-GEMM scan vs strip
gathers, on the real bench-scale scene (the go/no-go measurement for the
strip-conv backbone default). Also times the k5 stem both ways.

Usage: python tools/probe_strip_conv.py [--impl scan|strips|both] [--n 400000]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from agile3d_tpu.config import Config
from agile3d_tpu.ops.sparse_conv import sparse_conv, sparse_conv_strips
from agile3d_tpu.sparse import build_pyramid, pad_pyramid
from agile3d_tpu.sparse.quantize import sparse_quantize
from agile3d_tpu.data.synthetic import make_scene


def fence(v):
    return float(v.reshape(-1)[0].astype("float32"))


def timed_loop(fn, x, iters=10):
    @jax.jit
    def loop(x):
        def body(i, f):
            out = fn(f * (1.0 + 1e-38))
            return x * (1.0 + out.reshape(-1)[0] * 1e-38)
        return jax.lax.fori_loop(0, iters, body, x)

    t0 = time.time(); fence(loop(x)); t1 = time.time()
    ts = []
    for _ in range(3):
        a = time.time(); fence(loop(x)); ts.append((time.time() - a) / iters)
    return t1 - t0, min(ts) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="both")
    ap.add_argument("--n", type=int, default=400000)
    args = ap.parse_args()

    cfg = Config()
    rng = np.random.default_rng(0)
    coords, colors, labels = make_scene(rng, n_points=args.n, num_obj=8,
                                        extent=8.0)
    coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
    vox, _, _ = sparse_quantize(coords, cfg.model.voxel_size)
    pyr = pad_pyramid(build_pyramid(vox), buckets=cfg.buckets)
    lvl = pyr.levels[0]
    n = lvl.grid.shape[0]
    print(f"scene: {len(vox)} voxels (bucket {n})", file=sys.stderr)

    k3 = jnp.asarray(lvl.k3)
    k5 = jnp.asarray(lvl.k5)
    x96 = jnp.asarray(rng.standard_normal((n, 96)).astype(np.float32))
    x3 = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    w96 = jnp.asarray(rng.standard_normal((27, 96, 96)).astype(np.float32) * 0.05)
    w5 = jnp.asarray(rng.standard_normal((125, 3, 32)).astype(np.float32) * 0.05)

    runs = []
    if args.impl in ("scan", "both"):
        runs += [("k3 96->96 scan", lambda f: sparse_conv(f, k3, w96, unroll=False)),
                 ("k5  3->32 scan", lambda f: sparse_conv(f, k5, w5, unroll=False))]
    if args.impl in ("strips", "both"):
        runs += [("k3 96->96 strips", lambda f: sparse_conv_strips(f, k3, w96, 3)),
                 ("k5  3->32 strips", lambda f: sparse_conv_strips(f, k5, w5, 5))]

    for name, fn in runs:
        x = x3 if "3->" in name else x96
        c, s = timed_loop(fn, x)
        print(f"{name}: compile {c:.1f}s steady {s:.2f} ms")


if __name__ == "__main__":
    main()
