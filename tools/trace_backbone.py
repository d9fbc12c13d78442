"""Capture a device trace of one full backbone forward and attribute device
milliseconds to ops, grouped by output shape row-count (≈ pyramid level).

Usage: python tools/trace_backbone.py [strips01] [outdir]
Then:  python tools/xplane_ops.py <outdir>
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from agile3d_tpu.config import BackboneConfig, Config
from agile3d_tpu.models.backbone import backbone_forward, init_backbone
from agile3d_tpu.sparse import build_pyramid, pad_pyramid
from agile3d_tpu.sparse.grid import pad_features
from agile3d_tpu.sparse.quantize import sparse_quantize
from agile3d_tpu.data.synthetic import make_scene


def main():
    strips = (sys.argv[1] if len(sys.argv) > 1 else "1") == "1"
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/bb_trace_{int(strips)}"
    cfg = BackboneConfig(scan_blocks=True, strip_conv=strips)
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

    # the in-graph repeat loop: the same program bench_backbone_sweep uses —
    # it reliably gets good binaries from the (nondeterministic) compile
    # service, and per-step ops inside the while body are still traced
    @jax.jit
    def loop(params, state, x):
        def body(i, f):
            fm, _ = backbone_forward(params, state, pyr, f * (1.0 + 1e-38),
                                     training=False, cfg=cfg)
            return x * (1.0 + fm[-1].reshape(-1)[0] * 1e-38)
        return jax.lax.fori_loop(0, ITERS, body, x)

    def fence(v):
        return float(v.reshape(-1)[0].astype("float32"))

    t0 = time.time()
    fence(loop(params, state, x))
    print(f"compile+first {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(2):
        a = time.time()
        fence(loop(params, state, x))
        ts.append((time.time() - a) / ITERS * 1e3)
    print(f"steady {min(ts):.1f} ms/call", flush=True)

    with jax.profiler.trace(outdir):
        fence(loop(params, state, x))
    print("trace ->", outdir, flush=True)


if __name__ == "__main__":
    main()
