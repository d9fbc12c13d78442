"""Dump the optimized HLO of one backbone forward (production form: pyramid
as jit arguments) so trace op names (concatenate.675, slice_select_fusion.31,
checkpoint.72, ...) can be attributed to source ops.

Usage: python tools/dump_backbone_hlo.py [out.txt]
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
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/backbone_hlo.txt"
    cfg = BackboneConfig(scan_blocks=True, strip_conv=True)
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

    # EXACTLY trace_backbone.py's loop (pyr closed over) so the optimized
    # op names line up with the captured trace.
    @jax.jit
    def loop(params, state, x):
        def body(i, f):
            fm, _ = backbone_forward(params, state, pyr, f * (1.0 + 1e-38),
                                     training=False, cfg=cfg)
            return x * (1.0 + fm[-1].reshape(-1)[0] * 1e-38)
        return jax.lax.fori_loop(0, ITERS, body, x)

    t0 = time.time()
    compiled = loop.lower(params, state, x).compile()
    print(f"compiled in {time.time()-t0:.1f}s", file=sys.stderr)
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"{len(txt)} bytes -> {out_path}")


if __name__ == "__main__":
    main()
