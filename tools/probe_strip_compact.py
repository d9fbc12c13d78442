"""A/B the vectorized strip compaction (sparse_conv_strips.strip_slab).

The round-3 device trace attributed ~55 ms of the 139 ms backbone forward
to the stem's per-cell compaction selects: gg * k(k+1)/2 masked selects,
each materializing a narrow bf16[m, 3] array that the TPU tiles to 128
lanes (~42x physical traffic), plus their [m, 120] concat. The rewrite
does k wide passes over the whole [m, gg, k, cin] slab.

Measures with the bench.py methodology (in-graph fori_loop, two traced
lengths, min over independent compiles):
  stem   — k5 strips 3->32 standalone at the 196k bench bucket
  bb     — full backbone forward (production config)

Usage: python tools/probe_strip_compact.py [stem] [bb]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import min_over_draws, SALT  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from agile3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from agile3d_tpu.config import Config
    from agile3d_tpu.models.backbone import backbone_forward, init_backbone
    from agile3d_tpu.ops.sparse_conv import sparse_conv_strips
    from agile3d_tpu.sparse import build_pyramid, pad_pyramid
    from agile3d_tpu.sparse.grid import pad_features
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from agile3d_tpu.data.synthetic import make_scene

    which = set(sys.argv[1:]) or {"stem", "bb"}

    cfg = Config()
    rng = np.random.default_rng(0)
    coords, colors, labels = make_scene(rng, n_points=400000, num_obj=8,
                                        extent=8.0)
    coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
    vox, umap, _ = sparse_quantize(coords, cfg.model.voxel_size)
    pyr = pad_pyramid(build_pyramid(vox), buckets=cfg.buckets)
    n0 = pyr.levels[0].grid.shape[0]
    x = jnp.asarray(pad_features(colors[umap].astype(np.float32) / 255.0, n0))
    print(f"scene: {len(vox)} voxels, bucket {n0}", file=sys.stderr)

    results = {}

    if "stem" in which:
        k5 = jnp.asarray(pyr.levels[0].k5)
        w = jnp.asarray(
            rng.standard_normal((k5.shape[1], 3, 32)).astype(np.float32)
            * 0.05)

        def make_stem(draw):
            eps = 1e-38 + (draw + 16 * SALT) * 1e-40

            @jax.jit
            def loop(x, k5, w, n):
                def body(_, f):
                    out = sparse_conv_strips(f, k5, w, 5)
                    return f * (1.0 + jnp.sum(out) * eps)

                f = jax.lax.fori_loop(0, n, body, x)
                return jnp.sum(f) * eps

            return loop, (x, k5, w)

        results["stem k5 strips"] = min_over_draws(make_stem, "stem", 4, 32)

    if "stemk" in which:
        from agile3d_tpu.ops.banded_stem import (banded_stem_conv,
                                                 stem_banded_prep)

        lv0 = pyr.levels[0]
        sw0, slo, sr0, srank, sexc, sok = stem_banded_prep(lv0.k5)
        print(f"stem prep ok={sok} exceptions="
              f"{int((sexc[:, 0] >= 0).sum()) if sok else '-'}",
              file=sys.stderr)
        if sok:
            k5 = jnp.asarray(lv0.k5)
            w = jnp.asarray(
                rng.standard_normal((125, 3, 32)).astype(np.float32) * 0.05)
            aux = tuple(jnp.asarray(a) for a in (sr0, srank, sw0, slo, sexc))

            def make_stemk(draw):
                eps = 1e-38 + (draw + 16 * SALT) * 1e-40

                @jax.jit
                def loop(x, aux, w, n):
                    def body(_, f):
                        out = banded_stem_conv(f, *aux, w)
                        return f * (1.0 + jnp.sum(out) * eps)

                    f = jax.lax.fori_loop(0, n, body, x)
                    return jnp.sum(f) * eps

                return loop, (x, aux, w)

            results["stem banded kernel"] = min_over_draws(
                make_stemk, "stemk", 4, 32)

    bb_variants = []
    if "bb" in which:
        bb_variants.append(("backbone", None, "1"))
    if "bb_nostem" in which:       # banded k3 on, stem kernel off (strips)
        bb_variants.append(("backbone stem=strips", None, "0"))
    if "bb_scan" in which:         # round-2 scan path (no Mosaic at all)
        bb_variants.append(("backbone scan", False, "0"))
    if bb_variants:
        import dataclasses

        params, state = init_backbone(jax.random.PRNGKey(0),
                                      cfg.model.backbone)

        def make_bb_variant(bcfg, stem_env):
            def make_bb(draw):
                eps = 1e-38 + (draw + 16 * SALT) * 1e-40
                os.environ["AGILE3D_STEM_BANDED"] = stem_env

                @jax.jit
                def loop(params, state, pyr, x, n):
                    def body(_, f):
                        fm, _ = backbone_forward(params, state, pyr, f,
                                                 training=False, cfg=bcfg)
                        return f * (1.0
                                    + jnp.sum(fm[-1].astype(jnp.float32))
                                    * eps)

                    f = jax.lax.fori_loop(0, n, body, x)
                    return jnp.sum(f) * eps

                return loop, (params, state, pyr, x)

            return make_bb

        for label, banded, stem_env in bb_variants:
            bcfg = (cfg.model.backbone if banded is None else
                    dataclasses.replace(cfg.model.backbone,
                                        banded_conv=banded))
            # env must be set during TRACING (the stem route is a Python
            # branch); make_bb sets it per draw before tracing
            results[label] = min_over_draws(
                make_bb_variant(bcfg, stem_env), label, 16, 128)
        os.environ.pop("AGILE3D_STEM_BANDED", None)

    print("\n=== summary (dispatch-extrapolated T, min over draws) ===")
    for k, v in results.items():
        print(f"  {k}: {v:.2f} ms")


if __name__ == "__main__":
    main()
