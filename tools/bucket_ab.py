"""Same-session bucket A/B sweep: pin or refute the large-bucket backbone
cliff (VERDICT r4 task 3).

Round 4 observed ~3x worse per-voxel backbone cost at the 786k bucket vs
196k, measured across different sessions, and PERF.md hedged it as
"order-of-magnitude" due to tunnel variance. This tool removes the
confound: ONE process, ONE master scene subsampled to each bucket's
occupancy, every bucket timed with the same two-length dispatch-overhead
extrapolation bench.py uses, and the WHOLE sweep run twice (pass A, then
pass B, interleaved compiles long gone) so environment drift between the
passes is visible per bucket.

Usage: python tools/bucket_ab.py [--buckets 196608,262144,393216,524288,786432]
Prints a table + one JSON line {bucket: {valid, A_ms, B_ms, ms_per_mvox}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time  # noqa: F401  (kept for parity with bench timing imports)

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default="196608,262144,393216,524288,786432")
    ap.add_argument("--fill", type=float, default=0.92,
                    help="valid-voxel fraction of each bucket")
    ap.add_argument("--n1", type=int, default=4)
    ap.add_argument("--n2", type=int, default=32)
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="backbone compute dtype (bfloat16 = the roofline "
                         "lever (b): halves stream + granule bytes)")
    ap.add_argument("--mode", default="subsample",
                    choices=("subsample", "crop"),
                    help="subsample: random voxel subsets of the master "
                         "(fixed extent, density shrinks with the bucket); "
                         "crop: spatial sub-boxes (fixed density, extent "
                         "grows with the bucket — the clean control for "
                         "'is per-voxel cost flat in N')")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    targets = [int(b) for b in args.buckets.split(",")]

    import jax
    import jax.numpy as jnp

    from agile3d_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import min_over_draws
    from agile3d_tpu.config import Config
    from agile3d_tpu.data.synthetic import make_scene
    from agile3d_tpu.models.backbone import backbone_forward, init_backbone
    from agile3d_tpu.sparse import build_pyramid, pad_pyramid
    from agile3d_tpu.sparse.grid import pad_features
    from agile3d_tpu.sparse.quantize import sparse_quantize

    cfg = Config()
    bcfg = cfg.model.backbone

    # master scene: enough unique voxels to fill the largest target
    need = int(max(targets) * args.fill)
    rng = np.random.default_rng(0)
    n_pts, extent = 1_600_000, 70.0
    coords, colors, _ = make_scene(rng, n_points=n_pts, num_obj=8,
                                   extent=extent)
    coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
    vox, umap, _ = sparse_quantize(coords, cfg.model.voxel_size)
    while len(vox) < need:   # grow extent until the master is big enough
        extent *= 1.3
        coords, colors, _ = make_scene(rng, n_points=n_pts, num_obj=8,
                                       extent=extent)
        coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
        vox, umap, _ = sparse_quantize(coords, cfg.model.voxel_size)
    feats_all = colors[umap].astype(np.float32) / 255.0
    print(f"master scene: {len(vox)} voxels (extent {extent:.0f})",
          file=sys.stderr)

    params, state = init_backbone(jax.random.PRNGKey(0), bcfg)

    # per-bucket padded pyramids from nested subsamples of the master
    prepared = {}
    order = rng.permutation(len(vox))
    for b in targets:
        want = int(b * args.fill)
        if args.mode == "crop":
            # smallest axis-0 prefix slab holding `want` voxels: a spatial
            # crop, so local density (and kernel-map occupancy per voxel)
            # matches the master everywhere in the sweep
            xs = np.sort(vox[:, 0])
            cut = xs[min(want, len(xs)) - 1]
            inside = np.where(vox[:, 0] <= cut)[0]
            take = np.sort(rng.permutation(inside)[:want])
        else:
            take = np.sort(order[:want])
        pyr = pad_pyramid(build_pyramid(vox[take]), buckets=cfg.buckets)
        n0 = pyr.levels[0].grid.shape[0]
        assert n0 == b, (n0, b)
        x = jnp.asarray(pad_features(feats_all[take], n0))
        prepared[b] = (pyr, x, len(take))
        print(f"bucket {b}: {len(take)} valid voxels", file=sys.stderr)

    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    known_T = {}        # per-bucket T from an earlier pass
    last_T_ms = [1.0]   # largest T seen so far in THIS pass (ascending)

    def time_bucket(b, tag):
        pyr, x, _ = prepared[b]

        def make_loop(draw):
            eps = 1e-38 + draw * 1e-40

            # pyr rides as a jit ARGUMENT: closure-captured kernel maps
            # serialize into the lowered MLIR as literal constants and the
            # axon compile relay rejects the program with HTTP 413
            # (same constraint as bench_train.py's train loop)
            @jax.jit
            def loop(params, state, pyr, x, n):
                def body(_, f):
                    fm, _ = backbone_forward(params, state, pyr, f,
                                             training=False, cfg=bcfg,
                                             compute_dtype=compute_dtype)
                    s = jnp.sum(fm[-1].astype(jnp.float32))
                    return x * (1.0 + s * eps)

                return jnp.sum(jax.lax.fori_loop(0, n, body, x)) * eps

            return loop, (params, state, pyr, x)

        # Probe per-iteration cost with the draw-0 program (n is a traced
        # argument, so n=1/n=2 reuse one compile), then cap the dispatch
        # length: this environment's relay kills any single dispatch
        # running past ~70-80 s (measured: 28 iter x 2.3 s = 65.6 s ok,
        # 30 iter crashed the TPU worker at 88 s), so n2 targets <= ~40 s.
        # fence by VALUE fetch, not block_until_ready: through the axon
        # relay block_until_ready returns before device completion
        # (measured: n=8 "completing" in 150 ms where the fenced harness
        # sees 4.3 s); pulling the scalar to host is the only real fence
        # (same discipline as bench.fence)
        loop0, a0 = make_loop(0)
        import time as _t

        float(loop0(*a0, jnp.asarray(1, jnp.int32)))  # compile + warm
        t0 = _t.time()
        float(loop0(*a0, jnp.asarray(1, jnp.int32)))
        w1 = _t.time() - t0
        t0 = _t.time()
        float(loop0(*a0, jnp.asarray(3, jnp.int32)))
        w3 = _t.time() - t0
        est_ms = max((w3 - w1) / 2 * 1e3, 1.0)  # T ~ (w3 - w1) / 2
        # the relay probe is occasionally flaky (queue coalescing makes
        # w3 ~ w1); floor the estimate with 1.6x the previous (smaller)
        # bucket's measured T so a bad probe can never pick a dispatch
        # length that trips the ~70-80 s relay watchdog
        est_eff = max(est_ms, 1.6 * last_T_ms[0], known_T.get(b, 0.0))
        n2 = int(max(8, min(args.n2, 40_000 / est_eff)))
        n1 = max(2, n2 // 8)
        print(f"{tag}/bucket{b}: est {est_ms:.0f} ms/iter (eff "
              f"{est_eff:.0f}) -> lengths ({n1}, {n2})",
              file=sys.stderr, flush=True)

        stats = {}
        ms = min_over_draws(make_loop, f"{tag}/bucket{b}", n1, n2, stats)
        last_T_ms[0] = max(last_T_ms[0], ms)
        known_T[b] = ms
        return ms, stats

    results = {b: {"valid": prepared[b][2]} for b in targets}
    for tag in ("A", "B"):
        last_T_ms[0] = 1.0
        for b in targets:
            ms, stats = time_bucket(b, tag)
            results[b][f"{tag}_ms"] = round(ms, 2)
            results[b][f"{tag}_draws"] = stats.get("draws", [])

    print(f"\n{'bucket':>8} {'valid':>8} {'A ms':>9} {'B ms':>9} "
          f"{'A ms/Mvox':>10} {'B ms/Mvox':>10} {'B/A':>6}", file=sys.stderr)
    for b in targets:
        r = results[b]
        r["A_ms_per_mvox"] = round(r["A_ms"] / (r["valid"] / 1e6), 2)
        r["B_ms_per_mvox"] = round(r["B_ms"] / (r["valid"] / 1e6), 2)
        print(f"{b:>8} {r['valid']:>8} {r['A_ms']:>9} {r['B_ms']:>9} "
              f"{r['A_ms_per_mvox']:>10} {r['B_ms_per_mvox']:>10} "
              f"{r['B_ms'] / r['A_ms']:>6.2f}", file=sys.stderr)

    line = json.dumps({str(b): {k: v for k, v in results[b].items()
                                if not k.endswith("_draws")}
                       for b in targets})
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
