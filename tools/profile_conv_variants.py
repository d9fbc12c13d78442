"""Profile sparse-conv variants on the real chip and print per-HLO-op time
from the xplane trace — used to pin down WHICH gather lowerings hit XLA:TPU's
fast path (PERF.md: fused scan-gathers run ~3.6 ns/row; some formulations
fall off a cliff to ~800 ns/row).

Usage: python tools/profile_conv_variants.py [variant ...]
Variants: scan | packed | gatheradd
"""

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from agile3d_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()  # TPU only; CPU AOT cache is host-unsafe

from agile3d_tpu.config import Config
from agile3d_tpu.ops.sparse_conv import sparse_conv
from agile3d_tpu.sparse import build_pyramid, pad_pyramid
from agile3d_tpu.sparse.quantize import sparse_quantize
from agile3d_tpu.data.synthetic import make_scene


def build():
    cfg = Config()
    rng = np.random.default_rng(0)
    coords, colors, labels = make_scene(rng, n_points=400000, num_obj=8,
                                        extent=8.0)
    coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
    vox, _, _ = sparse_quantize(coords, cfg.model.voxel_size)
    pyr = pad_pyramid(build_pyramid(vox), buckets=cfg.buckets)
    return pyr.levels[0], rng


def variants(lvl, rng):
    n = lvl.grid.shape[0]
    k3 = np.asarray(lvl.k3)
    G, k = 9, 3
    cells = k3.reshape(n, G, k)
    present = cells >= 0
    r0 = np.where(present, cells, n).min(axis=2)
    r0 = np.where(present.any(2), r0, n - 1).astype(np.int32)
    delta = np.where(present, cells - r0[:, :, None], -1).astype(np.int32)
    r0T = jnp.asarray(np.ascontiguousarray(r0.T))
    dT = jnp.asarray(np.ascontiguousarray(delta.transpose(1, 0, 2)))
    k3j = jnp.asarray(k3)
    x = jnp.asarray(rng.standard_normal((n, 96)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((27, 96, 96)).astype(np.float32) * 0.05)
    cin = 96

    def packed(x):
        m = x.shape[0]
        y = jnp.concatenate([jnp.roll(x, -d, axis=0) for d in range(k)], 1)
        w_g = w.reshape(G, k * cin, 96)

        def body(acc, inp):
            r0_g, delta_g, wg = inp
            rows = y[r0_g]
            parts = []
            for j in range(k):
                sel = jnp.zeros((m, cin), x.dtype)
                for d in range(j + 1):
                    sel = jnp.where((delta_g[:, j] == d)[:, None],
                                    rows[:, d * cin:(d + 1) * cin], sel)
                parts.append(sel)
            slab = jnp.concatenate(parts, axis=1)
            return acc + jnp.dot(slab, wg,
                                 preferred_element_type=jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.zeros((m, 96), jnp.float32),
                              (r0T, dT, w_g))
        return acc

    def gatheradd(x):
        def body(acc, r0_g):
            return acc + x[r0_g], None
        acc, _ = jax.lax.scan(body, jnp.zeros((n, 96), jnp.float32), r0T)
        return acc

    return {
        "scan": (lambda f: sparse_conv(f, k3j, w, unroll=False), x),
        "packed": (packed, x),
        "gatheradd": (gatheradd, x),
    }


def run_one(name, fn, x, trace_dir):
    jf = jax.jit(fn)
    t0 = time.time()
    jax.block_until_ready(jf(x))
    tc = time.time() - t0
    t0 = time.time()
    f = x
    for _ in range(3):
        y = jf(f)
        f = x * (1.0 + y.reshape(-1)[0] * 1e-38)
    float(f.reshape(-1)[0])
    dt = (time.time() - t0) / 3 * 1e3
    print(f"{name}: {dt:.1f} ms/call (compile {tc:.0f}s)")

    d = os.path.join(trace_dir, name)
    with jax.profiler.trace(d):
        f = x
        for _ in range(3):
            y = jf(f)
            f = x * (1.0 + y.reshape(-1)[0] * 1e-38)
        float(f.reshape(-1)[0])
    return d


def dump_ops(trace_dir, top=18):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("  (no xplane captured)")
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data
        data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats^", {})
        import gzip, json
        try:
            data = gzip.decompress(data)
        except Exception:
            pass
        rows = json.loads(data)
        # format: {..., "data": [ [rank, program, category, name, ..., occurrences, total_time, avg, ...], ...]}
        print("  top HLO ops by total time:")
        body = rows[0]["data"] if isinstance(rows, list) else rows.get("data")
        for r in body[:top]:
            print("   ", r)
    except Exception as e:
        print(f"  (hlo_stats failed: {e}); raw planes: {paths}")


if __name__ == "__main__":
    which = sys.argv[1:] or ["scan", "packed"]
    lvl, rng = build()
    vs = variants(lvl, rng)
    tdir = "/tmp/conv_traces"
    for name in which:
        fn, x = vs[name]
        d = run_one(name, fn, x, tdir)
        dump_ops(d)
