"""On-chip probe: bf16 packed-strip gathers vs the f32 per-offset scan conv.

Cost model under test (PERF.md round-2 backbone follow-up): TPU gathers are
HBM-GRANULE-bound (~512 B minimum transaction, ~275 M granules/s), not
descriptor- or byte-bound:
  * f32 96-ch rows are 384 B = 1 granule -> the 27-offset scan conv is
    already at the random-access floor for f32;
  * packing the k z-cells of a column into ONE bf16 row (sorted-row
    invariant makes them consecutive; values identical to what the GEMM's
    default bf16 operand rounding produces anyway) cuts granules ~1.5x for
    k3 x 96ch (576 B rows) and ~5x for the k5 stem (30 B rows).

The compile service is nondeterministic (identical programs sometimes get
~80x slower binaries — see PERF.md "tunnel quirks"); every timing compiles
TWICE with a perturbation and reports both.

Usage: python tools/probe_packed_bf16.py [k3|k5|both]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from agile3d_tpu.config import Config
from agile3d_tpu.ops.sparse_conv import sparse_conv
from agile3d_tpu.sparse import build_pyramid, pad_pyramid
from agile3d_tpu.sparse.quantize import sparse_quantize
from agile3d_tpu.data.synthetic import make_scene


def packed_bf16(x, nbr, w, k):
    m, K = nbr.shape
    G = K // k
    cin, cout = w.shape[1], w.shape[2]
    cells = nbr.reshape(m, G, k)
    present = cells >= 0
    r0 = jnp.min(jnp.where(present, cells, m - 1), axis=2).astype(jnp.int32)
    delta = jnp.where(present, cells - r0[:, :, None], -1).astype(jnp.int8)
    xc = x.astype(jnp.bfloat16)
    y = jnp.concatenate([jnp.roll(xc, -d, axis=0) for d in range(k)], 1)
    w_g = w.reshape(G, k * cin, cout).astype(jnp.bfloat16)

    def body(acc, inp):
        r0_g, delta_g, wg = inp
        rows = y[r0_g]
        parts = []
        for j in range(k):
            sel = jnp.zeros((m, cin), jnp.bfloat16)
            for d in range(j + 1):
                sel = jnp.where((delta_g[:, j] == d)[:, None],
                                rows[:, d * cin:(d + 1) * cin], sel)
            parts.append(sel)
        slab = jnp.concatenate(parts, axis=1)
        return acc + jnp.dot(slab, wg, preferred_element_type=jnp.float32), None

    acc, _ = jax.lax.scan(body, jnp.zeros((m, cout), jnp.float32),
                          (r0.T, delta.transpose(1, 0, 2), w_g))
    return acc


def timeit(name, fn, x0, iters=10, reps=2):
    best = None
    msgs = []
    for r in range(reps):
        jf = jax.jit(lambda f, _r=r: fn(f) + 0.0 * _r)
        t0 = time.time()
        jax.block_until_ready(jf(x0))
        tc = time.time() - t0
        t0 = time.time()
        f = x0
        for _ in range(iters):
            y = jf(f)
            f = x0 * (1.0 + y.reshape(-1)[0] * 1e-38)
        float(f.reshape(-1)[0])
        dt = (time.time() - t0) / iters * 1e3
        msgs.append(f"{dt:.1f}ms/compile{tc:.0f}s")
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best:.2f} ms  [{' '.join(msgs)}]", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    cfg = Config()
    rng = np.random.default_rng(0)
    coords, colors, labels = make_scene(rng, n_points=400000, num_obj=8,
                                        extent=8.0)
    coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
    vox, _, _ = sparse_quantize(coords, cfg.model.voxel_size)
    pyr = pad_pyramid(build_pyramid(vox), buckets=cfg.buckets)
    lvl = pyr.levels[0]
    n = lvl.grid.shape[0]
    print(f"scene {len(vox)} voxels bucket {n}", flush=True)

    if which in ("k3", "both"):
        k3 = jnp.asarray(lvl.k3)
        x = jnp.asarray(rng.standard_normal((n, 96)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((27, 96, 96)).astype(np.float32) * 0.05)
        a = jax.jit(lambda f: packed_bf16(f, k3, w, 3))(x)
        b = jax.jit(lambda f: sparse_conv(f, k3, w, unroll=False))(x)
        print("k3 bf16-packed maxdiff", float(jnp.abs(a - b).max()),
              "ref max", float(jnp.abs(b).max()), flush=True)
        timeit("k3 96->96 scan f32   ",
               lambda f: sparse_conv(f, k3, w, unroll=False), x)
        timeit("k3 96->96 packed bf16", lambda f: packed_bf16(f, k3, w, 3), x)
    if which in ("k5", "both"):
        k5 = jnp.asarray(lvl.k5)
        x3 = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
        w5 = jnp.asarray(
            rng.standard_normal((125, 3, 32)).astype(np.float32) * 0.05)
        a = jax.jit(lambda f: packed_bf16(f, k5, w5, 5))(x3)
        b = jax.jit(lambda f: sparse_conv(f, k5, w5, unroll=False))(x3)
        print("k5 bf16-packed maxdiff", float(jnp.abs(a - b).max()),
              "ref max", float(jnp.abs(b).max()), flush=True)
        timeit("k5  3->32 scan f32   ",
               lambda f: sparse_conv(f, k5, w5, unroll=False), x3)
        timeit("k5  3->32 packed bf16", lambda f: packed_bf16(f, k5, w5, 5),
               x3)


if __name__ == "__main__":
    main()
