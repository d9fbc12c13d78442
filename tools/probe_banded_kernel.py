"""Banded windowed-gather Pallas kernel probe for the wide k3 convs.

VERDICT r2 next-step #5. The sorted-row invariant makes every per-offset
gather map strictly monotone and BANDED (tools/probe_banded_spans.py: a
block of consecutive output rows reads a narrow window of input rows).
The round-2 blocker was that Mosaic has no arbitrary dynamic row gather
from VMEM — but it has (a) dynamic-start HBM->VMEM window DMA and (b) the
MXU. This kernel routes the gather THROUGH the MXU:

  per output block of BLOCK_M rows:
    1. DMA the block's input window x[w0 : w0+W] into VMEM (dynamic w0,
       host-precomputed from the maps);
    2. per kernel offset j: slice a SUB_W sub-window at host-precomputed
       lo[i,j], build the one-hot band matrix
       onehot[m, r] = (nbr[m,j] - w0 - lo == r) on the VPU, and gather
       with a [BLOCK_M, SUB_W] @ [SUB_W, C] bf16 matmul, then apply the
       offset's weight — all accumulation in f32.

Exactness: host verifies every present neighbor lands inside its
sub-window (`banded_prep` ok flag); scenes that violate the band bound
fall back to the scan conv. Absent neighbors (-1) give negative rel and
an all-zero one-hot row.

Arithmetic: gather flops = 27 * 2*N*SUB_W*C — at BLOCK_M=128/SUB_W=640,
C=96, N=196k that is ~650 GFLOP of bf16 MXU work (~3.3 ms at peak),
replacing gathers measured at the HBM random-access floor (19.3 ms for
the same conv, PERF.md). Window DMA re-reads ~1.2 GB (~1.5 ms
sequential). Baseline to beat: 19.3 ms.

Usage: python tools/probe_banded_kernel.py [--interpret] [--points N]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK_M = 128
# Measured on the 185k-voxel bench scene (probe_banded_spans + banded_prep):
# per-offset spans at BM=128 are p50 127 / p99 158 / max 555 (the three
# dx-clusters sit ~one x-plane apart), and the per-block UNION window maxes
# at 3874 rows. W covers the union (one DMA per block); SUB_W covers the
# worst per-offset span.
W = 4096          # DMA window rows (bf16: W*C*2 = 768 KB of VMEM at C=96)
SUB_W = 640       # per-offset one-hot band width


def banded_prep(nbr: np.ndarray, n_pad: int,
                block_m=BLOCK_M, w=W, sub_w=SUB_W):
    """Host-side window planning. Returns (w0 [nb], lo [nb, Kpad], sub_ws, ok).

    w0[i]   : first input row of block i's DMA window (into the W-padded x)
    lo[i,j] : sub-window start for offset j, relative to w0[i]
    sub_ws  : per-offset static band width (the sorted order clusters
              spans by |dx|,|dy| of the stencil offset: dz-neighbors are
              rows apart, dx-neighbors a whole xy-plane apart — so a
              per-offset width beats one uniform SUB_W by ~2x in one-hot
              matmul FLOPs). Capped at `sub_w`.
    ok      : every present neighbor lands in [lo, lo+sub_ws[j]) of its
              window
    """
    n, k = nbr.shape
    assert n % block_m == 0
    nb = n // block_m
    cells = nbr.reshape(nb, block_m, k)
    present = cells >= 0
    big = np.int64(1 << 40)
    gmin = np.where(present, cells, big).min(axis=(1, 2))      # [nb]
    gmin = np.where(gmin == big, 0, gmin)
    # HBM window DMA start must be tile-aligned for Mosaic: round down 32.
    w0 = np.clip((gmin // 32) * 32, 0, n_pad).astype(np.int32)  # x padded +W
    rel = cells - w0[:, None, None]
    lo = np.where(present, rel, big).min(axis=1)               # [nb, k]
    lo = np.where(lo == big, 0, lo)
    # Mosaic needs the in-VMEM dynamic slice start sublane-aligned; round
    # down to a 32-row boundary (costs <=31 rows of the band slack).
    lo = (lo // 32) * 32
    hi = np.where(present, rel, -1).max(axis=1)                # [nb, k]
    span = np.where(hi >= 0, hi - lo + 1, 0).max(axis=0)       # [k]
    sub_ws = np.clip(((span + 31) // 32) * 32, 64, sub_w).astype(int)
    lo = np.minimum(lo, w - sub_ws[None, :])
    lo = np.clip(lo, 0, None).astype(np.int32)
    sub_rel = rel - lo[:, None, :]
    ok = bool(np.all(np.where(present, (sub_rel >= 0)
                              & (sub_rel < sub_ws[None, None, :]), True)))
    kpad = ((k + 31) // 32) * 32
    lo_p = np.zeros((nb, kpad), np.int32)
    lo_p[:, :k] = lo
    return w0, lo_p, [int(s) for s in sub_ws], ok


def make_banded_conv(n: int, k: int, cin: int, cout: int, sub_ws=None,
                     block_m=BLOCK_M, w_win=W, sub_w=SUB_W,
                     interpret=False):
    if sub_ws is None:
        sub_ws = [sub_w] * k
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb = n // block_m
    kpad = ((k + 31) // 32) * 32
    # HBM window DMA slices must be lane-aligned (128): pad cin up.
    cin_p = ((cin + 127) // 128) * 128

    def kernel(w0_ref, x_hbm, nbr_ref, w_ref, out_ref, xwin, sem):
        # nbr_ref lanes [0, kpad) hold neighbor rows; lanes [kpad, 2*kpad)
        # hold the per-offset sub-window starts lo[i, j], broadcast down
        # the block's rows (Mosaic block shapes need the last dim to span
        # the array, so lo rides in the same block as the neighbors).
        # w0_ref / the lo lanes hold row counts in units of 32-row tiles:
        # multiplying by 32 in-kernel lets Mosaic statically prove the
        # dynamic slice starts are tile-aligned (pl.multiple_of hints do
        # not survive into the memref_slice/DMA lowering here).
        # Window DMAs are double-buffered: block i+1's window is issued
        # before block i's compute so the fetch rides under the matmuls.
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        w0 = w0_ref[i] * 32

        def win_dma(blk, buf):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(w0_ref[blk] * 32, w_win), :],
                xwin.at[buf], sem.at[buf])

        @pl.when(i == 0)
        def _():
            win_dma(0, 0).start()

        @pl.when(i + 1 < nb)
        def _():
            win_dma(i + 1, 1 - slot).start()

        win_dma(i, slot).wait()

        nbrs = nbr_ref[:]                                   # [BM, 2*kpad]
        acc = jnp.zeros((block_m, cout), jnp.float32)
        for j in range(k):
            lo = nbrs[0, kpad + j] * 32
            rel = nbrs[:, j] - w0 - lo                      # [BM]
            sub = xwin[slot, pl.ds(lo, sub_ws[j]), :]       # [sub_ws[j], C]
            col = jax.lax.broadcasted_iota(
                jnp.int32, (block_m, sub_ws[j]), 1)
            onehot = (rel[:, None] == col).astype(jnp.bfloat16)
            gathered = jnp.dot(onehot, sub,
                               preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(gathered.astype(jnp.bfloat16), w_ref[j],
                                preferred_element_type=jnp.float32)
        out_ref[:] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # x (HBM)
            pl.BlockSpec((block_m, 2 * kpad), lambda i, w0: (i, 0),
                         memory_space=pltpu.VMEM),          # nbr | lo
            pl.BlockSpec(memory_space=pltpu.VMEM),          # weights
        ],
        out_specs=pl.BlockSpec((block_m, cout), lambda i, w0: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, w_win, cin_p), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, cout), jnp.float32),
        interpret=interpret,
    )

    def conv(x, nbr_aug, w0, wt):
        # x padded with w_win zero rows so window DMA can never run OOB,
        # and with zero cols up to the 128-lane tile for aligned DMA.
        xp = jnp.concatenate(
            [x, jnp.zeros((w_win, x.shape[1]), x.dtype)]).astype(jnp.bfloat16)
        xp = jnp.pad(xp, ((0, 0), (0, cin_p - cin)))
        wp = jnp.pad(wt.astype(jnp.bfloat16), ((0, 0), (0, cin_p - cin),
                                               (0, 0)))
        return call(w0, xp, nbr_aug, wp)

    return conv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=400000)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpreter correctness run")
    args = ap.parse_args()

    if args.interpret:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from agile3d_tpu.config import Config
    from agile3d_tpu.ops.sparse_conv import sparse_conv
    from agile3d_tpu.sparse import build_pyramid, pad_pyramid
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from agile3d_tpu.data.synthetic import make_scene

    cfg = Config()
    rng = np.random.default_rng(0)
    coords, colors, labels = make_scene(rng, n_points=args.points, num_obj=8,
                                        extent=8.0)
    coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
    vox, _, _ = sparse_quantize(coords, cfg.model.voxel_size)
    pyr = pad_pyramid(build_pyramid(vox), buckets=cfg.buckets)
    lvl = pyr.levels[0]
    n = lvl.grid.shape[0]
    print(f"scene {len(vox)} voxels bucket {n}", flush=True)

    nbr = lvl.k3
    w0, lo, sub_ws, ok = banded_prep(nbr, n)
    print(f"per-offset band widths: {sub_ws} (sum {sum(sub_ws)} "
          f"vs uniform {SUB_W * nbr.shape[1]})")
    print(f"banded_prep: blocks {n // BLOCK_M}, W {W}, SUB_W {SUB_W}, "
          f"in-band: {ok}", flush=True)
    if not ok:
        print("band bound violated -> this scene would fall back; "
              "probing anyway for timing (values off for spilled rows)")

    kpad = ((nbr.shape[1] + 31) // 32) * 32
    nbr_pad = np.full((n, kpad), -1, np.int32)
    nbr_pad[:, : nbr.shape[1]] = nbr
    # lane-append per-offset sub-window starts, broadcast down each block
    nbr_aug = np.hstack([nbr_pad, np.repeat(lo // 32, BLOCK_M, axis=0)])

    cin = cout = 96
    x = jnp.asarray(rng.standard_normal((n, cin)).astype(np.float32))
    wt = jnp.asarray(
        rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.05)
    nbr_d = jnp.asarray(nbr_aug)
    w0_d = jnp.asarray(w0 // 32)   # tile units (32-row), see kernel comment
    k3 = jnp.asarray(nbr)

    conv = make_banded_conv(n, 27, cin, cout, sub_ws=sub_ws,
                            interpret=args.interpret)

    a = jax.jit(lambda f: conv(f, nbr_d, w0_d, wt))(x)
    b = jax.jit(lambda f: sparse_conv(f, k3, wt, unroll=False))(x)
    # reference runs f32 activations through default-precision (bf16-pass)
    # matmuls; the kernel rounds activations to bf16 before the one-hot
    # gather, so tolerances are bf16-scale
    diff = float(jnp.abs(a - b).max())
    print(f"banded-kernel maxdiff {diff:.5f} (ref max "
          f"{float(jnp.abs(b).max()):.3f})", flush=True)

    if args.interpret:
        assert diff < 0.5, "interpreter correctness failed"
        print("interpreter correctness OK")
        return

    import importlib

    probe = importlib.import_module("tools.probe_packed_bf16")
    probe.timeit("k3 96->96 scan f32     ",
                 lambda f: sparse_conv(f, k3, wt, unroll=False), x)
    probe.timeit("k3 96->96 banded kernel",
                 lambda f: conv(f, nbr_d, w0_d, wt), x)


if __name__ == "__main__":
    main()
