"""Banded windowed-gather k5 STEM conv — Mosaic kernel for the 3->32
first-layer conv (reference res16unet.py stem, conv1 kernel 5).

Why the stem needs its own kernel: the k3 banded kernel's per-offset
one-hot matmuls cost ~2*N*sum_W*cin_p FLOPs with cin_p = 128 lanes; at
cin = 3 and 125 offsets that padding is ruinous. The packed-STRIP
formulation fixes it: the sorted-row invariant makes each (dx, dy) column's
<=5 present cells CONSECUTIVE rows, so the packed array
``y[r] = [x[r] | x[r+1] | ... | x[r+4]]`` ([N, 15]) holds a whole strip per
row, and the stem becomes 25 strip gathers instead of 125 cell gathers.

The XLA strips path (ops.sparse_conv.sparse_conv_strips) pays two platform
taxes this kernel removes (PERF.md round 3):
  * each strip gather is HBM random access (~1 granule/row — the ~18 ms
    floor measured in round 2), and
  * the present-cell -> kernel-cell compaction materializes narrow
    [N, 3] selects that the TPU tiles to 128 lanes (~42x traffic) — the
    round-3 device trace attributed ~55 ms of the 139 ms backbone to them.

Kernel shape (per BLOCK_M-row output block, grid over blocks):
  1. double-buffered HBM->VMEM window DMA of the packed y
     (``[w0 : w0+W_WIN, 0:128]`` bf16; w0 host-precomputed, 32-aligned);
  2. per strip group g (25, Python-unrolled): a one-hot band matmul
     gathers strip starts ``r0`` from a per-group static sub-window
     (widths cluster by the offset's dx: dz/dy neighbors are a z-run away,
     dx neighbors an xy-plane away — tools/probe_stem_spans.py), then one
     [128, 128] placement matmul drops the 15 packed lanes into the
     group's 16-lane section of a 4x8-group slab;
  3. per 8-group chunk: cell compaction (packed slot d -> kernel cell j,
     where slot = the cell's row offset from the strip start) as 5 static
     shift matmuls + VPU masks against a host-precomputed per-lane rank
     map — entirely VMEM-resident, no narrow materialization;
  4. one [128, 128] x [128, cout] contraction per chunk against weights
     laid out in (group-section, cell, cin) order; f32 accumulation.

Exactness: host prep validates every present strip start lands in its
static band (else returns no aux and the backbone falls back to the XLA
strips path for that scene via the jit pytree-structure key). Absent
strips get rel < 0 -> an all-zero one-hot row; absent cells have rank -1
which no compaction mask matches; pad voxels have no present cells, so
their output rows are exactly 0 (zero-pad invariant).

Supersedes the gather+compaction of the reference's stem
MinkowskiConvolution(kernel_size=5) (/root/reference/models/res16unet.py
stem; modules/common.py:125-155). Eval path only — training keeps the XLA
strips conv (native VJP; the banded train-memory cap applies to Mosaic
operands, see models/backbone.py).
"""

from __future__ import annotations

import functools
import os

import numpy as np

BLOCK_M = 128
# Output sub-blocks sharing ONE window DMA (see ops/banded_conv.py SUB):
# band starts stay per-128-row sub-block, the window fetch amortizes 4x.
SUB = 4
W_WIN = 8704
K = 5
NG = 25          # (dx, dy) strip groups
SEC = 16         # slab lanes per group section (15 used + 1 pad)
NCHUNK = 4       # ceil(25 / 8) chunks of 8 sections

# Per-group static band widths (multiples of 32), clustered by the group's
# dx (groups enumerate dx-major: g // 5 = dx index 0..4). Sized for the
# bulk of the span distribution (tools/probe_stem_spans.py); corner strips
# go to the exception list (130/4.6M on the bench scene at this profile;
# the cliff is one notch tighter at ~2.7k).
_DX_W = (384, 352, 192, 512, 1024)


def stem_widths() -> tuple:
    return tuple(_DX_W[g // K] for g in range(NG))


# Fixed capacity for out-of-band exception strips (see stem_banded_prep).
EXC_CAP = 4096


def stem_banded_prep(k5: np.ndarray, *, block_m: int = BLOCK_M,
                     w_win: int = W_WIN, exc_cap: int = EXC_CAP):
    """Host-side planning for one padded finest level.

    Strips whose start falls outside their group's static band (scene
    boundaries mix plane sizes, so a handful of corner blocks exceed the
    bulk profile — 74/4.6M strips on the bench scene) do NOT fail the
    scene: the kernel's one-hot simply produces a zero row for them
    (mismatch == zero, never garbage), and they are returned as a
    fixed-capacity EXCEPTION list that `banded_stem_conv` corrects with a
    cheap XLA gather + scatter-add. Only scenes with more than `exc_cap`
    exceptions fall back entirely.

    Args:
      k5: int32 [Np, 125] cell map (-1 absent / pad), offsets dx-major,
          dz fastest.
    Returns:
      (w0_t [nb], lo_t [nb, 32], r0 [Np, 32], rank [Np, 512],
       exc [exc_cap, 2+K] (row, group, cell rows; -1 pad), ok) with
      window/band starts in 32-row tile units, or Nones + False on
      fallback. The exception rows carry their K cell rows so the
      correction pass needs no full k5 map on device.
    """
    n, kk = k5.shape
    if kk != NG * K or n % (block_m * SUB):
        return (None,) * 5 + (False,)
    sub_ws = np.asarray(stem_widths(), np.int32)
    w_eff = min(w_win, n)
    if w_eff < int(sub_ws.max()):
        return (None,) * 5 + (False,)

    # C++ fast path (sparse/csrc agile3d_stem_prep): single streaming pass;
    # the numpy version below (the dominant host cost at KITTI scale —
    # ~26 s at a 1M-row padded level on this 1-core box) is kept as the
    # tested fallback (bit-identical, tests/test_native_prep.py).
    from agile3d_tpu.sparse.native import native_stem_prep

    nat = native_stem_prep(k5, NG, K, block_m, SUB, w_eff, sub_ws, exc_cap)
    if nat is not None and nat[5] != -1:
        w0_t, lo_p, r0_p, rank_p, exc, n_exc = nat
        if n_exc == -2 or n_exc > exc_cap:  # -2: non-consecutive strip
            return (None,) * 5 + (False,)
        return w0_t, lo_p, r0_p, rank_p.reshape(n, NCHUNK * 8 * SEC), \
            (exc if n_exc else None), True

    nb = n // block_m
    cells = k5.reshape(n, NG, K)                            # int32 view
    present = cells >= 0
    big = np.int32(1) << 30
    r0 = np.where(present, cells, big).min(axis=2)          # [n, NG]
    has = r0 < big
    # packed slot of cell j = its row offset from the strip start
    # (present cells are consecutive rows, so offsets are 0..K-1)
    rank = np.where(present, cells - r0[:, :, None], -1)    # [n, NG, K]
    if rank.max(initial=0) >= K:
        return (None,) * 5 + (False,)

    blocks = np.where(has, r0, big).reshape(nb, block_m, NG)
    # one window per SUB consecutive sub-blocks (shared DMA)
    gmin = blocks.reshape(nb // SUB, SUB * block_m, NG).min(axis=(1, 2))
    gmin = np.where(gmin == big, 0, gmin)
    w0 = np.clip((gmin // 32) * 32, 0, n - w_eff)           # [nb/SUB]
    rel = blocks - np.repeat(w0, SUB)[:, None, None]
    lo = np.where(blocks < big, rel, big).min(axis=1)       # [nb, NG]
    lo = np.where(lo == big, 0, lo)
    lo = (lo // 32) * 32
    lo = np.clip(np.minimum(lo, w_eff - sub_ws[None, :]), 0, None)
    sub_rel = rel - lo[:, None, :]
    out_of_band = np.where(
        blocks < big,
        (sub_rel < 0) | (sub_rel >= sub_ws[None, None]), False)
    n_exc = int(out_of_band.sum())
    if n_exc > exc_cap:
        return (None,) * 5 + (False,)
    if n_exc == 0:
        exc = None   # no correction pass at all (pytree-keyed dispatch)
    else:
        exc = np.full((exc_cap, 2 + K), -1, np.int32)
        vb, vm, vg = np.nonzero(out_of_band)
        rows = vb * block_m + vm
        exc[:n_exc, 0] = rows
        exc[:n_exc, 1] = vg                                 # group
        # the strip's K cell rows ride along so the conv's correction pass
        # never needs the full [n, 125] map on device (k5 is droppable
        # from the eval transfer — engine/eval.device_batch)
        exc[:n_exc, 2:] = k5.reshape(n, NG, K)[rows, vg]

    lo_p = np.zeros((nb, 32), np.int32)
    lo_p[:, :NG] = lo // 32
    r0_p = np.full((n, 32), -1, np.int32)
    r0_p[:, :NG] = np.where(has, r0, -1)
    # per-lane rank map: chunk t, section gi, lane j*3+c  <-  rank[g, j]
    rank3 = np.repeat(rank, 3, axis=2).astype(np.int8)      # [n, NG, 15]
    rank_p = np.full((n, NCHUNK * 8, SEC), -1, np.int8)
    rank_p[:, :NG, : 3 * K] = rank3
    return (w0 // 32).astype(np.int32), lo_p, r0_p, \
        rank_p.reshape(n, NCHUNK * 8 * SEC), exc, True


@functools.lru_cache(maxsize=None)
def _make_stem_kernel(n: int, cin: int, cout: int, block_m: int,
                      w_win: int, sub_ws: tuple, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb2 = n // (block_m * SUB)
    w_eff = min(w_win, n)
    cout_p = ((cout + 127) // 128) * 128

    # static placement matrices: packed lanes [0:SEC) -> section gi
    place = np.zeros((8, 128, 128), np.float32)
    for gi in range(8):
        for q in range(SEC):
            place[gi, q, gi * SEC + q] = 1.0
    # static shift matrices: lane l -> l + 3*s (slot-d section lane to
    # cell j = d + s section lane; cross-section leakage is masked off)
    shift = np.zeros((K, 128, 128), np.float32)
    for s in range(K):
        for q in range(128 - 3 * s):
            shift[s, q, q + 3 * s] = 1.0
    # static per-(s, lane) compaction comparand: cell j(l) - s where
    # j(l) = (l % SEC) // 3, or 127 (matches no rank) on pad lanes AND
    # where j < s — absent cells carry rank -1, which would otherwise
    # collide with j - s == -1 and pull the previous section's slot
    # content through the shift (measured: cross-section leakage).
    lane = np.arange(8 * SEC)
    j_of_lane = np.where(lane % SEC < 3 * K, (lane % SEC) // 3, 127)
    cmp_s = np.stack([np.where(j_of_lane >= s, j_of_lane - s, 127)
                      for s in range(K)]).astype(np.int8)

    # Pallas kernels may not close over array constants — the static
    # placement/shift/lane tables ride in as VMEM inputs instead. They stay
    # NUMPY here and convert per call: a jnp array created while tracing
    # call #1 would leak that trace into this lru_cached closure.
    place_c = place.astype(np.float32)
    shift_c = shift.astype(np.float32)
    cmp_c = cmp_s                                          # [K, 128] int8

    def kernel(w0_ref, y_hbm, r0_ref, rank_ref, w_ref, lo_ref, place_ref,
               shift_ref, jlane_ref, out_ref, ywin, sem):
        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)
        w0 = w0_ref[i] * 32

        def win_dma(blk, buf):
            return pltpu.make_async_copy(
                y_hbm.at[pl.ds(w0_ref[blk] * 32, w_eff), :],
                ywin.at[buf], sem.at[buf])

        @pl.when(i == 0)
        def _():
            win_dma(0, 0).start()

        @pl.when(i + 1 < nb2)
        def _():
            win_dma(i + 1, 1 - slot).start()

        win_dma(i, slot).wait()

        for sb in range(SUB):            # 128-row sub-blocks, own bands
            r0 = r0_ref[sb * block_m:(sb + 1) * block_m, :]  # [BM, 32]
            acc = jnp.zeros((block_m, cout_p), jnp.float32)
            for t in range(NCHUNK):
                slab = jnp.zeros((block_m, 128), jnp.float32)
                for gi in range(8):
                    g = t * 8 + gi
                    if g >= NG:
                        break
                    lo_g = lo_ref[jax.lax.rem(i, 8) * SUB + sb, g] * 32
                    rel = r0[:, g] - w0 - lo_g              # [BM]
                    sub = ywin[slot, pl.ds(lo_g, sub_ws[g]), :]
                    col = jax.lax.broadcasted_iota(
                        jnp.int32, (block_m, sub_ws[g]), 1)
                    onehot = (rel[:, None] == col).astype(jnp.bfloat16)
                    gath = jnp.dot(onehot, sub,
                                   preferred_element_type=jnp.float32)
                    slab = slab + jnp.dot(
                        gath.astype(jnp.bfloat16), place_ref[gi],
                        preferred_element_type=jnp.float32)
                # compaction: slot layout -> cell layout per section
                # (int8 vector compares don't lower in Mosaic — upcast i32)
                rank_t = rank_ref[sb * block_m:(sb + 1) * block_m,
                                  t * 128:(t + 1) * 128].astype(jnp.int32)
                slab_b = slab.astype(jnp.bfloat16)
                comp = jnp.zeros((block_m, 128), jnp.float32)
                for s in range(K):
                    shifted = jnp.dot(slab_b, shift_ref[s],
                                      preferred_element_type=jnp.float32)
                    mask = rank_t == jlane_ref[s, :][None, :].astype(
                        jnp.int32)
                    comp = comp + jnp.where(mask, shifted, 0.0)
                acc = acc + jnp.dot(comp.astype(jnp.bfloat16), w_ref[t],
                                    preferred_element_type=jnp.float32)
            out_ref[sb * block_m:(sb + 1) * block_m, :] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # packed y (HBM)
            pl.BlockSpec((SUB * block_m, 32), lambda i, w0: (i, 0),
                         memory_space=pltpu.VMEM),          # r0
            pl.BlockSpec((SUB * block_m, NCHUNK * 128),
                         lambda i, w0: (i, 0),
                         memory_space=pltpu.VMEM),          # rank lanes
            pl.BlockSpec(memory_space=pltpu.VMEM),          # weights
            pl.BlockSpec((8 * SUB, 32), lambda i, w0: (i // 8, 0),
                         memory_space=pltpu.VMEM),          # band starts
            pl.BlockSpec(memory_space=pltpu.VMEM),          # place mats
            pl.BlockSpec(memory_space=pltpu.VMEM),          # shift mats
            pl.BlockSpec(memory_space=pltpu.VMEM),          # j-of-lane
        ],
        out_specs=pl.BlockSpec((SUB * block_m, cout_p),
                               lambda i, w0: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, w_eff, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, cout_p), jnp.float32),
        interpret=interpret,
    )

    def conv(y_packed, r0, rank, w0_t, lo_t, w_chunks):
        return call(w0_t, y_packed, r0, rank, w_chunks, lo_t,
                    jnp.asarray(place_c, jnp.bfloat16),
                    jnp.asarray(shift_c, jnp.bfloat16),
                    jnp.asarray(cmp_c))[:, :cout]

    return conv


def _interpret_mode() -> bool:
    if os.environ.get("AGILE3D_BANDED_INTERPRET"):
        return True
    import jax

    return jax.default_backend() != "tpu"


def _pack_weights(w, cout_p):
    """[125, 3, cout] -> [NCHUNK, 128, cout_p] bf16: row (gi*SEC + j*3 + c)
    of chunk t = w[(t*8 + gi)*K + j, c, :]."""
    import jax.numpy as jnp

    kk, cin, cout = w.shape
    wsec = w.reshape(NG, K * cin, cout)              # [g, (j, c), o]
    wsec = jnp.concatenate(
        [wsec, jnp.zeros((NG, SEC - K * cin, cout), w.dtype)], axis=1)
    wsec = jnp.concatenate(
        [wsec, jnp.zeros((NCHUNK * 8 - NG, SEC, cout), w.dtype)], axis=0)
    wc = wsec.reshape(NCHUNK, 8 * SEC, cout)
    if cout_p != cout:
        wc = jnp.concatenate(
            [wc, jnp.zeros((NCHUNK, 8 * SEC, cout_p - cout), w.dtype)],
            axis=2)
    return wc.astype(jnp.bfloat16)


def banded_stem_conv(x, sb_r0, sb_rank, sb_w0, sb_lo, sb_exc, w):
    """Banded k5 stem conv: y[i] = sum_j x[k5[i, j]] @ w[j] (absent -> 0).

    Args:
      x: [Np, 3] features (any float dtype; computed in bf16/f32-accum —
         matches the XLA strips path, whose packed gathers are bf16 too).
      sb_*: aux from `stem_banded_prep` (device arrays); sb_exc rows carry
         their own cell rows (cols 2:), so no k5 map is needed — the eval
         engine drops the ~500 MB padded k5 from the device transfer when
         this path is active (engine/eval.device_batch).
      w: [125, 3, cout] weights (dx-major offsets, dz fastest).
    Returns [Np, cout] float32.
    """
    import jax.numpy as jnp

    n, cin = x.shape
    kk, wcin, cout = w.shape
    assert cin == wcin == 3 and kk == NG * K, (x.shape, w.shape)
    cout_p = ((cout + 127) // 128) * 128
    # packed strips: y[r] = [x[r] | ... | x[r+K-1]], bf16, 128 lanes
    xb = x.astype(jnp.bfloat16)
    y = jnp.concatenate([jnp.roll(xb, -d, axis=0) for d in range(K)], axis=1)
    y = jnp.pad(y, ((0, 0), (0, 128 - K * cin)))
    # cache key includes the band profile: aux from stem_banded_prep is
    # only valid for the widths it was planned with
    fn = _make_stem_kernel(n, cin, cout, BLOCK_M, W_WIN, stem_widths(),
                           _interpret_mode())
    w_chunks = _pack_weights(w, cout_p)
    out = fn(y, sb_r0, sb_rank, sb_w0, sb_lo, w_chunks)

    # Exception strips (out of their static band at scene corners) read a
    # zero one-hot row in the kernel; compute their true contribution with
    # a plain gather + scatter-add. sb_exc is a fixed [EXC_CAP, 2]
    # (row, group) list, -1-padded, so shapes stay static; None = the
    # scene had no exceptions (prep omits the list entirely).
    if sb_exc is None:
        return out
    # jnp-coerce: callers may close over a numpy pyramid (constants in
    # the traced graph), and numpy fancy-indexing rejects traced indices
    sb_exc = jnp.asarray(sb_exc)
    erow, egrp = sb_exc[:, 0], sb_exc[:, 1]
    live = erow >= 0
    ecell = sb_exc[:, 2:]                                   # [E, K]
    ev = jnp.where((ecell >= 0)[..., None] & live[:, None, None],
                   xb[jnp.maximum(ecell, 0)], 0)            # [E, K, cin]
    ew = w.reshape(NG, K, cin, cout)[jnp.maximum(egrp, 0)]  # [E, K, cin, C]
    # bf16-round the values (not the sums) exactly like the kernel path
    contrib = jnp.einsum(
        "ejc,ejco->eo", ev.astype(jnp.float32),
        ew.astype(jnp.bfloat16).astype(jnp.float32))
    # prep emits exceptions in ascending row order
    return out.at[jnp.where(live, erow, n)].add(
        contrib, mode="drop", indices_are_sorted=True)
