"""Banded windowed-gather k3 conv — a Mosaic (Pallas-TPU) kernel that routes
sparse-conv gathers through the MXU instead of HBM random access.

Replaces the per-offset gather scan (`ops.sparse_conv.sparse_conv`) for the
wide (>=96ch) k3 convs, where packed-strip gathers lose (PERF.md round-2
HBM-granule model) and the scan runs at the platform's random-access floor
(19.3 ms for one 96->96 k3 conv at 196k voxels). Measured on the same conv:
**10.5 ms** (tools/probe_banded_kernel.py, min over independent compiles).

Why it works: the sorted-row invariant (voxel rows sorted by packed
(batch,x,y,z) key) makes every per-offset gather map strictly monotone and
*banded* — a block of BLOCK_M consecutive output rows reads a narrow window
of input rows, and the window is narrow per offset cluster: dz-offsets read
rows ~a z-run away, dx-offsets ~an xy-plane away (tools/probe_banded_spans).
Mosaic has no arbitrary VMEM row gather, but it has dynamic-start HBM->VMEM
window DMA and the MXU, so the gather becomes a one-hot band matmul:

  per output block of BLOCK_M rows:
    1. DMA the block's input window x[w0 : w0+W] into VMEM (dynamic w0,
       host-precomputed; double-buffered so block i+1's fetch rides under
       block i's matmuls);
    2. per kernel offset j: slice a sub_ws[j]-row sub-window at
       host-precomputed lo[i,j], build onehot[m, r] = (nbr[m,j]-w0-lo == r)
       on the VPU, gather with a [BLOCK_M, sub_ws[j]] @ [sub_ws[j], C] bf16
       matmul, and apply offset j's weight; accumulate in f32.

Exactness: the host prep (`banded_prep`) verifies every present neighbor
lands inside its static sub-window and the union window fits W; scenes that
violate the band bound get no banded aux (fields stay None) and the
backbone routes those levels through the scan conv — the jit cache keys on
the pytree structure, so the fallback costs one extra compile, never a
wrong result. Absent neighbors (-1) produce an all-zero one-hot row, which
also zeroes pad-voxel outputs (zero-pad invariant).

Static band widths are per offset (legal: the offset loop is Python-
unrolled, so each j gets its own slice shape). All dynamic slice starts are
kept in units of 32-row tiles and multiplied by 32 in-kernel so Mosaic can
statically prove sublane alignment.

Supersedes the gather half of the reference's MinkowskiConvolution
(/root/reference/models/res16unet.py:222-295 hot loop). Differentiable:
a custom VJP computes dX with the SAME kernel via the stencil-transpose
identity (the transpose of the gather map under offset j is the map under
-j = offset k-1-j, so dX = banded_conv(g, maps, flip(w).swapaxes(1, 2)))
and dW with a dedicated accumulating kernel (_make_dw_kernel), so the
training path can route through it too.
"""

from __future__ import annotations

import functools
import os

import numpy as np

BLOCK_M = 128
# Output sub-blocks sharing ONE window DMA: band starts (lo) stay
# per-128-row sub-block (so band widths don't grow with the DMA block),
# while the window fetch amortizes over SUB*BLOCK_M output rows — 4x less
# window HBM traffic for +512 window rows. All voxel buckets are
# multiples of SUB*BLOCK_M = 512.
SUB = 4
W_WIN = 4608
# Per-offset-cluster static band widths (multiples of 32). Offsets come
# from kernel_maps.kernel_offsets(3): z fastest, so j // 9 - 1 = dx.
# Measured spans (tools/probe_banded_kernel.py, 196k + 98k scenes):
# dx=0 offsets max 160, dx=+-1 offsets max 555; +31 alignment slack.
# Sized so typical indoor scenes have ZERO exceptions: a tighter profile
# (160, 448; -27% one-hot FLOPs, 50 exceptions) measured SLOWER overall —
# the 8 per-conv [N, C] scatter-adds cost more than the saved matmul time
# (backbone 45.6 -> 73.6 ms). The exception list still protects wide-span
# scenes (outdoor/KITTI) from losing the banded path entirely.
_DX0_W = 224
_DX1_W = 608


def banded_widths(k: int) -> tuple[int, ...]:
    """Static per-offset band widths for a k^3 kernel (k odd)."""
    kk = k * k
    return tuple(_DX0_W if j // kk == (k - 1) // 2 else _DX1_W
                 for j in range(k ** 3))


def _effective_window(n: int, sub_ws, w_win: int = W_WIN):
    """Window width shrunk for scenes smaller than the DMA window (their
    whole array fits one window and w0 pins to 0). The per-offset band
    PROFILE is kept as-is — scenes narrower than the widest band are not
    banded-eligible (None from banded_prep; the conv falls back). Must be
    computed identically by banded_prep and banded_conv."""
    sub_ws = tuple(int(s) for s in sub_ws)
    w_eff = min(w_win, n)
    if w_eff < max(sub_ws):
        return sub_ws, None
    return sub_ws, w_eff


# Fixed capacity for out-of-band exception pairs (see banded_prep).
EXC_CAP = 4096


def banded_prep(nbr: np.ndarray, *, block_m: int = BLOCK_M,
                w_win: int = W_WIN, sub_ws=None, exc_cap: int = EXC_CAP):
    """Host-side window planning for one padded level.

    Neighbors whose row falls outside their offset's static band (scene
    corners mix xy-plane sizes) do NOT fail the scene: the kernel's
    one-hot yields a zero row for them (mismatch == zero, never garbage)
    and they come back as a fixed-capacity EXCEPTION list that
    `banded_conv` corrects with one XLA gather + scatter-add. Only scenes
    with more than `exc_cap` exceptions fall back to the scan conv.

    Args:
      nbr: int32 [Np, K] neighbor rows (-1 absent / pad), Np % block_m == 0.
    Returns:
      (w0_t [nb/SUB] int32, lo_t [nb, Kpad] int32, exc [exc_cap, 2]
      (row, offset; -1 pad), ok bool) with starts in 32-row tile units, or
      (None, None, None, False) on fallback.
    """
    n, k = nbr.shape
    if n % (block_m * SUB):
        return None, None, None, False
    if sub_ws is None:
        sub_ws = banded_widths(round(k ** (1 / 3)))
    # scenes smaller than the window DMA the whole array (w0 = 0)
    sub_ws, w_win = _effective_window(n, sub_ws, w_win)
    if w_win is None:
        return None, None, None, False
    sub_ws = np.asarray(sub_ws, np.int32)

    # C++ fast path (sparse/csrc agile3d_band_plan): one streaming pass vs
    # the ~6 full [n, k] numpy intermediates below — the numpy version is
    # kept as the tested fallback (bit-identical, tests/test_native_prep.py)
    from agile3d_tpu.sparse.native import native_band_plan

    nat = native_band_plan(nbr, block_m, SUB, w_win, sub_ws, exc_cap)
    if nat is not None and nat[3] >= 0:
        w0_t, lo_p, exc, n_exc = nat
        if n_exc > exc_cap:
            return None, None, None, False
        return w0_t, lo_p, (exc if n_exc else None), True

    nb = n // block_m
    cells = nbr.reshape(nb, block_m, k)          # int32; rows < 2^24
    present = cells >= 0
    big = np.int32(1) << 30
    # ONE window per SUB consecutive sub-blocks (shared DMA); band starts
    # stay per sub-block below
    gmin = np.where(present, cells, big).reshape(
        nb // SUB, SUB * block_m, k).min(axis=(1, 2))           # [nb/SUB]
    gmin = np.where(gmin == big, 0, gmin)
    # Window starts clamped so [w0, w0+w_win) always lies inside the n
    # padded rows: the kernel can DMA straight from x with NO zero-row
    # concatenate (tail blocks read a window ending exactly at n — their
    # neighbors are all < n by monotonicity, so bands still cover them).
    w0 = np.clip((gmin // 32) * 32, 0, n - w_win)               # aligned
    rel = cells - np.repeat(w0, SUB)[:, None, None]
    lo = np.where(present, rel, big).min(axis=1)                # [nb, k]
    lo = np.where(lo == big, 0, lo)
    lo = (lo // 32) * 32                                        # aligned
    lo = np.clip(np.minimum(lo, w_win - sub_ws[None, :]), 0, None)
    sub_rel = rel - lo[:, None, :]
    out_of_band = np.where(
        present, (sub_rel < 0) | (sub_rel >= sub_ws[None, None, :]), False)
    n_exc = int(out_of_band.sum())
    if n_exc > exc_cap:
        return None, None, None, False
    if n_exc == 0:
        exc = None   # no correction pass at all (pytree-keyed dispatch)
    else:
        exc = np.full((exc_cap, 2), -1, np.int32)
        vb, vm, vj = np.nonzero(out_of_band)
        exc[:n_exc, 0] = vb * block_m + vm                      # row
        exc[:n_exc, 1] = vj                                     # offset
    kpad = ((k + 31) // 32) * 32
    lo_p = np.zeros((nb, kpad), np.int32)
    lo_p[:, :k] = lo // 32
    return (w0 // 32).astype(np.int32), lo_p, exc, True


@functools.lru_cache(maxsize=None)
def _make_kernel(n: int, k: int, cin: int, cout: int, sub_ws: tuple,
                 block_m: int, w_win: int, interpret: bool,
                 slab: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb2 = n // (block_m * SUB)           # grid = shared-window blocks
    kpad = ((k + 31) // 32) * 32
    cin_p = ((cin + 127) // 128) * 128   # lane-aligned HBM window DMA

    def kernel(w0_ref, x_hbm, nbr_ref, lo_ref, w_ref, out_ref, xwin, sem):
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

        @pl.when(i + 1 < nb2)
        def _():
            win_dma(i + 1, 1 - slot).start()

        win_dma(i, slot).wait()

        for sb in range(SUB):            # 128-row sub-blocks, own bands
            nbrs = nbr_ref[sb * block_m:(sb + 1) * block_m, :]
            acc = jnp.zeros((block_m, cout), jnp.float32)
            gs = []
            for j in range(k):
                lo = lo_ref[jax.lax.rem(i, 8) * SUB + sb, j] * 32
                rel = nbrs[:, j] - w0 - lo                  # [BM]
                sub = xwin[slot, pl.ds(lo, sub_ws[j]), :]   # [sub_ws[j], C]
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (block_m, sub_ws[j]), 1)
                onehot = (rel[:, None] == col).astype(jnp.bfloat16)
                gathered = jnp.dot(onehot, sub,
                                   preferred_element_type=jnp.float32)
                if slab:
                    # collect; one [BM, k*cin_p] contraction below (27
                    # fewer small matmuls + f32 accumulate adds per block)
                    gs.append(gathered.astype(jnp.bfloat16))
                else:
                    acc = acc + jnp.dot(gathered.astype(jnp.bfloat16),
                                        w_ref[j],
                                        preferred_element_type=jnp.float32)
            if slab:
                acc = jnp.dot(jnp.concatenate(gs, axis=1), w_ref[:],
                              preferred_element_type=jnp.float32)
            out_ref[sb * block_m:(sb + 1) * block_m, :] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # x (HBM)
            pl.BlockSpec((SUB * block_m, k), lambda i, w0: (i, 0),
                         memory_space=pltpu.VMEM),          # neighbors
            pl.BlockSpec((8 * SUB, kpad), lambda i, w0: (i // 8, 0),
                         memory_space=pltpu.VMEM),          # band starts
            pl.BlockSpec(memory_space=pltpu.VMEM),          # weights
        ],
        out_specs=pl.BlockSpec((SUB * block_m, cout), lambda i, w0: (i, 0),
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

    def conv(x, k3p, lo_t, w0_t, wt):
        # Window starts are host-clamped to [0, n - w_win] (banded_prep),
        # so the DMA never runs OOB and x needs no zero-row concatenate —
        # only zero cols up to the 128-lane tile (aligned DMA slices).
        xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, cin_p - cin)))
        wp = jnp.pad(wt.astype(jnp.bfloat16),
                     ((0, 0), (0, cin_p - cin), (0, 0)))
        if slab:
            wp = wp.reshape(k * cin_p, cout)
        return call(w0_t, xp, k3p, lo_t, wp)

    return conv


@functools.lru_cache(maxsize=None)
def _make_dw_kernel(n: int, k: int, cin: int, cout: int, sub_ws: tuple,
                    block_m: int, w_win: int, interpret: bool):
    """dL/dw for the banded conv: dw[j] = sum_m x[nbr[m, j]]^T @ g[m].

    Same double-buffered window DMA + one-hot band gathers as the forward
    kernel; each block then contracts the gathered rows against its grad
    block ([BM, cin]^T @ [BM, cout] per offset) and accumulates straight
    into the resident [k*cin_p, cout] output block (constant index_map, so
    the accumulator lives in VMEM across the sequential TPU grid).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb2 = n // (block_m * SUB)
    kpad = ((k + 31) // 32) * 32
    cin_p = ((cin + 127) // 128) * 128

    def kernel(w0_ref, x_hbm, nbr_ref, lo_ref, g_ref, out_ref, xwin, sem):
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
            out_ref[:] = jnp.zeros_like(out_ref)

        @pl.when(i + 1 < nb2)
        def _():
            win_dma(i + 1, 1 - slot).start()

        win_dma(i, slot).wait()

        for sb in range(SUB):
            nbrs = nbr_ref[sb * block_m:(sb + 1) * block_m, :]
            g = g_ref[sb * block_m:(sb + 1) * block_m, :].astype(
                jnp.bfloat16)                               # [BM, cout]
            for j in range(k):
                lo = lo_ref[jax.lax.rem(i, 8) * SUB + sb, j] * 32
                rel = nbrs[:, j] - w0 - lo                  # [BM]
                sub = xwin[slot, pl.ds(lo, sub_ws[j]), :]   # [sub_ws[j], C]
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (block_m, sub_ws[j]), 1)
                onehot = (rel[:, None] == col).astype(jnp.bfloat16)
                gathered = jnp.dot(onehot, sub,
                                   preferred_element_type=jnp.float32)
                dwj = jax.lax.dot_general(                  # [cin_p, cout]
                    gathered.astype(jnp.bfloat16), g,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out_ref[pl.ds(j * cin_p, cin_p), :] += dwj

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb2,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # x (HBM)
            pl.BlockSpec((SUB * block_m, k), lambda i, w0: (i, 0),
                         memory_space=pltpu.VMEM),          # neighbors
            pl.BlockSpec((8 * SUB, kpad), lambda i, w0: (i // 8, 0),
                         memory_space=pltpu.VMEM),          # band starts
            pl.BlockSpec((SUB * block_m, cout), lambda i, w0: (i, 0),
                         memory_space=pltpu.VMEM),          # grad block
        ],
        out_specs=pl.BlockSpec((k * cin_p, cout), lambda i, w0: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, w_win, cin_p), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k * cin_p, cout), jnp.float32),
        interpret=interpret,
    )

    def dw(x, k3p, lo_t, w0_t, g):
        xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (0, cin_p - cin)))
        flat = call(w0_t, xp, k3p, lo_t, g.astype(jnp.float32))
        return flat.reshape(k, cin_p, cout)[:, :cin, :]

    return dw


@functools.lru_cache(maxsize=None)
def _make_vjp_conv(n: int, k: int, cin: int, cout: int, sub_ws: tuple,
                   block_m: int, w_win: int, interpret: bool):
    """banded conv with a custom VJP (powers the TRAINING path).

    dX uses the stencil-transpose identity: for a stride-1 cubic stencil on
    one coordinate set, the transpose of the gather map under offset j is
    the gather map under -j, and kernel_offsets enumerates offsets so that
    -offsets[j] == offsets[k-1-j] (verified symmetric for k in {2,3,5}).
    Hence dX = banded_conv(g, same maps/aux, flip(w, 0).swapaxes(1, 2)) —
    the SAME forward kernel with reversed, channel-transposed weights.
    dW runs the dedicated accumulating kernel (_make_dw_kernel).
    """
    import jax
    import jax.numpy as jnp

    # Slab contraction default ON: one [BM, 27*cin_p] matmul replaces 27
    # small weight matmuls + f32 adds per block. Same math; min-t(128)
    # measured 82.7 vs 94.6 ms for the full backbone (PERF.md; the
    # extrapolated-T draws were too noisy that session to quote).
    slab = os.environ.get("AGILE3D_BANDED_SLAB", "1") == "1"
    fwd_fn = _make_kernel(n, k, cin, cout, sub_ws, block_m, w_win,
                          interpret, slab=slab)
    # channel dims swap for the dX pass (gathers grads: cout -> cin)
    dx_fn = _make_kernel(n, k, cout, cin, sub_ws, block_m, w_win,
                         interpret)
    dw_fn = _make_dw_kernel(n, k, cin, cout, sub_ws, block_m, w_win,
                            interpret)

    @jax.custom_vjp
    def conv(x, k3p, lo_t, w0_t, w):
        return fwd_fn(x, k3p, lo_t, w0_t, w)

    def fwd(x, k3p, lo_t, w0_t, w):
        return fwd_fn(x, k3p, lo_t, w0_t, w), (x, k3p, lo_t, w0_t, w)

    def bwd(res, g):
        x, k3p, lo_t, w0_t, w = res
        wt = jnp.flip(w, 0).swapaxes(1, 2)                  # [K, cout, cin]
        dx = dx_fn(g, k3p, lo_t, w0_t, wt)
        dw = dw_fn(x, k3p, lo_t, w0_t, g)
        return dx.astype(x.dtype), None, None, None, dw.astype(w.dtype)

    conv.defvjp(fwd, bwd)
    return conv


def _interpret_mode() -> bool:
    # CPU tests exercise the kernel through the Pallas interpreter; on TPU
    # the env override also allows interpreter-mode debugging.
    if os.environ.get("AGILE3D_BANDED_INTERPRET"):
        return True
    import jax

    return jax.default_backend() != "tpu"


def banded_conv(x, k3, lo_t, w0_t, w, exc=None, sub_ws=None):
    """Banded k3 conv: y[i] = sum_j x[k3[i, j]] @ w[j] (absent -> 0).

    Args:
      x: [Np, cin] features (any float dtype; computed in bf16/f32-accum).
      k3: int32 [Np, K] neighbor rows (-1 absent).
      lo_t, w0_t: banded aux from `banded_prep` (tile units).
      w: [K, cin, cout] weights.
      exc: int32 [EXC_CAP, 2] out-of-band (row, offset) pairs from
        `banded_prep` (-1 pad); their one-hot rows are zero in the kernel
        and this wrapper adds the true contribution with a gather +
        scatter-add (plain XLA ops, so the custom VJP below composes with
        autodiff naturally). None = trusted in-band everywhere.
    Returns [Np, cout] float32.

    Differentiable wrt x and w (custom VJP — dX via the stencil-transpose
    identity on the same kernel, dW via the accumulating kernel), so the
    TRAINING path can route through it too.
    """
    import jax.numpy as jnp

    n, cin = x.shape
    k, _, cout = w.shape
    if sub_ws is None:
        sub_ws = banded_widths(round(k ** (1 / 3)))
    sub_ws, w_win = _effective_window(n, sub_ws)
    if w_win is None:
        raise ValueError(
            f"banded_conv on {n} rows < widest band {max(sub_ws)}; the "
            "caller should have routed this level to the scan conv "
            "(banded_prep returns no aux for it)")
    fn = _make_vjp_conv(n, k, cin, cout, sub_ws, BLOCK_M, w_win,
                        _interpret_mode())
    out = fn(x, k3, lo_t, w0_t, w)
    if exc is None:   # scene had no out-of-band pairs (prep omits the list)
        return out
    exc = jnp.asarray(exc)
    k3 = jnp.asarray(k3)
    erow, eoff = exc[:, 0], exc[:, 1]
    live = erow >= 0
    ecell = k3[jnp.maximum(erow, 0), jnp.maximum(eoff, 0)]      # [E]
    ev = jnp.where(live[:, None],
                   x.astype(jnp.bfloat16)[jnp.maximum(ecell, 0)], 0)
    ew = w[jnp.maximum(eoff, 0)]                                # [E, cin, C]
    contrib = jnp.einsum(
        "ec,eco->eo", ev.astype(jnp.float32),
        ew.astype(jnp.bfloat16).astype(jnp.float32))
    # prep emits exceptions in ascending row order
    return out.at[jnp.where(live, erow, n)].add(
        contrib, mode="drop", indices_are_sorted=True)
