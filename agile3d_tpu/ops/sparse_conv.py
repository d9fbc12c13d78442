"""Sparse convolution ops as gather-GEMM over precomputed kernel maps.

TPU-native replacements for ME.MinkowskiConvolution /
MinkowskiConvolutionTranspose / MinkowskiAvgPooling (reference
models/modules/common.py:125-216). Each op is a pure function over
(features, kernel map, weights); the kernel maps come from
sparse/kernel_maps.py and have static (bucketed) shapes, so everything
compiles once per bucket under jit.

Zero-padding invariant: feature arrays carry zero rows beyond the valid
count; every op that could break that (bias add, normalization) re-masks.
The per-offset matmuls are [N, C_in] @ [C_in, C_out] with N in the tens of
thousands to hundreds of thousands — MXU-shaped work; XLA fuses the gathers
and accumulations around them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_gather(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows of x [N, C] at idx [M] where idx == -1 yields zeros."""
    safe = jnp.clip(idx, 0, x.shape[0] - 1)
    return jnp.where((idx >= 0)[:, None], x[safe], 0)


import os

_UNROLL_MAX_K = 8  # unroll tiny kernels; scan larger ones (compile time)
# kernel offsets gathered per scan step (im2col slab width); env override
# for perf sweeps (tools/bench_backbone_sweep.py)
_SCAN_GROUP = int(os.environ.get("AGILE3D_SCAN_GROUP", "4"))


def sparse_conv(x: jax.Array, nbr: jax.Array, w: jax.Array,
                bias: jax.Array | None = None,
                valid: jax.Array | None = None,
                unroll: bool | None = None) -> jax.Array:
    """Generalized sparse conv: out[m] = sum_k x[nbr[m, k]] @ w[k] (+ bias).

    Covers stride-1 kernel-3/5 convs (nbr = level.k3/k5, M == N) and the
    stride-2 kernel-2 down convs (nbr = level.down, M == N_coarse).

    Large kernels (27/125 offsets) run as a lax.scan over offsets — one
    gather+GEMM per step — keeping the HLO graph size constant per conv
    (the 39-conv UNet would otherwise emit thousands of ops and multiply
    XLA compile time); tiny kernels (<= 8) are unrolled for fusion.

    Args:
      x:    [N, C_in] input features (zero pad rows).
      nbr:  [M, K] int32 gather map, -1 = absent neighbor.
      w:    [K, C_in, C_out] kernel (ME kernel layout).
      bias: optional [C_out].
      valid: optional [M] bool output-row mask (required if bias is not None
        to preserve the zero-padding invariant).
      unroll: force unrolled (True) / scanned (False) offsets.
    """
    k = w.shape[0]
    out_dtype = jnp.promote_types(x.dtype, w.dtype)
    if unroll is None:
        unroll = k <= _UNROLL_MAX_K
    if unroll:
        acc = jnp.zeros((nbr.shape[0], w.shape[2]), dtype=out_dtype)
        for j in range(k):
            g = masked_gather(x, nbr[:, j])
            acc = acc + jnp.dot(g, w[j], preferred_element_type=out_dtype)
    else:
        # Offsets are scanned in groups of G: each step gathers G neighbor
        # sets into an [M, G*C_in] im2col slab and runs ONE matmul. Versus a
        # per-offset scan this cuts the HBM accumulator read/write traffic
        # by G and widens the MXU contraction by G.
        g_sz = _SCAN_GROUP
        m, k_tot = nbr.shape
        cin, cout = w.shape[1], w.shape[2]
        pad = (-k_tot) % g_sz
        nbr_g = jnp.concatenate(
            [nbr, jnp.full((m, pad), -1, nbr.dtype)], axis=1)
        nbr_g = nbr_g.T.reshape(-1, g_sz, m)                 # [K/G, G, M]
        w_g = jnp.concatenate(
            [w, jnp.zeros((pad, cin, cout), w.dtype)], axis=0)
        w_g = w_g.reshape(-1, g_sz * cin, cout)              # [K/G, G*C, Co]

        @jax.checkpoint
        def body(acc, inp):
            # remat: without it, scan AD stacks the gathered [M, G*C_in]
            # activations across all steps (~GBs per conv at scene scale);
            # recomputing the gather in the backward is free.
            idx_g, wj = inp
            slab = jnp.concatenate(
                [masked_gather(x, idx_g[j]) for j in range(g_sz)], axis=1)
            return acc + jnp.dot(slab, wj,
                                 preferred_element_type=out_dtype), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((m, cout), dtype=out_dtype), (nbr_g, w_g))
    if bias is not None:
        assert valid is not None, "bias add requires a validity mask"
        acc = acc + bias[None, :]
    if valid is not None:
        acc = jnp.where(valid[:, None], acc, 0)
    return acc




def _packed_default_dtype(x_dtype):
    """bf16 on TPU matches the conv GEMM's DEFAULT-precision operand
    rounding exactly; when the user raises the global matmul precision
    (float32 / highest / tensorfloat32), the GEMMs stop rounding and the
    packed gathers must stop too."""
    if jax.default_backend() != "tpu":
        return x_dtype
    prec = jax.config.jax_default_matmul_precision
    if prec not in (None, "default", "bfloat16"):
        return x_dtype
    return jnp.bfloat16


def sparse_conv_strips(x: jax.Array, nbr: jax.Array, w: jax.Array,
                       k_strip: int,
                       bias: jax.Array | None = None,
                       valid: jax.Array | None = None,
                       group_size: int | None = None,
                       packed_dtype=None) -> jax.Array:
    """Packed-strip sparse conv — same math as ``sparse_conv``, fetching each
    (dx, dy) column's k z-cells as ONE packed row instead of k row gathers.

    Requires the sorted-row invariant (sparse/quantize.py module docstring):
    voxel rows sorted by packed (batch,x,y,z) key with z the fastest axis.
    Then for each (dx, dy) *column group* of ``k_strip`` kernel offsets, the
    present neighbor cells are CONSECUTIVE rows of x (nothing can sort
    between two cells of the same z-column). Packing k row-shifted copies of
    x side by side (``y = [x | roll(x,-1) | ... ]``, pure VPU) turns the
    k cell gathers into ONE row gather of y at the strip start, followed by
    cheap masked selects that compact present cells into kernel-cell slots.

    Why this wins (measured, tools/probe_packed_bf16.py): XLA:TPU gathers
    are HBM-GRANULE-bound (~512 B minimum transaction, ~275 M granules/s),
    so the packed fetch only pays when it reduces granule count:
    ``k * C_in * itemsize <= ~512 B``. The k5 stem (C_in=3, bf16 rows
    = 30 B) drops 5x granules -> 73.9 -> 19.3 ms on the 185k-voxel scene;
    96-ch k3 convs (576 B packed rows) LOSE vs the per-offset scan — use
    ``sparse_conv`` there (models/backbone.py picks per conv).

    ``packed_dtype`` defaults to bfloat16 on TPU: gathered values feed only
    the conv GEMM, whose default-precision TPU lowering rounds operands to
    bf16 anyway, so results match the f32 path's (same single bf16 MXU
    pass); on other backends it defaults to x.dtype (exact).

    ``kernel_offsets`` enumerates (dx, dy, dz) with dz fastest, so
    ``nbr[:, g*k : (g+1)*k]`` is exactly column group g and the kernel
    reshapes to [G, k*C_in, C_out] with no permutation.

    Args:
      x:    [N, C_in] input features (zero pad rows).
      nbr:  [M, G*k_strip] int32 gather map, -1 = absent.
      w:    [G*k_strip, C_in, C_out].
      k_strip: z-cells per column group (the kernel size).
      group_size: column groups per scan step (contraction width
        = group_size*k_strip*C_in); None = auto (wider slabs for tiny C_in
        so the MXU contraction stays >= 128).
    """
    m, k_tot = nbr.shape
    k = k_strip
    assert k_tot % k == 0, (k_tot, k)
    n_grp = k_tot // k
    cin, cout = w.shape[1], w.shape[2]
    out_dtype = jnp.promote_types(x.dtype, w.dtype)
    if packed_dtype is None:
        packed_dtype = _packed_default_dtype(x.dtype)
    if group_size is None:
        env = os.environ.get("AGILE3D_STRIP_GROUP")  # perf-sweep override
        if env:
            group_size = int(env)
        else:
            group_size = 1 if cin * k >= 128 else max(128 // (cin * k), 1)
    gg = min(group_size, n_grp)

    cells = nbr.reshape(m, n_grp, k)
    present = cells >= 0
    # strip start = lowest present cell row. The absent-cell sentinel must be
    # the max INPUT row (cells index x, whose row count differs from m for
    # down maps) so it can never undercut a real cell; empty columns read a
    # garbage row that the -1 deltas then mask out.
    r0 = jnp.min(jnp.where(present, cells, x.shape[0] - 1),
                 axis=2).astype(jnp.int32)
    # within-strip position of cell j = its row offset from the strip start
    # (present cells are consecutive, so this equals its presence rank <= j)
    delta = jnp.where(present, cells - r0[:, :, None], -1).astype(jnp.int8)

    xc = x.astype(packed_dtype)
    # packed strips: y[r] = [x[r] | x[r+1] | ... | x[r+k-1]]; roll wrap-around
    # rows are never selected (their cells would be absent -> delta == -1).
    # NO optimization_barrier here: forcing y to materialize pins a
    # gather-hostile layout and measured 3.7x SLOWER (72 vs 19 ms for the
    # k5 stem standalone) — XLA's own materialization choice is the fast
    # one (PERF.md round-2 zdilated postmortem).
    y = jnp.concatenate([jnp.roll(xc, -d, axis=0) for d in range(k)], axis=1)

    def strip_slab(r0_g, delta_g):
        """Gather gg column strips and lay them out as a [m, gg*k*cin] slab.

        Compaction (present cells -> kernel-cell slots) is vectorized
        across groups and cells: k wide passes over the whole slab. The
        per-cell form (gg * k(k+1)/2 masked selects, each on a narrow
        [m, cin] array) materialized every select into a 128-lane
        tile-padded buffer — ~42x physical HBM traffic at cin=3; the
        device trace showed those selects + their concat costing ~55 ms
        of the 139 ms backbone forward (PERF.md round 3)."""
        gg_n = r0_g.shape[0]
        w_slab = gg_n * k * cin
        # Every MATERIALIZED array here must stay 2D [m, w_slab]: 4D
        # [m, gg, k, cin] intermediates tile-pad the trailing (k, cin)
        # dims to (8, 128) — measured 44.6 ms standalone vs 19.3 for the
        # per-cell form. The broadcasts below are lazy inside one fusion.
        # Strips are gathered per group with 1D row indices: a single
        # 2D-index gather (y[r0_g.T]) hits XLA's generic gather path.
        rows2 = jnp.concatenate([y[r0_g[gi]] for gi in range(gg_n)],
                                axis=1)                 # [m, (g, slot, c)]
        # rank[m, (g, j, c)] = delta[m, g, j], repeated over c
        rank = jnp.repeat(
            delta_g.transpose(1, 0, 2).reshape(m, gg_n * k), cin, axis=1)
        out = jnp.zeros((m, w_slab), packed_dtype)
        for d in range(k):  # out[m,(g,j,c)] = rows2[m,(g,delta[m,g,j],c)]
            src_d = jnp.broadcast_to(
                rows2.reshape(m, gg_n, k, cin)[:, :, d:d + 1, :],
                (m, gg_n, k, cin)).reshape(m, w_slab)
            out = jnp.where(rank == d, src_d, out)
        return out

    pad_g = (-n_grp) % gg
    if pad_g:  # pad with empty groups (all cells absent -> select nothing)
        r0 = jnp.concatenate([r0, jnp.zeros((m, pad_g), jnp.int32)], 1)
        delta = jnp.concatenate(
            [delta, jnp.full((m, pad_g, k), -1, jnp.int8)], 1)
        w = jnp.concatenate(
            [w, jnp.zeros((pad_g * k, cin, cout), w.dtype)], 0)
    steps = (n_grp + pad_g) // gg
    r0_s = r0.T.reshape(steps, gg, m)
    delta_s = delta.transpose(1, 0, 2).reshape(steps, gg, m, k)
    w_s = w.reshape(steps, gg * k * cin, cout).astype(packed_dtype)

    if steps == 1:
        slab = strip_slab(r0_s[0], delta_s[0])
        acc = jnp.dot(slab, w_s[0], preferred_element_type=out_dtype)
    else:
        @jax.checkpoint
        def body(acc, inp):
            # remat: recompute the slab in the backward instead of stacking
            # [m, gg*k*cin] activations across all scan steps
            r0_g, delta_g, wj = inp
            slab = strip_slab(r0_g, delta_g)
            return acc + jnp.dot(slab, wj,
                                 preferred_element_type=out_dtype), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((m, cout), dtype=out_dtype),
            (r0_s, delta_s, w_s))
    if bias is not None:
        assert valid is not None, "bias add requires a validity mask"
        acc = acc + bias[None, :]
    if valid is not None:
        acc = jnp.where(valid[:, None], acc, 0)
    return acc


def sparse_conv_zdilated(x: jax.Array, src: jax.Array, q0: jax.Array,
                         w: jax.Array, k: int,
                         packed_dtype=None,
                         group_size: int | None = None) -> jax.Array:
    """Zero-select packed-window conv over z-complete dilated maps — same
    math as ``sparse_conv`` with the full k^3 map, built for the k5 stem.

    ``sparse_conv_strips`` needs per-cell masked selects to compact a
    column's PRESENT cells into kernel-cell slots; those selects fall out
    of XLA fusion inside the full backbone and eat the gather win (PERF.md
    round-2 strips section). Here the input is first expanded onto the
    z-dilated set D = V (+) z*[-(k-1), k-1] (kernel_maps.dilated_window_maps):
    every needed z-window is FULLY present in D at consecutive rows, so
    cell dz' sits at the FIXED offset q0 + (dz'+r) and the whole window is
    one packed-row gather with no selects at all.

    Args:
      x:   [N, C_in] level features (zero pad rows).
      src: [Nd] int32 — V row per D position, -1 for dilation padding.
      q0:  [M, k*k] int32 — window-start D rows per (dx, dy) offset,
           -1 when the window holds no V cell.
      w:   [k^3, C_in, C_out] (kernel_offsets order, dz fastest).
    """
    m = q0.shape[0]
    n_grp = q0.shape[1]
    cin, cout = w.shape[1], w.shape[2]
    out_dtype = jnp.promote_types(x.dtype, w.dtype)
    if packed_dtype is None:
        packed_dtype = _packed_default_dtype(x.dtype)
    if group_size is None:
        group_size = 1 if cin * k >= 128 else max(128 // (cin * k), 1)
    gg = min(group_size, n_grp)

    xc = x.astype(packed_dtype)
    # features on the dilated set (dilation-padding positions are zero)
    x_d = jnp.where((src >= 0)[:, None],
                    xc[jnp.clip(src, 0, xc.shape[0] - 1)], 0)
    nd = x_d.shape[0]
    # packed windows: y[q] = [x_d[q] | x_d[q+1] | ... | x_d[q+k-1]]
    y = jnp.concatenate([jnp.roll(x_d, -d, axis=0) for d in range(k)], axis=1)
    y = jnp.concatenate([y, jnp.zeros((1, k * cin), packed_dtype)], axis=0)
    r = jnp.where(q0 >= 0, q0, nd).astype(jnp.int32)  # absent -> zero row

    pad_g = (-n_grp) % gg
    if pad_g:
        r = jnp.concatenate([r, jnp.full((m, pad_g), nd, jnp.int32)], 1)
        w = jnp.concatenate(
            [w, jnp.zeros((pad_g * k, cin, cout), w.dtype)], 0)
    steps = (n_grp + pad_g) // gg
    r_s = r.T.reshape(steps, gg, m)
    w_s = w.reshape(steps, gg * k * cin, cout).astype(packed_dtype)

    def slab_of(r_g):
        return jnp.concatenate([y[r_g[gi]] for gi in range(r_g.shape[0])],
                               axis=1)

    if steps == 1:
        acc = jnp.dot(slab_of(r_s[0]), w_s[0],
                      preferred_element_type=out_dtype)
    else:
        @jax.checkpoint
        def body(acc, inp):
            r_g, wj = inp
            return acc + jnp.dot(slab_of(r_g), wj,
                                 preferred_element_type=out_dtype), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((m, cout), dtype=out_dtype), (r_s, w_s))
    return acc


def sparse_conv_factored(x: jax.Array, zmap: jax.Array, b2: jax.Array,
                         w: jax.Array, unroll: bool | None = None) -> jax.Array:
    """Two-stage factored cubic conv — EXACT same math as ``sparse_conv``
    with the full k^3 map, ~2x (k=3) to ~3.7x (k=5) fewer gathered rows
    (sparse/kernel_maps.factored_maps has the derivation; gathers are
    row-rate bound on TPU at ~46 M rows/s regardless of row width).

    Stage A streams the z-column concat h[d] = [x(p_d - r*z) .. x(p_d + r*z)]
    over the z-dilated set D; stage B is a k^2-offset gather-GEMM over h
    with the kernel reshaped [k^2, k*C_in, C_out] (dz-fastest product order
    means NO weight permutation).

    Args:
      x:    [N, C_in].
      zmap: [Nd, k] rows into x, -1 absent.
      b2:   [M, k*k] rows into D, -1 absent.
      w:    [k^3, C_in, C_out].
    """
    k = zmap.shape[1]
    cin, cout = w.shape[1], w.shape[2]
    h = jnp.concatenate(
        [masked_gather(x, zmap[:, i]) for i in range(k)], axis=1)
    w2 = w.reshape(k * k, k * cin, cout)
    return sparse_conv(h, b2, w2, unroll=unroll)


def sparse_conv_transpose(x_coarse: jax.Array, up_parent: jax.Array,
                          up_offset: jax.Array, w: jax.Array) -> jax.Array:
    """Kernel-2 stride-2 generative transposed conv back onto the finer map.

    Each fine voxel receives exactly one coarse contributor (its parent)
    through kernel element up_offset (see sparse/kernel_maps.py): the coarse
    map was produced by striding the fine map, so parents always exist and
    down/up coordinate sets mirror exactly (reference res16unet.py:253-287
    relies on the same property via ME's coordinate manager).

    Args:
      x_coarse: [N_coarse, C_in].
      up_parent: [N_fine] int32 rows into x_coarse (-1 on pad rows).
      up_offset: [N_fine] int32 kernel element in [0, 8).
      w: [8, C_in, C_out].
    """
    out_dtype = jnp.promote_types(x_coarse.dtype, w.dtype)
    g = masked_gather(x_coarse, up_parent)          # [N_fine, C_in]
    # One matmul per kernel element on the full row set, select per voxel.
    # 8 GEMMs of [N_fine, C_in] @ [C_in, C_out]; XLA keeps them on the MXU.
    acc = jnp.zeros((g.shape[0], w.shape[2]), dtype=out_dtype)
    for k in range(w.shape[0]):
        y = jnp.dot(g, w[k], preferred_element_type=out_dtype)
        acc = acc + jnp.where((up_offset == k)[:, None], y, 0)
    # pad rows: up_parent == -1 -> g == 0 -> acc row 0 already.
    return acc


def linear(x: jax.Array, w: jax.Array, bias: jax.Array | None = None,
           valid: jax.Array | None = None) -> jax.Array:
    """1x1 sparse conv == per-row linear (ME kernel_size=1)."""
    y = jnp.dot(x, w, preferred_element_type=jnp.promote_types(x.dtype, w.dtype))
    if bias is not None:
        assert valid is not None, "bias add requires a validity mask"
        y = y + bias[None, :]
    if valid is not None:
        y = jnp.where(valid[:, None], y, 0)
    return y


def sparse_conv_im2col(x: jax.Array, nbr: jax.Array, w: jax.Array) -> jax.Array:
    """im2col formulation: gather all K neighbors into [M, C_in*K] and do
    ONE [M, C_in*K] @ [C_in*K, C_out] matmul. The right shape for the k=5
    stem conv whose C_in is 3 — per-offset matmuls would contract over 3
    lanes; this contracts over 375.

    Gathers run per input channel so the materialized buffer keeps K (not
    C_in) on the minor axis — a [M, K, C_in] layout would be lane-padded
    C_in -> 128 by TPU tiling (a 42x memory blowup for C_in=3)."""
    k, cin, cout = w.shape
    safe = jnp.clip(nbr, 0, x.shape[0] - 1)
    present = nbr >= 0
    g = jnp.concatenate(
        [jnp.where(present, x[:, c][safe], 0) for c in range(cin)],
        axis=1)                                            # [M, C_in*K]
    w_cmajor = jnp.transpose(w, (1, 0, 2)).reshape(cin * k, cout)
    out_dtype = jnp.promote_types(x.dtype, w.dtype)
    return jnp.dot(g, w_cmajor, preferred_element_type=out_dtype)


def avg_pool_down(x: jax.Array, down: jax.Array) -> jax.Array:
    """Kernel-2 stride-2 average pooling (ME MinkowskiAvgPooling, used to
    pool raw xyz coordinates down the pyramid — reference models/agile3d.py:71,
    171-175). Mean over present children."""
    total = jnp.zeros((down.shape[0], x.shape[1]), dtype=x.dtype)
    count = jnp.zeros((down.shape[0],), dtype=x.dtype)
    for k in range(down.shape[1]):
        idx = down[:, k]
        total = total + masked_gather(x, idx)
        count = count + (idx >= 0).astype(x.dtype)
    return total / jnp.maximum(count, 1)[:, None]


def sum_pool_down(x: jax.Array, down: jax.Array) -> jax.Array:
    """Kernel-2 stride-2 sum pooling (ME MinkowskiSumPooling,
    reference models/modules/common.py:240-258)."""
    total = jnp.zeros((down.shape[0], x.shape[1]), dtype=x.dtype)
    for k in range(down.shape[1]):
        total = total + masked_gather(x, down[:, k])
    return total


def avg_unpool_up(x_coarse: jax.Array, up_parent: jax.Array) -> jax.Array:
    """Kernel-2 stride-2 average unpooling (ME MinkowskiAvgUnpooling,
    reference models/modules/common.py:219-237): copy parent value down."""
    return masked_gather(x_coarse, up_parent)
