"""Padded, device-ready pyramid — the static-shape `SparseGrid` pytree that
replaces ME's stateful CoordinateManager (SURVEY.md section 7 architecture
stance). Scenes are padded to size buckets so XLA compiles once per bucket.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

from agile3d_tpu.config import DEFAULT_VOXEL_BUCKETS, bucket_size
from agile3d_tpu.sparse.kernel_maps import Pyramid


class PaddedLevel(NamedTuple):
    """One pyramid level, padded to a bucket. All maps use -1 for absent/pad;
    gathers go through ops.sparse_conv.masked_gather which zero-fills."""

    grid: np.ndarray          # int32 [Np, 3]
    batch: np.ndarray         # int32 [Np] (pad rows = -1)
    valid: np.ndarray         # bool  [Np]
    k3: np.ndarray            # int32 [Np, 27]
    k5: np.ndarray | None     # int32 [Np, 125] | None
    down: np.ndarray | None   # int32 [Np_next, 8] (rows into THIS level)
    up_parent: np.ndarray | None  # int32 [Np] (rows into next level)
    up_offset: np.ndarray | None  # int32 [Np]
    num_valid: int            # python int: true voxel count (static per bucket)
    # factored-conv maps (kernel_maps.factored_maps); None when not built
    z3: np.ndarray | None = None   # int32 [Nd3p, 3]
    b9: np.ndarray | None = None   # int32 [Np, 9]
    z5: np.ndarray | None = None   # int32 [Nd5p, 5]
    b25: np.ndarray | None = None  # int32 [Np, 25]
    # z-complete dilated stem maps (sparse_conv_zdilated)
    zd_src: np.ndarray | None = None  # int32 [Ndp]
    zd_q0: np.ndarray | None = None   # int32 [Np, k*k]
    # banded windowed-gather aux (ops/banded_conv.banded_prep); None when
    # the level is small, unaligned, or violates the static band profile
    # (the backbone then routes this level's wide k3 convs through the
    # scan conv — jit keys on the pytree structure, so this is a per-scene
    # static dispatch, never a wrong result)
    bw0: np.ndarray | None = None     # int32 window starts /32
    blo: np.ndarray | None = None     # int32 [Np/128, Kpad] band starts /32
    bexc: np.ndarray | None = None    # int32 [EXC_CAP, 2] out-of-band pairs
    # banded STEM aux (ops/banded_stem.stem_banded_prep) — finest level
    # only; None falls back to the XLA strips stem the same way
    sb_w0: np.ndarray | None = None   # int32 [Np/128] window starts /32
    sb_lo: np.ndarray | None = None   # int32 [Np/128, 32] band starts /32
    sb_r0: np.ndarray | None = None   # int32 [Np, 32] strip-start rows
    sb_rank: np.ndarray | None = None  # int8 [Np, 512] per-lane cell rank
    sb_exc: np.ndarray | None = None  # int32 [EXC_CAP, 2+K] out-of-band
    #   strips as (row, group, cell rows) — self-contained so the eval
    #   transfer can drop k5 when the banded stem serves the scene


class PaddedPyramid(NamedTuple):
    levels: tuple  # tuple[PaddedLevel, ...], finest first


def _pad_rows(a: np.ndarray | None, n: int, fill) -> np.ndarray | None:
    if a is None:
        return None
    pad = n - a.shape[0]
    if pad < 0:
        raise ValueError(f"bucket {n} smaller than array {a.shape[0]}")
    widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, widths, constant_values=fill)


def pad_pyramid(
    pyr: Pyramid, buckets: Sequence[int] = DEFAULT_VOXEL_BUCKETS,
    stem_banded: bool = True,
) -> PaddedPyramid:
    from agile3d_tpu.ops.banded_conv import banded_prep

    sizes = [bucket_size(l.num_voxels, buckets) for l in pyr.levels]
    out = []
    for i, lvl in enumerate(pyr.levels):
        n = sizes[i]
        n_next = sizes[i + 1] if i + 1 < len(sizes) else None
        valid = np.zeros(n, dtype=bool)
        valid[: lvl.num_voxels] = True
        def pad_z(z):
            if z is None:
                return None
            # dilated sets can exceed the top voxel bucket (|D| <= k*N);
            # round up to a 1024 multiple past the ladder
            nd = bucket_size(z.shape[0], buckets)
            if nd < z.shape[0]:
                nd = -(-z.shape[0] // 1024) * 1024
            return _pad_rows(z, nd, -1)

        out.append(
            PaddedLevel(
                grid=_pad_rows(lvl.grid, n, 0),
                batch=_pad_rows(lvl.batch, n, -1),
                valid=valid,
                k3=_pad_rows(lvl.k3, n, -1),
                k5=_pad_rows(lvl.k5, n, -1),
                down=_pad_rows(lvl.down, n_next, -1) if lvl.down is not None else None,
                up_parent=_pad_rows(lvl.up_parent, n, -1),
                up_offset=_pad_rows(lvl.up_offset, n, 0),
                num_valid=lvl.num_voxels,
                z3=pad_z(getattr(lvl, "z3", None)),
                b9=_pad_rows(getattr(lvl, "b9", None), n, -1),
                z5=pad_z(getattr(lvl, "z5", None)),
                b25=_pad_rows(getattr(lvl, "b25", None), n, -1),
                zd_src=pad_z(getattr(lvl, "zd_src", None)),
                zd_q0=_pad_rows(getattr(lvl, "zd_q0", None), n, -1),
            )
        )
        # banded k3 aux for the two finest levels (where the wide-conv
        # gathers dominate the backbone; deeper levels are scan-cheap)
        if i < 2 and n >= 32768:
            bw0, blo, bexc, ok = banded_prep(out[-1].k3)
            if ok:
                out[-1] = out[-1]._replace(bw0=bw0, blo=blo, bexc=bexc)
        # banded stem aux (finest level, kernel-5 stem only; the stem
        # kernel is eval-only, so training collation skips the prep)
        if stem_banded and i == 0 and out[-1].k5 is not None and n >= 32768:
            from agile3d_tpu.ops.banded_stem import stem_banded_prep

            sw0, slo, sr0, srank, sexc, sok = stem_banded_prep(out[-1].k5)
            if sok:
                out[-1] = out[-1]._replace(sb_w0=sw0, sb_lo=slo,
                                           sb_r0=sr0, sb_rank=srank,
                                           sb_exc=sexc)
    return PaddedPyramid(levels=tuple(out))


def pad_features(feats: np.ndarray, n: int) -> np.ndarray:
    """Pad per-voxel features [N, C] with zero rows to [n, C]."""
    return _pad_rows(np.asarray(feats), n, 0)
