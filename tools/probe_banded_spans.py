"""Host-side probe for the banded-gather sparse-conv design.

Premise: if voxel rows are sorted by packed coordinate key, then for any
fixed kernel offset o the gather map g_o is STRICTLY INCREASING over its
domain (adding a constant offset vector preserves lexicographic order).
A per-offset gather is then a *banded* access: for a block of B consecutive
output rows, the needed input rows live in a window
[min_idx, min_idx + span). If span stays near B + small drift, the gather
can be realized as a dynamic-slice window + one-hot MXU matmul instead of
XLA's ~4 ns/row scalar gather — the lever for the backbone's 196 ms.

This probe measures, on the bench-scale synthetic scene:
  * per (level, conv-kind, offset): valid-pair fraction
  * per (offset, block): span distribution for B in {512, 1024}
  * spill fraction (pairs falling outside a W-row window) for W multiples
under (a) packed-key sort order (z-minor lex) and (b) Morton order.

Run: python tools/probe_banded_spans.py [n_points]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from agile3d_tpu.config import Config
from agile3d_tpu.sparse.kernel_maps import build_pyramid
from agile3d_tpu.sparse.quantize import pack_coords, sparse_quantize
from agile3d_tpu.data.synthetic import make_scene


def morton_keys(grid: np.ndarray) -> np.ndarray:
    """Interleave 19-bit unsigned per-axis coords into a Morton key."""
    c = grid.astype(np.int64) + (1 << 18)
    assert c.min() >= 0 and c.max() < (1 << 19)
    key = np.zeros(len(grid), np.int64)
    for bit in range(19):
        for ax in range(3):
            key |= ((c[:, ax] >> bit) & 1) << (bit * 3 + (2 - ax))
    return key


def span_stats(nbr: np.ndarray, B: int, Ws=(1.25, 1.5, 2.0, 3.0)):
    """For map [M, K]: per offset, block spans + spill fractions.

    Returns dict with aggregate stats over all offsets.
    """
    m, k = nbr.shape
    nblk = (m + B - 1) // B
    pad = nblk * B - m
    nb = np.concatenate([nbr, np.full((pad, k), -1, nbr.dtype)], axis=0)
    nb = nb.reshape(nblk, B, k)
    valid = nb >= 0
    big = np.where(valid, nb, np.iinfo(np.int32).max)
    small = np.where(valid, nb, np.iinfo(np.int32).min)
    lo = big.min(axis=1)          # [nblk, k] window starts
    hi = small.max(axis=1)
    has = valid.any(axis=1)
    span = np.where(has, hi - lo + 1, 0)
    total_pairs = int(valid.sum())
    out = {
        "pairs_frac": total_pairs / (m * k),
        "span_p50": float(np.percentile(span[has], 50)) if has.any() else 0,
        "span_p95": float(np.percentile(span[has], 95)) if has.any() else 0,
        "span_p99": float(np.percentile(span[has], 99)) if has.any() else 0,
        "span_max": int(span.max()) if has.any() else 0,
    }
    for wmul in Ws:
        W = int(B * wmul)
        local = nb - lo[:, None, :]
        spill = valid & (local >= W)
        out[f"spill@W={wmul}B"] = float(spill.sum()) / max(total_pairs, 1)
    return out


def fmt(d):
    return (f"pairs {d['pairs_frac']*100:5.1f}%  span p50/p95/p99/max "
            f"{d['span_p50']:7.0f}/{d['span_p95']:7.0f}/{d['span_p99']:8.0f}"
            f"/{d['span_max']:8d}  " +
            "  ".join(f"spill@{k.split('=')[1]} {v*100:6.3f}%"
                      for k, v in d.items() if k.startswith("spill")))


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
    cfg = Config()
    rng = np.random.default_rng(0)
    coords, colors, labels = make_scene(rng, n_points=n_points, num_obj=8,
                                        extent=8.0)
    coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
    vox, umap, imap = sparse_quantize(coords, cfg.model.voxel_size)
    print(f"scene: {len(vox)} voxels")

    # Morton order was measured here too before build_pyramid grew its
    # sorted-row guard: spans were 20-300x worse at every level (p50 span
    # 11k-31k at L0 vs 511 for lex) — z-minor lexicographic order is the
    # right one and the Morton branch is retired.
    for order_name in ("lex",):
        keys = pack_coords(vox)
        perm = np.argsort(keys, kind="stable")
        pyr = build_pyramid(vox[perm])
        print(f"\n=== order: {order_name} ===")
        for li, lvl in enumerate(pyr.levels):
            n = lvl.num_voxels
            for B in (512, 1024):
                s = span_stats(lvl.k3, B)
                print(f"L{li} N={n:7d} k3   B={B:5d}  {fmt(s)}")
            if lvl.k5 is not None:
                s = span_stats(lvl.k5, 1024)
                print(f"L{li} N={n:7d} k5   B= 1024  {fmt(s)}")
            if lvl.down is not None:
                s = span_stats(lvl.down, 1024)
                print(f"L{li}->L{li+1} down          B= 1024  {fmt(s)}")


if __name__ == "__main__":
    main()
