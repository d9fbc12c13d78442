"""Host-side span probe for a banded STRIP-level stem kernel (k5).

The stem's 25 (dx, dy) column strips each gather one packed row per output
voxel (strip start r0 = min present cell). If those r0 maps are banded like
the k3 per-offset maps, the stem can run as a Mosaic windowed one-hot
kernel over the PACKED [N, 15] array: 25 strip gathers instead of 125 cell
gathers, with in-kernel compaction.

Prints, per |dx| cluster: max/p99 span for BLOCK_M=128 blocks (+ alignment
slack), the per-block union window, and the resulting one-hot FLOP count.

Run: python tools/probe_stem_spans.py [n_points]
"""

import sys

import numpy as np

sys.path.insert(0, ".")

from agile3d_tpu.config import Config
from agile3d_tpu.sparse.kernel_maps import build_pyramid
from agile3d_tpu.sparse.quantize import sparse_quantize
from agile3d_tpu.data.synthetic import make_scene


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
    rng = np.random.default_rng(0)
    coords, colors, labels = make_scene(rng, n_points=n_points, num_obj=8,
                                        extent=8.0)
    coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
    vox, _, _ = sparse_quantize(coords, Config().model.voxel_size)
    pyr = build_pyramid(vox)
    k5 = pyr.levels[0].k5            # [N, 125] cell map, offsets z-fastest
    n = len(k5)
    print(f"N = {n}")

    bm = 128
    n_blk = (n // bm) * bm
    k = 5
    cells = k5[:n_blk].reshape(-1, bm, 25, k).astype(np.int64)
    present = cells >= 0
    big = np.int64(1) << 40
    # strip start per (row, group)
    r0 = np.where(present, cells, big).min(axis=3)          # [nb, bm, 25]
    # per-block per-group span
    gmax = np.where(r0 < big, r0, -big).max(axis=1)          # [nb, 25]
    gmin = np.where(r0 < big, r0, big).min(axis=1)           # [nb, 25]
    has = gmax >= gmin - 0  # block has any strip for this group
    span = np.where(has, gmax - gmin + 1, 0)                 # [nb, 25]

    # groups enumerated dx-major (offsets z fastest): group = dx*5 + dy
    gdx = np.abs(np.arange(25) // 5 - 2)
    for adx in range(3):
        s = span[:, gdx == adx].ravel()
        s = s[s > 0]
        print(f"|dx|={adx}: groups={np.sum(gdx == adx)} span p50 "
              f"{np.percentile(s, 50):.0f} p99 {np.percentile(s, 99):.0f} "
              f"max {s.max()}")

    # per-block union window (over all groups)
    umin = np.where(r0 < big, r0, big).min(axis=(1, 2))
    umax = np.where(r0 < big, r0, -big).max(axis=(1, 2))
    uni = umax - umin + 1 + k  # + strip length tail
    print(f"union window: p50 {np.percentile(uni, 50):.0f} p99 "
          f"{np.percentile(uni, 99):.0f} max {uni.max()}")

    # one-hot FLOPs with widths = per-cluster max rounded up to 32 + 32
    widths = []
    for g in range(25):
        s = span[:, g]
        w = int(np.ceil((s.max() + 32) / 32) * 32)
        widths.append(w)
    sw = sum(widths)
    print(f"per-group widths: {widths}\nsum_W = {sw}; one-hot GFLOP = "
          f"{2 * n * sw * 128 / 1e9:.0f}")


if __name__ == "__main__":
    main()
