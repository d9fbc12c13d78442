"""Record reference-backbone activations for checkpoint-parity calibration.

Runs in the ORIGINAL AGILE3D environment (torch + MinkowskiEngine; see the
reference installation.md) — not in this repo's TPU environment. It loads
the released checkpoint, pushes a deterministic probe scene through the
reference backbone (reference models/res16unet.py:222-295), and records:

  coords    [N, 3] float  raw probe coordinates (pre-quantization)
  feats     [N, 3] float  per-point colors in [0, 1]
  stem_out  [Nv, 32]      conv0p1s1 output (pre-BN) on the voxelized scene
  vox       [Nv, 3] int   ME's voxel coordinates (so row order is pinned)
  fmap{0..4}[*, C]        the 5 FPN feature maps (stride 16 -> 1)
  fmap{i}_coords [*, 4]   ME (batch,x,y,z) coords per fmap row

The npz feeds tools/calibrate_kernel_order.py, which resolves the ME
kernel-offset enumeration permutation empirically (the analytic default
lives in agile3d_tpu/sparse/kernel_maps.me_kernel_perm), and the same file
can drive full-backbone parity checks against the converted weights.

Usage (from the reference repo root, ME env):
  python record_reference_activations.py \
      --reference_repo /path/to/AGILE3D \
      --checkpoint weights/checkpoint1099.pth \
      --out ref_activations.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def make_probe(n_points: int = 20000, seed: int = 0):
    """Deterministic probe scene: a few axis-aligned boxes + noise, spanning
    ~4 m so the 5-level pyramid is non-degenerate at 5 cm voxels."""
    rng = np.random.default_rng(seed)
    pts = []
    for i in range(6):
        lo = rng.random(3) * 3.0
        hi = lo + 0.4 + rng.random(3) * 0.8
        pts.append(lo + rng.random((n_points // 8, 3)) * (hi - lo))
    pts.append(rng.random((n_points - len(pts) * (n_points // 8), 3)) * 4.0)
    coords = np.concatenate(pts).astype(np.float32)
    coords -= coords.min(0)
    feats = rng.random((len(coords), 3)).astype(np.float32)
    return coords, feats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference_repo", default=".",
                    help="AGILE3D repo root (for `from models import ...`)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", default="ref_activations.npz")
    ap.add_argument("--voxel_size", type=float, default=0.05)
    ap.add_argument("--n_points", type=int, default=20000)
    args = ap.parse_args()

    sys.path.insert(0, args.reference_repo)

    import MinkowskiEngine as ME  # noqa: N817
    import torch

    from models import build_model  # reference models/__init__.py:6

    class A:  # the backbone flags build_agile3d reads (reference main.py:24-84)
        dialations = [1, 1, 1, 1]
        conv1_kernel_size = 5
        bn_momentum = 0.02
        voxel_size = 0.05
        hidden_dim = 128
        dim_feedforward = 1024
        num_heads = 8
        num_decoders = 3
        num_bg_queries = 10
        dropout = 0.0
        pre_norm = False
        normalize_pos_enc = True
        positional_encoding_type = "fourier"
        gauss_scale = 1.0
        hlevels = [4]
        shared_decoder = False
        aux = True

    model = build_model(A())
    ckpt = torch.load(args.checkpoint, map_location="cpu",
                      weights_only=False)
    missing, unexpected = model.load_state_dict(
        ckpt.get("model", ckpt), strict=False)
    print("missing:", missing, "\nunexpected:", unexpected)
    model.eval()

    coords, feats = make_probe(args.n_points)
    q = np.floor(coords / args.voxel_size).astype(np.int32)
    bcoords = ME.utils.batched_coordinates([q])
    _, unique_map = ME.utils.sparse_quantize(
        bcoords.numpy(), return_index=True)
    x = ME.SparseTensor(
        coordinates=bcoords[unique_map],
        features=torch.from_numpy(feats[unique_map]))

    rec = {"coords": coords, "feats": feats,
           "vox": x.coordinates[:, 1:].numpy(),
           # ME's unique_map: validates the first-occurrence row-order
           # assumption the pre-recorded-click translation rests on
           # (agile3d_tpu/data/datasets.py:121-138; check it is sorted
           # ascending == first occurrence in point order)
           "unique_map": np.asarray(unique_map)}

    stem = {}

    def hook(_m, _i, out):
        stem["out"] = out.features.detach().numpy()

    h = model.backbone.conv0p1s1.register_forward_hook(hook)
    with torch.no_grad():
        # raw_coordinates is a plain per-row feature tensor aligned with x
        # (reference eval_multi_obj.py:114, models/agile3d.py:163-170)
        pcd_features, aux, _, _ = model.forward_backbone(
            x, raw_coordinates=torch.from_numpy(
                coords[unique_map].astype(np.float32)))
    h.remove()

    rec["stem_out"] = stem["out"]
    for i, f in enumerate(aux):
        rec[f"fmap{i}"] = f.features.detach().numpy()
        rec[f"fmap{i}_coords"] = f.coordinates.numpy()
    rec["pcd_features"] = pcd_features.features.detach().numpy()

    np.savez_compressed(args.out, **rec)
    print(f"wrote {args.out}: " +
          ", ".join(f"{k}{v.shape}" for k, v in rec.items()))


if __name__ == "__main__":
    main()
