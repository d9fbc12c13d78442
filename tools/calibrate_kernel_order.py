"""Calibrate the ME kernel-offset enumeration against a released checkpoint.

SURVEY.md hard part #2: our sparse convs enumerate cubic kernel offsets in
itertools.product order (sparse/kernel_maps.kernel_offsets); MinkowskiEngine
enumerates its kernel regions in its own C++ order. For training from
scratch this is irrelevant (weights are learned around whatever order is
used), but loading the reference's released ``checkpoint1099.pth`` requires
the kernel slices to be permuted into our order
(utils/ckpt.convert_torch_state_dict's ``kernel_perm`` hook).

This tool finds that permutation empirically, without MinkowskiEngine:
the candidate orders are the 48 signed axis permutations of the offset
lattice (ME uses one fixed traversal; any mismatch with ours is an axis
order/sign relabeling). For each candidate we run the backbone stem conv on
the recorded probe scene and score agreement against reference activations
recorded from the original repo (record them once with torch+ME using
tools/record_reference_activations.py on a CUDA/CPU machine that has ME).

Row alignment: the reference's ``stem_out`` rows follow ME's voxel order;
ours are packed-key sorted (sparse/quantize.py). When the recording carries
``vox`` (ME's voxel coordinates, written by record_reference_activations),
rows are matched EXACTLY by coordinate; otherwise we fall back on the
first-occurrence assumption (ME rows ordered by first point occurrence,
the same map data/datasets.py:130-134 uses for pre-recorded clicks).

The scoring core (``calibrate``) is exercised end-to-end by
tests/test_calibration.py, which fabricates a reference recording with a
known non-identity relabeling and asserts this tool recovers it.

Usage:
  python tools/calibrate_kernel_order.py \
      --checkpoint checkpoint1099.pth \
      --activations ref_activations.npz   # probe coords + recorded outputs
"""

from __future__ import annotations

import argparse
import itertools

import numpy as np


def candidate_perms(kernel_size: int):
    """All signed axis relabelings of the hypothesized ME traversal.

    The base hypothesis is the analytic ME order (column-major, first axis
    fastest — kernel_maps.me_kernel_perm); each candidate (axes, signs)
    relabels that traversal's axes. The returned perm maps our
    kernel_offsets() order onto the candidate: ours[i] = ckpt[perm[i]].
    Identity (axes=(0,1,2), signs=(1,1,1)) == the analytic default."""
    from agile3d_tpu.sparse.kernel_maps import kernel_offsets

    ours = kernel_offsets(kernel_size)
    me_base = ours[:, ::-1].copy()  # reversed-axis product == x fastest
    # rows of me_base in enumeration order j hold offset (x,y,z)? No:
    # product order varies the LAST tuple slot fastest; reversing columns
    # makes slot 0 (x) the fastest-varying, i.e. ME's column-major walk.
    out = {}
    for axes in itertools.permutations(range(3)):
        for signs in itertools.product((1, -1), repeat=3):
            cand = me_base[:, list(axes)] * np.array(signs)
            index = {tuple(o): j for j, o in enumerate(cand)}
            try:
                perm = np.array([index[tuple(o)] for o in ours])
            except KeyError:  # even kernels aren't sign-symmetric
                continue
            out[(axes, signs)] = perm
    return out


def align_ref_rows(rec, vox: np.ndarray, umap: np.ndarray) -> np.ndarray:
    """Map ME recording rows onto our sorted voxel rows.

    Returns ``our_rows`` [Nv] such that reference row j describes the same
    voxel as our row ``our_rows[j]``. Primary path: exact coordinate match
    against ``rec['vox']``. Fallback (no ``vox`` key): ME rows are assumed
    ordered by first point occurrence, so ``our_rows = argsort(umap)``
    (our row whose representative point comes j-th in point order)."""
    from agile3d_tpu.sparse.quantize import pack_coords

    if "vox" in rec:
        me_vox = np.asarray(rec["vox"], np.int64)
        if me_vox.shape[1] == 4:  # ME batched (b,x,y,z) coords
            me_vox = me_vox[:, 1:]
        if me_vox.shape[0] != vox.shape[0]:
            raise ValueError(
                f"recorded vox count {me_vox.shape[0]} != ours "
                f"{vox.shape[0]}: quantization disagrees")
        our_keys = pack_coords(vox)          # sorted (quantize invariant)
        me_keys = pack_coords(me_vox)
        our_rows = np.searchsorted(our_keys, me_keys)
        our_rows = np.clip(our_rows, 0, len(our_keys) - 1)
        if not np.array_equal(our_keys[our_rows], me_keys):
            raise ValueError("recorded voxel coords do not match ours")
        return our_rows
    # First-occurrence fallback — same assumption as the pre-recorded-click
    # translation (data/datasets.py:130-134).
    return np.argsort(umap, kind="stable")


def calibrate(rec, stem_kernel: np.ndarray, voxel_size: float = 0.05):
    """Score every candidate relabeling of ``stem_kernel`` (ME slice
    order, [k^3, Cin, Cout]) against the recorded ``stem_out``.

    Returns (scores, best_key, kernel_perm_table) where scores is a dict
    {(axes, signs): mean_abs_err} and the table maps kernel volume ->
    perm list for the winning relabeling."""
    import jax.numpy as jnp

    from agile3d_tpu.sparse import build_pyramid, pad_pyramid
    from agile3d_tpu.sparse.grid import pad_features
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from agile3d_tpu.ops.sparse_conv import sparse_conv

    coords = np.asarray(rec["coords"], np.float32)
    feats = np.asarray(rec["feats"], np.float32)
    ref_out = np.asarray(rec["stem_out"], np.float32)

    vox, umap, _ = sparse_quantize(coords, voxel_size)
    our_rows = align_ref_rows(rec, vox, umap)
    pyr = pad_pyramid(build_pyramid(vox))
    n0 = pyr.levels[0].grid.shape[0]
    x = jnp.asarray(pad_features(feats[umap], n0))
    k5 = jnp.asarray(pyr.levels[0].k5)

    ksz = round(stem_kernel.shape[0] ** (1 / 3))
    scores = {}
    for key, perm in candidate_perms(ksz).items():
        w = jnp.asarray(stem_kernel[perm])
        out = np.asarray(sparse_conv(x, k5, w))[: len(vox)]
        scores[key] = float(np.abs(out[our_rows] - ref_out).mean())

    best_key = min(scores, key=scores.get)
    cands = {k: candidate_perms(k) for k in (5, 3, 2)}
    table = {k ** 3: c[best_key].tolist()
             for k, c in cands.items() if best_key in c}
    return scores, best_key, table


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--activations", required=True,
                    help="npz from tools/record_reference_activations.py "
                         "('coords', 'feats', 'stem_out', ideally 'vox')")
    ap.add_argument("--voxel_size", type=float, default=0.05)
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.checkpoint, map_location="cpu",
                      weights_only=False)
    sd = ckpt.get("model", ckpt)
    stem = np.asarray(sd["backbone.conv0p1s1.kernel"].detach()
                      if hasattr(sd["backbone.conv0p1s1.kernel"], "detach")
                      else sd["backbone.conv0p1s1.kernel"], np.float32)

    rec = np.load(args.activations)
    if "vox" not in rec:
        print("WARNING: recording has no 'vox' coords; relying on the "
              "first-occurrence row-order assumption")

    scores, best_key, table = calibrate(rec, stem, args.voxel_size)
    for key, err in sorted(scores.items(), key=lambda kv: kv[1]):
        print(f"axes={key[0]} signs={key[1]}: mean abs err {err:.6f}")
    axes, signs = best_key
    print(f"\nBest: axes={axes} signs={signs} (err {scores[best_key]:.6f})")
    print("kernel_perm table:", table)
    if axes == (0, 1, 2) and signs == (1, 1, 1):
        print("=> matches the analytic default (me_kernel_perm); "
              "no override needed.")
    else:
        print("=> DIFFERS from the analytic default; pass this table as "
              "kernel_perm= to convert_torch_state_dict / "
              "load_model_weights.")


if __name__ == "__main__":
    main()
