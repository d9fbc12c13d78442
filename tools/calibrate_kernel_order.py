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
order/sign relabeling). For each candidate we run one backbone stem + first
block on a probe scene and score agreement against reference activations
recorded from the original repo (record them once with torch+ME using
tools/record_reference_activations.py on a CUDA/CPU machine that has ME).

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--activations", required=True,
                    help="npz with 'coords' [N,3] float, 'feats' [N,3], "
                         "'stem_out' [N,32] recorded from the reference")
    args = ap.parse_args()

    import jax.numpy as jnp

    from agile3d_tpu.sparse import build_pyramid, pad_pyramid
    from agile3d_tpu.sparse.grid import pad_features
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from agile3d_tpu.ops.sparse_conv import sparse_conv
    from agile3d_tpu.utils.ckpt import load_model_weights

    rec = np.load(args.activations)
    coords, feats, ref_out = rec["coords"], rec["feats"], rec["stem_out"]
    vox, umap, _ = sparse_quantize(coords, 0.05)
    pyr = pad_pyramid(build_pyramid(vox))
    n0 = pyr.levels[0].grid.shape[0]
    x = jnp.asarray(pad_features(feats[umap], n0))

    best = None
    for key, perm in candidate_perms(5).items():
        params, _, _ = load_model_weights(
            args.checkpoint, kernel_perm={125: perm})
        out = np.asarray(sparse_conv(
            x, jnp.asarray(pyr.levels[0].k5),
            jnp.asarray(params["backbone"]["conv0p1s1"]["w"])))
        err = np.abs(out[: len(vox)] - ref_out[umap]).mean()
        print(f"axes={key[0]} signs={key[1]}: mean abs err {err:.6f}")
        if best is None or err < best[1]:
            best = (key, err, perm)

    axes, signs = best[0]
    print(f"\nBest: axes={axes} signs={signs} (err {best[1]:.6f})")

    # Full table: same (axes, signs) relabeling applied per kernel size.
    # The relabeling candidates are composed on top of the analytic ME
    # default (kernel_maps.me_kernel_perm); identity relabeling == default.
    from agile3d_tpu.sparse.kernel_maps import me_kernel_perm

    table = {}
    for ksz in (5, 3, 2):
        cands = candidate_perms(ksz)
        if (axes, signs) in cands:
            table[ksz ** 3] = cands[(axes, signs)].tolist()
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
