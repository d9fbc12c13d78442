"""Voxel-axis sequence-parallel BACKBONE over the mesh's ``sp`` axis.

SURVEY.md section 7 stage 8 / section 5.7: the backbone is where the HBM
actually goes at KITTI-360 scale (reference models/res16unet.py:222-295 is
the load), so beyond-one-chip scenes must shard the voxel axis through the
UNet itself, not just the decoder (parallel/sp.py).

Design (all static shapes, one compile per bucket):

  * Rows are partitioned into n_sp CONTIGUOUS chunks of the padded level
    arrays. Rows are sorted by packed (batch,x,y,z) key (the sparse core's
    invariant), so a chunk is a slab in x — cross-shard neighbors live in
    a thin boundary layer.
  * At collate time ``partition_pyramid`` computes, per level, the HALO:
    the set of rows referenced by an output row owned by a different
    shard (through the k3/k5 neighbor maps, the stride-2 down maps, and
    the transposed-conv parent maps), padded to a static bucket. Every
    kernel map is remapped into shard-local coordinates: local rows
    [0, L), halo rows [L, L+H); -1 stays absent.
  * At run time each conv performs one HALO EXCHANGE — every shard
    gathers the halo rows it owns into a zeros [H, C] buffer and a psum
    over 'sp' replicates the full halo — then runs the plain gather-GEMM
    conv (ops/sparse_conv.sparse_conv) on [x_local | halo]. The exchange
    moves O(H*C) bytes over ICI per conv; H is the boundary layer
    (~N^(2/3)-scale), not N.
  * BatchNorm training moments are cross-shard: one psum of
    (count, sum, sum-of-squares) per BN (eval mode reads running stats
    locally, no collective).

The strips/banded/factored single-chip conv routings (models/backbone.py)
assume whole-array row adjacency and are intentionally NOT used here; the
SP path exists to make over-HBM scenes *fit*, and the plain scan conv is
the measured fallback everywhere else too.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from agile3d_tpu.config import ModelConfig
from agile3d_tpu.models.agile3d import SceneFeatures, _pos_enc
from agile3d_tpu.ops.norm import EPS, BNState
from agile3d_tpu.ops.sparse_conv import (
    linear,
    masked_gather,
    sparse_conv,
    sparse_conv_transpose,
)
from agile3d_tpu.sparse.grid import PaddedPyramid
from jax.sharding import Mesh, PartitionSpec as P


class SPLevel(NamedTuple):
    """One pyramid level, remapped for an n_sp-way row partition. All index
    arrays are flat over [n_sp * L_level] rows (shard_map slices them), and
    every map value lives in shard-LOCAL space: [0, L) = own rows,
    [L, L+H) = halo buffer rows, -1 = absent."""

    k3: np.ndarray                 # int32 [N, 27]
    k5: np.ndarray | None          # int32 [N, 125] finest level only
    down: np.ndarray | None        # int32 [N_next, 8] (reads THIS level)
    up_parent: np.ndarray | None   # int32 [N] (reads NEXT level's features)
    up_offset: np.ndarray | None   # int32 [N]
    valid: np.ndarray              # bool [N]
    halo_src: np.ndarray           # int32 [n_sp * H]: per shard, the LOCAL
    #   row of each halo slot it owns, -1 elsewhere (zeros after psum)


class SPPyramid(NamedTuple):
    levels: tuple  # tuple[SPLevel, ...] finest first


def _halo_bucket(n: int) -> int:
    """Static halo ladder: ~1.5x-geometric steps, 128-granular (128, 192,
    288, 448, 640, 1024, ...). The halo row count varies per scene; exact
    128-granular rounding would give the halo-exchange backbone a fresh
    shape set — and a fresh multi-minute XLA compile — for nearly every
    scene of a dataset eval. The geometric ladder caps the distinct
    compiled shapes at O(log N) while wasting <= ~50% pad rows (the halo
    is boundary-scale, ~6% of N, so the pad is noise next to N)."""
    h = 128
    while h < n:
        h = -(-(h * 3 // 2) // 128) * 128
    return h


def _cross_refs(map_arr: np.ndarray, l_out: int, l_in: int) -> np.ndarray:
    """Global input rows referenced by an output row of a different shard."""
    m = map_arr.shape[0]
    owner_out = (np.arange(m, dtype=np.int64) // l_out)[:, None]
    g = map_arr.astype(np.int64)
    mask = (g >= 0) & ((g // l_in) != owner_out)
    return np.unique(g[mask])


def _remap(map_arr: np.ndarray | None, l_out: int, l_in: int,
           halo: np.ndarray) -> np.ndarray | None:
    """Rewrite global input rows into shard-local [0,L) + halo [L,L+H)."""
    if map_arr is None:
        return None
    arr = map_arr
    squeeze = arr.ndim == 1
    if squeeze:
        arr = arr[:, None]
    owner_out = (np.arange(arr.shape[0], dtype=np.int64) // l_out)[:, None]
    g = arr.astype(np.int64)
    local = (g >= 0) & ((g // l_in) == owner_out)
    out = np.where(local, g - owner_out * l_in, -1)
    remote = (g >= 0) & ~local
    if remote.any():
        pos = np.searchsorted(halo, g[remote])
        assert (halo[pos] == g[remote]).all(), "halo set incomplete"
        out[remote] = l_in + pos
    out = out.astype(np.int32)
    return out[:, 0] if squeeze else out


def partition_pyramid(ppyr: PaddedPyramid, n_sp: int) -> SPPyramid:
    """Host-side: halo sets + shard-local kernel maps for an n_sp partition
    of a padded pyramid. Pure numpy (the same branchy index work as
    sparse/kernel_maps.py, done once per scene at collate time)."""
    levels = ppyr.levels
    nl = len(levels)
    sizes = [l.grid.shape[0] for l in levels]
    for n in sizes:
        if n % n_sp != 0:
            raise ValueError(
                f"padded level size {n} not divisible by n_sp={n_sp}; "
                "every bucket in config.buckets must be a multiple of the "
                "sp mesh width")
    ls = [n // n_sp for n in sizes]

    # halo[l] = rows of level l needed across a shard boundary by any map
    # that READS level-l features: its own k3/k5, its down map (outputs at
    # l+1), and level (l-1)'s transposed-conv parents (outputs at l-1).
    halo_parts: list[list[np.ndarray]] = [[] for _ in range(nl)]
    for l, lvl in enumerate(levels):
        halo_parts[l].append(_cross_refs(lvl.k3, ls[l], ls[l]))
        if lvl.k5 is not None:
            halo_parts[l].append(_cross_refs(lvl.k5, ls[l], ls[l]))
        if lvl.down is not None:
            halo_parts[l].append(_cross_refs(lvl.down, ls[l + 1], ls[l]))
        if lvl.up_parent is not None and l + 1 < nl:
            halo_parts[l + 1].append(
                _cross_refs(lvl.up_parent[:, None], ls[l], ls[l + 1]))

    halos = []
    for l in range(nl):
        parts = [p for p in halo_parts[l] if p.size]
        halos.append(np.unique(np.concatenate(parts)) if parts
                     else np.empty(0, np.int64))

    out = []
    for l, lvl in enumerate(levels):
        halo = halos[l]
        h = _halo_bucket(halo.size)

        own = halo // ls[l]
        src = np.full((n_sp, h), -1, np.int64)
        shard_col = np.arange(n_sp)[:, None]
        src[:, : halo.size] = np.where(
            own[None, :] == shard_col, halo[None, :] - shard_col * ls[l], -1)

        up_parent = None
        if lvl.up_parent is not None and l + 1 < nl:
            # transposed-conv parents read the NEXT level's features
            up_parent = _remap(lvl.up_parent, ls[l], ls[l + 1], halos[l + 1])

        out.append(SPLevel(
            k3=_remap(lvl.k3, ls[l], ls[l], halo),
            k5=_remap(lvl.k5, ls[l], ls[l], halo),
            down=(_remap(lvl.down, ls[l + 1], ls[l], halo)
                  if lvl.down is not None else None),
            up_parent=up_parent,
            up_offset=lvl.up_offset if up_parent is not None else None,
            valid=lvl.valid,
            halo_src=src.reshape(-1).astype(np.int32),
        ))

    return SPPyramid(levels=tuple(out))


# ---------------------------------------------------------------------------
# Device side (inside shard_map)
# ---------------------------------------------------------------------------


def _halo_exchange(x_local: jax.Array, halo_src: jax.Array,
                   axis: str) -> jax.Array:
    """[x_local | replicated halo rows]: each shard contributes the halo
    rows it owns (zeros elsewhere), one psum assembles the full buffer."""
    h = jax.lax.psum(masked_gather(x_local, halo_src), axis)
    return jnp.concatenate([x_local, h.astype(x_local.dtype)], axis=0)


def _batch_norm_sp(x, valid, params, state: BNState, *, training: bool,
                   momentum: float, axis: str):
    """Masked BatchNorm with CROSS-SHARD batch moments: one psum of
    (count, sum, sumsq). Same semantics as ops/norm.batch_norm on the
    concatenated rows (torch BatchNorm1d: biased var for normalization,
    unbiased for the running update)."""
    if training:
        m = valid.astype(x.dtype)
        n = jax.lax.psum(m.sum(), axis)
        n = jnp.maximum(n, 1)
        s1 = jax.lax.psum((x * m[:, None]).sum(0), axis)
        mean = s1 / n
        d = jnp.where(valid[:, None], x - mean[None, :], 0)
        ss = jax.lax.psum((d * d).sum(0), axis)
        var = ss / n
        new_state = BNState(
            mean=(1 - momentum) * state.mean + momentum * mean,
            var=((1 - momentum) * state.var
                 + momentum * ss / jnp.maximum(n - 1, 1)),
        )
    else:
        mean, var = state.mean, state.var
        new_state = state
    y = (x - mean[None, :]) * jax.lax.rsqrt(var[None, :] + EPS)
    y = y * params["scale"][None, :] + params["bias"][None, :]
    return jnp.where(valid[:, None], y, 0), new_state


def _residual_block_sp(p, s, x, k3, valid, halo_src, *, training, momentum,
                       axis):
    """BasicBlock / Bottleneck with halo-exchanged k3 convs and sp BN
    (mirrors models/backbone._residual_block; reference
    resnet_block.py:48-64, 117-137)."""
    s_new = {}

    def bn(name, y):
        out, s_new[name] = _batch_norm_sp(
            y.astype(jnp.float32), valid, p[name], s[name],
            training=training, momentum=momentum, axis=axis)
        return out

    def conv3(y, w):
        return sparse_conv(_halo_exchange(y, halo_src, axis), k3, w)

    if "conv3" in p:  # bottleneck
        out = jax.nn.relu(bn("norm1", linear(x, p["conv1"]["w"])))
        out = jax.nn.relu(bn("norm2", conv3(out, p["conv2"]["w"])))
        out = bn("norm3", linear(out, p["conv3"]["w"]))
    else:             # basic block
        out = jax.nn.relu(bn("norm1", conv3(x, p["conv1"]["w"])))
        out = bn("norm2", conv3(out, p["conv2"]["w"]))

    if "downsample" in p:
        residual = linear(x, p["downsample"]["conv"]["w"])
        residual, s_new["downsample_norm"] = _batch_norm_sp(
            residual, valid, p["downsample"]["norm"], s["downsample_norm"],
            training=training, momentum=momentum, axis=axis)
    else:
        residual = x
    return jax.nn.relu(out + residual), s_new


def _stage_sp(p_list, s_list, x, k3, valid, halo_src, *, training, momentum,
              axis):
    s_new = []
    for bp, bs in zip(p_list, s_list):
        x, ns = jax.checkpoint(
            lambda bp, bs, x: _residual_block_sp(
                bp, bs, x, k3, valid, halo_src, training=training,
                momentum=momentum, axis=axis))(bp, bs, x)
        s_new.append(ns)
    return x, s_new


def _backbone_forward_sp(params, state, lv: tuple, feats, *, training: bool,
                         cfg, axis: str, compute_dtype=None):
    """Local (per-shard) Res16UNet forward (mirrors
    models/backbone.backbone_forward; reference res16unet.py:222-295).
    Plain gather-GEMM convs only — see module docstring."""
    mom = cfg.bn_momentum
    ns = {}
    # same compute-dtype policy as the single-chip backbone_forward
    # (models/backbone.py): cast feats + weights once, keep BN statistics
    # f32, cast the top-level BN outputs back to the compute dtype
    cd = compute_dtype

    def bn(name, x, valid):
        y, ns[name] = _batch_norm_sp(
            x.astype(jnp.float32), valid, params[name], state[name],
            training=training, momentum=mom, axis=axis)
        return y.astype(cd) if cd else y

    if cd:
        feats = feats.astype(cd)
        params = jax.tree_util.tree_map(
            lambda x: x.astype(cd) if x.dtype == jnp.float32 else x, params)

    stem_map = lv[0].k5 if lv[0].k5 is not None else lv[0].k3
    out = sparse_conv(_halo_exchange(feats, lv[0].halo_src, axis),
                      stem_map, params["conv0p1s1"]["w"], unroll=False)
    out_p1 = jax.nn.relu(bn("bn0", out, lv[0].valid))

    skips = [out_p1]
    out = out_p1
    for i in range(4):
        out = sparse_conv(_halo_exchange(out, lv[i].halo_src, axis),
                          lv[i].down, params[f"conv{i+1}"]["w"])
        out = jax.nn.relu(bn(f"bn{i+1}", out, lv[i + 1].valid))
        out, ns[f"block{i+1}"] = _stage_sp(
            params[f"block{i+1}"], state[f"block{i+1}"], out,
            lv[i + 1].k3, lv[i + 1].valid, lv[i + 1].halo_src,
            training=training, momentum=mom, axis=axis)
        skips.append(out)

    feature_maps = [out]
    for j in range(4):
        i = 4 + j
        tgt = 3 - j
        xh_coarse = _halo_exchange(out, lv[tgt + 1].halo_src, axis)
        out = sparse_conv_transpose(xh_coarse, lv[tgt].up_parent,
                                    lv[tgt].up_offset,
                                    params[f"convtr{i}"]["w"])
        out = jax.nn.relu(bn(f"bntr{i}", out, lv[tgt].valid))
        out = jnp.concatenate([out, skips[tgt]], axis=1)
        out, ns[f"block{i+1}"] = _stage_sp(
            params[f"block{i+1}"], state[f"block{i+1}"], out,
            lv[tgt].k3, lv[tgt].valid, lv[tgt].halo_src,
            training=training, momentum=mom, axis=axis)
        feature_maps.append(out)
    return feature_maps, ns


def make_forward_backbone_sp(mesh: Mesh, cfg: ModelConfig):
    """Returns ``forward_backbone_sp(params, buffers, bn_state, sp_pyr,
    feats, raw)`` -> (SceneFeatures sharded over 'sp' on the voxel axis,
    new bn_state), the SP analogue of models/agile3d.forward_backbone.

    Single-scene only (B=1): the flat->per-sample regroup is the identity
    there (collate_scenes emits sample_idx[0, j] = j), which is exactly the
    over-HBM use case SP exists for — eval batch size is 1 (reference
    eval_multi_obj.py:94). The output feeds parallel/sp.make_forward_mask_sp
    without any resharding."""
    axis = "sp"

    def local_fn(params, buffers, bn_state, lv, feats, raw, training):
        fmaps, new_bn = _backbone_forward_sp(
            params["backbone"], bn_state, lv, feats, training=training,
            cfg=cfg.backbone, axis=axis,
            compute_dtype=(jnp.bfloat16
                           if cfg.backbone_dtype == "bfloat16" else None))
        squeezed = linear(fmaps[-1].astype(jnp.float32),
                          params["lin_squeeze"]["w"],
                          params["lin_squeeze"]["b"], valid=lv[0].valid)
        valid = lv[0].valid
        raw_m = jnp.where(valid[:, None], raw, 0)

        big = jnp.asarray(3.4e38, raw_m.dtype)
        cmin = jax.lax.pmin(
            jnp.min(jnp.where(valid[:, None], raw_m, big), axis=0), axis)
        cmax = jax.lax.pmax(
            jnp.max(jnp.where(valid[:, None], raw_m, -big), axis=0), axis)

        pos = _pos_enc(raw_m[None], buffers, cmin[None, None, :],
                       cmax[None, None, :], cfg)
        pos = jnp.where(valid[None, :, None], pos, 0)
        scene = SceneFeatures(
            mask_feat=squeezed[None], pos_pcd=pos, vox_valid=valid[None],
            raw=raw_m[None], cmin=cmin[None], cmax=cmax[None])
        return scene, new_bn

    def specs_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    def forward(params, buffers, bn_state, sp_pyr: SPPyramid, feats, raw,
                training=False):
        lv_specs = specs_like(tuple(sp_pyr.levels), P(axis))
        scene_specs = SceneFeatures(
            mask_feat=P(None, axis, None), pos_pcd=P(None, axis, None),
            vox_valid=P(None, axis), raw=P(None, axis, None),
            cmin=P(), cmax=P())
        fn = jax.shard_map(
            lambda p, bf, bs, lv, f, r: local_fn(p, bf, bs, lv, f, r,
                                                 training),
            mesh=mesh,
            in_specs=(specs_like(params, P()), specs_like(buffers, P()),
                      specs_like(bn_state, P()), lv_specs, P(axis), P(axis)),
            out_specs=(scene_specs, specs_like(bn_state, P())),
            check_vma=False,
        )
        return fn(params, buffers, bn_state, tuple(sp_pyr.levels), feats,
                  raw)

    return jax.jit(forward, static_argnames=("training",))
