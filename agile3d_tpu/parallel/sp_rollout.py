"""Voxel-sharded on-device eval rollout: SP x lax.scan composition.

Round 5 headline (VERDICT r4 task 1): the on-device click-rollout scan
(engine/device_eval.py — 6.6x faster than the per-round host loop) and
voxel-axis sequence parallelism (parallel/sp.py — the beyond-one-chip-HBM
path for KITTI-360-scale scans) used to be mutually exclusive: ``--sp N``
silently fell back to the host loop, paying ~200 ms of per-round dispatch
overhead through the environment tunnel at exactly the scale SP exists for.

Here the WHOLE scan runs inside one shard_map over the mesh's 'sp' axis
(reference eval_multi_obj.py:116-167 — the per-click loop — at beyond-one-
chip N). Per scan step, entirely on-chip and sharded:

  * decoder forward — the exact shard-local body the host SP path uses
    (parallel/sp.forward_mask_local: distributed softmax over voxel shards);
  * clicked-voxel gt-override — shard-local scatter;
  * full-resolution IoU — one all_gather of the [N] int32 voxel prediction
    (the only O(N) collective per round; 4 bytes/voxel), a shard-local
    gather through the full-res inverse map, and one psum of integer
    (intersection, |pred|, |gt|) counts — bit-identical to the single-chip
    reduction because integer sums are associative;
  * click simulation — boundary distances row-partitioned over shards
    (each shard computes min-distance-to-other-cluster for ITS rows against
    all-gathered global columns: the O(N^2) term scales 1/n_sp), cluster
    ranking via a 121-slot pmax, and the global furthest-point argmax via
    pmax(distance) + pmin(first global index attaining it) — the same
    first-index tie-break as the single-chip scan (min over a global iota
    is order-exact, so results are device-count independent);
  * click-table extension — replicated carry; every shard computes the
    identical update from collectively-reduced values.

The scan carry (click table + count) therefore stays replicated across
shards by construction, and the host gets one [rounds] IoU array back per
scene, exactly like the single-chip scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from agile3d_tpu.config import Config
from agile3d_tpu.models.agile3d import ClickState, SceneFeatures, cast_decoder_bf16
from agile3d_tpu.parallel.sp import forward_mask_local

_DIST_ROW_CHUNK = 512


def _row_chunk(nl: int) -> int:
    c = _DIST_ROW_CHUNK
    while c > 1 and nl % c:
        c //= 2
    return c


def _boundary_distances_rows_local(coords_l, cluster_l, coords_g, cluster_g,
                                   valid_g):
    """d[i] = min dist from LOCAL voxel i to any valid GLOBAL voxel in a
    different cluster (correct voxels carry cluster -1). Same per-axis f32
    arithmetic and full-column min as the single-chip
    engine/device_eval._boundary_distances_all — min is order-exact, so the
    row partition changes nothing numerically."""
    n = coords_g.shape[0]
    chunk = _row_chunk(coords_l.shape[0])
    rows = coords_l.reshape(-1, chunk, 3)
    row_cl = cluster_l.reshape(-1, chunk)
    inf = jnp.asarray(jnp.inf, coords_l.dtype)

    def chunk_min(args):
        rc, rcl = args
        d2 = jnp.zeros((chunk, n), coords_l.dtype)
        for ax in range(3):
            diff = rc[:, ax][:, None] - coords_g[:, ax][None, :]
            d2 = d2 + diff * diff
        excl = (rcl[:, None] == cluster_g[None, :]) | ~valid_g[None, :]
        return jnp.min(jnp.where(excl, inf, d2), axis=-1)

    d2 = jax.lax.map(chunk_min, (rows, row_cl)).reshape(-1)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def _simulate_click_sp(pred_l, labels_l, coords_l, valid_l, lo, n_glob,
                       axis, *, max_label=10):
    """Distributed top-1-cluster click selection (eval rounds >= 1,
    reference seg.py:173-226 with the [:1] selection), matching the
    single-chip engine/device_eval.simulate_click_device value for value.
    Returns replicated scalars (vox GLOBAL row, obj, has_error)."""
    k = max_label + 1
    err_l = valid_l & (pred_l != labels_l)
    compact_l = labels_l * k + pred_l
    cluster_l = jnp.where(err_l, compact_l, -1)

    # global columns for the distance min (coords 12 B/voxel + cluster 4 +
    # valid 1 — tiny next to the backbone activations SP exists to shard)
    coords_g = jax.lax.all_gather(coords_l, axis, tiled=True)
    cluster_g = jax.lax.all_gather(cluster_l, axis, tiled=True)
    valid_g = jax.lax.all_gather(valid_l, axis, tiled=True)

    d = _boundary_distances_rows_local(coords_l, cluster_l, coords_g,
                                       cluster_g, valid_g)
    d = jnp.where(err_l, d, -jnp.inf)

    # per-cluster max distance: local segment_max over the 121-slot compact
    # id space, then one pmax — exact (max is associative)
    n_slots = k * k
    sizes_l = jax.ops.segment_max(d, jnp.where(err_l, compact_l, n_slots),
                                  num_segments=n_slots + 1,
                                  indices_are_sorted=False)[:n_slots]
    sizes_l = jnp.where(jnp.isfinite(sizes_l), sizes_l, -jnp.inf)
    sizes = jax.lax.pmax(sizes_l, axis)

    # rank: max size, ties broken by the reference's unique() order
    # (ascending 96*gt + 11*pred key, seg.py:194) — replicated inputs, so
    # every shard picks the same slot
    slot_ids = jnp.arange(n_slots)
    ref_key = (slot_ids // k) * 96 + (slot_ids % k) * 11
    max_size = jnp.max(sizes)
    big = jnp.iinfo(jnp.int32).max
    best_slot = jnp.argmin(jnp.where(sizes == max_size, ref_key, big))

    # click = first GLOBAL index attaining the cluster's max distance:
    # pmax of the score, then pmin over the first local candidate's global
    # row (n_glob where the shard has no candidate)
    in_best = err_l & (compact_l == best_slot)
    score = jnp.where(in_best, d, -jnp.inf)
    maxd = jax.lax.pmax(jnp.max(score), axis)
    nl = pred_l.shape[0]
    iota_g = lo + jnp.arange(nl)
    cand = jnp.min(jnp.where(score == maxd, iota_g, n_glob))
    vox = jax.lax.pmin(cand, axis).astype(jnp.int32)

    has_error = jax.lax.psum(jnp.any(err_l).astype(jnp.int32), axis) > 0
    loc = vox - lo
    in_shard = (loc >= 0) & (loc < nl)
    obj = jax.lax.psum(
        jnp.where(in_shard, labels_l[jnp.clip(loc, 0, nl - 1)], 0), axis)
    return vox, obj.astype(jnp.int32), has_error


def _click_override_local(pred_l, vox, obj, lo):
    """Shard-local clicked-voxel gt override: the restriction of
    engine/clicks.click_override_device (scatter-max semantics — largest
    object id wins on one voxel) to this shard's rows."""
    nl = pred_l.shape[0]
    loc = vox - lo
    ok = (vox >= 0) & (loc >= 0) & (loc < nl)
    tagged = jnp.where(ok, obj + 1, 0)
    tag = jnp.zeros(nl, jnp.int32).at[jnp.clip(loc, 0, nl - 1)].max(tagged)
    return jnp.where(tag > 0, tag - 1, pred_l)


def make_device_rollout_sp(mesh: Mesh, cfg: Config, rounds: int):
    """SP twin of engine/device_eval.make_device_rollout: same signature,
    same outputs, but every input carrying a voxel or full-res point axis
    arrives sharded over the mesh's 'sp' axis and the whole scan runs
    inside one shard_map.

    fn(params, buffers, scene, vox0, obj0, tim0 [MC], count0, num_obj,
       labels [N], labels_full [Nf], inverse_map [Nf], full_valid [Nf])
    -> (ious [rounds], final (vox, obj, time, count)) — all replicated.

    N and Nf must be divisible by mesh.shape['sp'] (every padding bucket
    >= 2048 is, config.DEFAULT_VOXEL_BUCKETS)."""
    axis = "sp"
    n_sp = mesh.shape[axis]
    mcfg = cfg.model
    if any(h != 4 for h in mcfg.hlevels):
        raise NotImplementedError(
            "hlevels entries must all be 4 (same constraint as the "
            "single-chip forward_mask, models/agile3d.py)")
    k1 = mcfg.max_fg_objects + 1

    def local_fn(params, buffers, mask_feat_l, pos_pcd_l, valid_l, raw_l,
                 cmin, cmax, vox0, obj0, tim0, count0, num_obj,
                 labels_l, lf_l, inv_l, fv_l):
        nl = mask_feat_l.shape[1]
        n_glob = nl * n_sp
        shard = jax.lax.axis_index(axis)
        lo = shard * nl
        vox_valid_l = valid_l[0] & (labels_l >= 0)
        raw_loc = raw_l[0]
        labels_sim = jnp.maximum(labels_l, 0)
        lf_masked = jnp.where(fv_l, lf_l, -1)
        safe_inv = jnp.clip(inv_l, 0, n_glob - 1)
        o_ids = jnp.arange(1, k1)

        def step(carry, _):
            vox_t, obj_t, tim_t, count = carry
            clicks = ClickState(vox=vox_t[None], obj=obj_t[None],
                                time=tim_t[None])
            preds = forward_mask_local(
                params, buffers, mask_feat_l, pos_pcd_l, valid_l, raw_l,
                cmin, cmax, clicks, num_obj[None], cfg=mcfg, axis=axis)
            pred_l = jnp.argmax(preds[-1][0], -1).astype(jnp.int32)
            pred_l = _click_override_local(pred_l, vox_t, obj_t, lo)

            # full-resolution mean IoU (reference seg.py:44-59): one [N]
            # int32 all_gather + shard-local inverse-map gather + one
            # integer psum — exact vs the single-chip reduction
            pred_g = jax.lax.all_gather(pred_l, axis, tiled=True)
            pred_full_l = jnp.where(fv_l, pred_g[safe_inv], -1)
            p_mat = pred_full_l[None, :] == o_ids[:, None]     # [K, Nf_l]
            g_mat = lf_masked[None, :] == o_ids[:, None]
            stats_l = jnp.stack([
                jnp.sum(p_mat & g_mat, axis=-1),
                jnp.sum(p_mat, axis=-1),
                jnp.sum(g_mat, axis=-1),
            ])
            inter, pc, gc = jax.lax.psum(stats_l, axis)
            union = pc + gc - inter
            iou_vec = inter / jnp.maximum(union, 1)
            present = gc > 0
            iou = jnp.sum(jnp.where(present, iou_vec, 0)) / jnp.maximum(
                present.sum(), 1)

            new_vox, new_obj, has_err = _simulate_click_sp(
                pred_l, labels_sim, raw_loc, vox_valid_l, lo, n_glob, axis,
                max_label=mcfg.max_fg_objects)
            slot = jnp.clip(count, 0, vox_t.shape[0] - 1)
            vox_n = jnp.where(has_err, vox_t.at[slot].set(new_vox), vox_t)
            obj_n = jnp.where(has_err, obj_t.at[slot].set(new_obj), obj_t)
            tim_n = jnp.where(has_err, tim_t.at[slot].set(count), tim_t)
            count_n = jnp.where(has_err, count + 1, count)
            return (vox_n, obj_n, tim_n, count_n), iou

        (vox_f, obj_f, tim_f, count_f), ious = jax.lax.scan(
            step, (vox0, obj0, tim0, count0), None, length=rounds)
        return ious, (vox_f, obj_f, tim_f, count_f)

    sharded = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(), P(None, axis, None), P(None, axis, None),
                  P(None, axis), P(None, axis, None), P(), P(),
                  P(), P(), P(), P(), P(),
                  P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), (P(), P(), P(), P())),
        check_vma=False,
    )

    @jax.jit
    def rollout(params, buffers, scene: SceneFeatures, vox0, obj0, tim0,
                count0, num_obj, labels, labels_full, inverse_map,
                full_valid):
        if mcfg.decoder_dtype == "bfloat16":
            params, buffers, scene = cast_decoder_bf16(params, buffers,
                                                       scene)
        return sharded(params, buffers, scene.mask_feat, scene.pos_pcd,
                       scene.vox_valid, scene.raw, scene.cmin, scene.cmax,
                       vox0, obj0, tim0, count0, num_obj, labels,
                       labels_full, inverse_map, full_valid)

    return rollout
