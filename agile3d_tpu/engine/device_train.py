"""Device-side TRAINING rollout: the random-length simulated-click warmup
(reference engine.py:82-115) as one lax.scan on device.

The host path (engine/train.rollout_clicks) dispatches the decoder once per
round and runs the click simulator on host — ~20 device round-trips per
train step. Here rounds 0..num_rounds run as a single scan: decoder,
clicked-voxel override, multi-cluster error analysis (training takes the
top-num_obj clusters per round, one click each — reference seg.py:213-222)
and the click-table extension all stay on-chip; the host gets the final
click table, which feeds straight into the supervised train step without
leaving the device.

RNG semantics: the reference shuffles the selected clusters for click-order
assignment with python random (seg.py:128). Here the shuffle uses a JAX
PRNG (uniform-key ranking) — same distribution, different stream. Training
is stochastic anyway; only the eval path promises reference-exact replay.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from agile3d_tpu.config import Config
from agile3d_tpu.engine.clicks import click_override_device
from agile3d_tpu.engine.device_eval import _boundary_distances_all
from agile3d_tpu.models.agile3d import ClickState, forward_mask

# round-count buckets: one jit cache entry each; rounds beyond the drawn
# num_rounds are masked no-ops (cost overshoot <= 33%)
ROUND_BUCKETS = (1, 2, 4, 8, 12, 16, 20)


def round_bucket(r: int) -> int:
    for b in ROUND_BUCKETS:
        if r <= b:
            return b
    return ROUND_BUCKETS[-1]


def multi_cluster_clicks_device(pred, labels, coords, valid, num_obj, key,
                                *, max_label: int = 10):
    """Training click selection for ONE sample: top-num_obj error clusters
    by boundary distance, one click per cluster (the in-cluster
    furthest-from-boundary point, first index on ties), shuffled order.

    Returns (vox [S], obj [S], rank [S], sel [S]) with S = max_label
    static slots; sel marks live clicks; rank is the within-round click
    order after the shuffle.
    """
    k = max_label + 1
    n = pred.shape[0]
    n_slots = k * k
    err = valid & (pred != labels)
    compact = labels * k + pred
    cluster = jnp.where(err, compact, -1)

    d = _boundary_distances_all(coords, cluster, valid)
    d = jnp.where(err, d, -jnp.inf)

    sizes = jax.ops.segment_max(d, jnp.where(err, compact, n_slots),
                                num_segments=n_slots + 1)[:n_slots]
    sizes = jnp.where(jnp.isfinite(sizes), sizes, -jnp.inf)

    # rank slots: size desc, ties by the reference's unique() order
    # (ascending 96*gt + 11*pred key, seg.py:194)
    slot_ids = jnp.arange(n_slots)
    ref_key = (slot_ids // k) * 96 + (slot_ids % k) * 11
    order = jnp.lexsort((ref_key, -sizes))

    s_cap = max_label  # static per-round click capacity
    sel_slots = order[:s_cap]
    sel_sizes = sizes[sel_slots]
    sel = (jnp.arange(s_cap) < num_obj) & jnp.isfinite(sel_sizes)

    # per selected cluster: first row attaining the cluster max distance
    in_sel = (err[None, :]
              & (compact[None, :] == sel_slots[:, None])
              & (d[None, :] == sel_sizes[:, None]))       # [S, N]
    vox = jnp.argmax(in_sel, axis=1).astype(jnp.int32)    # first True
    obj = labels[jnp.clip(vox, 0, n - 1)].astype(jnp.int32)

    # shuffled click order among live clicks (uniform-key ranking)
    u = jax.random.uniform(key, (s_cap,))
    u = jnp.where(sel, u, jnp.inf)
    rank = jnp.argsort(jnp.argsort(u)).astype(jnp.int32)  # position of each
    return vox, obj, rank, sel


def train_rollout_scan(cfg: Config, rounds: int):
    """The rollout as a plain traceable function (jit/vmap/shard_map it as
    needed — engine/train.py jits it single-chip, parallel/train.py vmaps it
    over dp shards).

    fn(params, buffers, scene, labels [B,N], num_obj [B], num_rounds scalar,
       key) -> (ClickState [B,MC], counts [B])
    Rounds r run while r <= num_rounds (reference: current <= num_iters).
    """
    mc = cfg.model.max_clicks
    max_label = cfg.model.max_fg_objects

    def rollout(params, buffers, scene, labels, num_obj, num_rounds, key):
        b, n = labels.shape
        target = jnp.maximum(labels, 0)
        valid = scene.vox_valid & (labels >= 0)
        b_idx = jnp.arange(b)[:, None]

        def step(carry, inp):
            vox_t, obj_t, tim_t, count = carry
            current, rkey = inp
            active = current <= num_rounds

            clicks = ClickState(vox=vox_t, obj=obj_t, time=tim_t)
            out = forward_mask(params, buffers, scene, clicks, num_obj,
                               cfg=cfg.model)
            pred = jnp.argmax(out["pred_masks"], -1).astype(jnp.int32)
            # round 0 uses the zero prediction (reference engine.py:84-88)
            pred = jnp.where(current == 0, 0, pred)
            pred = click_override_device(pred, vox_t, obj_t)

            keys = jax.random.split(rkey, b)
            new_vox, new_obj, rank, sel = jax.vmap(
                functools.partial(multi_cluster_clicks_device,
                                  max_label=max_label)
            )(pred, target, scene.raw, valid, num_obj, keys)

            write = sel & active                          # [B, S]
            slots = jnp.where(write, count[:, None] + rank, mc)  # mc = drop
            vox_n = vox_t.at[b_idx, slots].set(new_vox, mode="drop")
            obj_n = obj_t.at[b_idx, slots].set(new_obj, mode="drop")
            tim_n = tim_t.at[b_idx, slots].set(slots, mode="drop")
            count_n = jnp.minimum(count + write.sum(-1), mc)
            return (vox_n, obj_n, tim_n, count_n), None

        vox0 = jnp.full((b, mc), -1, jnp.int32)
        obj0 = jnp.zeros((b, mc), jnp.int32)
        tim0 = jnp.zeros((b, mc), jnp.int32)
        count0 = jnp.zeros((b,), jnp.int32)
        keys = jax.random.split(key, rounds)
        (vox_f, obj_f, tim_f, count_f), _ = jax.lax.scan(
            step, (vox0, obj0, tim0, count0),
            (jnp.arange(rounds), keys))
        return ClickState(vox=vox_f, obj=obj_f, time=tim_f), count_f

    return rollout


def make_device_train_rollout(cfg: Config, rounds: int):
    """Jitted single-chip wrapper around train_rollout_scan."""
    return jax.jit(train_rollout_scan(cfg, rounds))
