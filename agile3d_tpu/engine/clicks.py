"""Simulated-click engine: error-region analysis and click sampling.

Re-implements the reference click simulator (reference utils/seg.py:93-239)
with the O(E*N) distance work on device and the tiny (<=121-entry) cluster
bookkeeping on host:

  * Error clusters partition mispredicted points by (gt, pred) pair
    (reference seg.py:186: cluster id = gt*96 + pred*11 — injective for
    labels in [0,10]).
  * For every error point i, its "distance to the error boundary" is
    min_j dist(i, j) over all points j in a DIFFERENT cluster (correct
    points count as cluster -1). This single uniform definition equals the
    reference's per-cluster loop: for cluster c it computes cdist(points
    not in c, points in c).min(axis=0) (seg.py:157-171).
  * Cluster size = max distance; next click = the point attaining it
    (first index on ties, seg.py:102-104).
  * Selection: training keeps the top num_obj clusters by size; eval keeps
    all clusters at round 0 and the top-1 afterwards (seg.py:213-222); the
    selected clusters are shuffled for click-order assignment
    (seg.py:128).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Device: boundary distances (the O(E*N) hot spot; reference seg.py:157-171
# runs a dense torch.cdist per cluster — here one fused pass for all clusters)
# ---------------------------------------------------------------------------

_ROW_CHUNK = 256


@functools.partial(jax.jit, static_argnames=("row_chunk",))
def boundary_distances(
    coords: jax.Array,    # [N, 3] float raw coords (pad rows arbitrary)
    cluster: jax.Array,   # [N] int32 compact cluster id, -1 = not an error
    valid: jax.Array,     # [N] bool
    err_idx: jax.Array,   # [E_pad] int32 rows of error points, -1 = pad
    row_chunk: int = _ROW_CHUNK,
) -> jax.Array:
    """d[e] = min over valid j with cluster[j] != cluster[err_idx[e]] of
    ||coords[err_idx[e]] - coords[j]||. Pad rows give garbage — callers mask
    by err_idx >= 0."""
    n = coords.shape[0]
    e_pad = err_idx.shape[0]
    pad_rows = (-e_pad) % row_chunk
    idx = jnp.concatenate([err_idx, jnp.full((pad_rows,), -1, err_idx.dtype)])
    safe = jnp.clip(idx, 0, n - 1)
    ecoords = coords[safe].reshape(-1, row_chunk, 3)
    ecl = cluster[safe].reshape(-1, row_chunk)

    inf = jnp.asarray(jnp.inf, coords.dtype)

    def chunk_min(args):
        ec, cl_rows = args
        # [chunk, N] squared distances via explicit per-axis differences:
        # accurate f32 VPU work (the |x|^2 - 2xy + |y|^2 MXU formulation
        # catastrophically cancels, and on TPU would run bf16).
        d2 = jnp.zeros((ec.shape[0], n), coords.dtype)
        for ax in range(coords.shape[1]):
            diff = ec[:, ax][:, None] - coords[:, ax][None, :]
            d2 = d2 + diff * diff
        excl = (cl_rows[:, None] == cluster[None, :]) | ~valid[None, :]
        d2 = jnp.where(excl, inf, d2)
        return jnp.min(d2, axis=-1)

    d2 = jax.lax.map(chunk_min, (ecoords, ecl)).reshape(-1)[:e_pad]
    return jnp.sqrt(jnp.maximum(d2, 0.0))


# ---------------------------------------------------------------------------
# Host: cluster ranking + click extraction (reference seg.py:119-226)
# ---------------------------------------------------------------------------


class NewClicks(NamedTuple):
    vox: np.ndarray    # [n_new] voxel rows
    obj: np.ndarray    # [n_new] gt labels (0 = background click)
    order: np.ndarray  # [n_new] click order within this round (post-shuffle)


def simulate_clicks(
    pred: np.ndarray,        # [N] int predicted labels (valid rows)
    labels: np.ndarray,      # [N] int gt labels in [0, num_obj]
    coords: np.ndarray,      # [N, 3] raw coords (valid rows)
    *,
    num_obj: int,
    training: bool,
    current_num_clicks: int,
    rng,                     # python random.Random (shuffle semantics)
    distance_fn=None,        # (coords, cluster, valid, err_idx) -> d
    max_label: int = 10,
) -> NewClicks | None:
    """Host driver mirroring reference get_simulated_clicks semantics.

    ``distance_fn`` defaults to the jitted device kernel; tests can inject a
    brute-force version.
    """
    n = len(pred)
    err = pred != labels
    if not err.any():
        return None

    k = max_label + 1
    compact = labels.astype(np.int64) * k + pred.astype(np.int64)
    cluster = np.where(err, compact, -1).astype(np.int32)

    err_rows = np.nonzero(err)[0].astype(np.int32)
    if distance_fn is None:
        e_pad = _bucket(len(err_rows))
        err_idx = np.full(e_pad, -1, np.int32)
        err_idx[: len(err_rows)] = err_rows
        d = np.asarray(boundary_distances(
            jnp.asarray(coords, jnp.float32), jnp.asarray(cluster),
            jnp.ones(n, bool), jnp.asarray(err_idx)))[: len(err_rows)]
    else:
        d = distance_fn(coords, cluster, err_rows)

    err_cl = cluster[err_rows]
    # rank clusters by max boundary distance, descending; ties keep the
    # reference's unique() order (ascending 96*gt + 11*pred key)
    uniq = np.unique(err_cl)
    ref_key = (uniq // k) * 96 + (uniq % k) * 11
    uniq = uniq[np.argsort(ref_key, kind="stable")]
    sizes = np.array([d[err_cl == c].max() for c in uniq])
    order_desc = np.argsort(-sizes, kind="stable")
    ranked = uniq[order_desc]

    if training:
        selected = ranked[:num_obj]
    elif current_num_clicks == 0:
        selected = ranked
    else:
        selected = ranked[:1]

    selected = list(selected)
    rng.shuffle(selected)

    vox, obj, order = [], [], []
    for click_order, c in enumerate(selected):
        rows = err_rows[err_cl == c]
        dc = d[err_cl == c]
        best = rows[int(np.argmax(dc))]  # first index on ties (np.argmax)
        vox.append(int(best))
        obj.append(int(labels[best]))
        order.append(click_order)
    return NewClicks(np.array(vox, np.int32), np.array(obj, np.int32),
                     np.array(order, np.int32))


def _bucket(e: int) -> int:
    for b in (1024, 4096, 16384, 65536, 262144, 1048576):
        if e <= b:
            return b
    return e


# ---------------------------------------------------------------------------
# Click table bookkeeping (replaces reference dict-of-lists + extend_clicks,
# seg.py:229-239)
# ---------------------------------------------------------------------------


class HostClicks:
    """Per-sample click table on host; mirrors ClickState but growable."""

    def __init__(self, max_clicks: int):
        self.max_clicks = max_clicks
        self.vox = np.full(max_clicks, -1, np.int32)
        self.obj = np.zeros(max_clicks, np.int32)
        self.time = np.zeros(max_clicks, np.int32)
        self.count = 0

    def extend(self, new: NewClicks):
        """reference extend_clicks: new click times are offset by the current
        total click count (seg.py:233-237)."""
        n = len(new.vox)
        if self.count + n > self.max_clicks:
            raise ValueError(
                f"click budget exceeded: {self.count}+{n} > {self.max_clicks}")
        sl = slice(self.count, self.count + n)
        self.vox[sl] = new.vox
        self.obj[sl] = new.obj
        self.time[sl] = new.order + self.count
        self.count += n

    def arrays(self):
        return self.vox.copy(), self.obj.copy(), self.time.copy()


def apply_click_override(pred: np.ndarray, clicks: HostClicks) -> np.ndarray:
    """Clicked voxels are forced to their ground-truth object id before
    simulation and IoU (reference engine.py:101-104, eval_multi_obj.py:137-141)."""
    out = pred.copy()
    v = clicks.vox[: clicks.count]
    out[v] = clicks.obj[: clicks.count]
    return out


def click_override_device(pred: jax.Array, vox: jax.Array,
                          obj: jax.Array) -> jax.Array:
    """Device-side clicked-voxel gt override (reference engine.py:101-104,
    eval_multi_obj.py:137-141): scatter obj+1 at clicked voxels, then
    replace the prediction there. Scatter-max means the LARGEST object id
    wins when two clicks land on one voxel (the reference's dict-order
    overwrite is unspecified there). Shapes: pred [N] with vox/obj [MC],
    or batched pred [B, N] with vox/obj [B, MC]; vox == -1 slots are
    ignored.

    The single shared implementation for the eval scan, the train-rollout
    scan, and the interactive serve step — keep them identical or the three
    protocols silently diverge."""
    n = pred.shape[-1]
    tagged = jnp.where(vox >= 0, obj + 1, 0)
    if pred.ndim == 2:
        b_idx = jnp.arange(pred.shape[0])[:, None]
        tag = jnp.zeros(pred.shape, jnp.int32).at[
            b_idx, jnp.clip(vox, 0, n - 1)].max(tagged)
    else:
        tag = jnp.zeros(n, jnp.int32).at[jnp.clip(vox, 0, n - 1)].max(tagged)
    return jnp.where(tag > 0, tag - 1, pred)


# ---------------------------------------------------------------------------
# IoU metrics (reference utils/seg.py:10-59)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("max_obj",))
def iou_per_object(pred: jax.Array, labels: jax.Array, valid: jax.Array,
                   max_obj: int = 10):
    """IoU per object id 1..max_obj; nan-free: absent objects report 0 and a
    presence mask."""
    ious, present = [], []
    for o in range(1, max_obj + 1):
        p = (pred == o) & valid
        g = (labels == o) & valid
        inter = jnp.sum(p & g)
        union = jnp.sum(p) + jnp.sum(g) - inter
        ious.append(inter / jnp.maximum(union, 1))
        present.append(jnp.sum(g) > 0)
    return jnp.stack(ious), jnp.stack(present)


def mean_iou_scene(pred_full: np.ndarray, labels_full: np.ndarray,
                   max_obj: int = 10) -> tuple[float, dict]:
    """Full-resolution mean IoU over the scene's target objects
    (reference seg.py:44-59)."""
    ious, present = iou_per_object(
        jnp.asarray(pred_full), jnp.asarray(labels_full),
        jnp.ones(len(pred_full), bool), max_obj=max_obj)
    ious, present = np.asarray(ious), np.asarray(present)
    iou_dict = {o + 1: float(ious[o]) for o in range(max_obj) if present[o]}
    mean = float(ious[present].mean()) if present.any() else 0.0
    return mean, iou_dict
