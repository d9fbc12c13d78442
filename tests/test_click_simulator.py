"""Click simulator vs a literal numpy/torch transcription of the reference
semantics (reference utils/seg.py:93-239)."""

import random

import numpy as np
import torch
import jax.numpy as jnp

from agile3d_tpu.engine.clicks import (
    HostClicks,
    apply_click_override,
    boundary_distances,
    mean_iou_scene,
    simulate_clicks,
)


def ref_simulate(pred, labels, coords, current_num_clicks, training, rng):
    """Reference get_simulated_clicks flow in numpy/torch (seg.py:173-226)."""
    error_mask = np.abs(pred.astype(float) - labels.astype(float)) > 0
    if error_mask.sum() == 0:
        return None
    cluster_ids = labels.astype(float) * 96 + pred.astype(float) * 11
    num_obj = (np.unique(labels) != 0).sum()

    error_clusters = cluster_ids[error_mask]
    uniq = np.unique(error_clusters)
    cl_mask_arr = np.full(len(coords), -1.0)
    cl_mask_arr[error_mask] = error_clusters

    sizes, dists = {}, {}
    tc = torch.from_numpy(coords)
    for c in uniq:
        members = cl_mask_arr == c
        pd = torch.cdist(tc[~members], tc[members]).min(dim=0)[0].numpy()
        dists[c] = pd
        sizes[c] = pd.max()

    ranked = sorted(sizes, key=sizes.get, reverse=True)
    if training:
        selected = ranked[:num_obj] if len(ranked) >= num_obj else ranked
    elif current_num_clicks == 0:
        selected = ranked
    else:
        selected = ranked[:1]
    selected = list(selected)
    rng.shuffle(selected)

    out = []
    for order, c in enumerate(selected):
        members = np.nonzero(cl_mask_arr == c)[0]
        pd = dists[c]
        best = members[int(np.nonzero(pd == pd.max())[0][0])]
        out.append((int(best), int(labels[best]), order))
    return out


def _scene(rng_np, n=400, num_obj=3):
    coords = rng_np.random((n, 3)).astype(np.float32) * 4
    labels = rng_np.integers(0, num_obj + 1, n).astype(np.int32)
    pred = labels.copy()
    flip = rng_np.random(n) < 0.3
    pred[flip] = rng_np.integers(0, num_obj + 1, flip.sum())
    return coords, labels, pred


def test_boundary_distances_match_cdist():
    rng_np = np.random.default_rng(0)
    coords, labels, pred = _scene(rng_np)
    err = pred != labels
    compact = np.where(err, labels * 11 + pred, -1).astype(np.int32)
    err_rows = np.nonzero(err)[0].astype(np.int32)
    e_pad = 1024
    err_idx = np.full(e_pad, -1, np.int32)
    err_idx[: len(err_rows)] = err_rows
    d = np.asarray(boundary_distances(
        jnp.asarray(coords), jnp.asarray(compact),
        jnp.ones(len(coords), bool), jnp.asarray(err_idx)))[: len(err_rows)]

    tc = torch.from_numpy(coords)
    for c in np.unique(compact[err]):
        members = compact == c
        ref = torch.cdist(tc[~members], tc[members]).min(dim=0)[0].numpy()
        np.testing.assert_allclose(d[compact[err_rows] == c], ref,
                                   rtol=1e-4, atol=1e-5)


def _cdist_distance_fn(coords, cluster, err_rows):
    """Exact reference distances (torch.cdist) so the semantics comparison is
    not perturbed by f32 noise on near-tied cluster sizes."""
    tc = torch.from_numpy(coords)
    d = np.empty(len(err_rows), np.float32)
    ec = cluster[err_rows]
    for c in np.unique(ec):
        members = cluster == c
        pd = torch.cdist(tc[~members], tc[members]).min(dim=0)[0].numpy()
        d[ec == c] = pd
    return d


def _compare(training, current_num_clicks, seed):
    rng_np = np.random.default_rng(seed)
    coords, labels, pred = _scene(rng_np)
    num_obj = int((np.unique(labels) != 0).sum())

    got = simulate_clicks(pred, labels, coords, num_obj=num_obj,
                          training=training,
                          current_num_clicks=current_num_clicks,
                          rng=random.Random(seed),
                          distance_fn=_cdist_distance_fn)
    ref = ref_simulate(pred, labels, coords, current_num_clicks, training,
                       random.Random(seed))
    assert (got is None) == (ref is None)
    if ref is None:
        return
    assert len(got.vox) == len(ref)
    for i, (v, o, t) in enumerate(ref):
        assert got.vox[i] == v, (i, got, ref)
        assert got.obj[i] == o
        assert got.order[i] == t


def test_simulator_matches_reference_training():
    for seed in range(5):
        _compare(training=True, current_num_clicks=3, seed=seed)


def test_simulator_matches_reference_eval_round0():
    for seed in range(3):
        _compare(training=False, current_num_clicks=0, seed=seed)


def test_simulator_matches_reference_eval_top1():
    for seed in range(3):
        _compare(training=False, current_num_clicks=5, seed=seed)


def test_simulator_perfect_prediction_returns_none():
    rng_np = np.random.default_rng(0)
    coords, labels, _ = _scene(rng_np)
    got = simulate_clicks(labels.copy(), labels, coords, num_obj=3,
                          training=False, current_num_clicks=4,
                          rng=random.Random(0))
    assert got is None


def test_click_table_and_override():
    hc = HostClicks(max_clicks=8)
    from agile3d_tpu.engine.clicks import NewClicks
    hc.extend(NewClicks(np.array([3, 7], np.int32), np.array([1, 2], np.int32),
                        np.array([0, 1], np.int32)))
    hc.extend(NewClicks(np.array([5], np.int32), np.array([0], np.int32),
                        np.array([0], np.int32)))
    np.testing.assert_array_equal(hc.vox[:3], [3, 7, 5])
    np.testing.assert_array_equal(hc.time[:3], [0, 1, 2])  # offsets by count
    pred = np.full(10, 9, np.int32)
    out = apply_click_override(pred, hc)
    assert out[3] == 1 and out[7] == 2 and out[5] == 0
    assert (out[[0, 1, 2, 4, 6, 8, 9]] == 9).all()


def test_mean_iou_scene_matches_reference():
    rng_np = np.random.default_rng(1)
    labels = rng_np.integers(0, 4, 1000).astype(np.int32)
    pred = labels.copy()
    pred[rng_np.random(1000) < 0.2] = 0
    mean, d = mean_iou_scene(pred, labels)

    # reference seg.py:44-59
    total = 0.0
    ids = [o for o in np.unique(labels) if o != 0]
    for o in ids:
        p, g = pred == o, labels == o
        inter = (p & g).sum()
        total += inter / (p.sum() + g.sum() - inter)
    np.testing.assert_allclose(mean, total / len(ids), rtol=1e-6)
    assert set(d) == set(int(o) for o in ids)
