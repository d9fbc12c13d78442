"""Device-side training rollout vs the host rollout (engine/device_train.py
vs engine/train.rollout_clicks; reference engine.py:82-115).

With the shuffle pinned to identity on the host side, the two paths must
produce the same click SETS per sample (same voxels, same gt objects, same
total count); click times may differ by the within-round permutation, which
is the one place the device path uses its own RNG stream.
"""

import random as pyrandom

import pytest

pytestmark = pytest.mark.slow  # minutes-scale on a 1-core host (fast tier: -m 'not slow')

import numpy as np
import jax
import jax.numpy as jnp

from agile3d_tpu.config import Config, ModelConfig, TrainConfig
from agile3d_tpu.data.datasets import SceneSample, collate_scenes
from agile3d_tpu.engine.device_train import (
    make_device_train_rollout,
    round_bucket,
)
from agile3d_tpu.engine.eval import InteractiveEngine
from agile3d_tpu.engine.train import rollout_clicks, subsample_objects
from agile3d_tpu.models.agile3d import init_agile3d
from agile3d_tpu.sparse.quantize import sparse_quantize
from tests.synthetic import make_scene

CFG = Config(model=ModelConfig(max_clicks=64), train=TrainConfig(batch_size=2),
             buckets=(512, 1024, 4096))


class PinnedRng(pyrandom.Random):
    """Host rollout RNG with identity shuffle and a fixed iteration draw."""

    def __init__(self, num_iters):
        super().__init__(0)
        self._n = num_iters

    def randint(self, a, b):
        return self._n

    def shuffle(self, x):
        pass


def _batch(seed=0, n_points=1200, num_obj=3, b=2):
    rng = np.random.default_rng(seed)
    samples = []
    for i in range(b):
        coords, colors, labels = make_scene(rng, n_points=n_points,
                                            num_obj=num_obj)
        vox, umap, imap = sparse_quantize(coords, CFG.model.voxel_size)
        samples.append(SceneSample(
            vox_coords=vox, raw_coords=coords[umap],
            feats=colors[umap].astype(np.float32) / 255.0,
            labels=labels[umap].astype(np.int32),
            labels_full=labels.astype(np.int32), inverse_map=imap,
            click_idx={}, scene_name=f"s{i}", num_obj=num_obj))
    return collate_scenes(samples, CFG.buckets)


@pytest.mark.parametrize("num_iters,num_obj_cap", [(3, 1), (4, 3)])
def test_device_train_rollout_matches_host_sets(num_iters, num_obj_cap):
    batch = _batch(num_obj=max(num_obj_cap, 1))
    params, buffers, state = init_agile3d(jax.random.PRNGKey(0), CFG.model)
    engine = InteractiveEngine(CFG)
    scene, _ = engine.run_backbone(params, buffers, state, batch,
                                   training=True)

    b = batch.labels.shape[0]
    n_valid = [int((batch.sample_idx[i] >= 0).sum()) for i in range(b)]
    labels_new = batch.labels.copy()
    num_obj = np.zeros(b, np.int32)
    rng = np.random.default_rng(1)
    for i in range(b):
        labels_new[i], num_obj[i] = subsample_objects(
            batch.labels[i], rng, num_obj_cap)

    # host path, shuffle pinned
    raw_per_sample = []
    off = 0
    for i in range(b):
        raw_per_sample.append(batch.raw[off: off + n_valid[i]])
        off += n_valid[i]
    host_clicks = rollout_clicks(
        engine, params, buffers, scene, labels_new, num_obj,
        raw_per_sample, n_valid, PinnedRng(num_iters), CFG)

    # device path
    rollout = make_device_train_rollout(CFG, round_bucket(num_iters + 1))
    cs, counts = rollout(params, buffers, scene, jnp.asarray(labels_new),
                         jnp.asarray(num_obj), jnp.asarray(num_iters),
                         jax.random.PRNGKey(7))
    vox_d = np.asarray(cs.vox)
    obj_d = np.asarray(cs.obj)
    tim_d = np.asarray(cs.time)
    counts = np.asarray(counts)

    for i in range(b):
        hc = host_clicks[i]
        assert counts[i] == hc.count, f"sample {i} count mismatch"
        host_set = sorted(zip(hc.vox[:hc.count].tolist(),
                              hc.obj[:hc.count].tolist()))
        dev_set = sorted(zip(vox_d[i, :counts[i]].tolist(),
                             obj_d[i, :counts[i]].tolist()))
        assert host_set == dev_set, f"sample {i} click sets differ"
        # click times are a permutation of 0..count-1
        assert sorted(tim_d[i, :counts[i]].tolist()) == list(range(counts[i]))
        # every click's recorded object is the gt label at its voxel
        lv = labels_new[i]
        for v, o in dev_set:
            assert lv[v] == o

    # num_obj_cap=1: shuffle is a no-op, so times must match exactly too
    if num_obj_cap == 1:
        for i in range(b):
            hc = host_clicks[i]
            order_h = np.argsort(hc.time[:hc.count])
            order_d = np.argsort(tim_d[i, :counts[i]])
            np.testing.assert_array_equal(hc.vox[:hc.count][order_h],
                                          vox_d[i, :counts[i]][order_d])


def test_device_train_rollout_no_errors_noop():
    """A perfectly-labeled scene yields zero clicks and survives the scan."""
    batch = _batch(num_obj=1)
    params, buffers, state = init_agile3d(jax.random.PRNGKey(0), CFG.model)
    engine = InteractiveEngine(CFG)
    scene, _ = engine.run_backbone(params, buffers, state, batch)
    # labels == 0 everywhere -> pred zeros at round 0 -> no error clusters;
    # later rounds use real predictions but num_rounds=0 masks them out
    labels = np.where(batch.labels >= 0, 0, -1).astype(np.int32)
    rollout = make_device_train_rollout(CFG, 1)
    cs, counts = rollout(params, buffers, scene, jnp.asarray(labels),
                         jnp.asarray(np.array([0, 0], np.int32)),
                         jnp.asarray(0), jax.random.PRNGKey(0))
    assert (np.asarray(counts) == 0).all()
    assert (np.asarray(cs.vox) == -1).all()
