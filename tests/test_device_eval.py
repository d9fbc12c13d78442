"""Device-side eval rollout vs the host-loop path: identical CSV rows."""

import random

import jax
import numpy as np
import pytest

from agile3d_tpu.config import Config, ModelConfig
from agile3d_tpu.data.datasets import InterMultiObjDataset, collate_scenes
from agile3d_tpu.engine.device_eval import (
    evaluate_scene_device,
    simulate_click_device,
)
from agile3d_tpu.engine.eval import InteractiveEngine, evaluate_scene
from agile3d_tpu.models.agile3d import init_agile3d
from tests.synthetic import write_benchmark

CFG = Config(model=ModelConfig(max_clicks=64), buckets=(1024, 2048, 4096))


def test_simulate_click_device_matches_host():
    import jax.numpy as jnp

    from agile3d_tpu.engine.clicks import simulate_clicks

    rng_np = np.random.default_rng(0)
    n = 512
    coords = rng_np.random((n, 3)).astype(np.float32) * 4
    labels = rng_np.integers(0, 4, n).astype(np.int32)
    pred = labels.copy()
    flip = rng_np.random(n) < 0.2
    pred[flip] = rng_np.integers(0, 4, flip.sum())

    host = simulate_clicks(pred, labels, coords, num_obj=3, training=False,
                           current_num_clicks=5, rng=random.Random(0))
    vox, obj, has_err = simulate_click_device(
        jnp.asarray(pred), jnp.asarray(labels), jnp.asarray(coords),
        jnp.ones(n, bool))
    assert bool(has_err)
    assert int(vox) == host.vox[0]
    assert int(obj) == host.obj[0]


def test_simulate_click_device_no_errors():
    import jax.numpy as jnp

    n = 512
    labels = jnp.asarray(np.arange(n, dtype=np.int32) % 3)
    _, _, has_err = simulate_click_device(
        labels, labels, jnp.zeros((n, 3)), jnp.ones(n, bool))
    assert not bool(has_err)


@pytest.mark.slow
def test_device_rollout_matches_host_rows(tmp_path):
    scans, val_list = write_benchmark(str(tmp_path), num_scenes=1, num_obj=2,
                                      n_points=1200)
    ds = InterMultiObjDataset(scans, val_list, 0.05)
    params, buffers, bn = init_agile3d(jax.random.PRNGKey(0), CFG.model)
    engine = InteractiveEngine(CFG)
    batch = collate_scenes([ds[0]], CFG.buckets)

    host_rows = evaluate_scene(engine, params, buffers, bn, batch,
                               mode="multi", instance_id=0,
                               rng=random.Random(3), max_num_clicks=3,
                               skip_converged=False)
    dev_rows = evaluate_scene_device(engine, params, buffers, bn, batch,
                                     mode="multi", instance_id=0,
                                     rng=random.Random(3), max_num_clicks=3)
    assert len(host_rows) == len(dev_rows)
    for hr, dr in zip(host_rows, dev_rows):
        h, d = hr.split(" "), dr.split(" ")
        assert h[:4] == d[:4], (hr, dr)
        assert abs(float(h[4]) - float(d[4])) < 1e-5, (hr, dr)


@pytest.mark.slow
def test_device_rollout_matches_host_rows_single(tmp_path):
    """Single-object protocol (binarized labels, +1 absolute click/round,
    reference eval_single_obj.py:108,164) through the device scan — the
    eval CLIs' default path — matches the host loop row for row."""
    from agile3d_tpu.data.datasets import InterSingleObjDataset

    scans, _ = write_benchmark(str(tmp_path), num_scenes=1, num_obj=2,
                               n_points=1200)
    objects = np.array([["scene0000_00", "1"], ["scene0000_00", "2"]])
    ds = InterSingleObjDataset(scans, objects, 0.05)
    params, buffers, bn = init_agile3d(jax.random.PRNGKey(1), CFG.model)
    engine = InteractiveEngine(CFG)
    for i in range(len(ds)):
        batch = collate_scenes([ds[i]], CFG.buckets)
        host_rows = evaluate_scene(engine, params, buffers, bn, batch,
                                   mode="single", instance_id=i,
                                   rng=random.Random(7), max_num_clicks=3,
                                   skip_converged=False)
        dev_rows = evaluate_scene_device(engine, params, buffers, bn, batch,
                                         mode="single", instance_id=i,
                                         rng=random.Random(7),
                                         max_num_clicks=3)
        assert len(host_rows) == len(dev_rows)
        for hr, dr in zip(host_rows, dev_rows):
            h, d = hr.split(" "), dr.split(" ")
            assert h[:4] == d[:4], (hr, dr)
            assert abs(float(h[4]) - float(d[4])) < 1e-5, (hr, dr)
