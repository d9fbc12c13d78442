"""Frozen end-to-end golden generator (VERDICT r3 missing #4).

The reference's committed results/*.csv are its regression oracle
(reference README.md:100, SURVEY.md section 4); this repo's analogue is a
committed rollout trajectory: fixed-seed weights + a fixed synthetic scene
-> the exact per-click CSV the host eval path produces on CPU in f32.
tests/test_golden.py replays this generator and diffs byte-for-byte, so a
kernel rewrite that silently shifts numerics (new conv path, attention
chunking change, BN reorder) fails CI instead of drifting NoC.

Regenerate (only when an INTENDED numeric change lands, with the reason in
the commit message):

    python tools/make_golden.py
"""

import os
import sys

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")
GOLDEN_CSV = os.path.join(GOLDEN_DIR, "rollout_multi.csv")
# single-object InterObject3D protocol (reference eval_single_obj.py:108,164:
# fixed {'0','1'} click dict, +1 click per round, absolute click counts)
GOLDEN_SINGLE_CSV = os.path.join(GOLDEN_DIR, "rollout_single.csv")
# the production serving config (README): decoder_dtype=bfloat16. bf16 is
# deterministic on the CPU backend too, so this golden is byte-exact; the
# f32-vs-bf16 tolerance band lives in tests/test_golden.py.
GOLDEN_MULTI_BF16_CSV = os.path.join(GOLDEN_DIR, "rollout_multi_bf16.csv")

WEIGHTS_SEED = 42     # init_agile3d PRNGKey
SCENE_SEED = 11       # synthetic benchmark draw
ROLLOUT_SEED = 13     # click-simulator tie-break shuffles
NUM_SCENES = 1
NUM_OBJ = 3
N_POINTS = 3000
MAX_CLICKS = 5


def generate(out_csv: str, tmpdir: str, *, mode: str = "multi",
             decoder_dtype: str = "float32") -> str:
    """Run the frozen rollout; returns the CSV path. CPU only — TPU
    matmuls default to bf16 passes, which is exactly the drift this golden
    exists to keep OUT of the committed bytes. (decoder_dtype='bfloat16'
    is still deterministic on CPU: the serving-config golden pins the
    bf16 decoder path's own bytes.)"""
    import jax

    assert jax.default_backend() == "cpu", (
        "goldens are defined on the CPU backend (deterministic f32); run "
        "under tests/conftest.py or set jax.config jax_platforms=cpu first")
    jax.config.update("jax_default_matmul_precision", "highest")

    import numpy as np

    from agile3d_tpu.config import Config, ModelConfig
    from agile3d_tpu.data.datasets import (
        InterMultiObjDataset, InterSingleObjDataset)
    from agile3d_tpu.engine.eval import InteractiveEngine, evaluate_dataset
    from agile3d_tpu.models.agile3d import init_agile3d
    from agile3d_tpu.data.synthetic import write_benchmark

    cfg = Config(model=ModelConfig(max_clicks=128,
                                   decoder_dtype=decoder_dtype))
    scans, val_list = write_benchmark(
        tmpdir, num_scenes=NUM_SCENES, num_obj=NUM_OBJ, seed=SCENE_SEED,
        n_points=N_POINTS)
    if mode == "single":
        # InterObject3D protocol: one (scene, object) pair per instance
        # (reference eval_single_obj.py:108: click dict {'0','1'})
        objects = np.array([["scene0000_00", str(o)]
                            for o in range(1, NUM_OBJ + 1)])
        ds = InterSingleObjDataset(scans, objects, cfg.model.voxel_size)
    else:
        ds = InterMultiObjDataset(scans, val_list, cfg.model.voxel_size)
    params, buffers, state = init_agile3d(
        jax.random.PRNGKey(WEIGHTS_SEED), cfg.model)
    engine = InteractiveEngine(cfg)
    evaluate_dataset(engine, params, buffers, state, ds, out_csv,
                     mode=mode, max_num_clicks=MAX_CLICKS,
                     seed=ROLLOUT_SEED, log=lambda *a: None)
    return out_csv


if __name__ == "__main__":
    import tempfile

    sys.path.insert(0, os.path.dirname(GOLDEN_DIR.rstrip("/")).rsplit(
        "/tests", 1)[0])
    # Mirror tests/conftest.py's environment EXACTLY: the 8-virtual-device
    # host platform changes XLA:CPU's intra-op partitioning, which shifts
    # bf16 dot reductions by a last-ulp — goldens must be minted under the
    # same device topology the replay tests run on.
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    jobs = [(GOLDEN_CSV, dict())]
    if "--all" in sys.argv or "--single" in sys.argv:
        jobs.append((GOLDEN_SINGLE_CSV, dict(mode="single")))
    if "--all" in sys.argv or "--bf16" in sys.argv:
        jobs.append((GOLDEN_MULTI_BF16_CSV, dict(decoder_dtype="bfloat16")))
    for path, kw in jobs:
        with tempfile.TemporaryDirectory() as td:
            generate(path, td, **kw)
        print(f"wrote {path}:")
        sys.stdout.write(open(path).read())
