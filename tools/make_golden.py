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

WEIGHTS_SEED = 42     # init_agile3d PRNGKey
SCENE_SEED = 11       # synthetic benchmark draw
ROLLOUT_SEED = 13     # click-simulator tie-break shuffles
NUM_SCENES = 1
NUM_OBJ = 3
N_POINTS = 3000
MAX_CLICKS = 5


def generate(out_csv: str, tmpdir: str) -> str:
    """Run the frozen rollout; returns the CSV path. CPU + f32 only — TPU
    matmuls default to bf16 passes, which is exactly the drift this golden
    exists to keep OUT of the committed bytes."""
    import jax

    assert jax.default_backend() == "cpu", (
        "goldens are defined on the CPU backend (deterministic f32); run "
        "under tests/conftest.py or set jax.config jax_platforms=cpu first")
    jax.config.update("jax_default_matmul_precision", "highest")

    from agile3d_tpu.config import Config, ModelConfig
    from agile3d_tpu.data.datasets import InterMultiObjDataset
    from agile3d_tpu.engine.eval import InteractiveEngine, evaluate_dataset
    from agile3d_tpu.models.agile3d import init_agile3d
    from tests.synthetic import write_benchmark

    cfg = Config(model=ModelConfig(max_clicks=128))
    scans, val_list = write_benchmark(
        tmpdir, num_scenes=NUM_SCENES, num_obj=NUM_OBJ, seed=SCENE_SEED,
        n_points=N_POINTS)
    ds = InterMultiObjDataset(scans, val_list, cfg.model.voxel_size)
    params, buffers, state = init_agile3d(
        jax.random.PRNGKey(WEIGHTS_SEED), cfg.model)
    engine = InteractiveEngine(cfg)
    evaluate_dataset(engine, params, buffers, state, ds, out_csv,
                     mode="multi", max_num_clicks=MAX_CLICKS,
                     seed=ROLLOUT_SEED, log=lambda *a: None)
    return out_csv


if __name__ == "__main__":
    import tempfile

    sys.path.insert(0, os.path.dirname(GOLDEN_DIR.rstrip("/")).rsplit(
        "/tests", 1)[0])
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        generate(GOLDEN_CSV, td)
    print(f"wrote {GOLDEN_CSV}:")
    sys.stdout.write(open(GOLDEN_CSV).read())
