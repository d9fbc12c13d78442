"""Arbitrary-scene-size operation (VERDICT r4 task 5).

The reference runs any scene that fits GPU memory and tells the user to
crop beyond that (reference demo.md:39,70). This framework: (a) the
bucket ladder auto-extends beyond its top rung so huge scenes pad and
compile instead of crashing in collation (config.bucket_size), and (b) an
HBM pre-check turns a would-be device OOM into a one-line actionable
error naming the remedies (engine/eval.check_single_chip_rows)."""

import subprocess
import sys

import numpy as np
import pytest

from agile3d_tpu.config import DEFAULT_VOXEL_BUCKETS, bucket_size
from agile3d_tpu.engine.eval import SceneTooLargeError, check_single_chip_rows


def test_bucket_within_ladder_unchanged():
    assert bucket_size(200_000) == 262_144
    assert bucket_size(1_048_576) == 1_048_576
    assert bucket_size(1) == DEFAULT_VOXEL_BUCKETS[0]


def test_bucket_autoextend_voxel_ladder_8192_quantum():
    # beyond the 1,048,576 top rung: next multiple of 8192 (preserves
    # chunked-attention and Pallas BLOCK_N=512 divisibility)
    assert bucket_size(1_048_577) == 1_048_576 + 8192
    got = bucket_size(1_203_878)
    assert got >= 1_203_878 and got % 8192 == 0
    assert got - 1_203_878 < 8192


def test_bucket_autoextend_non_voxel_ladder_top_rung_quantum():
    # the round-count ladder (engine/device_eval._ROUND_BUCKETS, top 224)
    # must grow in 224-multiples, not jump to 8192-row padding
    rounds = (32, 64, 128, 224)
    assert bucket_size(224, rounds) == 224
    assert bucket_size(225, rounds) == 448
    assert bucket_size(449, rounds) == 672


def test_hbm_precheck_is_actionable(monkeypatch):
    monkeypatch.setenv("AGILE3D_HBM_GIB", "1.0")
    with pytest.raises(SceneTooLargeError) as exc:
        check_single_chip_rows(1_204_224)
    msg = str(exc.value)
    for remedy in ("--sp", "crop", "voxel size"):
        assert remedy in msg
    # under budget: no-op
    check_single_chip_rows(65_536)


def test_hbm_precheck_default_budget_passes_scannet_scale():
    # ScanNet-scale scenes must never trip the default single-chip budget
    check_single_chip_rows(196_608)
    # and a scene far beyond one chip's HBM must trip it
    with pytest.raises(SceneTooLargeError):
        check_single_chip_rows(4_000_000)


@pytest.mark.slow
def test_oversized_scene_cli_one_line_error_not_collation_traceback(tmp_path):
    """Feed a >1.05M-voxel scene (beyond the ladder's top rung) to the real
    eval_multi_obj.py CLI. Collation must auto-extend (no deep
    '_pad_rows bucket smaller than array' ValueError); the HBM pre-check
    (budget pinned low via AGILE3D_HBM_GIB so the test never attempts the
    full backbone) must surface as a one-line actionable error."""
    import jax

    from agile3d_tpu.config import Config
    from agile3d_tpu.models.agile3d import init_agile3d
    from agile3d_tpu.utils.ckpt import save_checkpoint
    from tests.synthetic import write_benchmark

    scans, val_list = write_benchmark(str(tmp_path), num_scenes=1,
                                      num_obj=4, seed=0,
                                      n_points=2_200_000, extent=100.0)
    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0),
                                             Config().model)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, params, buffers, bn_state)
    proc = subprocess.run(
        [sys.executable, "eval_multi_obj.py", "--scan_folder", scans,
         "--val_list", val_list, "--output_dir", str(tmp_path / "out"),
         "--checkpoint", ckpt, "--device", "cpu"],
        capture_output=True, text=True, timeout=600,
        env={"PATH": "/usr/bin:/bin", "AGILE3D_HBM_GIB": "1.0",
             "JAX_PLATFORMS": "cpu", "HOME": "/root"},
        cwd="/root/repo")
    assert proc.returncode != 0
    err = proc.stderr.strip().splitlines()
    # one-line actionable exit, not a traceback
    assert err[-1].startswith("error: scene pads to"), proc.stderr[-2000:]
    assert "--sp" in err[-1] and "crop" in err[-1]
    assert "Traceback" not in proc.stderr, proc.stderr[-2000:]
    assert "smaller than array" not in proc.stderr
