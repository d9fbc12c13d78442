"""End-to-end interactive eval on synthetic scenes: dataset -> backbone ->
click rollout -> CSV -> evaluator (SURVEY.md section 7 stage 5, the minimum
end-to-end slice)."""

import os

import jax
import numpy as np
import pytest

from agile3d_tpu.config import Config, ModelConfig
from agile3d_tpu.data.datasets import InterMultiObjDataset, collate_scenes
from agile3d_tpu.engine.eval import InteractiveEngine, evaluate_dataset
from agile3d_tpu.evaluation import EvaluatorMO
from agile3d_tpu.models.agile3d import init_agile3d
from tests.synthetic import write_benchmark

CFG = Config(model=ModelConfig(max_clicks=128))


@pytest.fixture(scope="module")
def bench(tmp_path_factory):
    return write_benchmark(str(tmp_path_factory.mktemp("bench")),
                           num_scenes=2, num_obj=3, n_points=3000)


def test_dataset_loads(bench):
    scans, val_list = bench
    ds = InterMultiObjDataset(scans, val_list, 0.05)
    assert len(ds) == 2
    s = ds[0]
    assert s.num_obj == 3
    assert set(np.unique(s.labels)) <= {0, 1, 2, 3}
    assert s.labels_full.shape == s.inverse_map.shape
    np.testing.assert_array_equal(
        np.unique(s.labels[s.inverse_map]), np.unique(s.labels_full))
    batch = collate_scenes([s])
    assert batch.sample_idx.shape[0] == 1
    assert (batch.sample_idx >= 0).sum() == len(s.labels)


@pytest.mark.slow
def test_e2e_eval_and_metrics(bench, tmp_path):
    scans, val_list = bench
    ds = InterMultiObjDataset(scans, val_list, 0.05)
    params, buffers, state = init_agile3d(jax.random.PRNGKey(0), CFG.model)
    engine = InteractiveEngine(CFG)
    csv = str(tmp_path / "results.csv")
    evaluate_dataset(engine, params, buffers, state, ds, csv, mode="multi",
                     max_num_clicks=5, log=lambda *a: None)

    rows = open(csv).read().strip().split("\n")
    # budget 15 clicks: rounds at 0, 3, 4, ..., 15 -> 14 rows/scene
    assert len(rows) == 2 * 14
    first = rows[0].split(" ")
    assert first[3] == "0.0" and float(first[4]) <= 1.0

    # click counts per scene are 0, 1, 4/3, 5/3, ..., 5.0
    counts = [float(r.split(" ")[3]) for r in rows[:14]]
    assert counts[0] == 0.0 and counts[1] == 1.0
    assert abs(counts[-1] - 5.0) < 1e-9
    assert all(b > a for a, b in zip(counts, counts[1:]))

    ev = EvaluatorMO(val_list, csv, [0.5, 0.65, 0.8, 0.85, 0.9])
    res = ev.eval_results()
    assert set(res) >= {"NoC@50", "NoC@85", "IoU@1", "IoU@5"}
    for k in ("IoU@1", "IoU@3", "IoU@5"):
        assert np.isfinite(res[k]) and 0 <= res[k] <= 1.0
    # with a 5-click budget and random weights, NoC@tau is NaN unless some
    # scene reached tau (the clicks>=20 fallback can't fire) — that matches
    # the reference evaluator's behavior; just check type, not value
    assert all(isinstance(v, float) for v in res.values())


@pytest.mark.slow
def test_e2e_eval_deterministic(bench, tmp_path):
    scans, val_list = bench
    ds = InterMultiObjDataset(scans, val_list, 0.05)
    params, buffers, state = init_agile3d(jax.random.PRNGKey(0), CFG.model)
    engine = InteractiveEngine(CFG)
    csv1 = str(tmp_path / "r1.csv")
    csv2 = str(tmp_path / "r2.csv")
    for csv in (csv1, csv2):
        evaluate_dataset(engine, params, buffers, state, ds, csv,
                         mode="multi", max_num_clicks=3, seed=7,
                         log=lambda *a: None)
    assert open(csv1).read() == open(csv2).read()


def test_ply_roundtrip(tmp_path):
    from agile3d_tpu.data.ply import read_ply, write_ply

    rng = np.random.default_rng(0)
    n = 100
    fields = {
        "x": rng.random(n).astype(np.float32),
        "y": rng.random(n).astype(np.float32),
        "z": rng.random(n).astype(np.float32),
        "R": rng.integers(0, 255, n).astype(np.uint8),
        "G": rng.integers(0, 255, n).astype(np.uint8),
        "B": rng.integers(0, 255, n).astype(np.uint8),
        "label": rng.integers(0, 10, n).astype(np.int32),
    }
    for binary in (True, False):
        p = str(tmp_path / f"t_{binary}.ply")
        write_ply(p, fields, binary=binary)
        back = read_ply(p)
        for k, v in fields.items():
            np.testing.assert_allclose(back[k], v, rtol=1e-6)

    faces = rng.integers(0, n, (20, 3)).astype(np.int32)
    p = str(tmp_path / "mesh.ply")
    write_ply(p, fields, faces=faces)
    back, f2 = read_ply(p, with_faces=True)
    np.testing.assert_array_equal(f2, faces)


@pytest.mark.slow
def test_eval_loss_meter(bench, tmp_path):
    from agile3d_tpu.utils.misc import MetricLogger

    scans, val_list = bench
    ds = InterMultiObjDataset(scans, val_list, 0.05)
    params, buffers, state = init_agile3d(jax.random.PRNGKey(0), CFG.model)
    engine = InteractiveEngine(CFG)
    meter = MetricLogger()
    evaluate_dataset(engine, params, buffers, state, ds,
                     str(tmp_path / "r.csv"), mode="multi", max_num_clicks=2,
                     log=lambda *a: None, loss_meter=meter)
    assert meter.meters["loss"].count > 0
    assert np.isfinite(meter.meters["loss"].global_avg)
    assert np.isfinite(meter.meters["loss_bce"].global_avg)
    assert np.isfinite(meter.meters["loss_dice"].global_avg)


def test_prerecorded_clicks_translate_from_me_order(tmp_path):
    """The reference's val lists record clicks as ME-quantized voxel rows
    (first-occurrence point order, reference InterMultiObj3DSegDataset.py:
    78-86); our rows are key-sorted, so the loader must translate them."""
    import json

    import numpy as np

    from agile3d_tpu.data.datasets import InterMultiObjDataset
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from tests.synthetic import make_scene, write_benchmark

    scans, vl_path = write_benchmark(str(tmp_path), num_scenes=1, num_obj=3,
                                     seed=5, n_points=3000)
    with open(vl_path) as f:
        val_list = json.load(f)
    (name, spec), = val_list.items()

    # reconstruct what ME would have recorded: first-occurrence voxel rows
    # (the loader min-shifts coords per axis, reference :50-53 — match it)
    rng = np.random.default_rng(5)
    coords, colors, labels = make_scene(rng, n_points=3000, num_obj=3)
    coords = coords - coords.min(axis=0, keepdims=True)
    vox, umap, imap = sparse_quantize(coords, 0.05)
    fo = np.argsort(umap, kind="stable")    # our row of ME rank r
    labels_me = labels[umap][fo]            # labels in ME (first-occ) order
    clicks_me = {
        str(o): [int(np.flatnonzero(labels_me == o)[0])] for o in (1, 2, 3)
    }
    spec["clicks"] = clicks_me
    with open(vl_path, "w") as f:
        json.dump(val_list, f)

    ds = InterMultiObjDataset(scans, vl_path, 0.05)
    sample = ds[0]
    # translated rows must carry the right labels in OUR order (the loader
    # raises if not), and differ from the raw ME ranks in general
    for o, rows in sample.click_idx.items():
        assert (sample.labels[rows] == int(o)).all()
