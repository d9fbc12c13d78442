"""End-to-end single-object (InterObject3D protocol) eval + AP pipeline."""

import os

import jax
import numpy as np
import pytest

from agile3d_tpu.config import Config, ModelConfig
from agile3d_tpu.data.datasets import InterSingleObjDataset
from agile3d_tpu.engine.eval import InteractiveEngine, evaluate_dataset
from agile3d_tpu.evaluation import EvaluatorSO, evaluate_ap
from agile3d_tpu.models.agile3d import init_agile3d
from tests.synthetic import write_benchmark

CFG = Config(model=ModelConfig(max_clicks=32), buckets=(1024, 2048, 4096))


@pytest.mark.slow
def test_single_object_eval_pipeline(tmp_path):
    scans, _ = write_benchmark(str(tmp_path), num_scenes=2, num_obj=2,
                               n_points=1500)
    objects = np.array([["scene0000_00", "1"], ["scene0000_00", "2"],
                        ["scene0001_00", "1"]])
    ds = InterSingleObjDataset(scans, objects, 0.05)
    assert len(ds) == 3
    s = ds[0]
    assert set(np.unique(s.labels)) <= {0, 1}   # binarized
    assert s.num_obj == "1"

    params, buffers, bn = init_agile3d(jax.random.PRNGKey(0), CFG.model)
    engine = InteractiveEngine(CFG)
    csv = str(tmp_path / "single.csv")
    evaluate_dataset(engine, params, buffers, bn, ds, csv, mode="single",
                     max_num_clicks=3, log=lambda *a: None)

    rows = open(csv).read().strip().split("\n")
    # 3 objects x rounds at 0..3 clicks = 4 rows each (absolute counts)
    assert len(rows) == 12
    clicks_cols = [r.split(" ")[3] for r in rows[:4]]
    assert clicks_cols == ["0", "1", "2", "3"]

    ev = EvaluatorSO("scannet40", objects,
                     np.array(["chair", "table", "sofa"]), csv)
    res = ev.eval_results()
    assert "IoU@1" in res and np.isfinite(res["IoU@1"])
    per_class = ev.eval_per_class()
    assert set(per_class) <= {"chair", "table", "sofa"}

    ap = evaluate_ap(csv, clicks_range=range(1, 4))
    for k in (1, 2, 3):
        assert 0 <= ap[k]["all_ap"] <= 1

    # architectural-class exclusion machinery
    res_excl = ev.eval_results(exclude_classes=("chair",))
    assert np.isfinite(res_excl["IoU@1"])
