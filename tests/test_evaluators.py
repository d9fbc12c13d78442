"""Golden regression: the ported evaluators must reproduce the BASELINE.md
metrics from the reference repo's committed result CSVs (SURVEY.md section 4:
the CSVs are end-to-end oracles)."""

import os

import numpy as np
import pytest

from agile3d_tpu.evaluation import EvaluatorMO, evaluate_ap
from agile3d_tpu.evaluation.ap import ap_at_clicks, compute_averages

RESULTS = "/root/reference/results"


def _keys_from_csv(path):
    keys = {}
    with open(path) as f:
        for line in f:
            s = line.rstrip().split(" ")
            if len(s) >= 5:
                keys[f"scene{s[1]}_obj_{s[2]}"] = {}
    return keys


# BASELINE.md multi-object table (computed with the reference's own metric
# definitions from its committed CSVs)
MO_EXPECTED = {
    "our_multi_scannet.csv": {
        "NoC@50": 1.11, "NoC@65": 1.86, "NoC@80": 6.28, "NoC@85": 10.04,
        "NoC@90": 14.36, "IoU@1": 67.7, "IoU@3": 79.6, "IoU@5": 82.3,
        "IoU@10": 85.0, "IoU@15": 86.0,
    },
    "our_multi_s3dis.csv": {
        "NoC@50": 1.21, "NoC@65": 1.68, "NoC@80": 3.41, "NoC@85": 5.68,
        "NoC@90": 9.62, "IoU@1": 62.4, "IoU@3": 82.3, "IoU@5": 86.3,
        "IoU@10": 88.3, "IoU@15": 90.3,
    },
    "our_multi_kitti360.csv": {
        "NoC@50": 10.39, "NoC@65": 14.33, "NoC@80": 17.37, "NoC@85": 18.25,
        "NoC@90": 18.79, "IoU@1": 34.9, "IoU@3": 39.4, "IoU@5": 40.4,
        "IoU@10": 44.3, "IoU@15": 48.2,
    },
}


@pytest.mark.parametrize("csv_name", sorted(MO_EXPECTED))
def test_evaluator_mo_reproduces_baseline(csv_name):
    path = os.path.join(RESULTS, csv_name)
    if not os.path.exists(path):
        pytest.skip("reference results not mounted")
    ev = EvaluatorMO(_keys_from_csv(path), path)
    got = ev.eval_results()
    for name, want in MO_EXPECTED[csv_name].items():
        val = got[name]
        if name.startswith("IoU"):
            val *= 100
        assert abs(val - want) < 0.051, (csv_name, name, val, want)


def test_evaluator_so_reproduces_baseline():
    path = os.path.join(RESULTS, "our_single_scannet20_seen.csv")
    if not os.path.exists(path):
        pytest.skip("reference results not mounted")
    # no val-list npy is shipped; build the object set from the CSV, with a
    # dummy per-object class so grouping machinery runs
    pairs = []
    with open(path) as f:
        for line in f:
            s = line.rstrip().split(" ")
            if len(s) >= 5:
                pairs.append(("scene" + s[1], s[2]))
    pairs = sorted(set(pairs))
    from agile3d_tpu.evaluation import EvaluatorSO

    ev = EvaluatorSO("scannet40", np.array(pairs),
                     np.array(["chair"] * len(pairs)), path)
    got = ev.eval_results()
    # BASELINE.md single-object ScanNet20-seen row
    expected = {"NoC@50": 1.67, "NoC@65": 2.74, "NoC@80": 5.74,
                "NoC@85": 8.07, "NoC@90": 11.60, "IoU@1": 67.8,
                "IoU@3": 78.7, "IoU@5": 82.6, "IoU@10": 85.8, "IoU@15": 87.1}
    for name, want in expected.items():
        val = got[name]
        if name.startswith("IoU"):
            val *= 100
        assert abs(val - want) < 0.051, (name, val, want)


def test_ap_sane_on_reference_csv():
    path = os.path.join(RESULTS, "our_single_scannet20_seen.csv")
    if not os.path.exists(path):
        pytest.skip("reference results not mounted")
    aps = compute_averages(ap_at_clicks(path, 10))
    assert 0.0 <= aps["all_ap"] <= 1.0
    assert aps["all_ap_25%"] >= aps["all_ap_50%"] >= aps["all_ap"]
    # more clicks should not hurt AP much; 15 clicks beats 2 clicks
    a2 = compute_averages(ap_at_clicks(path, 2))["all_ap"]
    a15 = compute_averages(ap_at_clicks(path, 15))["all_ap"]
    assert a15 > a2


def test_iou_at_k_key_format():
    """Pin the CSV click-column formatting contract: the eval writers emit
    f"{current / num_obj}" and EvaluatorMO matches IoU@k rows by the
    literal strings '1.0'/'3.0'/'5.0'/'10.0'/'15.0'. Exact IEEE division
    of small ints guarantees the match for every num_obj <= 10 and
    k <= 20."""
    for num_obj in range(1, 11):
        for k in (1, 3, 5, 10, 15):
            current = k * num_obj
            assert f"{current / num_obj}" == f"{float(k)}"
