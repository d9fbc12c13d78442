"""Analytic FLOPs accounting (utils/costs.py) cross-checked against XLA's
own compiled cost analysis — the independent oracle for the MFU/roofline
numbers bench.py reports (VERDICT r4 task 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agile3d_tpu.config import Config, ModelConfig
from agile3d_tpu.models.agile3d import (
    ClickState, SceneFeatures, forward_mask, init_agile3d)
from agile3d_tpu.utils.costs import (
    backbone_costs, decoder_costs, stage_table, summarize)


def test_decoder_flops_match_xla_cost_analysis():
    cfg = ModelConfig(max_clicks=32)
    params, buffers, _ = init_agile3d(jax.random.PRNGKey(0), cfg)
    n = 2048
    scene = SceneFeatures(
        mask_feat=jnp.zeros((1, n, 128)), pos_pcd=jnp.zeros((1, n, 128)),
        vox_valid=jnp.ones((1, n), bool), raw=jnp.zeros((1, n, 3)),
        cmin=jnp.zeros((1, 3)), cmax=jnp.ones((1, 3)))
    clicks = ClickState(jnp.full((1, 32), -1, jnp.int32),
                        jnp.zeros((1, 32), jnp.int32),
                        jnp.zeros((1, 32), jnp.int32))
    lowered = jax.jit(
        lambda p, b, s, c: forward_mask(p, b, s, c,
                                        jnp.asarray([3], jnp.int32),
                                        cfg=cfg)
    ).lower(params, buffers, scene, clicks)
    xla_flops = lowered.compile().cost_analysis()["flops"]

    mine = summarize(decoder_costs(n, 10 + 32, cfg))["model_flops"]
    # the analytic count tracks the matmul work; XLA adds elementwise /
    # softmax flops — agree within 10%
    assert abs(mine - xla_flops) / xla_flops < 0.10, (mine, xla_flops)


@pytest.mark.slow
def test_backbone_flops_match_xla_cost_analysis(monkeypatch):
    import dataclasses

    import agile3d_tpu.ops.sparse_conv as sc
    from agile3d_tpu.data.datasets import SceneSample, collate_scenes
    from agile3d_tpu.models.backbone import backbone_forward
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from tests.synthetic import make_scene

    # XLA's HloCostAnalysis counts a while-loop (lax.scan) body ONCE,
    # regardless of trip count — so the oracle comparison must compile a
    # fully-unrolled program: plain gather-GEMM route (no strips, whose
    # steps>1 path also scans) and every offset unrolled.
    monkeypatch.setattr(sc, "_UNROLL_MAX_K", 1000)

    rng = np.random.default_rng(0)
    cfg = Config(buckets=(2048, 4096, 8192, 16384, 32768))
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, backbone=dataclasses.replace(
                cfg.model.backbone, strip_conv=False, banded_conv=False)))
    coords, colors, labels = make_scene(rng, n_points=12000, num_obj=4,
                                        extent=3.0)
    vox, umap, imap = sparse_quantize(coords, 0.05)
    s = SceneSample(vox_coords=vox, raw_coords=coords[umap],
                    feats=colors[umap].astype(np.float32) / 255.0,
                    labels=labels[umap].astype(np.int32),
                    labels_full=labels.astype(np.int32), inverse_map=imap,
                    click_idx={}, scene_name="t", num_obj=4)
    batch = collate_scenes([s], cfg.buckets)
    params, _, bn = init_agile3d(jax.random.PRNGKey(0), cfg.model)
    pyr = batch.pyramid
    lowered = jax.jit(
        lambda p, st, f: backbone_forward(p, st, pyr, f, training=False,
                                          cfg=cfg.model.backbone)
    ).lower(params["backbone"], bn, jnp.asarray(batch.feats))
    xla_flops = lowered.compile().cost_analysis()["flops"]

    # padded counts = the matmul work the compiled program actually issues.
    # XLA's total adds elementwise flops on top (per-offset masked-gather
    # selects, accumulator adds, BN/ReLU — measured ~12% here) that the
    # analytic model deliberately excludes as non-MXU work, so the oracle
    # band is one-sided: mine <= xla, within 15%.
    mine_padded = summarize(
        backbone_costs(pyr, cfg.model.backbone, padded=True))["model_flops"]
    assert mine_padded <= xla_flops * 1.02, (mine_padded, xla_flops)
    assert (xla_flops - mine_padded) / xla_flops < 0.15, (
        mine_padded, xla_flops)

    # useful counts are <= padded and the stage table covers every stage
    costs = backbone_costs(pyr, cfg.model.backbone)
    assert summarize(costs)["model_flops"] <= mine_padded
    table = stage_table(costs)
    assert set(table) == {"stem", "down1", "down2", "down3", "down4",
                          "up4", "up5", "up6", "up7"}
    assert all(v["gflops"] > 0 for k, v in table.items() if k != "stem")


def test_summarize_roofline_fields():
    cfg = ModelConfig()
    costs = decoder_costs(8192, 42, cfg)
    out = summarize(costs, measured_s=5e-3)
    for k in ("model_flops", "achieved_tflops", "achieved_gbps",
              "frac_of_peak_mxu", "frac_of_roofline", "roofline_floor_ms"):
        assert k in out
    assert 0 < out["frac_of_roofline"] <= 1.5  # floor can't exceed measured
    assert out["achieved_tflops"] == pytest.approx(
        out["model_flops"] / 5e-3 / 1e12, abs=5e-4)  # summarize rounds to 3dp
