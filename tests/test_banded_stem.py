"""Banded Mosaic stem-conv exactness (interpret mode on CPU).

The kernel (ops/banded_stem.py) must match an f32-accumulating dense
reference on bf16-rounded values — the same contract as the XLA strips
stem it replaces (whose packed gathers are bf16 too). Covers: compaction
(packed slot -> kernel cell) incl. the absent-cell rank(-1) collision
guard, window planning, pad-row zeroing, and the prep fallback.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from agile3d_tpu.config import Config
from agile3d_tpu.ops.banded_stem import (banded_stem_conv,
                                         stem_banded_prep)
from agile3d_tpu.sparse import build_pyramid, pad_pyramid
from agile3d_tpu.sparse.grid import pad_features
from agile3d_tpu.sparse.quantize import sparse_quantize
from tests.synthetic import make_scene


def _scene(n_points=30000, seed=3):
    rng = np.random.default_rng(seed)
    coords, colors, _ = make_scene(rng, n_points=n_points, num_obj=4)
    vox, _, _ = sparse_quantize(coords, Config().model.voxel_size)
    pyr = pad_pyramid(build_pyramid(vox), buckets=Config().buckets)
    return pyr.levels[0], rng


def _dense_ref(x, k5, w):
    """f32-accumulating reference on bf16-rounded values."""
    xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16), np.float32)
    wb = np.asarray(jnp.asarray(w).astype(jnp.bfloat16), np.float32)
    acc = np.zeros((len(x), w.shape[-1]), np.float32)
    for j in range(k5.shape[1]):
        idx = k5[:, j]
        acc += np.where((idx >= 0)[:, None], xb[np.maximum(idx, 0)], 0) \
            @ wb[j]
    return acc


@pytest.mark.slow
def test_stem_kernel_exact_and_pad_zero():
    lv, rng = _scene()
    n = lv.grid.shape[0]
    w0, lo, r0, rank, exc, ok = stem_banded_prep(lv.k5)
    assert ok, "bench-style scene must satisfy the static band profile"
    x = pad_features(
        rng.standard_normal((lv.num_valid, 3)).astype(np.float32), n)
    w = rng.standard_normal((125, 3, 32)).astype(np.float32) * 0.1
    out = np.asarray(banded_stem_conv(
        jnp.asarray(x), jnp.asarray(r0), jnp.asarray(rank),
        jnp.asarray(w0), jnp.asarray(lo),
        None if exc is None else jnp.asarray(exc),
        jnp.asarray(w)))
    ref = _dense_ref(x, lv.k5, w)
    np.testing.assert_allclose(out, ref, atol=1e-4)
    assert np.abs(out[lv.num_valid:]).max() == 0.0  # zero-pad invariant


@pytest.mark.slow
def test_pad_pyramid_attaches_stem_aux_and_backbone_routes():
    """pad_pyramid produces the aux on big scenes; backbone_forward output
    through the banded stem equals the strips-stem output (CPU interpret)."""
    import dataclasses

    from agile3d_tpu.models.backbone import backbone_forward, init_backbone

    rng = np.random.default_rng(0)
    coords, colors, _ = make_scene(rng, n_points=60000, num_obj=4,
                                   extent=4.0)
    vox, umap, _ = sparse_quantize(coords, Config().model.voxel_size)
    pyr = pad_pyramid(build_pyramid(vox), buckets=Config().buckets)
    if pyr.levels[0].grid.shape[0] < 32768:
        pytest.skip("scene too small for stem aux")
    assert pyr.levels[0].sb_r0 is not None

    cfg_on = dataclasses.replace(Config().model.backbone, banded_conv=True)
    cfg_off = dataclasses.replace(Config().model.backbone, banded_conv=False)
    n0 = pyr.levels[0].grid.shape[0]
    x = jnp.asarray(pad_features(
        colors[umap].astype(np.float32) / 255.0, n0))
    params, state = init_backbone(jax.random.PRNGKey(0), cfg_on)
    fm_on, _ = backbone_forward(params, state, pyr, x, training=False,
                                cfg=cfg_on)
    fm_off, _ = backbone_forward(params, state, pyr, x, training=False,
                                 cfg=cfg_off)
    np.testing.assert_allclose(np.asarray(fm_on[-1]),
                               np.asarray(fm_off[-1]), atol=2e-2)


def test_prep_falls_back_on_small_or_misaligned():
    lv, _ = _scene()
    # misaligned row count
    ok = stem_banded_prep(lv.k5[:127])[-1]
    assert not ok
    # exception capacity exceeded -> fallback
    ok = stem_banded_prep(lv.k5, exc_cap=0)[-1]
    assert isinstance(ok, bool)


@pytest.mark.slow
def test_exception_strips_corrected():
    """Force a tiny band profile so many strips go out of band; the
    exception scatter-add must restore exactness."""
    import agile3d_tpu.ops.banded_stem as bs

    lv, rng = _scene()
    n = lv.grid.shape[0]
    orig = bs._DX_W
    bs._DX_W = (64, 64, 64, 64, 64)   # absurdly tight: floods exceptions
    try:
        w0, lo, r0, rank, exc, ok = stem_banded_prep(
            lv.k5, exc_cap=2_000_000)
    finally:
        bs._DX_W = orig
    if not ok:
        pytest.skip("tight profile produced unplannable windows")
    n_exc = int((exc[:, 0] >= 0).sum())
    assert n_exc > 0, "tight profile should produce exceptions"
    x = pad_features(
        rng.standard_normal((lv.num_valid, 3)).astype(np.float32), n)
    w = rng.standard_normal((125, 3, 32)).astype(np.float32) * 0.1
    # run the kernel with the tight widths it was planned for
    bs._DX_W = (64, 64, 64, 64, 64)
    try:
        out = np.asarray(banded_stem_conv(
            jnp.asarray(x), jnp.asarray(r0), jnp.asarray(rank),
            jnp.asarray(w0), jnp.asarray(lo), jnp.asarray(exc),
            jnp.asarray(w)))
    finally:
        bs._DX_W = orig
    ref = _dense_ref(x, lv.k5, w)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_eval_transfer_drops_k5_iff_banded_active():
    """engine/eval.device_batch must ship the padded k5 map ONLY when the
    banded stem will not serve the batch (the exception strips carry their
    own cell rows, so the kernel path has no k5 consumer on device)."""
    import dataclasses

    from agile3d_tpu.data.datasets import SceneSample, collate_scenes
    from agile3d_tpu.engine.eval import InteractiveEngine
    from agile3d_tpu.models.backbone import stem_banded_active
    from agile3d_tpu.sparse.quantize import sparse_quantize

    cfg = Config()
    rng = np.random.default_rng(5)
    coords, colors, labels = make_scene(rng, n_points=40000, num_obj=4)
    vox, umap, imap = sparse_quantize(coords, cfg.model.voxel_size)
    sample = SceneSample(
        vox_coords=vox, raw_coords=coords[umap],
        feats=colors[umap].astype(np.float32) / 255.0,
        labels=labels[umap].astype(np.int32),
        labels_full=labels.astype(np.int32), inverse_map=imap,
        click_idx={}, scene_name="t", num_obj=4)
    batch = collate_scenes([sample], cfg.buckets)
    assert batch.pyramid.levels[0].sb_r0 is not None

    def with_banded(flag):
        return dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, backbone=dataclasses.replace(
                cfg.model.backbone, banded_conv=flag)))

    # forced ON (CPU backend would otherwise disable it)
    cfg_on = with_banded(True)
    assert stem_banded_active(cfg_on.model.backbone,
                              batch.pyramid.levels[0], False)
    pyr_d, *_ = InteractiveEngine(cfg_on).device_batch(batch)
    assert pyr_d.levels[0].k5 is None
    assert pyr_d.levels[0].sb_r0 is not None

    # forced OFF: the strips/scan stem needs k5 -> it must ship
    pyr_d, *_ = InteractiveEngine(with_banded(False)).device_batch(batch)
    assert pyr_d.levels[0].k5 is not None
