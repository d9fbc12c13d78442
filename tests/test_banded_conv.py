"""Banded windowed-gather conv (ops/banded_conv.py): exactness vs the scan
conv, host prep invariants, and the pad_pyramid wiring. Runs the Mosaic
kernel through the Pallas interpreter (CPU backend -> interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agile3d_tpu.config import Config
from agile3d_tpu.ops.banded_conv import (
    BLOCK_M,
    SUB,
    W_WIN,
    banded_conv,
    banded_prep,
    banded_widths,
)
from agile3d_tpu.ops.sparse_conv import sparse_conv
from agile3d_tpu.sparse import build_pyramid, pad_pyramid
from agile3d_tpu.sparse.quantize import sparse_quantize
from tests.synthetic import make_scene


def _small_padded_k3(n_points=18000, bucket=2048):
    rng = np.random.default_rng(3)
    coords, _, _ = make_scene(rng, n_points=n_points, num_obj=4)
    coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
    vox, _, _ = sparse_quantize(coords, 0.2)
    pyr = pad_pyramid(build_pyramid(vox), buckets=(bucket, 4 * bucket))
    lvl = pyr.levels[0]
    assert lvl.k3.shape[0] % BLOCK_M == 0
    return lvl


def test_banded_matches_scan_and_zero_pads():
    lvl = _small_padded_k3()
    k3 = lvl.k3
    n = k3.shape[0]
    w0_t, lo_t, exc_t, ok = banded_prep(k3)
    assert ok
    rng = np.random.default_rng(0)
    cin = cout = 96
    x = jnp.asarray(rng.standard_normal((n, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32)
                    * 0.1)
    got = banded_conv(x, jnp.asarray(k3), jnp.asarray(lo_t),
                      jnp.asarray(w0_t), w, exc=exc_t)
    ref = sparse_conv(x, jnp.asarray(k3), w)
    # kernel rounds activations to bf16 before the one-hot gather
    assert float(jnp.abs(got - ref).max()) < 0.05 * float(
        jnp.abs(ref).max() + 1.0)
    # zero-pad invariant: pad rows (all neighbors absent) stay exactly 0
    pad_rows = ~np.asarray(lvl.valid)
    if pad_rows.any():
        assert float(jnp.abs(got[pad_rows]).max()) == 0.0


@pytest.mark.slow
def test_banded_grads_match_scan_conv():
    """Custom VJP: dX (stencil-transpose identity) and dW (accumulating
    kernel) must match jax.grad through the XLA scan conv."""
    lvl = _small_padded_k3()
    k3 = lvl.k3
    n = k3.shape[0]
    w0_t, lo_t, exc_t, ok = banded_prep(k3)
    assert ok
    rng = np.random.default_rng(7)
    cin, cout = 96, 64
    x = jnp.asarray(rng.standard_normal((n, cin)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((27, cin, cout)).astype(np.float32)
                    * 0.1)
    # a fixed cotangent-shaping target makes the losses identical functions
    tgt = jnp.asarray(rng.standard_normal((n, cout)).astype(np.float32))
    k3_d, lo_d, w0_d = jnp.asarray(k3), jnp.asarray(lo_t), jnp.asarray(w0_t)

    def loss_banded(x, w):
        return jnp.sum((banded_conv(x, k3_d, lo_d, w0_d, w,
                                    exc=exc_t) - tgt) ** 2)

    def loss_scan(x, w):
        return jnp.sum((sparse_conv(x, k3_d, w) - tgt) ** 2)

    gx_b, gw_b = jax.grad(loss_banded, argnums=(0, 1))(x, w)
    gx_s, gw_s = jax.grad(loss_scan, argnums=(0, 1))(x, w)
    # both paths round activations/grads to bf16 before MXU passes on TPU;
    # on CPU the scan conv runs f32, so tolerances are bf16-scale
    def rel_err(a, b):
        return float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-6))

    assert rel_err(gx_b, gx_s) < 0.03, rel_err(gx_b, gx_s)
    assert rel_err(gw_b, gw_s) < 0.03, rel_err(gw_b, gw_s)
    # pad rows get zero gradient (zero-pad invariant survives the VJP)
    pad_rows = ~np.asarray(lvl.valid)
    if pad_rows.any():
        assert float(jnp.abs(gx_b[pad_rows]).max()) == 0.0


def test_banded_prep_invariants():
    lvl = _small_padded_k3()
    k3 = lvl.k3
    w0_t, lo_t, exc_t, ok = banded_prep(k3)
    assert ok
    n, k = k3.shape
    nb = n // BLOCK_M
    assert w0_t.shape == (nb // SUB,)   # one window per SUB sub-blocks
    assert lo_t.shape[0] == nb and lo_t.shape[1] >= k
    sub_ws = np.asarray(banded_widths(3))
    cells = k3.reshape(nb, BLOCK_M, k).astype(np.int64)
    w0_rows = np.repeat(w0_t, SUB)
    rel = cells - (w0_rows[:, None, None].astype(np.int64) * 32)
    sub_rel = rel - lo_t[:, None, :k].astype(np.int64) * 32
    present = cells >= 0
    assert np.all(np.where(present, sub_rel >= 0, True))
    assert np.all(np.where(present, sub_rel < sub_ws[None, None, :], True))
    # window DMA never runs out of the W-padded input
    assert np.all(w0_t * 32 + W_WIN <= n + W_WIN)


def test_banded_prep_rejects_band_violations():
    # a map whose neighbors jump the full array violates any banded profile
    n, k = 4 * BLOCK_M, 27
    rng = np.random.default_rng(1)
    nbr = rng.integers(0, n, (n, k)).astype(np.int32)
    nbr[0, 0], nbr[0, 1] = 0, n - 1   # span ~ n >> profile width
    w0_t, lo_t, exc_t, ok = banded_prep(nbr)
    # band-jumping neighbors now land on the exception list instead of
    # failing the scene (unless they overflow the capacity)
    assert ok == (exc_t is not None)
    assert banded_prep(nbr, exc_cap=0)[-1] is False
    # unaligned row count is rejected, not mis-handled
    assert banded_prep(np.zeros((BLOCK_M + 1, k), np.int32))[-1] is False


def test_pad_pyramid_builds_banded_aux_only_when_big():
    lvl = _small_padded_k3()          # 2048-voxel bucket: below threshold
    assert lvl.blo is None and lvl.bw0 is None

    rng = np.random.default_rng(5)
    coords, _, _ = make_scene(rng, n_points=90000, num_obj=6)
    coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
    vox, _, _ = sparse_quantize(coords, 0.02)
    cfg = Config()
    pyr = pad_pyramid(build_pyramid(vox), buckets=cfg.buckets)
    l0 = pyr.levels[0]
    if l0.k3.shape[0] >= 32768:       # big scene: aux present and coherent
        assert l0.blo is not None and l0.bw0 is not None
        assert l0.bw0.shape[0] == l0.k3.shape[0] // (BLOCK_M * SUB)
    # deeper levels never carry aux
    for lv in pyr.levels[2:]:
        assert lv.blo is None


@pytest.mark.slow
def test_exception_pairs_corrected():
    """Force tiny band widths so neighbors go out of band; the exception
    gather + scatter-add must restore exactness (same contract as the
    stem kernel's exception list)."""
    lvl = _small_padded_k3()
    k3 = lvl.k3
    n = k3.shape[0]
    tight = tuple(64 for _ in range(27))
    # cap sized to the scene (the correction arrays scale with it)
    w0_t, lo_t, exc_t, ok = banded_prep(k3, sub_ws=tight, exc_cap=60_000)
    if not ok:
        pytest.skip("tight profile unplannable on this scene")
    assert exc_t is not None and int((exc_t[:, 0] >= 0).sum()) > 0
    rng = np.random.default_rng(0)
    cin = cout = 96
    x = jnp.asarray(rng.standard_normal((n, cin)).astype(np.float32))
    w = jnp.asarray(
        rng.standard_normal((27, cin, cout)).astype(np.float32) * 0.1)
    got = banded_conv(x, jnp.asarray(k3), jnp.asarray(lo_t),
                      jnp.asarray(w0_t), w, exc=jnp.asarray(exc_t),
                      sub_ws=tight)
    ref = sparse_conv(x, jnp.asarray(k3), w)
    assert float(jnp.abs(got - ref).max()) < 0.05 * float(
        jnp.abs(ref).max() + 1.0)
