"""The driver's multi-chip gate must pass in-process on the 8-device CPU
mesh (conftest provisions it) — and stay cheap enough that it also passes
on a ONE-core host: MULTICHIP_r03 regressed because the dryrun compiled the
flagship 26-block backbone and XLA:CPU's 40 s all-reduce rendezvous starved
when 8 shard programs serialized on one core. dryrun_cfg() is the tiny
structural-validation config that keeps this gate host-speed-independent
(verified under `taskset -c 0`: 82 s end to end)."""

import jax
import pytest

from __graft_entry__ import dryrun_cfg, dryrun_multichip


@pytest.mark.slow
def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    dryrun_multichip(8)  # raises on any sharding/collective failure


def test_dryrun_cfg_is_tiny():
    """Guard the r03 regression class: the dry run must never silently grow
    back to a config whose per-shard program can outlast XLA:CPU's
    collective rendezvous window on a slow host."""
    cfg = dryrun_cfg()
    assert max(cfg.model.backbone.planes) <= 32
    assert sum(cfg.model.backbone.layers) <= 8
    assert max(cfg.buckets) <= 1024
    assert cfg.train.batch_size == 1
