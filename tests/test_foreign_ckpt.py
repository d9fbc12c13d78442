"""Foreign-layout converter round-trip (VERDICT r4 task 8).

The existing round-trip (tests/test_ckpt.py) pins convert(export(x)) == x,
but both directions are this repo's code: a shared misunderstanding of the
reference's tensor layouts would cancel out. These tests feed the
converter artifacts minted in the FOREIGN layouts themselves:

  * conv kernels whose slice axis is enumerated by the ME C++ iterator
    SIMULATION (tests/test_kernel_perm.me_region_iterator_offsets — a
    literal step-by-step re-implementation of ME's kernel_region iterator
    that shares no code with the analytic digit-reversal perm);
  * torch's own nn.MultiheadAttention in_proj packing (the module is the
    oracle: parity is checked against its forward output, so the test
    binds to torch's packing semantics, not this repo's export);
  * torch BatchNorm1d buffers (running stats written by torch itself);
  * torch nn.Linear [out, in] weight layout.

Together with tests/test_ckpt.py and tests/test_kernel_perm.py this
narrows utils/ckpt.py's day-zero caveat to: ordering verified against
both derivations AND a foreign-layout artifact; value check pending the
released checkpoint1099.pth (RUNBOOK.md).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from agile3d_tpu.sparse.kernel_maps import kernel_offsets
from agile3d_tpu.utils.ckpt import (
    _bn, _kernel, _linear, _mha, _resolve_perm)
from tests.test_kernel_perm import me_region_iterator_offsets


@pytest.mark.parametrize("k", [2, 3, 5])
def test_foreign_kernel_slices_land_on_their_geometric_offsets(k):
    """Mint a kernel whose ME-order slice j encodes the offset the ME
    iterator simulation says position j holds; after conversion, slice i
    (our enumeration) must encode OUR offset i — i.e. the converter pairs
    weights with geometric offsets exactly as ME would, with the ME side
    derived independently of the analytic perm."""
    me_order = me_region_iterator_offsets(k)  # [K, 3], simulated C++ order
    K = me_order.shape[0]
    # slice j = the offset tuple broadcast into a [1, 3] "weight"
    w_me = me_order.astype(np.float32).reshape(K, 1, 3)
    sd = {"backbone.any.kernel": w_me}
    w_ours = _kernel(sd, "backbone.any.kernel", _resolve_perm("me"))
    np.testing.assert_array_equal(
        w_ours.reshape(K, 3).astype(np.int32), kernel_offsets(k))


def test_torch_mha_packing_activation_parity():
    """torch's nn.MultiheadAttention IS the oracle: its randomly
    initialized in_proj packing goes through the converter's _mha and the
    repo's MHA must reproduce the module's forward output."""
    import jax.numpy as jnp

    from agile3d_tpu.ops.attention import mha

    torch.manual_seed(7)
    e, h, lq, lk = 64, 4, 5, 9
    m = nn.MultiheadAttention(e, h, dropout=0.0)
    m.eval()
    q = torch.randn(lq, 1, e)
    kv = torch.randn(lk, 1, e)
    with torch.no_grad():
        want, _ = m(q, kv, kv, need_weights=False)

    sd = {f"x.{n}": t.detach().numpy() for n, t in m.state_dict().items()}
    p = _mha(sd, "x")
    got = mha({k: jnp.asarray(v) for k, v in p.items()},
              jnp.asarray(q.numpy().transpose(1, 0, 2)),
              jnp.asarray(kv.numpy().transpose(1, 0, 2)),
              jnp.asarray(kv.numpy().transpose(1, 0, 2)), num_heads=h)
    np.testing.assert_allclose(np.asarray(got)[0],
                               want.numpy()[:, 0, :], atol=2e-5)


def test_torch_bn_buffers_through_converter():
    """Running stats written by torch's own BatchNorm1d (train-mode
    updates, then eval-mode normalize) must reproduce through _bn + the
    repo's masked batch_norm in eval mode."""
    import jax.numpy as jnp

    from agile3d_tpu.ops.norm import batch_norm

    torch.manual_seed(3)
    c = 8
    bn = nn.BatchNorm1d(c, momentum=0.02)
    with torch.no_grad():
        bn.weight.copy_(torch.randn(c))
        bn.bias.copy_(torch.randn(c))
    bn.train()
    for _ in range(5):           # torch writes its own running buffers
        bn(torch.randn(32, c))
    bn.eval()
    x = torch.randn(16, c)
    want = bn(x).detach().numpy()

    sd = {f"p.bn.{n}": t.detach().numpy() for n, t in bn.state_dict().items()}
    params, state = _bn(sd, "p")
    got, _ = batch_norm(jnp.asarray(x.numpy()), jnp.ones(16, bool),
                        {k: jnp.asarray(v) for k, v in params.items()},
                        state, training=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_torch_linear_layout_through_converter():
    torch.manual_seed(1)
    lin = nn.Linear(6, 4)
    x = torch.randn(3, 6)
    want = lin(x).detach().numpy()
    sd = {f"l.{n}": t.detach().numpy() for n, t in lin.state_dict().items()}
    p = _linear(sd, "l")
    got = x.numpy() @ p["w"] + p["b"]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_export_enumeration_matches_me_iterator_simulation():
    """The export path's ME-order emission checked against the simulated
    iterator (not the analytic perm): exported slice at the simulated
    position of geometric offset o must equal the repo param slice at our
    position of o — for every kernel volume the backbone uses."""
    import jax

    from agile3d_tpu.config import Config
    from agile3d_tpu.models.agile3d import init_agile3d
    from agile3d_tpu.utils.ckpt import export_torch_state_dict

    cfg = Config().model
    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0), cfg)
    sd = export_torch_state_dict(params, buffers, cfg, bn_state)

    for sd_name, ours in [
        ("backbone.conv0p1s1.kernel",
         params["backbone"]["conv0p1s1"]["w"]),           # k=5
        ("backbone.block1.0.conv1.kernel",
         params["backbone"]["block1"][0]["conv1"]["w"]),  # k=3
        ("backbone.conv1p1s2.kernel",
         params["backbone"]["conv1"]["w"]),               # k=2
    ]:
        w_me = np.asarray(sd[sd_name])
        ours = np.asarray(ours)
        K = w_me.shape[0]
        k = round(K ** (1 / 3))
        me_order = me_region_iterator_offsets(k)
        pos_in_me = {tuple(o): j for j, o in enumerate(me_order.tolist())}
        for i, off in enumerate(kernel_offsets(k).tolist()):
            np.testing.assert_array_equal(w_me[pos_in_me[tuple(off)]],
                                          ours[i], err_msg=sd_name)
