"""Checkpointing: orbax-native save/resume + one-way PyTorch converter.

The reference checkpoints a dict {model, optimizer, lr_scheduler, epoch,
args} every epoch (reference main.py:190-202) and releases
``checkpoint1099.pth``; eval CLIs load model-only with strict=False
(eval_multi_obj.py:199-205). Here:

  * ``save_checkpoint`` / ``load_checkpoint`` — orbax StandardCheckpointer
    over the (params, buffers, bn_state, opt_state, epoch) bundle.
  * ``convert_torch_state_dict`` — maps the reference's state_dict names
    onto the jax param/buffer/bn-state trees (torch [out,in] Linears are
    transposed; packed MHA in_proj is split; ME conv kernels keep their
    [K, in, out] layout modulo the kernel-offset enumeration permutation;
    the default table is verified against two independent derivations of
    ME's region-iterator semantics — the analytic digit-reversal
    (sparse/kernel_maps.me_kernel_perm) and a literal simulation of ME's
    C++ iterator (tests/test_kernel_perm.py) — plus a foreign-layout
    round-trip: artifacts minted in the reference's own layouts (torch
    nn.MultiheadAttention in_proj packing with the module's forward as
    oracle, torch BN buffers, ME-iterator-ordered kernel slices) convert
    to activation/semantic parity (tests/test_foreign_ckpt.py). The table
    stays configurable via ``kernel_perm``; what remains unproven offline
    is only the VALUE check against the released checkpoint1099.pth
    weights (day-zero plan: RUNBOOK.md).
"""

from __future__ import annotations

import numpy as np

from agile3d_tpu.config import ModelConfig
from agile3d_tpu.ops.norm import BNState


# ---------------------------------------------------------------------------
# Orbax-native checkpoints
# ---------------------------------------------------------------------------


def save_checkpoint(path, params, buffers, bn_state, opt_state=None,
                    epoch: int = 0):
    import orbax.checkpoint as ocp

    bundle = {"params": params, "buffers": buffers, "bn_state": bn_state,
              "epoch": np.asarray(epoch)}
    if opt_state is not None:
        bundle["opt_state"] = opt_state
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, bundle, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path, template: dict):
    """Restore against a template bundle (same structure as saved).

    Placement: orbax hands back COMMITTED host arrays, and a jit called
    with committed-CPU inputs lowers for the CPU platform — on the TPU
    host that crashes the Mosaic kernels ('Only interpret mode is
    supported on CPU backend', observed in the round-4 regime resume).
    Two template cases:

      * template leaf on the DEFAULT backend (e.g. dp-mesh training state,
        or any CPU-backend test): device_put onto its sharding — restore
        lands exactly where the template lives
        (tests/test_ckpt.py::test_orbax_restore_lands_on_template_device);
      * template leaf on a NON-default platform — the normal single-chip
        resume: init_agile3d keeps the fresh-init template host-resident
        on purpose (fast init + fast first save, models/agile3d.py:88-94),
        so "the template's device" is the WRONG target. Return plain
        numpy instead: uncommitted host arrays behave exactly like fresh
        init (transferred to the accelerator on first use, no platform
        poisoning). Round-5 regime resume hit this: the round-4 fix
        restored onto the CPU-resident template's sharding, committing
        the whole state to CPU and crashing the first rollout backbone.
    """
    import jax
    import numpy as np_
    import orbax.checkpoint as ocp

    default_platform = jax.default_backend()

    def _place(r, t):
        if hasattr(t, "sharding"):
            t_platform = next(iter(t.sharding.device_set)).platform
            if t_platform == default_platform:
                return jax.device_put(r, t.sharding)
        return np_.asarray(r) if hasattr(r, "devices") else r

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, template)
    return jax.tree_util.tree_map(_place, restored, template)


def load_model_weights(path: str, cfg: ModelConfig = ModelConfig(),
                       kernel_perm: dict | str | None = "me"):
    """Load (params, buffers, bn_state) from either a reference .pth
    checkpoint (converted on the fly; torch needed only here) or an
    orbax directory saved by save_checkpoint."""
    if path.endswith(".pth"):
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt)
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
              for k, v in sd.items()}
        return convert_torch_state_dict(sd, cfg, kernel_perm)

    import jax

    from agile3d_tpu.models.agile3d import init_agile3d

    template_p, template_b, template_s = init_agile3d(
        jax.random.PRNGKey(0), cfg)
    restored = load_checkpoint(path, {
        "params": template_p, "buffers": template_b,
        "bn_state": template_s, "epoch": np.asarray(0)})
    return restored["params"], restored["buffers"], restored["bn_state"]


# ---------------------------------------------------------------------------
# torch -> jax conversion
# ---------------------------------------------------------------------------


def _mha(sd, prefix):
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])  # [3E, E]
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])
    e = w.shape[1]
    return {
        "q_w": w[:e].T, "k_w": w[e: 2 * e].T, "v_w": w[2 * e:].T,
        "q_b": b[:e], "k_b": b[e: 2 * e], "v_b": b[2 * e:],
        "out_w": np.asarray(sd[f"{prefix}.out_proj.weight"]).T,
        "out_b": np.asarray(sd[f"{prefix}.out_proj.bias"]),
    }


def _ln(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _linear(sd, prefix):
    return {"w": np.asarray(sd[f"{prefix}.weight"]).T,
            "b": np.asarray(sd[f"{prefix}.bias"])}


def _bn(sd, prefix):
    params = {"scale": np.asarray(sd[f"{prefix}.bn.weight"]),
              "bias": np.asarray(sd[f"{prefix}.bn.bias"])}
    state = BNState(mean=np.asarray(sd[f"{prefix}.bn.running_mean"]),
                    var=np.asarray(sd[f"{prefix}.bn.running_var"]))
    return params, state


def _resolve_perm(kernel_perm):
    """None -> identity; "me" -> the derived ME enumeration table
    (sparse/kernel_maps.ME_KERNEL_PERM); dict -> as given."""
    if kernel_perm is None:
        return {}
    if kernel_perm == "me":
        from agile3d_tpu.sparse.kernel_maps import ME_KERNEL_PERM

        return ME_KERNEL_PERM
    return kernel_perm


def _kernel(sd, name, kernel_perm=None):
    k = np.asarray(sd[name])
    if k.ndim == 3 and kernel_perm and k.shape[0] in kernel_perm:
        k = k[kernel_perm[k.shape[0]]]
    return k


def convert_torch_state_dict(sd: dict, cfg: ModelConfig = ModelConfig(),
                             kernel_perm: dict | str | None = "me"):
    """Returns (params, buffers, bn_state) matching init_agile3d's trees.

    ``sd`` is the reference checkpoint's ['model'] dict with numpy values
    (load with torch.load(..., map_location='cpu') and call .numpy()).
    ``kernel_perm`` permutes sparse-conv kernel slices per kernel volume
    {8: perm, 27: perm, 125: perm} to align ME's offset enumeration with
    sparse/kernel_maps.kernel_offsets. The default "me" applies the
    permutation derived from ME's kernel_region iterator semantics
    (sparse/kernel_maps.me_kernel_perm); pass None for identity or an
    explicit table from tools/calibrate_kernel_order.py.
    """
    kernel_perm = _resolve_perm(kernel_perm)
    bb_cfg = cfg.backbone
    planes, layers = bb_cfg.planes, bb_cfg.layers

    bp, bs = {}, {}
    bp["conv0p1s1"] = {"w": _kernel(sd, "backbone.conv0p1s1.kernel", kernel_perm)}
    bp["bn0"], bs["bn0"] = _bn(sd, "backbone.bn0")

    def block(prefix, n_blocks):
        ps, ss = [], []
        for j in range(n_blocks):
            p = {
                "conv1": {"w": _kernel(sd, f"{prefix}.{j}.conv1.kernel", kernel_perm)},
                "conv2": {"w": _kernel(sd, f"{prefix}.{j}.conv2.kernel", kernel_perm)},
            }
            s = {}
            p["norm1"], s["norm1"] = _bn(sd, f"{prefix}.{j}.norm1")
            p["norm2"], s["norm2"] = _bn(sd, f"{prefix}.{j}.norm2")
            if f"{prefix}.{j}.downsample.0.kernel" in sd:
                p["downsample"] = {
                    "conv": {"w": _kernel(sd, f"{prefix}.{j}.downsample.0.kernel",
                                          kernel_perm)}}
                p["downsample"]["norm"], s["downsample_norm"] = _bn(
                    sd, f"{prefix}.{j}.downsample.1")
            ps.append(p)
            ss.append(s)
        return ps, ss

    down_names = ["conv1p1s2", "conv2p2s2", "conv3p4s2", "conv4p8s2"]
    for i, name in enumerate(down_names):
        bp[f"conv{i+1}"] = {"w": _kernel(sd, f"backbone.{name}.kernel", kernel_perm)}
        bp[f"bn{i+1}"], bs[f"bn{i+1}"] = _bn(sd, f"backbone.bn{i+1}")
        bp[f"block{i+1}"], bs[f"block{i+1}"] = block(f"backbone.block{i+1}",
                                                     layers[i])

    tr_names = ["convtr4p16s2", "convtr5p8s2", "convtr6p4s2", "convtr7p2s2"]
    for j, name in enumerate(tr_names):
        i = 4 + j
        bp[f"convtr{i}"] = {"w": _kernel(sd, f"backbone.{name}.kernel", kernel_perm)}
        bp[f"bntr{i}"], bs[f"bntr{i}"] = _bn(sd, f"backbone.bntr{i}")
        bp[f"block{i+1}"], bs[f"block{i+1}"] = block(f"backbone.block{i+1}",
                                                     layers[i])

    params = {"backbone": bp}
    params["lin_squeeze"] = {
        "w": np.asarray(sd["lin_squeeze_head.kernel"]),
        "b": np.asarray(sd["lin_squeeze_head.bias"]),
    }
    params["bg_query_feat"] = np.asarray(sd["bg_query_feat.weight"])
    params["bg_query_pos"] = np.asarray(sd["bg_query_pos.weight"])
    params["mask_embed_head"] = {
        "linear1": _linear(sd, "mask_embed_head.0"),
        "linear2": _linear(sd, "mask_embed_head.2"),
    }
    params["decoder_norm"] = _ln(sd, "decoder_norm")

    num_sets = 1 if cfg.shared_decoder else cfg.num_decoders
    decoders = []
    for d in range(num_sets):
        for i in range(len(cfg.hlevels)):  # reference agile3d.py:88-131
            decoders.append({
                "c2s": {"attn": _mha(sd, f"c2s_attention.{d}.{i}.multihead_attn"),
                        "norm": _ln(sd, f"c2s_attention.{d}.{i}.norm")},
                "c2c": {"attn": _mha(sd, f"c2c_attention.{d}.{i}.self_attn"),
                        "norm": _ln(sd, f"c2c_attention.{d}.{i}.norm")},
                "ffn": {"linear1": _linear(sd, f"ffn_attention.{d}.{i}.linear1"),
                        "linear2": _linear(sd, f"ffn_attention.{d}.{i}.linear2"),
                        "norm": _ln(sd, f"ffn_attention.{d}.{i}.norm")},
                "s2c": {"attn": _mha(sd, f"s2c_attention.{d}.{i}.multihead_attn"),
                        "norm": _ln(sd, f"s2c_attention.{d}.{i}.norm")},
            })
    params["decoders"] = decoders

    from agile3d_tpu.ops.pos_enc import positional_encoding_1d

    buffers = {
        "gauss_B": np.asarray(sd["pos_enc.gauss_B"]),
        "time_pe": positional_encoding_1d(cfg.hidden_dim, cfg.time_table_len),
    }
    return params, buffers, bs


def export_torch_state_dict(params, buffers, cfg: ModelConfig, bn_state,
                            kernel_perm: dict | str | None = "me"):
    """Inverse mapping (for round-trip tests and torch interop). Conv
    kernels are emitted in ME enumeration order (the inverse of
    ``kernel_perm``), so exported dicts interoperate with the reference."""
    kernel_perm = _resolve_perm(kernel_perm)
    inv_perm = {}
    for vol, perm in kernel_perm.items():
        inv = np.empty_like(np.asarray(perm))
        inv[np.asarray(perm)] = np.arange(len(inv))
        inv_perm[vol] = inv
    sd = {}

    def kern(w):
        w = np.asarray(w)
        if w.ndim == 3 and w.shape[0] in inv_perm:
            w = w[inv_perm[w.shape[0]]]
        return w

    def put_bn(prefix, p, s):
        sd[f"{prefix}.bn.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bn.bias"] = np.asarray(p["bias"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(s.mean)
        sd[f"{prefix}.bn.running_var"] = np.asarray(s.var)

    bp, bs = params["backbone"], bn_state
    sd["backbone.conv0p1s1.kernel"] = kern(bp["conv0p1s1"]["w"])
    put_bn("backbone.bn0", bp["bn0"], bs["bn0"])
    down_names = ["conv1p1s2", "conv2p2s2", "conv3p4s2", "conv4p8s2"]
    tr_names = ["convtr4p16s2", "convtr5p8s2", "convtr6p4s2", "convtr7p2s2"]
    for i, name in enumerate(down_names):
        sd[f"backbone.{name}.kernel"] = kern(bp[f"conv{i+1}"]["w"])
        put_bn(f"backbone.bn{i+1}", bp[f"bn{i+1}"], bs[f"bn{i+1}"])
    for stage in range(1, 9):
        for j, (p, s) in enumerate(zip(bp[f"block{stage}"], bs[f"block{stage}"])):
            pre = f"backbone.block{stage}.{j}"
            sd[f"{pre}.conv1.kernel"] = kern(p["conv1"]["w"])
            sd[f"{pre}.conv2.kernel"] = kern(p["conv2"]["w"])
            put_bn(f"{pre}.norm1", p["norm1"], s["norm1"])
            put_bn(f"{pre}.norm2", p["norm2"], s["norm2"])
            if "downsample" in p:
                sd[f"{pre}.downsample.0.kernel"] = kern(
                    p["downsample"]["conv"]["w"])
                put_bn(f"{pre}.downsample.1", p["downsample"]["norm"],
                       s["downsample_norm"])
    for j, name in enumerate(tr_names):
        i = 4 + j
        sd[f"backbone.{name}.kernel"] = kern(bp[f"convtr{i}"]["w"])
        put_bn(f"backbone.bntr{i}", bp[f"bntr{i}"], bs[f"bntr{i}"])

    sd["lin_squeeze_head.kernel"] = np.asarray(params["lin_squeeze"]["w"])
    sd["lin_squeeze_head.bias"] = np.asarray(params["lin_squeeze"]["b"])
    sd["bg_query_feat.weight"] = np.asarray(params["bg_query_feat"])
    sd["bg_query_pos.weight"] = np.asarray(params["bg_query_pos"])
    sd["mask_embed_head.0.weight"] = np.asarray(
        params["mask_embed_head"]["linear1"]["w"]).T
    sd["mask_embed_head.0.bias"] = np.asarray(
        params["mask_embed_head"]["linear1"]["b"])
    sd["mask_embed_head.2.weight"] = np.asarray(
        params["mask_embed_head"]["linear2"]["w"]).T
    sd["mask_embed_head.2.bias"] = np.asarray(
        params["mask_embed_head"]["linear2"]["b"])
    sd["decoder_norm.weight"] = np.asarray(params["decoder_norm"]["scale"])
    sd["decoder_norm.bias"] = np.asarray(params["decoder_norm"]["bias"])
    sd["pos_enc.gauss_B"] = np.asarray(buffers["gauss_B"])

    n_slots = len(cfg.hlevels)
    for flat, dec in enumerate(params["decoders"]):
        d, i = divmod(flat, n_slots)
        for key, attn_name in (("c2s", "multihead_attn"), ("c2c", "self_attn"),
                               ("s2c", "multihead_attn")):
            a = dec[key]["attn"]
            pre = f"{key}_attention.{d}.{i}.{attn_name}"
            sd[f"{pre}.in_proj_weight"] = np.concatenate(
                [np.asarray(a["q_w"]).T, np.asarray(a["k_w"]).T,
                 np.asarray(a["v_w"]).T], axis=0)
            sd[f"{pre}.in_proj_bias"] = np.concatenate(
                [np.asarray(a["q_b"]), np.asarray(a["k_b"]),
                 np.asarray(a["v_b"])])
            sd[f"{pre}.out_proj.weight"] = np.asarray(a["out_w"]).T
            sd[f"{pre}.out_proj.bias"] = np.asarray(a["out_b"])
            sd[f"{key}_attention.{d}.{i}.norm.weight"] = np.asarray(
                dec[key]["norm"]["scale"])
            sd[f"{key}_attention.{d}.{i}.norm.bias"] = np.asarray(
                dec[key]["norm"]["bias"])
        sd[f"ffn_attention.{d}.{i}.linear1.weight"] = np.asarray(
            dec["ffn"]["linear1"]["w"]).T
        sd[f"ffn_attention.{d}.{i}.linear1.bias"] = np.asarray(
            dec["ffn"]["linear1"]["b"])
        sd[f"ffn_attention.{d}.{i}.linear2.weight"] = np.asarray(
            dec["ffn"]["linear2"]["w"]).T
        sd[f"ffn_attention.{d}.{i}.linear2.bias"] = np.asarray(
            dec["ffn"]["linear2"]["b"])
        sd[f"ffn_attention.{d}.{i}.norm.weight"] = np.asarray(
            dec["ffn"]["norm"]["scale"])
        sd[f"ffn_attention.{d}.{i}.norm.bias"] = np.asarray(
            dec["ffn"]["norm"]["bias"])
    return sd
