"""Pure-torch reference harness for parity tests.

Replicates the *math* of the reference decoder, positional encodings, and
criterion (reference models/agile3d.py:183-384,
models/modules/attention_block.py, models/position_embedding.py,
models/criterion.py) using stock torch modules — no MinkowskiEngine — so the
JAX implementation can be checked against torch semantics with identical
weights. Test-only code; the library itself is torch-free.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def mha_from_params(p, d_model, num_heads):
    m = nn.MultiheadAttention(d_model, num_heads, dropout=0.0)
    with torch.no_grad():
        m.in_proj_weight.copy_(torch.from_numpy(np.concatenate(
            [np.asarray(p["q_w"]).T, np.asarray(p["k_w"]).T,
             np.asarray(p["v_w"]).T], axis=0)))
        m.in_proj_bias.copy_(torch.from_numpy(np.concatenate(
            [np.asarray(p["q_b"]), np.asarray(p["k_b"]), np.asarray(p["v_b"])])))
        m.out_proj.weight.copy_(torch.from_numpy(np.asarray(p["out_w"]).T))
        m.out_proj.bias.copy_(torch.from_numpy(np.asarray(p["out_b"])))
    return m


def ln_from_params(p, d):
    m = nn.LayerNorm(d)
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(np.asarray(p["scale"])))
        m.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
    return m


def linear_from_params(p):
    w = np.asarray(p["w"])
    m = nn.Linear(w.shape[0], w.shape[1])
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(w.T))
        m.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
    return m


def fourier_pos_torch(xyz, gauss_b, cmin, cmax):
    """xyz [N,3] -> [N, d]; normalize to [0,1], *2pi, @B, [sin|cos]."""
    diff = cmax - cmin
    x = (xyz - cmin) / diff
    proj = (x * (2 * np.pi)) @ torch.from_numpy(np.asarray(gauss_b))
    return torch.cat([proj.sin(), proj.cos()], dim=-1)


class TorchRefDecoder:
    """Single-sample forward_mask following the reference control flow."""

    def __init__(self, params, buffers, cfg):
        self.cfg = cfg
        c, h = cfg.hidden_dim, cfg.num_heads
        self.decoders = []
        for dp in params["decoders"]:
            self.decoders.append({
                "c2s": mha_from_params(dp["c2s"]["attn"], c, h),
                "c2s_norm": ln_from_params(dp["c2s"]["norm"], c),
                "c2c": mha_from_params(dp["c2c"]["attn"], c, h),
                "c2c_norm": ln_from_params(dp["c2c"]["norm"], c),
                "ffn1": linear_from_params(dp["ffn"]["linear1"]),
                "ffn2": linear_from_params(dp["ffn"]["linear2"]),
                "ffn_norm": ln_from_params(dp["ffn"]["norm"], c),
                "s2c": mha_from_params(dp["s2c"]["attn"], c, h),
                "s2c_norm": ln_from_params(dp["s2c"]["norm"], c),
            })
        self.decoder_norm = ln_from_params(params["decoder_norm"], c)
        self.mask1 = linear_from_params(params["mask_embed_head"]["linear1"])
        self.mask2 = linear_from_params(params["mask_embed_head"]["linear2"])
        self.bg_feat = torch.from_numpy(np.asarray(params["bg_query_feat"]))
        self.bg_pos = torch.from_numpy(np.asarray(params["bg_query_pos"]))
        self.gauss_b = np.asarray(buffers["gauss_B"])
        self.time_pe = torch.from_numpy(np.asarray(buffers["time_pe"]))

    def _cross(self, layer, norm, tgt, memory, pos, query_pos, attn_mask):
        q = tgt + query_pos
        k = memory + pos
        t2 = layer(q, k, memory, attn_mask=attn_mask)[0]
        return norm(tgt + t2)

    def _self(self, layer, norm, tgt, query_pos):
        q = tgt + query_pos
        t2 = layer(q, q, tgt)[0]
        return norm(tgt + t2)

    def _ffn(self, d, tgt):
        t2 = d["ffn2"](F.relu(d["ffn1"](tgt)))
        return d["ffn_norm"](tgt + t2)

    def _mask_module(self, fg_q, bg_q, mask_features, fg_split):
        fg_emb = self.mask2(F.relu(self.mask1(self.decoder_norm(fg_q))))
        fg_prods = (mask_features @ fg_emb.T).split(fg_split, dim=1)
        fg_masks = torch.cat(
            [p.max(dim=-1, keepdim=True)[0] for p in fg_prods], dim=-1)
        bg_emb = self.mask2(F.relu(self.mask1(self.decoder_norm(bg_q))))
        bg_masks = (mask_features @ bg_emb.T).max(dim=-1, keepdim=True)[0]
        out = torch.cat([bg_masks, fg_masks], dim=-1)

        labels = out.argmax(1)
        bg_attn = ~(labels == 0)
        bg_attn = bg_attn.unsqueeze(0).repeat(bg_q.shape[0], 1)
        bg_attn[torch.where(bg_attn.sum(-1) == bg_attn.shape[-1])] = False
        fg_attn = []
        for oid in range(1, fg_masks.shape[-1] + 1):
            m = ~(labels == oid)
            m = m.unsqueeze(0).repeat(fg_split[oid - 1], 1)
            m[torch.where(m.sum(-1) == m.shape[-1])] = False
            fg_attn.append(m)
        attn = torch.cat(fg_attn + [bg_attn], dim=0)
        return out, attn

    @torch.no_grad()
    def forward_mask(self, mask_feat, pos_pcd, raw, click_idx, click_time_idx):
        """mask_feat/pos_pcd [N, C], raw [N, 3]; click dicts keyed '0','1',..."""
        mask_feat = torch.from_numpy(mask_feat)
        pos_pcd = torch.from_numpy(pos_pcd)
        raw = torch.from_numpy(raw)
        cmin, cmax = raw.min(0)[0], raw.max(0)[0]

        num_obj = len(click_idx) - 1
        fg_split = [len(click_idx[str(i)]) for i in range(1, num_obj + 1)]
        fg_ids = [i for o in range(1, num_obj + 1) for i in click_idx[str(o)]]
        fg_times = [t for o in range(1, num_obj + 1)
                    for t in click_time_idx[str(o)]]
        bg_ids = click_idx["0"]
        bg_times = click_time_idx["0"]

        fg_q = mask_feat[fg_ids]
        fg_pos = fourier_pos_torch(raw[fg_ids], self.gauss_b, cmin, cmax)
        fg_pos = fg_pos + self.time_pe[fg_times]
        bg_q = self.bg_feat.clone()
        bg_pos = self.bg_pos.clone()
        if bg_ids:
            bq = mask_feat[bg_ids]
            bp = fourier_pos_torch(raw[bg_ids], self.gauss_b, cmin, cmax)
            bp = bp + self.time_pe[bg_times]
            bg_q = torch.cat([bg_q, bq], dim=0)
            bg_pos = torch.cat([bg_pos, bp], dim=0)

        src = mask_feat
        preds = []
        attn_mask = None
        for d in self.decoders:
            queries = torch.cat([fg_q, bg_q], dim=0)
            qpos = torch.cat([fg_pos, bg_pos], dim=0)
            out = self._cross(d["c2s"], d["c2s_norm"], queries, src,
                              pos_pcd, qpos, attn_mask)
            out = self._self(d["c2c"], d["c2c_norm"], out, qpos)
            queries = self._ffn(d, out)
            src = self._cross(d["s2c"], d["s2c_norm"], src, queries,
                              qpos, pos_pcd, None)
            fg_q, bg_q = queries.split([len(fg_ids), bg_q.shape[0]], 0)
            masks, attn_mask = self._mask_module(fg_q, bg_q, src, fg_split)
            preds.append(masks.numpy())
        return preds


# ---------------------------------------------------------------------------
# Pure-torch Res16UNet emulation over kernel maps (no MinkowskiEngine):
# sparse conv = gather + einsum, weights in ME kernel enumeration order.
# Mirrors the reference wiring (reference models/res16unet.py:26-295,
# models/modules/resnet_block.py:48-64) so the JAX backbone + checkpoint
# converter can be parity-tested end to end: an exported ME-layout
# state_dict must produce identical activations through both stacks.
# ---------------------------------------------------------------------------

from agile3d_tpu.sparse.kernel_maps import ME_KERNEL_PERM  # noqa: E402


def sp_conv_torch(x, nbr, w_me):
    """out[m] = sum_j x[nbr[m, j]] @ w_me[ME_KERNEL_PERM[j]].

    ``nbr`` columns follow kernel_maps.kernel_offsets (product) order;
    ``w_me`` slices follow ME's column-major enumeration, so column j uses
    kernel slice perm[j] — exactly how ME pairs offsets with weights."""
    perm = ME_KERNEL_PERM.get(w_me.shape[0])
    out = x.new_zeros((nbr.shape[0], w_me.shape[2]))
    for j in range(nbr.shape[1]):
        idx = torch.from_numpy(np.ascontiguousarray(nbr[:, j])).long()
        g = torch.where((idx >= 0)[:, None], x[idx.clamp(min=0)],
                        x.new_zeros(()))
        k = int(perm[j]) if perm is not None else j
        out = out + g @ w_me[k]
    return out


def sp_conv_tr_torch(x_coarse, up_parent, up_offset, w_me):
    """Kernel-2 stride-2 transposed conv: fine voxel takes its parent's
    features through kernel element up_offset (our enumeration)."""
    perm = ME_KERNEL_PERM[w_me.shape[0]]
    parent = torch.from_numpy(np.ascontiguousarray(up_parent)).long()
    off = torch.from_numpy(np.ascontiguousarray(up_offset)).long()
    g = torch.where((parent >= 0)[:, None], x_coarse[parent.clamp(min=0)],
                    x_coarse.new_zeros(()))
    out = x_coarse.new_zeros((g.shape[0], w_me.shape[2]))
    for k in range(w_me.shape[0]):
        sel = off == k
        out[sel] = g[sel] @ w_me[int(perm[k])]
    return out


def _bn_from_sd(sd, prefix, momentum=0.02):
    c = sd[f"{prefix}.bn.weight"].shape[0]
    m = nn.BatchNorm1d(c, momentum=momentum)
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy(np.asarray(sd[f"{prefix}.bn.weight"])))
        m.bias.copy_(torch.from_numpy(np.asarray(sd[f"{prefix}.bn.bias"])))
        m.running_mean.copy_(torch.from_numpy(
            np.asarray(sd[f"{prefix}.bn.running_mean"])))
        m.running_var.copy_(torch.from_numpy(
            np.asarray(sd[f"{prefix}.bn.running_var"])))
    return m


class TorchRefBackbone:
    """Res16UNet (basic-block variants) from an ME-layout state_dict.

    forward(feats, pyramid, training) -> (fmaps, intermediates) where fmaps
    is the 5-level FPN [stride16, 8, 4, 2, 1] matching the reference's
    out_fpn=True (reference models/res16unet.py:250-295)."""

    def __init__(self, sd, layers=(2, 3, 4, 6, 2, 2, 2, 2)):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.layers = layers
        self.bns = {}
        for key in self.sd:
            if key.endswith(".bn.weight"):
                self.bns[key[: -len(".bn.weight")]] = _bn_from_sd(
                    self.sd, key[: -len(".bn.weight")])

    def _w(self, name):
        return torch.from_numpy(self.sd[f"{name}.kernel"])

    def _bn(self, name, x, training):
        m = self.bns[name]
        m.train(training)
        return m(x)

    def _block(self, prefix, x, k3, training):
        """BasicBlock (reference resnet_block.py:48-64)."""
        residual = x
        out = sp_conv_torch(x, k3, self._w(f"{prefix}.conv1"))
        out = F.relu(self._bn(f"{prefix}.norm1", out, training))
        out = sp_conv_torch(out, k3, self._w(f"{prefix}.conv2"))
        out = self._bn(f"{prefix}.norm2", out, training)
        if f"{prefix}.downsample.0.kernel" in self.sd:
            residual = x @ torch.from_numpy(
                self.sd[f"{prefix}.downsample.0.kernel"])
            residual = self._bn(f"{prefix}.downsample.1", residual, training)
        return F.relu(out + residual)

    def _stage(self, stage, x, k3, training):
        for j in range(self.layers[stage - 1]):
            x = self._block(f"backbone.block{stage}.{j}", x, k3, training)
        return x

    @torch.no_grad()
    def forward(self, feats, pyr, training=False):
        lv = pyr.levels
        rec = {}
        x = torch.from_numpy(np.asarray(feats, np.float32))
        out = sp_conv_torch(x, lv[0].k5, self._w("backbone.conv0p1s1"))
        out_p1 = F.relu(self._bn("backbone.bn0", out, training))
        rec["stem"] = out_p1.numpy()

        skips = [out_p1]
        out = out_p1
        down = ["conv1p1s2", "conv2p2s2", "conv3p4s2", "conv4p8s2"]
        for i in range(4):
            out = sp_conv_torch(out, lv[i].down,
                                self._w(f"backbone.{down[i]}"))
            out = F.relu(self._bn(f"backbone.bn{i+1}", out, training))
            out = self._stage(i + 1, out, lv[i + 1].k3, training)
            rec[f"down{i+1}"] = out.numpy()
            skips.append(out)

        fmaps = [out]
        tr = ["convtr4p16s2", "convtr5p8s2", "convtr6p4s2", "convtr7p2s2"]
        for j in range(4):
            i = 4 + j
            tgt = 3 - j
            out = sp_conv_tr_torch(out, lv[tgt].up_parent, lv[tgt].up_offset,
                                   self._w(f"backbone.{tr[j]}"))
            out = F.relu(self._bn(f"backbone.bntr{i}", out, training))
            out = torch.cat([out, skips[tgt]], dim=1)
            out = self._stage(i + 1, out, lv[tgt].k3, training)
            rec[f"up{i+1}"] = out.numpy()
            fmaps.append(out)
        return [f.numpy() for f in fmaps], rec
