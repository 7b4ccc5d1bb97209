"""Export one of our checkpoints as a reference-compatible torch state_dict.

Inverse of tools/convert_torch_ckpt.py: users who trained here can load the
result into the reference's `CrossFormer_pc_mp` / `_ft` classes with
`load_state_dict` (same key layout the reference saves at pretrain.py:287).

Usage:
  python tools/export_torch_ckpt.py in.ckpt out.pth \
      --arch E1CL8SL-H4D256-L128-MR2 [--kind pretrain|ft_cls]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _add_lin(out, prefix, d):
    out[prefix + ".weight"] = np.asarray(d["kernel"]).T
    if "bias" in d:
        out[prefix + ".bias"] = np.asarray(d["bias"])


def _add_ln(out, prefix, d):
    out[prefix + ".weight"] = np.asarray(d["scale"])
    out[prefix + ".bias"] = np.asarray(d["bias"])


def _add_bn(out, prefix, params, stats):
    out[prefix + ".weight"] = np.asarray(params["scale"])
    out[prefix + ".bias"] = np.asarray(params["bias"])
    out[prefix + ".running_mean"] = np.asarray(stats["mean"])
    out[prefix + ".running_var"] = np.asarray(stats["var"])
    out[prefix + ".num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _add_conv1d(out, prefix, d):
    out[prefix + ".weight"] = np.asarray(d["kernel"]).T[:, :, None]
    if "bias" in d:
        out[prefix + ".bias"] = np.asarray(d["bias"])


def _add_mha(out, prefix, d):
    for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
        _add_lin(out, f"{prefix}.{name}", d[name])


def _add_mlp(out, prefix, d):  # Sequential [LN, Linear, GELU, Linear]
    _add_ln(out, prefix + ".0", d["LayerNorm_0"])
    _add_lin(out, prefix + ".1", d["Dense_0"])
    _add_lin(out, prefix + ".3", d["Dense_1"])


def _add_ca_layer(out, prefix, d):
    ca = d["CrossAttention_0"]
    _add_ln(out, prefix + ".0.module.q_norm", ca["q_norm"])
    _add_ln(out, prefix + ".0.module.kv_norm", ca["kv_norm"])
    _add_mha(out, prefix + ".0.module.attention", ca["attention"])
    _add_mlp(out, prefix + ".1.module", d["MLP_0"])


def _add_sa_layer(out, prefix, d):
    sa = d["SelfAttention_0"]
    _add_ln(out, prefix + ".0.module.norm", sa["norm"])
    _add_mha(out, prefix + ".0.module.attention", sa["attention"])
    _add_mlp(out, prefix + ".1.module", d["MLP_0"])


def export_pc_model(params: dict, stats: dict, kind: str = "pretrain") -> dict:
    out: dict = {}
    stem = params["stem"]
    _add_lin(out, "input_adapter.point_mlp.0", stem["input_adapter"]["Dense_0"])
    _add_ln(out, "input_adapter.point_mlp.1", stem["input_adapter"]["LayerNorm_0"])
    _add_lin(out, "input_adapter.point_mlp.3", stem["input_adapter"]["Dense_1"])
    g2e = stem["group2emb"]
    g2e_stats = stats["stem"]["group2emb"]
    _add_conv1d(out, "group2emb.first_conv.0", g2e["Dense_0"])
    _add_bn(out, "group2emb.first_conv.1", g2e["BatchNorm_0"],
            g2e_stats["BatchNorm_0"])
    _add_conv1d(out, "group2emb.first_conv.3", g2e["Dense_1"])
    _add_conv1d(out, "group2emb.second_conv.0", g2e["Dense_2"])
    _add_bn(out, "group2emb.second_conv.1", g2e["BatchNorm_1"],
            g2e_stats["BatchNorm_1"])
    _add_conv1d(out, "group2emb.second_conv.3", g2e["Dense_3"])
    _add_lin(out, "position_emb.0", stem["position_emb"]["Dense_0"])
    _add_lin(out, "position_emb.2", stem["position_emb"]["Dense_1"])

    enc = params["encoder"]
    # the reference aliases cross_attn_1 = cross_attn_n when there is a
    # single CA layer (partseg.py:297-298), so its state_dict carries both
    # key prefixes pointing at the same tensors
    _add_ca_layer(out, "encoder.cross_attn_1", enc["cross_attn_n"])
    _add_ca_layer(out, "encoder.cross_attn_n", enc["cross_attn_n"])
    if "cross_attn_1" in enc:  # unshared first CA layer
        _add_ca_layer(out, "encoder.cross_attn_1", enc["cross_attn_1"])
    i = 0
    while f"sa_{i}" in enc:
        _add_sa_layer(out, f"encoder.sa_layers.{i}", enc[f"sa_{i}"])
        i += 1

    if kind == "pretrain":
        h = params["latent_head"]
        hs = stats["latent_head"]
        _add_bn(out, "latent_head.0", h["BatchNorm_0"], hs["BatchNorm_0"])
        _add_lin(out, "latent_head.2", h["Dense_0"])
        _add_bn(out, "latent_head.3", h["BatchNorm_1"], hs["BatchNorm_1"])
        _add_lin(out, "latent_head.5", h["Dense_1"])
    elif kind == "ft_cls":
        h = params["finetune_head"]
        hs = stats["finetune_head"]
        for j, pos in enumerate(("0", "3", "6")):
            _add_bn(out, f"finetune_head.{pos}", h[f"BatchNorm_{j}"],
                    hs[f"BatchNorm_{j}"])
        _add_lin(out, "finetune_head.2", h["Dense_0"])
        _add_lin(out, "finetune_head.5", h["Dense_1"])
        _add_lin(out, "finetune_head.8", h["Dense_2"])
    else:
        raise ValueError(kind)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--kind", default="pretrain",
                    choices=["pretrain", "ft_cls"])
    args = ap.parse_args()

    import torch

    from vipformer_tpu.train.checkpoint import load_checkpoint

    raw = load_checkpoint(args.src)
    params = raw["params"]["pc"] if "pc" in raw.get("params", {}) else raw["params"]
    stats = raw["batch_stats"]["pc"] if "pc" in raw.get("batch_stats", {}) \
        else raw["batch_stats"]
    sd = export_pc_model(params, stats, kind=args.kind)
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
               args.dst)
    print(f"wrote {args.dst}: {len(sd)} tensors ({args.kind})")


if __name__ == "__main__":
    main()
