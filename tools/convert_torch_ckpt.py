"""Convert a reference ViPFormer torch checkpoint to this framework.

Maps a `CrossFormer_pc_mp` / `CrossFormer_pc_mp_ft` state_dict (the
reference's released `pc_model_best.pth` files, saved at pretrain.py:287 /
ft_cls.py:212) onto our flax parameter tree so users of the reference can
carry their trained weights over.

Usage:
  python tools/convert_torch_ckpt.py in.pth out.ckpt \
      --arch E1CL8SL-H4D256-L128-MR2 [--kind pretrain|ft_cls] \
      [--num_obj_classes 40]

Checkpoints trained with the reference code went through its accidental
patch-normalization slice (`pointcloud/utils.py:36`), so converted models
must run with `Config.patch_compat=True` to be numerically faithful —
the converter records that in the checkpoint metadata (and the whole-model
forward is then bit-parity tested, see tests/test_torch_parity.py::
test_pc_model_full_parity_compat). Pass `--no_compat` only for checkpoints
trained with this framework's corrected stem.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _lin(sd, prefix):
    out = {"kernel": np.asarray(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _ln(sd, prefix):
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _bn(sd, prefix):
    params = {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }
    stats = {
        "mean": np.asarray(sd[prefix + ".running_mean"]),
        "var": np.asarray(sd[prefix + ".running_var"]),
    }
    return params, stats


def _conv1d(sd, prefix):
    out = {"kernel": np.asarray(sd[prefix + ".weight"])[:, :, 0].T}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _mha(sd, prefix):
    return {
        "q_proj": _lin(sd, prefix + ".q_proj"),
        "k_proj": _lin(sd, prefix + ".k_proj"),
        "v_proj": _lin(sd, prefix + ".v_proj"),
        "o_proj": _lin(sd, prefix + ".o_proj"),
    }


def _mlp(sd, prefix):  # Sequential [LN, Linear, GELU, Linear]
    return {
        "LayerNorm_0": _ln(sd, prefix + ".0"),
        "Dense_0": _lin(sd, prefix + ".1"),
        "Dense_1": _lin(sd, prefix + ".3"),
    }


def _ca_layer(sd, prefix):
    # Sequential [Residual(CrossAttention), Residual(MLP)]
    return {
        "CrossAttention_0": {
            "q_norm": _ln(sd, prefix + ".0.module.q_norm"),
            "kv_norm": _ln(sd, prefix + ".0.module.kv_norm"),
            "attention": _mha(sd, prefix + ".0.module.attention"),
        },
        "MLP_0": _mlp(sd, prefix + ".1.module"),
    }


def _sa_layer(sd, prefix):
    return {
        "SelfAttention_0": {
            "norm": _ln(sd, prefix + ".0.module.norm"),
            "attention": _mha(sd, prefix + ".0.module.attention"),
        },
        "MLP_0": _mlp(sd, prefix + ".1.module"),
    }


def convert_pc_model(sd: dict, num_sa_layers: int, kind: str = "pretrain"):
    """state_dict -> (params, batch_stats) for CrossFormerPC / PCFT."""
    g2e_bn0_p, g2e_bn0_s = _bn(sd, "group2emb.first_conv.1")
    g2e_bn1_p, g2e_bn1_s = _bn(sd, "group2emb.second_conv.1")
    params = {
        "stem": {
            "input_adapter": {
                "Dense_0": _lin(sd, "input_adapter.point_mlp.0"),
                "LayerNorm_0": _ln(sd, "input_adapter.point_mlp.1"),
                "Dense_1": _lin(sd, "input_adapter.point_mlp.3"),
            },
            "group2emb": {
                "Dense_0": _conv1d(sd, "group2emb.first_conv.0"),
                "BatchNorm_0": g2e_bn0_p,
                "Dense_1": _conv1d(sd, "group2emb.first_conv.3"),
                "Dense_2": _conv1d(sd, "group2emb.second_conv.0"),
                "BatchNorm_1": g2e_bn1_p,
                "Dense_3": _conv1d(sd, "group2emb.second_conv.3"),
            },
            "position_emb": {
                "Dense_0": _lin(sd, "position_emb.0"),
                "Dense_1": _lin(sd, "position_emb.2"),
            },
        },
        "encoder": {},
    }
    stats = {
        "stem": {
            "group2emb": {
                "BatchNorm_0": g2e_bn0_s,
                "BatchNorm_1": g2e_bn1_s,
            }
        }
    }
    params["encoder"]["cross_attn_n"] = _ca_layer(sd, "encoder.cross_attn_1")
    for i in range(num_sa_layers):
        params["encoder"][f"sa_{i}"] = _sa_layer(
            sd, f"encoder.sa_layers.{i}"
        )

    if kind == "pretrain":
        h0_p, h0_s = _bn(sd, "latent_head.0")
        h1_p, h1_s = _bn(sd, "latent_head.3")
        params["latent_head"] = {
            "BatchNorm_0": h0_p,
            "Dense_0": _lin(sd, "latent_head.2"),
            "BatchNorm_1": h1_p,
            "Dense_1": _lin(sd, "latent_head.5"),
        }
        stats["latent_head"] = {"BatchNorm_0": h0_s, "BatchNorm_1": h1_s}
    elif kind == "ft_cls":
        bns = []
        for j, t in enumerate(["0", "3", "6"]):
            bns.append(_bn(sd, f"finetune_head.{t}"))
        params["finetune_head"] = {
            "BatchNorm_0": bns[0][0],
            "Dense_0": _lin(sd, "finetune_head.2"),
            "BatchNorm_1": bns[1][0],
            "Dense_1": _lin(sd, "finetune_head.5"),
            "BatchNorm_2": bns[2][0],
            "Dense_2": _lin(sd, "finetune_head.8"),
        }
        stats["finetune_head"] = {
            f"BatchNorm_{j}": bns[j][1] for j in range(3)
        }
    else:
        raise ValueError(kind)
    return params, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--arch", default="E1CL8SL-H4D256-L128-MR2")
    ap.add_argument("--kind", default="pretrain",
                    choices=["pretrain", "ft_cls"])
    ap.add_argument("--num_obj_classes", type=int, default=40)
    ap.add_argument("--no_compat", action="store_true",
                    help="mark the checkpoint as NOT needing the "
                    "reference-faithful patch_compat stem")
    args = ap.parse_args()

    import torch

    from vipformer_tpu.config import decode_arch_name
    from vipformer_tpu.train.checkpoint import save_checkpoint

    sd = torch.load(args.src, map_location="cpu")
    if "model_state_dict" in sd:  # ft_partseg-style dict checkpoint
        sd = sd["model_state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()}
    arch = decode_arch_name(args.arch)
    params, stats = convert_pc_model(
        sd, arch["num_sa_layers"], kind=args.kind
    )
    compat = not args.no_compat
    save_checkpoint(
        args.dst,
        {"params": params, "batch_stats": stats},
        {"converted_from": args.src, "arch": args.arch, "kind": args.kind,
         "patch_compat": compat},
    )
    n = sum(np.prod(v.shape) for v in
            __import__("jax").tree_util.tree_leaves(params))
    print(f"wrote {args.dst}: {int(n):,} parameters ({args.kind})")
    if compat:
        print("NOTE: run this checkpoint with --patch_compat true "
              "(reference-trained stem; see ops/geometry.py)")


if __name__ == "__main__":
    main()
