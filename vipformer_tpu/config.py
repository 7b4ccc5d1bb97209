"""Typed configuration with a CLI overlay.

The reference uses a module-level argparse singleton parsed at import time
(`/root/reference/parser.py:163`) that every module imports. Here the same
tunable surface (all ~60 flags, see SURVEY.md §2.2) lives in one frozen
dataclass; entry points build a `Config` from CLI args and pass it explicitly.
Nothing reads global state, so configs are picklable, hashable-by-value and
safe to close over in jitted functions.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Sequence


@dataclass(frozen=True)
class Config:
    # --- experiment naming (parser.py:7-15)
    proj_name: str = "ViPFormerTPU"
    exp_name: str = "default"
    run_dir: str = "runs"

    # --- reproducibility / modality switches (parser.py:17-22)
    seed: int = 1
    mp: bool = True  # modal-prior CrossFormer family (all shipped experiments)
    modality: str = "both"  # cmc-only | imc-only | both

    # --- resume (parser.py:24-28)
    resume: bool = False
    pc_model_file: str = "pc_model_best"
    img_model_file: str = "img_model_best"
    eval_only: bool = False
    # crash-resume for the FINETUNE loops: restore the rolling
    # `model_last` snapshot (full train state + epoch) and continue.
    # Distinct from `resume`, which in the finetune CLIs means
    # "bootstrap the backbone from a pretrain checkpoint" (the
    # reference's only notion of finetune resume, `ft_cls.py:92-101`);
    # the reference cannot continue a killed finetune at all.
    resume_training: bool = False

    # --- loop sizes (parser.py:32-39)
    epochs: int = 300
    batch_size: int = 16
    test_batch_size: int = 160
    num_workers: int = 0

    # --- optimizer / schedule (parser.py:42-65)
    optim: str = "sgd"  # sgd | adam | adamw
    lr: float = 0.001
    max_lr: float = 0.1
    min_lr: float = 0.0
    warm_epochs: int = 10
    factor: float = 0.1
    patience: int = 10
    step_size: int = 30
    gamma: float = 0.1
    momentum: float = 0.9
    scheduler: str = "cos"  # cos | coswarm | plateau | step
    grad_clip_norm: float | None = None  # partseg uses 10.0 (ft_partseg.py:175)

    # --- point counts (parser.py:67-74)
    num_pt_points: int = 2048
    num_ft_points: int = 1024
    num_test_points: int = 1024
    point_channels: int = 3

    # --- architecture (parser.py:76-113)
    num_groups: int = 128
    group_size: int = 32
    num_pc_latents: int = 128
    num_img_latents: int = 128
    num_latent_channels: int = 256
    num_ca_layers: int = 1
    num_ca_heads: int = 4
    num_sa_layers_per_block: int = 6
    num_sa_blocks: int = 1
    num_sa_layers: int = 1
    num_sa_heads: int = 4
    mlp_widen_factor: int = 2
    max_dpr: float = 0.5
    atten_drop: float = 0.1
    mlp_drop: float = 0.5
    layer_idx: tuple[int, ...] = ()
    cmid_weight: float = 1.0
    img_height: int = 224
    img_width: int = 224
    patch_size: int = 12
    num_frequency_bands: int = 64  # non-mp Fourier image adapter (utils.py:176)

    # --- logging cadence (parser.py:115-116)
    save_freq: int = 50
    print_freq: int = 50

    # --- datasets / tasks (parser.py:132-147)
    data_dir: str = "data"  # reference hard-codes /mnt/sdb/... (data.py:40)
    pt_dataset: str = "ModelNet40"
    ft_dataset: str = "ModelNet40"
    num_obj_classes: int = 40
    num_part_classes: int = 50
    output_seq_length: int = 1
    class_choice: str | None = None
    test_area: int = 5
    ballradius: int = 10
    svm_coff: float = 1.0
    synthetic_data: bool = False  # run on generated data when real sets absent
    synthetic_size: int = 512  # synthetic ShapeNetRender sample count (the
    # real set is ~43k; raise for long-horizon soak runs on generated data)
    patch_compat: bool = False  # reproduce the reference's patch
    # normalization slice bit-for-bit (pointcloud/utils.py:36) — required for
    # checkpoints trained with the reference code; default is its documented
    # intent (see ops/geometry.py:divide_patches)

    # --- few-shot (parser.py:149-157)
    n_runs: int = 10
    k_way: int = 5
    n_shot: int = 10
    n_query: int = 20
    fewshot_model: str = "pretrain"  # pretrain | ft (the reference's two
    # commented variants, eval_fewshot.py:23-26)

    # --- TPU-native knobs (no reference equivalent)
    compute_dtype: str = "bfloat16"  # bf16 compute replaces AMP/GradScaler
    num_devices: int = 0  # 0 = all local devices (DP axis size)
    model_axis: int = 1  # tensor-parallel axis size (1 = pure DP)
    global_negatives: bool = False  # NT-Xent negatives: per-shard (reference
    # faithful, pretrain.py:155) vs. cross-replica all-gathered
    device_augs: bool = False  # run the two-view point augmentation chain
    # on-device inside the train step (data/augment_device.py) instead of
    # per-sample on the host
    remat: bool = False  # jax.checkpoint over attention blocks
    donate_state: bool = True
    fused_attention: bool = True  # Pallas fused attention when on TPU
    log_to_file: bool = True

    # write <run>/files/{pt,ft}_test_feats_labels.npz for the t-SNE viewer
    # (reference's {ft,pt}_{MN,SO}_test_feats_labels.pth artifacts)
    dump_feats: bool = False

    # --- wandb channel (parser.py:159-161; self-hosted server supported).
    # Off by default: the JSONL metrics stream is always written and is the
    # source of truth; wandb mirrors it when enabled and importable.
    wandb: bool = False
    wb_url: str = "http://localhost:28282"
    wb_key: str = ""

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def __post_init__(self):
        assert self.modality in ("cmc-only", "imc-only", "both"), self.modality
        assert self.optim in ("sgd", "adam", "adamw"), self.optim
        assert self.scheduler in ("cos", "coswarm", "plateau", "step")
        if self.num_latent_channels % self.num_ca_heads:
            raise ValueError("num_latent_channels must divide num_ca_heads")
        if self.num_latent_channels % self.num_sa_heads:
            raise ValueError("num_latent_channels must divide num_sa_heads")


# Architecture naming convention of the reference experiment matrix,
# E1CL<k>SL-H<h>D<d>-L<l>-MR<m>  (README.md:76): 1 cross-attention layer,
# k self-attention layers, h heads, d latent channels, l latents, m MLP ratio.
def decode_arch_name(name: str) -> dict:
    import re

    m = re.match(r"E1CL(\d+)SL-H(\d+)D(\d+)-L(\d+)-MR(\d+)", name)
    if not m:
        raise ValueError(f"not an arch name: {name}")
    k, h, d, l, r = map(int, m.groups())
    return dict(
        num_ca_layers=1,
        num_sa_layers=k,
        num_ca_heads=h,
        num_sa_heads=h,
        num_latent_channels=d,
        num_pc_latents=l,
        num_groups=l,
        mlp_widen_factor=r,
    )


_BOOL_FIELDS = frozenset(
    f.name for f in dataclasses.fields(Config) if f.type in ("bool", bool)
)


def add_config_args(parser: argparse.ArgumentParser) -> None:
    for f in dataclasses.fields(Config):
        flag = "--" + f.name
        if f.name in _BOOL_FIELDS:
            parser.add_argument(
                flag,
                type=lambda s: s.lower() in ("1", "true", "yes"),
                nargs="?",
                const=True,
                default=None,
            )
        elif f.name == "layer_idx":
            parser.add_argument(flag, nargs="+", type=int, default=None)
        elif f.name == "class_choice":
            parser.add_argument(flag, type=str, default=None)
        else:
            ty = {"int": int, "float": float, "str": str}.get(str(f.type), str)
            if str(f.type) in ("float | None",):
                ty = float
            parser.add_argument(flag, type=ty, default=None)
    parser.add_argument("--arch", type=str, default=None,
                        help="E1CL<k>SL-H<h>D<d>-L<l>-MR<m> shorthand")


def config_from_args(
    argv: Sequence[str] | None = None, **defaults
) -> Config:
    parser = argparse.ArgumentParser(description="ViPFormer-TPU")
    add_config_args(parser)
    ns = parser.parse_args(argv)
    overrides = dict(defaults)
    if ns.arch:
        overrides.update(decode_arch_name(ns.arch))
    for f in dataclasses.fields(Config):
        v = getattr(ns, f.name, None)
        if v is not None:
            overrides[f.name] = tuple(v) if f.name == "layer_idx" else v
    return Config(**overrides)
