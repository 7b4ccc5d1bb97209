"""Model factory mirroring the reference's `utils.py:111-323` builders.

Each builder returns an un-initialized flax Module; callers init/restore
parameters explicitly (functional style — no device placement here).
"""

from __future__ import annotations

import jax.numpy as jnp

from vipformer_tpu.config import Config
from vipformer_tpu.models.crossformer import (
    CrossFormerImg,
    CrossFormerPC,
    CrossFormerPCFT,
    CrossFormerPartSeg,
    CrossFormerSemSeg,
)
from vipformer_tpu.models.perceiver_models import (
    PerceiverClassifier,
    PerceiverFeatsModel,
)


def compute_dtype(cfg: Config):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        cfg.compute_dtype
    ]


def _mp_common(cfg: Config) -> dict:
    return dict(
        num_latent_channels=cfg.num_latent_channels,
        num_cross_attention_layers=cfg.num_ca_layers,
        num_cross_attention_heads=cfg.num_ca_heads,
        num_self_attention_layers=cfg.num_sa_layers,
        num_self_attention_heads=cfg.num_sa_heads,
        mlp_widen_factor=cfg.mlp_widen_factor,
        max_dpr=cfg.max_dpr,
        atten_drop=cfg.atten_drop,
        mlp_drop=cfg.mlp_drop,
        remat=cfg.remat,
        dtype=compute_dtype(cfg),
    )


def build_pc_model(cfg: Config):
    """Pretraining point branch (reference `build_model`, utils.py:115-171)."""
    if cfg.mp:
        return CrossFormerPC(
            num_latents=cfg.num_pc_latents,
            group_size=cfg.group_size,
            patch_compat=cfg.patch_compat,
            **_mp_common(cfg),
        )
    return PerceiverFeatsModel(
        adapter="pointcloud",
        num_latents=cfg.num_pc_latents,
        num_latent_channels=cfg.num_latent_channels,
        num_cross_attention_heads=cfg.num_ca_heads,
        num_cross_attention_qk_channels=cfg.num_latent_channels,
        num_cross_attention_layers=cfg.num_ca_layers,
        cross_attention_widening_factor=cfg.mlp_widen_factor,
        num_self_attention_heads=cfg.num_sa_heads,
        num_self_attention_layers_per_block=cfg.num_sa_layers_per_block,
        num_self_attention_blocks=cfg.num_sa_blocks,
        self_attention_widening_factor=cfg.mlp_widen_factor,
        max_dpr=cfg.max_dpr,
        atten_drop=cfg.atten_drop,
        mlp_drop=cfg.mlp_drop,
        remat=cfg.remat,
        dtype=compute_dtype(cfg),
    )


def build_img_model(cfg: Config):
    """Pretraining image branch (reference utils.py:134-148 / 173-197)."""
    if cfg.mp:
        return CrossFormerImg(
            img_height=cfg.img_height,
            img_width=cfg.img_width,
            patch_size=cfg.patch_size,
            **_mp_common(cfg),
        )
    return PerceiverFeatsModel(
        adapter="image",
        num_latents=cfg.num_img_latents,
        num_latent_channels=cfg.num_latent_channels,
        num_cross_attention_heads=cfg.num_ca_heads,
        num_cross_attention_qk_channels=cfg.num_latent_channels,
        num_cross_attention_layers=cfg.num_ca_layers,
        cross_attention_widening_factor=cfg.mlp_widen_factor,
        num_self_attention_heads=cfg.num_sa_heads,
        num_self_attention_layers_per_block=cfg.num_sa_layers_per_block,
        num_self_attention_blocks=cfg.num_sa_blocks,
        self_attention_widening_factor=cfg.mlp_widen_factor,
        max_dpr=cfg.max_dpr,
        atten_drop=cfg.atten_drop,
        mlp_drop=cfg.mlp_drop,
        image_shape=(cfg.img_height, cfg.img_width, 3),
        num_frequency_bands=cfg.num_frequency_bands,
        remat=cfg.remat,
        dtype=compute_dtype(cfg),
    )


def build_model(cfg: Config):
    """(pc_model,) or (pc_model, img_model) by modality, like utils.py:111."""
    if cfg.modality == "imc-only":
        return (build_pc_model(cfg),)
    return build_pc_model(cfg), build_img_model(cfg)


def build_ft_cls(cfg: Config):
    """Classification finetune model (reference utils.py:203-274)."""
    if cfg.mp:
        return CrossFormerPCFT(
            num_latents=cfg.num_pc_latents,
            group_size=cfg.group_size,
            patch_compat=cfg.patch_compat,
            num_obj_classes=cfg.num_obj_classes,
            **_mp_common(cfg),
        )
    return PerceiverClassifier(
        adapter="pointcloud",
        num_latents=cfg.num_pc_latents,
        num_latent_channels=cfg.num_latent_channels,
        num_classes=cfg.num_obj_classes,
        num_output_queries=cfg.output_seq_length,
        num_cross_attention_heads=cfg.num_ca_heads,
        num_cross_attention_qk_channels=cfg.num_latent_channels,
        num_cross_attention_layers=cfg.num_ca_layers,
        cross_attention_widening_factor=cfg.mlp_widen_factor,
        num_self_attention_heads=cfg.num_sa_heads,
        num_self_attention_layers_per_block=cfg.num_sa_layers_per_block,
        num_self_attention_blocks=cfg.num_sa_blocks,
        self_attention_widening_factor=cfg.mlp_widen_factor,
        max_dpr=cfg.max_dpr,
        atten_drop=cfg.atten_drop,
        mlp_drop=cfg.mlp_drop,
        remat=cfg.remat,
        dtype=compute_dtype(cfg),
    )


def build_ft_partseg(cfg: Config):
    """Part-segmentation model (reference utils.py:277-298)."""
    layer_idx = cfg.layer_idx or (2, 6, 10)
    return CrossFormerPartSeg(
        num_latents=cfg.num_pc_latents,
        group_size=cfg.group_size,
        patch_compat=cfg.patch_compat,
        layer_idx=tuple(layer_idx),
        num_part_classes=cfg.num_part_classes,
        **_mp_common(cfg),
    )


def build_ft_semseg(cfg: Config):
    """Semantic-segmentation model (reference utils.py:301-323)."""
    layer_idx = cfg.layer_idx or (2, 6, 10)
    return CrossFormerSemSeg(
        point_channels=cfg.point_channels,
        num_latents=cfg.num_pc_latents,
        group_size=cfg.group_size,
        patch_compat=cfg.patch_compat,
        layer_idx=tuple(layer_idx),
        num_obj_classes=cfg.num_obj_classes,
        **_mp_common(cfg),
    )
