"""Generic Perceiver-IO wrapper models (the reference's non-`--mp` path).

Reference: `utils.py:150-198` (pretraining feats models over the generic
encoder) and `utils.py:226-272` + `pointcloud/classifier.py:53-81` /
`image/classifier.py:130-158` (encoder+decoder classifiers).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax

from vipformer_tpu.nn.adapters import (
    ClassificationOutputAdapter,
    ImageInputAdapter,
)
from vipformer_tpu.nn.perceiver import (
    LatentFeatsHead,
    PerceiverDecoder,
    PerceiverEncoder,
    pool_latents,
)
from vipformer_tpu.nn.pointnet import PointCloudInputAdapter

Array = jax.Array
Dtype = Any


class PerceiverFeatsModel(nn.Module):
    """Input adapter + PerceiverEncoder + pooled contrastive head
    (reference `PerceiverEncoder_feats_head`, `core/modules.py:471-523`).

    `adapter`: "pointcloud" or "image".
    Returns (projected_feats [B, D], backbone_feats [B, 2D]).
    """

    adapter: str
    num_latents: int
    num_latent_channels: int
    num_cross_attention_heads: int = 4
    num_cross_attention_qk_channels: Optional[int] = None
    num_cross_attention_v_channels: Optional[int] = None
    num_cross_attention_layers: int = 1
    first_cross_attention_layer_shared: bool = False
    cross_attention_widening_factor: int = 1
    num_self_attention_heads: int = 4
    num_self_attention_layers_per_block: int = 6
    num_self_attention_blocks: int = 1
    first_self_attention_block_shared: bool = True
    self_attention_widening_factor: int = 1
    max_dpr: float = 0.0
    atten_drop: float = 0.1
    mlp_drop: float = 0.5
    image_shape: Tuple[int, int, int] = (224, 224, 3)
    num_frequency_bands: int = 64
    remat: bool = False
    dtype: Optional[Dtype] = None

    def _tokens(self, x, deterministic):
        if self.adapter == "pointcloud":
            return PointCloudInputAdapter(
                self.num_latent_channels, dtype=self.dtype, name="input_adapter"
            )(x)
        elif self.adapter == "image":
            return ImageInputAdapter(
                self.image_shape,
                self.num_frequency_bands,
                dtype=self.dtype,
                name="input_adapter",
            )(x)
        raise ValueError(self.adapter)

    def _encoder(self):
        return PerceiverEncoder(
            num_latents=self.num_latents,
            num_latent_channels=self.num_latent_channels,
            num_cross_attention_heads=self.num_cross_attention_heads,
            num_cross_attention_qk_channels=self.num_cross_attention_qk_channels,
            num_cross_attention_v_channels=self.num_cross_attention_v_channels,
            num_cross_attention_layers=self.num_cross_attention_layers,
            first_cross_attention_layer_shared=self.first_cross_attention_layer_shared,
            cross_attention_widening_factor=self.cross_attention_widening_factor,
            num_self_attention_heads=self.num_self_attention_heads,
            num_self_attention_layers_per_block=self.num_self_attention_layers_per_block,
            num_self_attention_blocks=self.num_self_attention_blocks,
            first_self_attention_block_shared=self.first_self_attention_block_shared,
            self_attention_widening_factor=self.self_attention_widening_factor,
            max_dpr=self.max_dpr,
            atten_drop=self.atten_drop,
            mlp_drop=self.mlp_drop,
            remat=self.remat,
            dtype=self.dtype,
            name="encoder",
        )

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True):
        dt = self.dtype or x.dtype
        tokens = self._tokens(x.astype(dt), deterministic)
        x_latent = self._encoder()(tokens, None, deterministic)
        backbone_feats = pool_latents(x_latent)
        proj = LatentFeatsHead(
            self.num_latent_channels, dtype=self.dtype, name="latent_head"
        )(backbone_feats, deterministic)
        return proj, backbone_feats


class PerceiverClassifier(nn.Module):
    """Input adapter + PerceiverEncoder + output-query PerceiverDecoder
    (reference `PerceiverIO`, `core/modules.py:642-655`; non-mp ft_cls path
    `utils.py:226-272`).

    Returns (logits [B, classes], backbone_feats [B, 2D]).
    """

    adapter: str
    num_latents: int
    num_latent_channels: int
    num_classes: int
    # "query" = output-query PerceiverDecoder (the shipped path);
    # "pooled" = the reference's dormant `PerceiverDecoder_var`
    # (core/modules.py:608-639): max||mean pooled latents through the
    # BN/ReLU 2D->D->D/2->classes chain (same math as FinetuneHead)
    decoder: str = "query"
    num_output_queries: int = 1
    num_cross_attention_heads: int = 4
    num_cross_attention_qk_channels: Optional[int] = None
    num_cross_attention_v_channels: Optional[int] = None
    num_cross_attention_layers: int = 1
    cross_attention_widening_factor: int = 1
    num_self_attention_heads: int = 4
    num_self_attention_layers_per_block: int = 6
    num_self_attention_blocks: int = 1
    self_attention_widening_factor: int = 1
    max_dpr: float = 0.0
    atten_drop: float = 0.1
    mlp_drop: float = 0.5
    image_shape: Tuple[int, int, int] = (224, 224, 3)
    num_frequency_bands: int = 64
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True):
        dt = self.dtype or x.dtype
        if self.adapter == "pointcloud":
            tokens = PointCloudInputAdapter(
                self.num_latent_channels, dtype=self.dtype, name="input_adapter"
            )(x.astype(dt))
        else:
            tokens = ImageInputAdapter(
                self.image_shape,
                self.num_frequency_bands,
                dtype=self.dtype,
                name="input_adapter",
            )(x.astype(dt))
        x_latent = PerceiverEncoder(
            num_latents=self.num_latents,
            num_latent_channels=self.num_latent_channels,
            num_cross_attention_heads=self.num_cross_attention_heads,
            num_cross_attention_qk_channels=self.num_cross_attention_qk_channels,
            num_cross_attention_v_channels=self.num_cross_attention_v_channels,
            num_cross_attention_layers=self.num_cross_attention_layers,
            cross_attention_widening_factor=self.cross_attention_widening_factor,
            num_self_attention_heads=self.num_self_attention_heads,
            num_self_attention_layers_per_block=self.num_self_attention_layers_per_block,
            num_self_attention_blocks=self.num_self_attention_blocks,
            self_attention_widening_factor=self.self_attention_widening_factor,
            max_dpr=self.max_dpr,
            atten_drop=self.atten_drop,
            mlp_drop=self.mlp_drop,
            remat=self.remat,
            dtype=self.dtype,
            name="encoder",
        )(tokens, None, deterministic)
        if self.decoder == "pooled":
            from vipformer_tpu.models.crossformer import FinetuneHead

            feats = pool_latents(x_latent)
            logits = FinetuneHead(
                self.num_latent_channels,
                self.num_classes,
                dtype=self.dtype,
                name="decoder_var",
            )(feats, deterministic)
            return logits, feats
        adapter = ClassificationOutputAdapter(
            num_classes=self.num_classes,
            num_output_queries=self.num_output_queries,
            num_output_query_channels=self.num_latent_channels,
            dtype=self.dtype,
            name="output_adapter",
        )
        logits = PerceiverDecoder(
            output_adapter=adapter,
            num_latent_channels=self.num_latent_channels,
            num_cross_attention_heads=self.num_cross_attention_heads,
            num_cross_attention_qk_channels=self.num_latent_channels,
            cross_attention_widening_factor=self.cross_attention_widening_factor,
            num_self_attention_heads=self.num_self_attention_heads,
            num_self_attention_layers_per_block=2,  # utils.py:261
            self_attention_widening_factor=self.self_attention_widening_factor,
            atten_drop=self.atten_drop,
            mlp_drop=self.mlp_drop,
            dtype=self.dtype,
            name="decoder",
        )(x_latent, deterministic)
        return logits, pool_latents(x_latent)
