"""Generic Perceiver-IO family (the reference's non-`--mp` fallback path).

Reference `core/modules.py:330-655`: latent-array encoder with optional
weight sharing of the first cross-attention layer / self-attention block,
output-query decoder, and a pooled-features contrastive head.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vipformer_tpu.nn.adapters import ClassificationOutputAdapter
from vipformer_tpu.nn.init import latent_init
from vipformer_tpu.nn.layers import (
    CrossAttentionLayer,
    Dense,
    SelfAttentionBlock,
    batch_norm,
)

Array = jax.Array
Dtype = Any


class LatentFeatsHead(nn.Module):
    """BN -> ReLU -> Dense(D, no bias) -> BN -> ReLU -> Dense(D, no bias).

    Contrastive projection head over pooled latents
    (reference `core/modules.py:495-501`, `pointcloud/partseg.py:519-525`).
    """

    num_latent_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        x = batch_norm(deterministic, self.dtype)(x)
        x = jax.nn.relu(x)
        x = Dense(self.num_latent_channels, use_bias=False, dtype=self.dtype)(x)
        x = batch_norm(deterministic, self.dtype)(x)
        x = jax.nn.relu(x)
        return Dense(self.num_latent_channels, use_bias=False, dtype=self.dtype)(x)


def pool_latents(x_latent: Array) -> Array:
    """backbone_feats = concat[max-pool, mean-pool] over the latent axis
    (reference `core/modules.py:520`)."""
    return jnp.concatenate(
        [jnp.max(x_latent, axis=1), jnp.mean(x_latent, axis=1)], axis=-1
    )


class PerceiverEncoder(nn.Module):
    """Latent-bottleneck encoder: CA(latent <- input) + SA blocks.

    Reference `core/modules.py:330-468`. The input adapter is applied by the
    caller (models own their adapters); this module consumes token sequences.
    """

    num_latents: int
    num_latent_channels: int
    num_cross_attention_heads: int = 4
    num_cross_attention_qk_channels: Optional[int] = None
    num_cross_attention_v_channels: Optional[int] = None
    num_cross_attention_layers: int = 1
    first_cross_attention_layer_shared: bool = False
    cross_attention_widening_factor: int = 1
    num_self_attention_heads: int = 4
    num_self_attention_qk_channels: Optional[int] = None
    num_self_attention_v_channels: Optional[int] = None
    num_self_attention_layers_per_block: int = 6
    num_self_attention_blocks: int = 1
    first_self_attention_block_shared: bool = True
    self_attention_widening_factor: int = 1
    max_dpr: float = 0.0
    atten_drop: float = 0.1
    mlp_drop: float = 0.5
    remat: bool = False
    dtype: Optional[Dtype] = None

    def setup(self):
        if self.num_cross_attention_layers <= 0:
            raise ValueError("num_cross_attention_layers must be > 0")
        if self.num_self_attention_blocks <= 0:
            raise ValueError("num_self_attention_blocks must be > 0")
        if self.num_cross_attention_layers > self.num_self_attention_blocks:
            raise ValueError(
                "num_cross_attention_layers must be <= num_self_attention_blocks"
            )

        def cross_attn(name):
            return CrossAttentionLayer(
                num_heads=self.num_cross_attention_heads,
                num_qk_channels=self.num_cross_attention_qk_channels,
                num_v_channels=self.num_cross_attention_v_channels,
                widening_factor=self.cross_attention_widening_factor,
                atten_drop=self.atten_drop,
                mlp_drop=self.mlp_drop,
                dtype=self.dtype,
                name=name,
            )

        def self_attn(name):
            return SelfAttentionBlock(
                num_layers=self.num_self_attention_layers_per_block,
                num_heads=self.num_self_attention_heads,
                num_qk_channels=self.num_self_attention_qk_channels,
                num_v_channels=self.num_self_attention_v_channels,
                widening_factor=self.self_attention_widening_factor,
                max_dpr=self.max_dpr,
                atten_drop=self.atten_drop,
                mlp_drop=self.mlp_drop,
                remat=self.remat,
                dtype=self.dtype,
                name=name,
            )

        self.cross_attn_n = cross_attn("cross_attn_n")
        self.self_attn_n = self_attn("self_attn_n")
        share_ca = (
            self.first_cross_attention_layer_shared
            or self.num_cross_attention_layers == 1
        )
        share_sa = (
            self.first_self_attention_block_shared
            or self.num_self_attention_blocks == 1
        )
        self.cross_attn_1 = self.cross_attn_n if share_ca else cross_attn("cross_attn_1")
        self.self_attn_1 = self.self_attn_n if share_sa else self_attn("self_attn_1")

        self.latent = self.param(
            "latent",
            latent_init(),
            (self.num_latents, self.num_latent_channels),
        )

    def __call__(
        self, x: Array, pad_mask: Optional[Array] = None, deterministic: bool = True
    ) -> Array:
        b = x.shape[0]
        x_latent = jnp.broadcast_to(
            self.latent[None].astype(x.dtype), (b, *self.latent.shape)
        )
        x_latent = self.cross_attn_1(x_latent, x, pad_mask, deterministic)
        x_latent = self.self_attn_1(x_latent, None, deterministic)
        for i in range(1, self.num_self_attention_blocks):
            if i < self.num_cross_attention_layers:
                x_latent = self.cross_attn_n(x_latent, x, pad_mask, deterministic)
            x_latent = self.self_attn_n(x_latent, None, deterministic)
        return x_latent


class PerceiverDecoder(nn.Module):
    """Output-query cross-attention decoder + 2-layer SA block + adapter.

    Reference `core/modules.py:526-605`.
    """

    output_adapter: ClassificationOutputAdapter
    num_latent_channels: int
    num_cross_attention_heads: int = 4
    num_cross_attention_qk_channels: Optional[int] = None
    num_cross_attention_v_channels: Optional[int] = None
    cross_attention_widening_factor: int = 1
    num_self_attention_heads: int = 4
    num_self_attention_qk_channels: Optional[int] = None
    num_self_attention_v_channels: Optional[int] = None
    num_self_attention_layers_per_block: int = 2
    self_attention_widening_factor: int = 1
    atten_drop: float = 0.0
    mlp_drop: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x_latent: Array, deterministic: bool = True) -> Array:
        b = x_latent.shape[0]
        query = self.output_adapter.output_query(b).astype(x_latent.dtype)
        x = CrossAttentionLayer(
            num_heads=self.num_cross_attention_heads,
            num_qk_channels=self.num_cross_attention_qk_channels,
            num_v_channels=self.num_cross_attention_v_channels,
            widening_factor=self.cross_attention_widening_factor,
            atten_drop=self.atten_drop,
            mlp_drop=self.mlp_drop,
            dtype=self.dtype,
            name="cross_attn",
        )(query, x_latent, None, deterministic)
        x = SelfAttentionBlock(
            num_layers=self.num_self_attention_layers_per_block,
            num_heads=self.num_self_attention_heads,
            num_qk_channels=self.num_self_attention_qk_channels,
            num_v_channels=self.num_self_attention_v_channels,
            widening_factor=self.self_attention_widening_factor,
            max_dpr=0.0,  # no DropPath in the decoder (core/modules.py:579)
            atten_drop=self.atten_drop,
            mlp_drop=self.mlp_drop,
            dtype=self.dtype,
            name="self_attn",
        )(x, None, deterministic)
        return self.output_adapter(x)
