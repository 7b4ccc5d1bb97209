"""Input/output adapters: task-specific tensors <-> generic token sequences."""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vipformer_tpu.nn.init import (
    latent_init,
    randn_init,
    torch_linear_bias,
    torch_linear_kernel,
)
from vipformer_tpu.nn.layers import Dense

Array = jax.Array
Dtype = Any


class _PatchDense(nn.Module):
    """Patch embedding applied as a strided convolution.

    Holds the SAME parameters as `Dense` over flattened patches — kernel
    [p*p*c, D] (row-major (p1, p2, c) like the reference's rearrange) and
    bias [D] — but applies them with `lax.conv_general_dilated` at
    stride p. The flatten route's 6-D reshape+transpose lowers on TPU to
    dozens of per-channel async slices over [B, c, H, W] (~370 us each —
    it dominated the whole image branch); the conv form is one implicit
    im2col matmul on the MXU.
    """

    features: int
    patch_size: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, imgs: Array) -> Array:
        p = self.patch_size
        c = imgs.shape[-1]
        fan_in = p * p * c
        kernel = self.param(
            "kernel", torch_linear_kernel(), (fan_in, self.features)
        )
        bias = self.param(
            "bias", torch_linear_bias(fan_in), (self.features,)
        )
        imgs, kernel, bias = nn.dtypes.promote_dtype(
            imgs, kernel, bias, dtype=self.dtype
        )
        # no preferred_element_type: the TPU conv accumulates in f32 on the
        # MXU regardless, and conv's grad rule rejects a widened output dtype
        y = jax.lax.conv_general_dilated(
            imgs,
            kernel.reshape(p, p, c, self.features),
            window_strides=(p, p),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b, gh, gw, d = y.shape
        return y.reshape(b, gh * gw, d) + bias


class ImagePatchify(nn.Module):
    """ViT-style patchify + linear embed + learned position embedding.

    Reference mp image branch (`pointcloud/partseg.py:628-637`): rearrange
    'b (h p1) (w p2) c -> b (h w) (p1 p2 c)' + Linear(D); position embedding
    is a learned randn(1, P, D) parameter. The rearrange+Linear pair is
    computed as one strided conv (see `_PatchDense`) with an identical
    parameter layout, so checkpoints trained either way interchange.
    """

    patch_size: int
    num_latent_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, imgs: Array) -> tuple[Array, Array]:
        b, h, w, c = imgs.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        patch_embs = _PatchDense(
            self.num_latent_channels, p, dtype=self.dtype, name="Dense_0"
        )(imgs)
        pos = self.param(
            "position_emb",
            randn_init(),
            (1, gh * gw, self.num_latent_channels),
        )
        return patch_embs, pos.astype(patch_embs.dtype)


@lru_cache(maxsize=8)
def _fourier_encoding(
    spatial_shape: Tuple[int, ...], num_bands: int
) -> np.ndarray:
    """Fourier position encodings for a spatial grid, computed once on host.

    Reference `image/classifier.py:48-106`: per-dimension positions in
    [-1, 1] (meshgrid 'ij'), frequencies linspace(1, max_freq/2, bands),
    encoding = [positions, sin(pi f p) per dim, cos(pi f p) per dim]
    concatenated channel-wise -> [prod(shape), len(shape)*(2*bands+1)].
    """
    coords = [np.linspace(-1.0, 1.0, s) for s in spatial_shape]
    pos = np.stack(np.meshgrid(*coords, indexing="ij"), axis=-1)
    grids = [
        pos[..., i : i + 1]
        * np.linspace(1.0, s / 2.0, num_bands)[None, :]
        for i, s in enumerate(spatial_shape)
    ]
    enc = [pos]
    enc.extend(np.sin(math.pi * g) for g in grids)
    enc.extend(np.cos(math.pi * g) for g in grids)
    out = np.concatenate(enc, axis=-1).astype(np.float32)
    return out.reshape(-1, out.shape[-1])


def fourier_channels(spatial_ndim: int, num_bands: int) -> int:
    return spatial_ndim * (2 * num_bands + 1)


class ImageInputAdapter(nn.Module):
    """Fourier position-encoded raw-pixel adapter (non-mp image path).

    Reference `image/classifier.py:28-127`: flatten pixels, concat RGB with
    the Fourier grid encoding -> [B, H*W, 3 + fourier_channels].
    """

    image_shape: Tuple[int, int, int]  # (H, W, C)
    num_frequency_bands: int = 64
    dtype: Optional[Dtype] = None

    @property
    def num_input_channels(self) -> int:
        return self.image_shape[-1] + fourier_channels(
            len(self.image_shape) - 1, self.num_frequency_bands
        )

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        if (h, w, c) != self.image_shape:
            raise ValueError(
                f"input image shape {(h, w, c)} != {self.image_shape}"
            )
        enc = jnp.asarray(
            _fourier_encoding((h, w), self.num_frequency_bands),
            dtype=x.dtype,
        )
        x = x.reshape(b, h * w, c)
        enc = jnp.broadcast_to(enc[None], (b, *enc.shape))
        return jnp.concatenate([x, enc], axis=-1)


class ClassificationOutputAdapter(nn.Module):
    """Learned output queries + linear classification head.

    Reference `core/modules.py:317-327`: query init N(0, 0.02) clamp ±2;
    forward squeezes the singleton query dimension.
    """

    num_classes: int
    num_output_queries: int = 1
    num_output_query_channels: Optional[int] = None
    dtype: Optional[Dtype] = None

    def setup(self):
        qc = self.num_output_query_channels or self.num_classes
        self.query = self.param(
            "output_query", latent_init(), (self.num_output_queries, qc)
        )
        self.linear = Dense(self.num_classes, dtype=self.dtype)

    def query_channels(self) -> int:
        return self.num_output_query_channels or self.num_classes

    def output_query(self, batch: int) -> Array:
        return jnp.broadcast_to(self.query[None], (batch, *self.query.shape))

    def __call__(self, x: Array) -> Array:
        out = self.linear(x)
        if out.shape[1] == 1:
            out = out.squeeze(axis=1)
        return out
