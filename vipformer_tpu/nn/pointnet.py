"""Patch-embedding and dense-decode blocks (mini-PointNet family).

All 1x1 Conv1d stacks of the reference become Dense layers on channel-last
layouts — on TPU a kernel-1 conv *is* a matmul, and channel-last keeps the
contraction on the MXU's lane dimension without transposes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vipformer_tpu.nn.layers import Dense, batch_norm, gelu_exact, layer_norm
from vipformer_tpu.ops.geometry import three_nn_weights

Array = jax.Array
Dtype = Any


class Group2Emb(nn.Module):
    """Point-BERT style mini-PointNet: local patch -> patch embedding.

    Reference `pointcloud/utils.py:144-189`: per-point conv 3->64->128, patch
    max-pool, concat [global, local] -> conv 256->256->D, patch max-pool.

    Input [B, G, S, C] -> output [B, G, D]. BatchNorm reduces over
    (batch, groups, group_size) per channel, matching torch BatchNorm1d on
    the reference's [B*G, C, S] layout.
    """

    dim_model: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, point_groups: Array, deterministic: bool = True) -> Array:
        b, g, s, cin = point_groups.shape

        from vipformer_tpu.ops.pallas.g2e_train import (
            g2e_train_enabled,
            g2e_train_supported,
        )

        if (
            not deterministic
            and not self.is_initializing()
            and g2e_train_enabled()
            and g2e_train_supported(b, g, s, cin)
        ):
            # fused train path (ops/pallas/g2e_train.py): the whole
            # mini-PointNet runs in VMEM row blocks with only the
            # pre-BatchNorm_1 activation cached in HBM — same weights,
            # same train-mode BN semantics, custom VJP. The running-stat
            # momentum update happens here with the kernel's batch stats
            # (flax formula, undifferentiated like the XLA path).
            return self._fused_train(point_groups, s)

        x = Dense(64, dtype=self.dtype)(point_groups)
        x = batch_norm(deterministic, self.dtype)(x)
        x = jax.nn.relu(x)
        x = Dense(128, dtype=self.dtype)(x)  # [B, G, S, 128]
        global_feat = jnp.max(x, axis=2, keepdims=True)  # [B, G, 1, 128]
        # implicit-concat Dense: cat[global, local] @ W without ever
        # materializing the [B, G, S, 256] broadcast concat (see Dense)
        x = Dense(256, dtype=self.dtype)((global_feat, x))
        x = batch_norm(deterministic, self.dtype)(x)
        x = jax.nn.relu(x)
        x = Dense(self.dim_model, dtype=self.dtype)(x)
        return jnp.max(x, axis=2)  # [B, G, D]

    def _fused_train(self, point_groups: Array, s: int) -> Array:
        from vipformer_tpu.ops.pallas.g2e_train import g2e_train_apply

        dt = self.dtype or point_groups.dtype
        p = {
            k: self.get_variable("params", k)
            for k in ("Dense_0", "Dense_1", "Dense_2", "Dense_3",
                      "BatchNorm_0", "BatchNorm_1")
        }
        wb = (
            p["Dense_0"]["kernel"], p["Dense_0"]["bias"],
            p["BatchNorm_0"]["scale"], p["BatchNorm_0"]["bias"],
            p["Dense_1"]["kernel"], p["Dense_1"]["bias"],
            p["Dense_2"]["kernel"], p["Dense_2"]["bias"],
            p["BatchNorm_1"]["scale"], p["BatchNorm_1"]["bias"],
            p["Dense_3"]["kernel"], p["Dense_3"]["bias"],
        )
        out, (mu0, var0, mu1, var1) = g2e_train_apply(
            point_groups.astype(dt), wb, s,
            jax.default_backend() != "tpu",  # interpret off-TPU (CPU tests)
        )
        if self.is_mutable_collection("batch_stats"):
            mom = 0.9  # torch momentum 0.1 (nn.layers.batch_norm)
            for name, mu, var in (
                ("BatchNorm_0", mu0, var0),
                ("BatchNorm_1", mu1, var1),
            ):
                ra = self.get_variable("batch_stats", name)
                self.put_variable(
                    "batch_stats", name,
                    {
                        "mean": mom * ra["mean"] + (1 - mom) * mu,
                        "var": mom * ra["var"] + (1 - mom) * var,
                    },
                )
        return out


class PositionEmb(nn.Module):
    """Center-coordinate MLP: C -> 128 -> GELU -> D.

    Reference `pointcloud/partseg.py:498-501` (and the point_channels-wide
    semseg variant, `semseg.py:361-364`).
    """

    dim_model: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, centers: Array) -> Array:
        x = Dense(128, dtype=self.dtype)(centers)
        x = gelu_exact(x)
        return Dense(self.dim_model, dtype=self.dtype)(x)


class FeaturePropagation(nn.Module):
    """Inverse-distance 3-NN upsampling + per-point MLP.

    Reference `PointNetFeaturePropagation` (`pointcloud/utils.py:192-242`)
    on channel-last layout: interpolate group features to every point,
    concat skip features, then Dense/BN/ReLU stack.
    """

    mlp: Sequence[int]
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        xyz_dst: Array,  # [B, N, 3] target positions
        xyz_src: Array,  # [B, S, 3] source (group center) positions
        feats_dst: Optional[Array],  # [B, N, Dd] skip features or None
        feats_src: Array,  # [B, S, Ds] features to upsample
        deterministic: bool = True,
    ) -> Array:
        # The first Dense is hoisted THROUGH the interpolation: 3-NN
        # upsampling is linear in the features, so
        #   interp(feats_src) @ W == interp(feats_src @ W)
        # and the widest matmul of the decode runs on S = num_groups
        # source rows instead of N point rows (~16x fewer rows at the
        # partseg shapes; the [B, N, Ds] interpolated activation is never
        # materialized at all). The skip features join as an
        # implicit-concat segment (nn.layers.Dense), so the parameter
        # tree is identical to Dense over concat([skip, interp]).
        wmat = three_nn_weights(xyz_dst, xyz_src)  # [B, N, S]

        def interp(h: Array) -> Array:
            return jnp.einsum(
                "bns,bsd->bnd", wmat.astype(h.dtype), h,
                preferred_element_type=h.dtype,
            )

        src = (
            feats_src.astype(feats_dst.dtype)
            if feats_dst is not None
            else feats_src
        )
        inp = (
            (feats_dst, (src, interp))
            if feats_dst is not None
            else ((src, interp),)
        )
        for width in self.mlp:
            x = Dense(width, dtype=self.dtype)(inp)
            x = batch_norm(deterministic, self.dtype)(x)
            x = jax.nn.relu(x)
            inp = x
        return x


class PointCloudInputAdapter(nn.Module):
    """Per-point MLP C -> 64 -> LN -> ReLU -> D.

    Reference `pointcloud/classifier.py:25-50`.
    """

    num_input_channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, pts: Array) -> Array:
        x = Dense(64, dtype=self.dtype)(pts)
        x = layer_norm(self.dtype)(x)
        x = jax.nn.relu(x)
        return Dense(self.num_input_channels, dtype=self.dtype)(x)
