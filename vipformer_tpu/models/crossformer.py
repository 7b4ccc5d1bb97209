"""CrossFormer model family (the `--mp` "modal prior" path — every shipped
reference experiment uses these, see SURVEY.md §2.3).

Reference: `/root/reference/vipformer/model/pointcloud/partseg.py:233-680`
and `semseg.py:337-460`. One encoder implementation serves pretraining,
classification finetune, part segmentation and semantic segmentation; the
reference keeps two duplicated copies (partseg.py / semseg.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vipformer_tpu.nn.layers import (
    CrossAttentionLayer,
    Dense,
    SelfAttentionLayer,
    batch_norm,
    dpr_schedule,
    layer_norm,
)
from vipformer_tpu.nn.adapters import ImagePatchify
from vipformer_tpu.nn.perceiver import LatentFeatsHead, pool_latents
from vipformer_tpu.nn.pointnet import (
    FeaturePropagation,
    Group2Emb,
    PointCloudInputAdapter,
    PositionEmb,
)
from vipformer_tpu.ops.geometry import divide_patches

Array = jax.Array
Dtype = Any


class MPEncoder(nn.Module):
    """Modal-prior encoder: 1+ cross-attention, then self-attention stack with
    the position embedding re-added before *every* layer
    (reference `pointcloud/partseg.py:314-342`).

    With `modal_prior=True` returns the final latent array; otherwise returns
    the per-layer features tapped at `layer_idx` (1-based, static).
    """

    num_latent_channels: int
    num_cross_attention_layers: int = 1
    num_cross_attention_heads: int = 4
    cross_attention_widening_factor: int = 1
    first_cross_attention_layer_shared: bool = False
    num_self_attention_layers: int = 6
    num_self_attention_heads: int = 4
    self_attention_widening_factor: int = 1
    max_dpr: float = 0.0
    atten_drop: float = 0.0
    mlp_drop: float = 0.0
    modal_prior: bool = False
    layer_idx: Tuple[int, ...] = ()
    remat: bool = False
    dtype: Optional[Dtype] = None

    def setup(self):
        if self.num_cross_attention_layers <= 0:
            raise ValueError("num_cross_attention_layers must be > 0")

        def cross_attn(name):
            layer = CrossAttentionLayer(
                num_heads=self.num_cross_attention_heads,
                widening_factor=self.cross_attention_widening_factor,
                atten_drop=self.atten_drop,
                mlp_drop=self.mlp_drop,
                dtype=self.dtype,
                name=name,
            )
            return layer

        self.cross_attn_n = cross_attn("cross_attn_n")
        share = (
            self.first_cross_attention_layer_shared
            or self.num_cross_attention_layers == 1
        )
        self.cross_attn_1 = (
            self.cross_attn_n if share else cross_attn("cross_attn_1")
        )

        dprs = dpr_schedule(self.max_dpr, self.num_self_attention_layers)
        layer_cls = (
            nn.remat(SelfAttentionLayer, static_argnums=(3,))
            if self.remat
            else SelfAttentionLayer
        )
        self.sa_layers = [
            layer_cls(
                num_heads=self.num_self_attention_heads,
                widening_factor=self.self_attention_widening_factor,
                drop_path_rate=dprs[i],
                atten_drop=self.atten_drop,
                mlp_drop=self.mlp_drop,
                # mp-family residual dropout after self-attention is mlp_drop
                # (pointcloud/partseg.py:186), unlike the generic family
                post_attn_drop=self.mlp_drop,
                dtype=self.dtype,
                name=f"sa_{i}",
            )
            for i in range(self.num_self_attention_layers)
        ]

    def __call__(
        self,
        group_embs: Array,  # [B, G, D] latent queries (patch embeddings)
        pos_embs: Array,  # [B or 1, G, D] position embeddings
        pts_embs: Array,  # [B, M, D] per-token kv sequence
        pad_mask: Optional[Array] = None,
        deterministic: bool = True,
    ):
        x = self.cross_attn_1(
            group_embs + pos_embs, pts_embs, pad_mask, deterministic
        )
        feats = []
        for i, sa_layer in enumerate(self.sa_layers):
            if i + 1 < self.num_cross_attention_layers:
                x = self.cross_attn_n(
                    x + pos_embs, pts_embs, pad_mask, deterministic
                )
            x = sa_layer(x + pos_embs, None, deterministic)
            if (i + 1) in self.layer_idx:
                feats.append(x)
        if self.modal_prior:
            return x
        return tuple(feats)


def _encoder_kwargs(m) -> dict:
    return dict(
        num_latent_channels=m.num_latent_channels,
        num_cross_attention_layers=m.num_cross_attention_layers,
        num_cross_attention_heads=m.num_cross_attention_heads,
        cross_attention_widening_factor=m.mlp_widen_factor,
        num_self_attention_layers=m.num_self_attention_layers,
        num_self_attention_heads=m.num_self_attention_heads,
        self_attention_widening_factor=m.mlp_widen_factor,
        max_dpr=m.max_dpr,
        atten_drop=m.atten_drop,
        mlp_drop=m.mlp_drop,
        remat=m.remat,
        dtype=m.dtype,
    )


class _PointPatchStem(nn.Module):
    """Shared point-cloud stem: per-point embeddings + FPS/kNN patch pipeline.

    pts -> (pts_embs [B,N,D], group_embs [B,G,D], pos_embs [B,G,D],
    centers [B,G,C]). Reference `pointcloud/partseg.py:527-545`.
    """

    num_latents: int
    num_latent_channels: int
    group_size: int
    patch_compat: bool = False  # reference-faithful normalization slice
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, pts: Array, deterministic: bool = True):
        from vipformer_tpu.ops.pallas.stem import (
            fused_stem_enabled,
            fused_stem_supported,
            group2emb_fused_apply,
        )

        dt = self.dtype or pts.dtype
        pts_embs = PointCloudInputAdapter(
            self.num_latent_channels, dtype=self.dtype, name="input_adapter"
        )(pts.astype(dt))
        fps_key = (
            self.make_rng("fps") if self.has_rng("fps") else None
        )
        g2e = Group2Emb(
            self.num_latent_channels, dtype=self.dtype, name="group2emb"
        )
        use_fused = (
            not self.is_initializing()
            and fused_stem_enabled()
            and fused_stem_supported(
                self.num_latents, self.group_size, pts.shape[1],
                deterministic, self.patch_compat,
            )
        )
        if use_fused:
            # eval fast path (ops/pallas/stem.py): gather + normalize +
            # Group2Emb fused in VMEM; same weights, no [B, G, S, C]
            # neighbor tensor ever reaches HBM
            from vipformer_tpu.ops.geometry import (
                farthest_point_sample_with_centers, knn,
            )

            # centers come out of the FPS kernel's registers — the
            # index_points gather this replaces is XLA's scalar gather on
            # a minor-dim-3 array (69 us at B=128, superlinear 293 us at
            # B=256 on v5e)
            _, centers = farthest_point_sample_with_centers(
                pts, self.num_latents, fps_key
            )
            idx = knn(self.group_size, pts[..., :3], centers[..., :3])
            group_embs = group2emb_fused_apply(
                self.get_variable("params", "group2emb"),
                self.get_variable("batch_stats", "group2emb"),
                pts, centers, idx, dt,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            neighbors, centers = divide_patches(
                pts, self.num_latents, self.group_size, fps_key,
                neighbor_dtype=dt, compat=self.patch_compat,
            )
            group_embs = g2e(neighbors, deterministic)
        pos_embs = PositionEmb(
            self.num_latent_channels, dtype=self.dtype, name="position_emb"
        )(centers.astype(dt))
        return pts_embs, group_embs, pos_embs, centers


class CrossFormerPC(nn.Module):
    """Point-cloud pretraining branch (reference `CrossFormer_pc_mp`,
    `pointcloud/partseg.py:473-550`).

    Returns (projected_feats [B, D], backbone_feats [B, 2D]).
    """

    num_latents: int = 128
    num_latent_channels: int = 384
    group_size: int = 32
    patch_compat: bool = False
    num_cross_attention_layers: int = 1
    num_cross_attention_heads: int = 6
    num_self_attention_layers: int = 6
    num_self_attention_heads: int = 6
    mlp_widen_factor: int = 4
    max_dpr: float = 0.0
    atten_drop: float = 0.1
    mlp_drop: float = 0.5
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, pts: Array, deterministic: bool = True):
        pts_embs, group_embs, pos_embs, _ = _PointPatchStem(
            self.num_latents,
            self.num_latent_channels,
            self.group_size,
            patch_compat=self.patch_compat,
            dtype=self.dtype,
            name="stem",
        )(pts, deterministic)
        x_latent = MPEncoder(
            **_encoder_kwargs(self), modal_prior=True, name="encoder"
        )(group_embs, pos_embs, pts_embs, None, deterministic)
        backbone_feats = pool_latents(x_latent)
        proj = LatentFeatsHead(
            self.num_latent_channels, dtype=self.dtype, name="latent_head"
        )(backbone_feats, deterministic)
        return proj, backbone_feats


class FinetuneHead(nn.Module):
    """BN/ReLU classification head 2D -> D -> D/2 -> classes
    (reference `pointcloud/partseg.py:571-580`)."""

    num_latent_channels: int
    num_classes: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        d = self.num_latent_channels
        x = batch_norm(deterministic, self.dtype)(x)
        x = jax.nn.relu(x)
        x = Dense(d, dtype=self.dtype)(x)
        x = batch_norm(deterministic, self.dtype)(x)
        x = jax.nn.relu(x)
        x = Dense(d // 2, dtype=self.dtype)(x)
        x = batch_norm(deterministic, self.dtype)(x)
        x = jax.nn.relu(x)
        return Dense(self.num_classes, dtype=self.dtype)(x)


class CrossFormerPCFT(nn.Module):
    """Classification finetune model (reference `CrossFormer_pc_mp_ft`,
    `pointcloud/partseg.py:553-605`). Same backbone names as CrossFormerPC so
    pretrained weights restore directly; the contrastive `latent_head` is
    replaced by a fresh `finetune_head` (the reference drops it silently via
    strict=False — here the restore API is explicit, see train/checkpoint.py).

    Returns (logits [B, classes], backbone_feats [B, 2D]).
    """

    num_latents: int = 128
    num_latent_channels: int = 384
    group_size: int = 32
    patch_compat: bool = False
    num_cross_attention_layers: int = 1
    num_cross_attention_heads: int = 6
    num_self_attention_layers: int = 6
    num_self_attention_heads: int = 6
    mlp_widen_factor: int = 4
    max_dpr: float = 0.0
    atten_drop: float = 0.1
    mlp_drop: float = 0.5
    num_obj_classes: int = 40
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, pts: Array, deterministic: bool = True):
        pts_embs, group_embs, pos_embs, _ = _PointPatchStem(
            self.num_latents,
            self.num_latent_channels,
            self.group_size,
            patch_compat=self.patch_compat,
            dtype=self.dtype,
            name="stem",
        )(pts, deterministic)
        x_latent = MPEncoder(
            **_encoder_kwargs(self), modal_prior=True, name="encoder"
        )(group_embs, pos_embs, pts_embs, None, deterministic)
        backbone_feats = pool_latents(x_latent)
        logits = FinetuneHead(
            self.num_latent_channels,
            self.num_obj_classes,
            dtype=self.dtype,
            name="finetune_head",
        )(backbone_feats, deterministic)
        return logits, backbone_feats


class CrossFormerImg(nn.Module):
    """Image pretraining branch (reference `CrossFormer_img_mp`,
    `pointcloud/partseg.py:608-680`): ViT patchify + learned pos emb; the
    patch embeddings serve as both query and kv of the same MPEncoder.

    Returns (projected_feats [B, D], backbone_feats [B, 2D]).
    """

    img_height: int = 144
    img_width: int = 144
    patch_size: int = 12
    num_latent_channels: int = 384
    num_cross_attention_layers: int = 1
    num_cross_attention_heads: int = 6
    num_self_attention_layers: int = 6
    num_self_attention_heads: int = 6
    mlp_widen_factor: int = 4
    max_dpr: float = 0.0
    atten_drop: float = 0.1
    mlp_drop: float = 0.5
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, imgs: Array, deterministic: bool = True):
        dt = self.dtype or imgs.dtype
        patch_embs, pos_embs = ImagePatchify(
            self.patch_size,
            self.num_latent_channels,
            dtype=self.dtype,
            name="patch2emb",
        )(imgs.astype(dt))
        x_latent = MPEncoder(
            **_encoder_kwargs(self), modal_prior=True, name="encoder"
        )(patch_embs, pos_embs, patch_embs, None, deterministic)
        backbone_feats = pool_latents(x_latent)
        proj = LatentFeatsHead(
            self.num_latent_channels, dtype=self.dtype, name="latent_head"
        )(backbone_feats, deterministic)
        return proj, backbone_feats


class LabelConv(nn.Module):
    """One-hot object-label conditioning: Dense(64, no bias) -> BN ->
    LeakyReLU(0.2) (reference `pointcloud/partseg.py:391-393`)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, onehot: Array, deterministic: bool = True) -> Array:
        x = Dense(64, use_bias=False, dtype=self.dtype)(onehot)
        x = batch_norm(deterministic, self.dtype)(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class SegHead(nn.Module):
    """Dense decode head: Dense 512 -> BN -> ReLU -> Dropout(0.5) ->
    Dense 256 -> BN -> ReLU -> Dense(classes)
    (reference `pointcloud/partseg.py:399-405,460-466`).

    `x` may be a tuple of channel segments (implicit-concat Dense,
    nn.layers.Dense) — the seg models pass (per-point feats [B,N,Dp],
    global feats [B,1,Dg]) so the first Dense computes the global
    segment's product ONCE per cloud and broadcast-adds it, instead of
    re-multiplying identical rows N times over a materialized
    [B,N,Dp+Dg] broadcast-concat. Same parameter tree either way."""

    num_classes: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Array:
        x = Dense(512, dtype=self.dtype)(x)
        x = batch_norm(deterministic, self.dtype)(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(0.5)(x, deterministic=deterministic)
        x = Dense(256, dtype=self.dtype)(x)
        x = batch_norm(deterministic, self.dtype)(x)
        x = jax.nn.relu(x)
        return Dense(self.num_classes, dtype=self.dtype)(x)


class CrossFormerPartSeg(nn.Module):
    """Part segmentation model (reference `CrossFormer_partseg`,
    `pointcloud/partseg.py:345-470`): multi-layer feature taps, global
    max+avg pooling, one-hot label conditioning, 3-NN feature propagation to
    all points, dense per-point head.

    __call__(pts [B,N,3], cls_onehot [B,16]) -> logits [B, N, num_part_classes].
    """

    num_latents: int = 128
    num_latent_channels: int = 384
    group_size: int = 32
    patch_compat: bool = False
    num_cross_attention_layers: int = 1
    num_cross_attention_heads: int = 6
    num_self_attention_layers: int = 12
    num_self_attention_heads: int = 6
    mlp_widen_factor: int = 4
    max_dpr: float = 0.1
    atten_drop: float = 0.0
    mlp_drop: float = 0.0
    layer_idx: Tuple[int, ...] = ()
    num_part_classes: int = 50
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, pts: Array, cls_onehot: Array, deterministic: bool = True
    ) -> Array:
        assert len(self.layer_idx) > 0, "partseg needs layer_idx taps"
        B, N, _ = pts.shape
        pts_embs, group_embs, pos_embs, centers = _PointPatchStem(
            self.num_latents,
            self.num_latent_channels,
            self.group_size,
            patch_compat=self.patch_compat,
            dtype=self.dtype,
            name="stem",
        )(pts, deterministic)
        feats = MPEncoder(
            **_encoder_kwargs(self),
            modal_prior=False,
            layer_idx=self.layer_idx,
            name="encoder",
        )(group_embs, pos_embs, pts_embs, None, deterministic)
        norm = layer_norm(self.dtype, name="norm")
        x = jnp.concatenate([norm(f) for f in feats], axis=-1)  # [B,G,kD]

        x_max = jnp.max(x, axis=1)
        x_avg = jnp.mean(x, axis=1)
        label_feat = LabelConv(dtype=self.dtype, name="label_conv")(
            cls_onehot.astype(x.dtype), deterministic
        )
        # [B, 1, Dg]: stays un-broadcast — the seg head consumes it as an
        # implicit-concat segment (reference materializes the repeat at
        # partseg.py:451-453; per-cloud product + broadcast-add is the
        # same math minus ~2*N*Dg*512 redundant FLOPs and the [B,N,Dp+Dg]
        # concat's HBM round-trip)
        global_feat = jnp.concatenate(
            [x_max, x_avg, label_feat], axis=-1
        )[:, None, :]

        xyz = pts[..., :3]
        f0 = FeaturePropagation(
            mlp=(self.mlp_widen_factor * self.num_latent_channels, 1024),
            dtype=self.dtype,
            name="propagation",
        )(xyz, centers[..., :3], xyz.astype(x.dtype), x, deterministic)

        return SegHead(
            self.num_part_classes, dtype=self.dtype, name="seg_head"
        )((f0, global_feat.astype(f0.dtype)), deterministic)


class CrossFormerSemSeg(nn.Module):
    """Semantic segmentation model for S3DIS xyz+rgb (reference
    `CrossFormer_semseg`, `pointcloud/semseg.py:337-460`): like partseg but
    point_channels=6, no label conditioning, propagation on xyz only.

    Note: the reference also constructs an unused `label_conv`
    (`semseg.py:384-386`) which is dead weight; omitted here.

    __call__(pts [B,N,6]) -> logits [B, N, num_obj_classes].
    """

    point_channels: int = 6
    num_latents: int = 128
    num_latent_channels: int = 384
    group_size: int = 32
    patch_compat: bool = False
    num_cross_attention_layers: int = 1
    num_cross_attention_heads: int = 6
    num_self_attention_layers: int = 12
    num_self_attention_heads: int = 6
    mlp_widen_factor: int = 4
    max_dpr: float = 0.1
    atten_drop: float = 0.0
    mlp_drop: float = 0.0
    layer_idx: Tuple[int, ...] = ()
    num_obj_classes: int = 13
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, pts: Array, deterministic: bool = True) -> Array:
        assert len(self.layer_idx) > 0, "semseg needs layer_idx taps"
        B, N, _ = pts.shape
        # stem on full xyz+rgb channels (centers keep all channels for the
        # position embedding, semseg.py:361-364,413-417)
        pts_embs, group_embs, pos_embs, centers = _PointPatchStem(
            self.num_latents,
            self.num_latent_channels,
            self.group_size,
            patch_compat=self.patch_compat,
            dtype=self.dtype,
            name="stem",
        )(pts, deterministic)
        feats = MPEncoder(
            **_encoder_kwargs(self),
            modal_prior=False,
            layer_idx=self.layer_idx,
            name="encoder",
        )(group_embs, pos_embs, pts_embs, None, deterministic)
        norm = layer_norm(self.dtype, name="norm")
        x = jnp.concatenate([norm(f) for f in feats], axis=-1)

        x_max = jnp.max(x, axis=1)
        x_avg = jnp.mean(x, axis=1)
        # un-broadcast [B, 1, Dg] implicit-concat segment (see partseg)
        global_feat = jnp.concatenate([x_max, x_avg], axis=-1)[:, None, :]

        xyz = pts[..., :3]
        f0 = FeaturePropagation(
            mlp=(self.mlp_widen_factor * self.num_latent_channels, 1024),
            dtype=self.dtype,
            name="propagation",
        )(xyz, centers[..., :3], xyz.astype(x.dtype), x, deterministic)

        x = (f0, global_feat.astype(f0.dtype))
        return SegHead(
            self.num_obj_classes, dtype=self.dtype, name="seg_head"
        )(x, deterministic)
