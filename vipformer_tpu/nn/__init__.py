from vipformer_tpu.nn.adapters import (
    ClassificationOutputAdapter,
    ImageInputAdapter,
    ImagePatchify,
)
from vipformer_tpu.nn.layers import (
    CrossAttention,
    CrossAttentionLayer,
    Dense,
    DropPath,
    MLP,
    MultiHeadAttention,
    SelfAttention,
    SelfAttentionBlock,
    SelfAttentionLayer,
    batch_norm,
    dpr_schedule,
    layer_norm,
)
from vipformer_tpu.nn.perceiver import (
    LatentFeatsHead,
    PerceiverDecoder,
    PerceiverEncoder,
    pool_latents,
)
from vipformer_tpu.nn.pointnet import (
    FeaturePropagation,
    Group2Emb,
    PointCloudInputAdapter,
    PositionEmb,
)

__all__ = [
    "ClassificationOutputAdapter",
    "ImageInputAdapter",
    "ImagePatchify",
    "CrossAttention",
    "CrossAttentionLayer",
    "Dense",
    "DropPath",
    "MLP",
    "MultiHeadAttention",
    "SelfAttention",
    "SelfAttentionBlock",
    "SelfAttentionLayer",
    "batch_norm",
    "dpr_schedule",
    "layer_norm",
    "LatentFeatsHead",
    "PerceiverDecoder",
    "PerceiverEncoder",
    "pool_latents",
    "FeaturePropagation",
    "Group2Emb",
    "PointCloudInputAdapter",
    "PositionEmb",
]
