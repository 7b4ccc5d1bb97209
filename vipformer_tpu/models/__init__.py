from vipformer_tpu.models.crossformer import (
    CrossFormerImg,
    CrossFormerPC,
    CrossFormerPCFT,
    CrossFormerPartSeg,
    CrossFormerSemSeg,
    MPEncoder,
)
from vipformer_tpu.models.factory import (
    build_ft_cls,
    build_ft_partseg,
    build_ft_semseg,
    build_img_model,
    build_model,
    build_pc_model,
    compute_dtype,
)
from vipformer_tpu.models.perceiver_models import (
    PerceiverClassifier,
    PerceiverFeatsModel,
)

__all__ = [
    "CrossFormerImg",
    "CrossFormerPC",
    "CrossFormerPCFT",
    "CrossFormerPartSeg",
    "CrossFormerSemSeg",
    "MPEncoder",
    "PerceiverClassifier",
    "PerceiverFeatsModel",
    "build_ft_cls",
    "build_ft_partseg",
    "build_ft_semseg",
    "build_img_model",
    "build_model",
    "build_pc_model",
    "compute_dtype",
]
