from vipformer_tpu.losses.contrastive import nt_xent_grouped, nt_xent_loss
from vipformer_tpu.losses.classification import (
    smoothed_cross_entropy,
    partseg_smoothed_loss,
)

__all__ = [
    "nt_xent_grouped",
    "nt_xent_loss",
    "smoothed_cross_entropy",
    "partseg_smoothed_loss",
]
