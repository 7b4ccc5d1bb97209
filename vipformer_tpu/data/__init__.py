from vipformer_tpu.data.datasets import (
    ModelNet40SVM,
    S3DIS,
    ScanObjectNNSVM,
    ShapeNetPart,
    ShapeNetRender,
)
from vipformer_tpu.data.pipeline import (
    Loader,
    collate_cls,
    collate_partseg,
    collate_pretrain,
    collate_pretrain_raw,
    collate_semseg,
    pad_batch,
)
from vipformer_tpu.data.ply import load_ply, save_ply

__all__ = [
    "ModelNet40SVM",
    "S3DIS",
    "ScanObjectNNSVM",
    "ShapeNetPart",
    "ShapeNetRender",
    "Loader",
    "collate_cls",
    "collate_partseg",
    "collate_pretrain",
    "collate_pretrain_raw",
    "collate_semseg",
    "pad_batch",
    "load_ply",
    "save_ply",
]
