from vipformer_tpu.train.checkpoint import (
    load_checkpoint,
    load_metadata,
    restore_backbone,
    save_checkpoint,
)
from vipformer_tpu.train.logging import Logger, RunDir, is_chief, maybe_wandb
from vipformer_tpu.train.meters import AccuracyMeter, AverageMeter
from vipformer_tpu.train.optim import build_optimizer, set_learning_rate
from vipformer_tpu.train.schedules import Schedule
from vipformer_tpu.train.state import TrainState
from vipformer_tpu.train.trainer import (
    create_state,
    init_variables,
    make_cls_eval,
    make_cls_step,
    make_feats_fn,
    make_partseg_eval,
    make_partseg_step,
    make_pretrain_step,
    make_semseg_eval,
    make_semseg_step,
    refine_partseg_pred,
)

__all__ = [
    "load_checkpoint",
    "load_metadata",
    "restore_backbone",
    "save_checkpoint",
    "Logger",
    "RunDir",
    "is_chief",
    "maybe_wandb",
    "AccuracyMeter",
    "AverageMeter",
    "build_optimizer",
    "set_learning_rate",
    "Schedule",
    "TrainState",
    "create_state",
    "init_variables",
    "make_cls_eval",
    "make_cls_step",
    "make_feats_fn",
    "make_partseg_eval",
    "make_partseg_step",
    "make_pretrain_step",
    "make_semseg_eval",
    "make_semseg_step",
    "refine_partseg_pred",
]
