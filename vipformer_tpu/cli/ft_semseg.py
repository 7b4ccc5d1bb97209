"""Semantic-segmentation finetune on S3DIS.

The reference ships the model (`CrossFormer_semseg`), the dataset, class
weights and the `--test_area` flag but never the entry point (SURVEY.md
§2.1); this completes the capability.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from vipformer_tpu.cli.common import round_up_batch, setup
from vipformer_tpu.cli import common
from vipformer_tpu.config import Config, config_from_args
from vipformer_tpu.data import Loader, S3DIS, collate_semseg, pad_batch
from vipformer_tpu.evaluation import semseg_miou
from vipformer_tpu.models import build_ft_semseg
from vipformer_tpu.parallel import place_state, shard_batch
from vipformer_tpu.train import (
    Schedule,
    create_state,
    init_variables,
    load_checkpoint,
    make_semseg_eval,
    make_semseg_step,
    restore_backbone,
    save_checkpoint,
)
from vipformer_tpu.train.meters import AverageMeter


def evaluate(eval_step, params, batch_stats, test_set, batch_size, mesh):
    loader = Loader(test_set, batch_size, collate_semseg, shuffle=False)
    preds, segs = [], []
    for batch in loader:
        batch, mask = pad_batch(batch, batch_size)
        sb = shard_batch(batch, mesh)
        pred = np.asarray(eval_step(params, batch_stats, sb["points"]))
        preds.append(pred[mask])
        segs.append(batch["seg"][mask])
    return semseg_miou(np.concatenate(preds), np.concatenate(segs))


def main(cfg: Config) -> dict:
    run, logger, mesh = setup(cfg)
    batch_size = round_up_batch(cfg.batch_size, mesh)
    train_set = S3DIS(cfg.data_dir, "train", cfg.test_area)
    test_set = S3DIS(cfg.data_dir, "test", cfg.test_area)
    train_loader = Loader(
        train_set, batch_size, collate_semseg, shuffle=True, seed=cfg.seed,
        drop_last=True, num_workers=cfg.num_workers,
    )
    # S3DIS blocks carry 9 channels; the model consumes the first
    # point_channels (xyz+rgb by default, semseg.py:358)
    pc = cfg.point_channels

    model = build_ft_semseg(cfg)
    sample = next(iter(train_loader))
    params, stats = init_variables(
        model, (jnp.asarray(sample["points"][..., :pc]),), cfg.seed
    )
    if cfg.resume:
        ckpt_path = (cfg.pc_model_file if "/" in cfg.pc_model_file
                     else run.model_path(cfg.pc_model_file))
        common.warn_patch_compat(ckpt_path, cfg, logger)
        raw = load_checkpoint(ckpt_path)
        pre_params, _ = common.pc_checkpoint_trees(raw)
        params = restore_backbone(
            params, pre_params, ("encoder",), log=logger.write
        )

    state, tx = create_state(cfg, params, stats)
    state, start_epoch, last_meta = common.resume_training_state(
        run, state, logger, cfg
    )
    state = place_state(state, mesh)
    step = make_semseg_step(cfg, model, tx)
    eval_step = make_semseg_eval(model)
    schedule = Schedule(cfg)

    best = last_meta.get("best", {"miou": 0.0})
    best_epoch = last_meta.get("best_epoch", -1)
    from vipformer_tpu.utils.cache import train_key

    key = train_key(cfg.seed)
    epoch_metric = None  # feeds the plateau scheduler
    for epoch in range(start_epoch, cfg.epochs):
        # plateau gets last epoch's mean train loss (None on the first
        # epoch); NOTE the reference's plateau was unusable -- its
        # scheduler.step() at pretrain.py:311 passes no metric, which
        # raises in torch -- so this is the intended semantics, working
        lr = schedule.lr(epoch, epoch_metric)
        train_loader.set_epoch(epoch)
        loss_m, acc_m = AverageMeter(), AverageMeter()
        t0 = time.time()
        for batch in train_loader:
            batch = {
                "points": batch["points"][..., :pc], "seg": batch["seg"]
            }
            key, sub = jax.random.split(key)
            state, metrics = step(state, shard_batch(batch, mesh), lr, sub)
            loss_m.update(float(metrics["loss"]), batch_size)
            acc_m.update(float(metrics["acc"]), batch_size)
        train_time = time.time() - t0
        epoch_metric = loss_m.avg

        results = evaluate(
            eval_step, state.params, state.batch_stats,
            _SliceChannels(test_set, pc), cfg.test_batch_size, mesh,
        )
        if results["miou"] > best["miou"]:
            best, best_epoch = results, epoch
            save_checkpoint(
                run.model_path("model_best"),
                jax.device_get(state),
                {"epoch": epoch, **results, "kind": "ft_semseg"},
            )
        logger.write(
            f"epoch {epoch}/{cfg.epochs}: loss {loss_m.avg:.4f} "
            f"train acc {acc_m.avg:.4f} | test acc "
            f"{results['point_level_acc']:.4f} miou {results['miou']:.4f} "
            f"(best {best['miou']:.4f}@{best_epoch})"
        )
        logger.metrics(
            epoch, lr=lr, train_loss=loss_m.avg, train_acc=acc_m.avg,
            train_time=train_time, **results,
        )
        common.save_rolling(
            run, state, epoch, cfg,
            {"best": best, "best_epoch": best_epoch, "kind": "ft_semseg"},
        )
    logger.write(f"final best mIoU {best['miou']:.4f} at epoch {best_epoch}")
    return {"best": best, "best_epoch": best_epoch}


class _SliceChannels:
    """Wrap a semseg dataset to expose only the first `c` point channels."""

    def __init__(self, ds, c):
        self.ds, self.c = ds, c

    def __len__(self):
        return len(self.ds)

    def get(self, i, rng=None):
        pts, seg = self.ds.get(i, rng)
        return pts[..., : self.c], seg


if __name__ == "__main__":
    main(config_from_args(
        ft_dataset="S3DIS", point_channels=6, num_obj_classes=13,
        num_sa_layers=12, max_dpr=0.1, atten_drop=0.0, mlp_drop=0.0,
    ))
