"""Part-segmentation finetune entry point (reference `ft_partseg.py`).

Category-masked refined predictions and the full IoU suite (instance-mean
part IoU, category-mean IoU, mean part acc, point acc) run vectorized;
checkpoints on new-best mean-category-IoU with optimizer state included,
like the reference (`ft_partseg.py:205-219`). Gradient clipping to norm 10
comes from `Config.grad_clip_norm` (default set here).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from vipformer_tpu.cli.common import round_up_batch, setup
from vipformer_tpu.cli import common
from vipformer_tpu.config import Config, config_from_args
from vipformer_tpu.data import Loader, ShapeNetPart, collate_partseg, pad_batch
from vipformer_tpu.evaluation import PartSegMetrics
from vipformer_tpu.models import build_ft_partseg
from vipformer_tpu.parallel import place_state, shard_batch
from vipformer_tpu.train import (
    Schedule,
    create_state,
    init_variables,
    load_checkpoint,
    make_partseg_eval,
    make_partseg_step,
    restore_backbone,
    save_checkpoint,
)
from vipformer_tpu.train.meters import AverageMeter


def evaluate(eval_step, params, batch_stats, test_set, batch_size, mesh):
    loader = Loader(test_set, batch_size, collate_partseg, shuffle=False)
    metrics = PartSegMetrics()
    for batch in loader:
        batch, mask = pad_batch(batch, batch_size)
        sb = shard_batch(batch, mesh)
        _, refined = eval_step(
            params, batch_stats, sb["points"], sb["obj_labels"]
        )
        metrics.update(
            np.asarray(refined), batch["seg"], batch["obj_labels"], valid=mask
        )
    return metrics.results()


def main(cfg: Config) -> dict:
    if cfg.grad_clip_norm is None:
        cfg = cfg.replace(grad_clip_norm=10.0)  # ft_partseg.py:175
    run, logger, mesh = setup(cfg)
    batch_size = round_up_batch(cfg.batch_size, mesh)

    train_set = ShapeNetPart(
        cfg.data_dir, "trainval", cfg.num_ft_points, cfg.class_choice
    )
    test_set = ShapeNetPart(
        cfg.data_dir, "test", cfg.num_ft_points, cfg.class_choice
    )
    train_loader = Loader(
        train_set, batch_size, collate_partseg, shuffle=True, seed=cfg.seed,
        drop_last=True, num_workers=cfg.num_workers,
    )

    model = build_ft_partseg(cfg)
    sample = next(iter(train_loader))
    params, stats = init_variables(
        model,
        (jnp.asarray(sample["points"]), jnp.zeros((batch_size, 16))),
        cfg.seed,
    )
    if cfg.resume:
        ckpt_path = (cfg.pc_model_file if "/" in cfg.pc_model_file
                     else run.model_path(cfg.pc_model_file))
        common.warn_patch_compat(ckpt_path, cfg, logger)
        raw = load_checkpoint(ckpt_path)
        pre_params, _ = common.pc_checkpoint_trees(raw)
        params = restore_backbone(
            params, pre_params, ("stem", "encoder"), log=logger.write
        )

    state, tx = create_state(cfg, params, stats)
    state, start_epoch, last_meta = common.resume_training_state(
        run, state, logger, cfg
    )
    state = place_state(state, mesh)
    step = make_partseg_step(cfg, model, tx)
    eval_step = make_partseg_eval(model)
    schedule = Schedule(cfg)

    best = last_meta.get("best", {"mean_category_iou": 0.0})
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
            key, sub = jax.random.split(key)
            state, metrics = step(state, shard_batch(batch, mesh), lr, sub)
            loss_m.update(float(metrics["loss"]), batch_size)
            acc_m.update(float(metrics["acc"]), batch_size)
        train_time = time.time() - t0
        epoch_metric = loss_m.avg

        results = evaluate(
            eval_step, state.params, state.batch_stats, test_set,
            cfg.test_batch_size, mesh,
        )
        if results["mean_category_iou"] > best["mean_category_iou"]:
            best, best_epoch = results, epoch
            save_checkpoint(
                run.model_path("model_best"),
                jax.device_get(state),
                {"epoch": epoch, **results, "kind": "ft_partseg"},
            )
        logger.write(
            f"epoch {epoch}/{cfg.epochs}: loss {loss_m.avg:.4f} "
            f"train acc {acc_m.avg:.4f} | "
            + " ".join(f"{k} {v:.4f}" for k, v in results.items())
            + f" (best catIoU {best['mean_category_iou']:.4f}@{best_epoch})"
        )
        logger.metrics(
            epoch, lr=lr, train_loss=loss_m.avg, train_acc=acc_m.avg,
            train_time=train_time, **results,
        )
        common.save_rolling(
            run, state, epoch, cfg,
            {"best": best, "best_epoch": best_epoch, "kind": "ft_partseg"},
        )
    logger.write(
        f"final best mean-category IoU {best['mean_category_iou']:.4f} "
        f"at epoch {best_epoch}"
    )
    return {"best": best, "best_epoch": best_epoch}


if __name__ == "__main__":
    main(config_from_args(
        ft_dataset="ShapeNetPart", num_sa_layers=12, max_dpr=0.1,
        atten_drop=0.0, mlp_drop=0.0,
    ))
