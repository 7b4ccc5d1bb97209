"""Classification finetune entry point (reference `ft_cls.py`).

Loads pretrained backbone weights with the explicit restore API (no
strict=False silence), trains with label-smoothed CE (0.2), evaluates the
test split every epoch, checkpoints on new-best accuracy.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from vipformer_tpu.cli.common import round_up_batch, setup
from vipformer_tpu.cli import common
from vipformer_tpu.config import Config, config_from_args
from vipformer_tpu.data import (
    Loader,
    ModelNet40SVM,
    ScanObjectNNSVM,
    collate_cls,
    pad_batch,
)
from vipformer_tpu.models import build_ft_cls
from vipformer_tpu.parallel import place_state, shard_batch
from vipformer_tpu.train import (
    Schedule,
    create_state,
    init_variables,
    load_checkpoint,
    make_cls_eval,
    make_cls_step,
    restore_backbone,
    save_checkpoint,
)
from vipformer_tpu.train.meters import AccuracyMeter, AverageMeter


def datasets(cfg: Config):
    ds_cls = {"ModelNet40": ModelNet40SVM, "ScanObjectNN": ScanObjectNNSVM}[
        cfg.ft_dataset
    ]
    return (
        ds_cls(cfg.data_dir, "train", cfg.num_ft_points),
        ds_cls(cfg.data_dir, "test", cfg.num_ft_points),
    )


def evaluate(eval_step, params, batch_stats, test_set, batch_size, mesh):
    loader = Loader(test_set, batch_size, collate_cls, shuffle=False)
    correct = total = 0
    for batch in loader:
        batch, mask = pad_batch(batch, batch_size)
        sb = shard_batch(batch, mesh)
        pred = np.asarray(eval_step(params, batch_stats, sb["points"]))
        correct += int((pred[mask] == batch["labels"][mask]).sum())
        total += int(mask.sum())
    return correct / max(total, 1)


def main(cfg: Config) -> dict:
    run, logger, mesh = setup(cfg)
    batch_size = round_up_batch(cfg.batch_size, mesh)
    train_set, test_set = datasets(cfg)
    train_loader = Loader(
        train_set, batch_size, collate_cls, shuffle=True, seed=cfg.seed,
        drop_last=True, num_workers=cfg.num_workers,
    )

    model = build_ft_cls(cfg)
    sample = next(iter(train_loader))
    params, stats = init_variables(model, (jnp.asarray(sample["points"]),),
                                   cfg.seed)

    if cfg.resume:
        # bootstrap backbone from a pretrain checkpoint
        ckpt_path = (cfg.pc_model_file if "/" in cfg.pc_model_file
                     else run.model_path(cfg.pc_model_file))
        common.warn_patch_compat(ckpt_path, cfg, logger)
        raw = load_checkpoint(ckpt_path)
        pre_params, pre_stats = common.pc_checkpoint_trees(raw)
        params = restore_backbone(
            params, pre_params, ("stem", "encoder"), log=logger.write
        )
        if pre_stats:
            stats = restore_backbone(
                stats, pre_stats, ("stem", "encoder"),
                log=lambda m: None,
            )

    state, tx = create_state(cfg, params, stats)
    state, start_epoch, last_meta = common.resume_training_state(
        run, state, logger, cfg
    )
    state = place_state(state, mesh)
    step = make_cls_step(cfg, model, tx)
    eval_step = make_cls_eval(model)
    schedule = Schedule(cfg)

    if cfg.eval_only:
        # reference `--eval` mode: load model_best and report test accuracy
        best = load_checkpoint(run.model_path("model_best"), template=state)
        acc = evaluate(
            eval_step, best.params, best.batch_stats, test_set,
            cfg.test_batch_size, mesh,
        )
        logger.write(f"eval-only: test acc {acc:.4f}")
        return {"best_acc": acc, "best_epoch": -1}

    best_acc = last_meta.get("best_acc", 0.0)
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

        test_acc = evaluate(
            eval_step, state.params, state.batch_stats, test_set,
            cfg.test_batch_size, mesh,
        )
        if test_acc > best_acc:
            best_acc, best_epoch = test_acc, epoch
            save_checkpoint(
                run.model_path("model_best"),
                jax.device_get(state),
                {"epoch": epoch, "test_acc": test_acc, "kind": "ft_cls"},
            )
        logger.write(
            f"epoch {epoch}/{cfg.epochs}: train loss {loss_m.avg:.4f} "
            f"acc {acc_m.avg:.4f} | test acc {test_acc:.4f} "
            f"(best {best_acc:.4f}@{best_epoch}) lr {lr:.5f} "
            f"{train_time:.1f}s"
        )
        logger.metrics(
            epoch, lr=lr, train_loss=loss_m.avg, train_acc=acc_m.avg,
            test_acc=test_acc, best_acc=best_acc, train_time=train_time,
        )
        common.save_rolling(
            run, state, epoch, cfg,
            {"test_acc": test_acc, "best_acc": best_acc,
             "best_epoch": best_epoch, "kind": "ft_cls"},
        )
    logger.write(f"final best test acc {best_acc:.4f} at epoch {best_epoch}")
    if cfg.dump_feats:
        from vipformer_tpu.train import make_feats_fn

        feats, labels = common.extract_features(
            make_feats_fn(model), state.params, state.batch_stats,
            test_set, cfg.test_batch_size, mesh, collate_cls,
        )
        common.dump_feats_artifact(run, logger, "ft", feats, labels)
    return {"best_acc": best_acc, "best_epoch": best_epoch}


if __name__ == "__main__":
    main(config_from_args(ft_dataset="ModelNet40"))
