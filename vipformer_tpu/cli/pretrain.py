"""Contrastive pretraining entry point (reference `pretrain.py`).

DDP-era mechanics translated to the mesh runtime: one process, one jitted
step over the global batch sharded across the data axis; the per-epoch SVM
linear probe runs once on device (the reference redundantly ran sklearn on
every rank). Checkpoints on new-best probe accuracy, exactly like the
reference's gate (`pretrain.py:281-290`).

Usage: python -m vipformer_tpu.cli.pretrain --epochs 2 --batch_size 32 ...
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from vipformer_tpu.cli.common import (
    collate_points_labels,
    extract_features,
    round_up_batch,
    setup,
)
from vipformer_tpu.config import Config, config_from_args
from vipformer_tpu.data import (
    Loader,
    ModelNet40SVM,
    ScanObjectNNSVM,
    ShapeNetRender,
    collate_pretrain,
)
from vipformer_tpu.evaluation import fit_svm
from vipformer_tpu.models import build_img_model, build_pc_model
from vipformer_tpu.parallel import data_axis_size, place_state, shard_batch
from vipformer_tpu.train import (
    Schedule,
    create_state,
    init_variables,
    load_checkpoint,
    make_feats_fn,
    make_pretrain_step,
    save_checkpoint,
)
from vipformer_tpu.train.meters import AverageMeter


def probe_sets(cfg: Config):
    ds_cls = {"ModelNet40": ModelNet40SVM, "ScanObjectNN": ScanObjectNNSVM}[
        cfg.pt_dataset
    ]
    train = ds_cls(cfg.data_dir, "train", cfg.num_test_points)
    test = ds_cls(cfg.data_dir, "test", cfg.num_test_points)
    return train, test


def main(cfg: Config) -> dict:
    run, logger, mesh = setup(cfg)
    batch_size = round_up_batch(cfg.batch_size, mesh)

    train_set = ShapeNetRender(
        cfg.data_dir, cfg.img_height, cfg.img_width, cfg.num_pt_points,
        synthetic_size=cfg.synthetic_size, raw_views=cfg.device_augs,
    )
    from vipformer_tpu.data import collate_pretrain_raw

    train_loader = Loader(
        train_set, batch_size,
        collate_pretrain_raw if cfg.device_augs else collate_pretrain,
        shuffle=True, seed=cfg.seed, drop_last=True,
        num_workers=cfg.num_workers,
    )
    probe_train, probe_test = probe_sets(cfg)
    logger.write(
        f"pretrain set: {len(train_set)} samples "
        f"({'synthetic' if getattr(train_set, 'synthetic', False) else 'real'}), "
        f"probe: {cfg.pt_dataset} {len(probe_train)}/{len(probe_test)}"
    )

    pc_model = build_pc_model(cfg)
    use_img = cfg.modality != "imc-only"
    img_model = build_img_model(cfg) if use_img else None

    sample = next(iter(train_loader))
    sample_pc = sample["pc_raw"] if cfg.device_augs else sample["pc_t1"]
    pc_params, pc_stats = init_variables(
        pc_model, (jnp.asarray(sample_pc),), cfg.seed
    )
    params = {"pc": pc_params}
    stats = {"pc": pc_stats}
    if use_img:
        img_params, img_stats = init_variables(
            img_model, (jnp.asarray(sample["imgs"]),), cfg.seed + 10
        )
        params["img"] = img_params
        stats["img"] = img_stats

    state, tx = create_state(cfg, params, stats)
    start_epoch = 0
    best_acc, best_epoch = 0.0, -1
    if cfg.resume:
        import os as _os

        # prefer the rolling last-epoch snapshot over the best-probe one:
        # after a mid-run kill "best" may be many epochs stale (the
        # reference resume had the same weakness, `pretrain.py:95-101` —
        # weights of the best epoch only)
        path = run.model_path(cfg.pc_model_file)
        last = run.model_path("pc_model_last")
        if cfg.pc_model_file == "pc_model_best" and _os.path.exists(last):
            path = last
        if _os.path.exists(path):
            restored = load_checkpoint(path, template=state)
            state = restored
            from vipformer_tpu.train import load_metadata

            meta = load_metadata(path)
            start_epoch = meta.get("epoch", -1) + 1
            # restore the best-probe tracker, else the first post-resume
            # epoch silently overwrites pc_model_best with a worse model
            # (observed in the r4 soak: 0.77@110 clobbered 0.80)
            best_acc = float(meta.get("best_acc", 0.0))
            best_epoch = int(meta.get("best_epoch", -1))
            if best_epoch < 0:
                # older snapshots lack the fields; fall back to the best
                # checkpoint's own metadata
                bp = run.model_path("pc_model_best")
                if _os.path.exists(bp):
                    bmeta = load_metadata(bp)
                    best_acc = float(bmeta.get("svm_test_acc", 0.0))
                    best_epoch = int(bmeta.get("epoch", -1))
            logger.write(
                f"resumed from {path} at epoch {start_epoch} "
                f"(best probe {best_acc:.4f}@{best_epoch})"
            )
        else:
            # a run killed before its first save has nothing to resume;
            # start fresh rather than crash (matters for unattended
            # requeue loops — tools/run_queue.py retries)
            logger.write(f"resume requested but {path} missing: fresh start")
    state = place_state(state, mesh)

    step = make_pretrain_step(
        cfg, pc_model, img_model, tx, neg_groups=data_axis_size(mesh)
    )
    feats_fn = make_feats_fn(pc_model)
    schedule = Schedule(cfg)

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
        meters = {k: AverageMeter() for k in ("loss", "loss_imid", "loss_cmid")}
        t0 = time.time()
        from vipformer_tpu.data.pipeline import prefetch_to_device

        for i, batch in enumerate(
            prefetch_to_device(iter(train_loader), mesh)
        ):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, lr, sub)
            for k, m in meters.items():
                m.update(float(metrics[k]), batch_size)
            if i % cfg.print_freq == 0:
                logger.write(
                    f"epoch {epoch}/{cfg.epochs} batch {i}/{len(train_loader)} "
                    f"<{cfg.modality}> imid {meters['loss_imid'].avg:.4f} "
                    f"cmid {meters['loss_cmid'].avg:.4f} "
                    f"total {meters['loss'].avg:.4f}"
                )
        train_time = time.time() - t0
        epoch_metric = meters["loss"].avg

        # --- SVM linear probe (the continuous quality gate)
        t0 = time.time()
        pc_params_eval = state.params["pc"]
        pc_stats_eval = state.batch_stats["pc"]
        tr_feats, tr_labels = extract_features(
            feats_fn, pc_params_eval, pc_stats_eval, probe_train,
            cfg.test_batch_size, mesh, collate_points_labels,
        )
        te_feats, te_labels = extract_features(
            feats_fn, pc_params_eval, pc_stats_eval, probe_test,
            cfg.test_batch_size, mesh, collate_points_labels,
        )
        svm = fit_svm(tr_feats, tr_labels, c=cfg.svm_coff)
        test_acc = svm.score(te_feats, te_labels)
        test_time = time.time() - t0

        if test_acc > best_acc:
            best_acc, best_epoch = test_acc, epoch
            logger.write(
                f"new best probe acc {best_acc:.4f} at epoch {epoch}; saving"
            )
            save_checkpoint(
                run.model_path("pc_model_best"),
                jax.device_get(state),
                {"epoch": epoch, "svm_test_acc": test_acc, "kind": "pretrain"},
            )
        if cfg.save_freq and (epoch + 1) % cfg.save_freq == 0:
            host_state = jax.device_get(state)
            meta = {"epoch": epoch, "svm_test_acc": test_acc,
                    "best_acc": best_acc, "best_epoch": best_epoch,
                    "kind": "pretrain"}
            save_checkpoint(
                run.model_path(f"pc_model_epoch{epoch}"), host_state, meta
            )
            # rolling snapshot --resume restarts from (kill-safe: the save
            # is atomic via os.replace)
            save_checkpoint(run.model_path("pc_model_last"), host_state, meta)
        logger.write(
            f"epoch {epoch}: probe acc {test_acc:.4f} (best {best_acc:.4f}"
            f"@{best_epoch}) lr {lr:.5f} train {train_time:.1f}s "
            f"probe {test_time:.1f}s"
        )
        logger.metrics(
            epoch,
            lr=lr,
            pretrain_loss=meters["loss"].avg,
            imid_loss=meters["loss_imid"].avg,
            cmid_loss=meters["loss_cmid"].avg,
            svm_test_acc=test_acc,
            svm_best_acc=best_acc,
            train_time=train_time,
            test_time=test_time,
        )
    logger.write(f"final best probe acc {best_acc:.4f} at epoch {best_epoch}")
    if cfg.dump_feats and cfg.epochs > start_epoch:
        from vipformer_tpu.cli.common import dump_feats_artifact

        # te_feats/te_labels hold the last probe epoch's test-split features
        dump_feats_artifact(run, logger, "pt", te_feats, te_labels)
    return {"best_acc": best_acc, "best_epoch": best_epoch}


if __name__ == "__main__":
    main(config_from_args())
