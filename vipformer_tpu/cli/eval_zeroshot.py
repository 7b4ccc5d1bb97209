"""Linear-probe + model-complexity evaluation (reference `eval_zeroshot.py`).

Loads a pretrained point model, extracts full-split backbone features,
fits a linear SVM, an RBF SVM, and a small kernel/C grid search (the
reference's `eval_zeroshot.py:86-115` protocol) — all in-repo and
on-device (evaluation/svm.py); sklearn is never required — and reports
parameter count + analytical FLOPs from XLA's cost model.
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from vipformer_tpu.cli.common import (
    collate_points_labels,
    extract_features,
    setup,
)
from vipformer_tpu.cli import common
from vipformer_tpu.config import Config, config_from_args
from vipformer_tpu.data import ModelNet40SVM, ScanObjectNNSVM
from vipformer_tpu.evaluation import complexity_report, fit_svm
from vipformer_tpu.models import build_pc_model
from vipformer_tpu.train import init_variables, load_checkpoint, make_feats_fn


def main(cfg: Config) -> dict:
    run, logger, mesh = setup(cfg, snapshot_sources=False)
    ds_cls = {"ModelNet40": ModelNet40SVM, "ScanObjectNN": ScanObjectNNSVM}[
        cfg.pt_dataset
    ]
    train_set = ds_cls(cfg.data_dir, "train", cfg.num_test_points)
    test_set = ds_cls(cfg.data_dir, "test", cfg.num_test_points)

    model = build_pc_model(cfg)
    pts0, _ = train_set.get(0)
    params, stats = init_variables(
        model, (jnp.asarray(pts0[None]),), cfg.seed
    )
    path = (cfg.pc_model_file if "/" in cfg.pc_model_file
            else run.model_path(cfg.pc_model_file))
    common.warn_patch_compat(path, cfg, logger)
    try:
        raw = load_checkpoint(path)
        pre, pre_stats = common.pc_checkpoint_trees(raw)
        from flax import serialization

        params = serialization.from_state_dict(params, pre)
        if pre_stats:
            stats = serialization.from_state_dict(stats, pre_stats)
        logger.write(f"loaded pretrained model from {path}")
    except FileNotFoundError:
        logger.write(f"WARNING: no checkpoint at {path}; evaluating raw init")

    # complexity (reference records params + fvcore FLOPs per test batch)
    batch = jnp.zeros((cfg.test_batch_size, cfg.num_test_points, 3))
    report = complexity_report(
        model, {"params": params, "batch_stats": stats}, batch
    )
    logger.write(
        f"total parameters: {report['params']:,}; "
        f"FLOPs per {cfg.test_batch_size}-batch: "
        f"{report['flops_per_batch']:,.0f}"
    )

    feats_fn = make_feats_fn(model)
    tr_feats, tr_labels = extract_features(
        feats_fn, params, stats, train_set, cfg.test_batch_size, mesh,
        collate_points_labels,
    )
    te_feats, te_labels = extract_features(
        feats_fn, params, stats, test_set, cfg.test_batch_size, mesh,
        collate_points_labels,
    )

    t0 = time.time()
    linear_acc = fit_svm(tr_feats, tr_labels, c=cfg.svm_coff).score(
        te_feats, te_labels
    )
    logger.write(
        f"linear SVM acc: {linear_acc:.4f} ({time.time() - t0:.1f}s)"
    )
    out = {"linear_acc": linear_acc, **report}

    # rbf + grid-search probes, in-repo (reference `eval_zeroshot.py:86-115`
    # used sklearn's SVC/GridSearchCV; these run on-device, backend="jax")
    from vipformer_tpu.evaluation import fit_rbf_svm, grid_search_svm

    t0 = time.time()
    rbf = fit_rbf_svm(tr_feats, tr_labels, c=cfg.svm_coff)
    out["rbf_acc"] = float(rbf.score(te_feats, te_labels))
    logger.write(
        f"rbf SVM acc: {out['rbf_acc']:.4f} ({time.time() - t0:.1f}s)"
    )
    t0 = time.time()
    grid_model, best, best_val = grid_search_svm(tr_feats, tr_labels)
    out["grid_acc"] = float(grid_model.score(te_feats, te_labels))
    out["grid_best"] = best
    logger.write(
        f"grid-search best {best} (val {best_val:.4f}) acc "
        f"{out['grid_acc']:.4f} ({time.time() - t0:.1f}s)"
    )
    return out


if __name__ == "__main__":
    main(config_from_args())
