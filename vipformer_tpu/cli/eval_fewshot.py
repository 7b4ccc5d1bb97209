"""Few-shot episodic evaluation entry point (reference `eval_fewshot.py`).

Loads a pretrained point model, extracts backbone features for the full
train pool once (batched, on device), then runs `n_runs` K-way/N-shot
episodes with StandardScaler + linear SVM per episode.
"""

from __future__ import annotations

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
from vipformer_tpu.evaluation import fewshot_eval
from vipformer_tpu.models import build_pc_model
from vipformer_tpu.train import init_variables, load_checkpoint, make_feats_fn


def main(cfg: Config) -> dict:
    run, logger, mesh = setup(cfg, snapshot_sources=False)
    logger.write(
        f"fewshot eval on {cfg.ft_dataset}: n_runs={cfg.n_runs} "
        f"k_way={cfg.k_way} n_shot={cfg.n_shot} n_query={cfg.n_query}"
    )
    ds_cls = {"ModelNet40": ModelNet40SVM, "ScanObjectNN": ScanObjectNNSVM}[
        cfg.ft_dataset
    ]
    pool = ds_cls(cfg.data_dir, "train", cfg.num_test_points)

    if cfg.fewshot_model == "ft":
        from vipformer_tpu.models import build_ft_cls

        model = build_ft_cls(cfg)  # backbone_feats of the finetuned model
    else:
        model = build_pc_model(cfg)
    sample_pts, _ = pool.get(0)
    params, stats = init_variables(
        model, (jnp.asarray(sample_pts[None]),), cfg.seed
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

    feats_fn = make_feats_fn(model)
    feats, labels = extract_features(
        feats_fn, params, stats, pool, cfg.test_batch_size, mesh,
        collate_points_labels,
    )
    mean, std, accs = fewshot_eval(
        feats, labels, cfg.k_way, cfg.n_shot, cfg.n_query, cfg.n_runs,
        c=cfg.svm_coff, seed=cfg.seed,
    )
    logger.write(f"acc: {mean:.2f} +/- {std:.2f} over {cfg.n_runs} runs")
    return {"mean": mean, "std": std, "accs": accs}


if __name__ == "__main__":
    main(config_from_args())
