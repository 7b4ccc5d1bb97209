"""Shared CLI plumbing: run setup, batched feature extraction, eval loops."""

from __future__ import annotations

import numpy as np

import jax

from vipformer_tpu.config import Config
from vipformer_tpu.data import Loader, pad_batch
from vipformer_tpu.parallel import make_mesh, shard_batch
from vipformer_tpu.train.logging import Logger, RunDir


def setup(cfg: Config, snapshot_sources: bool = True):
    """Run directory + logger + device mesh (replaces the reference's
    `utils.init` + `mp.spawn` + process-group setup).

    Multi-host: when JAX coordinator env vars are present
    (JAX_COORDINATOR_ADDRESS etc., set by TPU pod launchers),
    jax.distributed.initialize() joins the job before the mesh is built —
    the NCCL process-group equivalent.
    """
    from vipformer_tpu.parallel import maybe_initialize_distributed
    from vipformer_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    multi_process = maybe_initialize_distributed()
    run = RunDir(cfg.run_dir, cfg.proj_name, cfg.exp_name)
    logger = Logger(run, cfg.proj_name, to_file=cfg.log_to_file)
    from vipformer_tpu.train.logging import maybe_wandb

    logger.wandb = maybe_wandb(cfg, logger)
    mesh = make_mesh(cfg.num_devices, cfg.model_axis)
    logger.write(
        f"mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} "
        f"{mesh.devices.flat[0].platform} device(s)"
        + (
            f" [process {jax.process_index()}/{jax.process_count()}]"
            if multi_process
            else ""
        )
    )
    if snapshot_sources:
        # reference snapshots entry+model sources per run (utils.py:338-346);
        # we record the resolved config instead (sources live in git)
        import dataclasses, json, os

        with open(run.file("config.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)
    return run, logger, mesh


def warn_patch_compat(ckpt_path: str, cfg: Config, logger) -> None:
    """Loudly flag a stem-mode mismatch between a checkpoint and the config.

    Converted reference checkpoints record patch_compat=True in their
    metadata (tools/convert_torch_ckpt.py); running them with the corrected
    stem (or vice versa) silently degrades accuracy, so mismatches are
    logged as warnings at every pretrained-backbone restore."""
    from vipformer_tpu.train.checkpoint import load_metadata

    try:
        meta = load_metadata(ckpt_path)
    except Exception:
        return
    want = meta.get("patch_compat")
    if want is not None and bool(want) != cfg.patch_compat:
        logger.write(
            f"WARNING: checkpoint {ckpt_path} was trained with "
            f"patch_compat={want} but config has "
            f"patch_compat={cfg.patch_compat}; pass --patch_compat "
            f"{str(bool(want)).lower()} to match its stem "
            "(see ops/geometry.py:divide_patches)"
        )


def pc_checkpoint_trees(raw: dict):
    """Extract the point-branch (params, batch_stats|None) from a checkpoint.

    Handles the three layouts users feed the finetune/eval entry points:
    * pretrain-CLI checkpoints nest both branches under 'pc'/'img',
    * tools/convert_torch_ckpt.py output stores the pc tree directly,
    * bare param trees (no 'params' wrapper) pass through unchanged.
    """
    params = raw.get("params", raw)
    if isinstance(params, dict) and "pc" in params:
        params = params["pc"]
    stats = raw.get("batch_stats") if isinstance(raw, dict) else None
    if isinstance(stats, dict) and "pc" in stats:
        stats = stats["pc"]
    return params, stats


def round_up_batch(cfg_batch: int, mesh) -> int:
    """Global batch must divide the data axis (the reference asserts
    batch_size % world_size == 0, pretrain.py:58-59)."""
    d = mesh.shape["data"]
    if cfg_batch % d:
        raise ValueError(
            f"batch_size {cfg_batch} not divisible by data-axis size {d}"
        )
    return cfg_batch


def extract_features(feats_fn, params, batch_stats, dataset, batch_size,
                     mesh, collate):
    """Batched backbone-feature extraction over a full dataset.

    Pads the trailing batch so the jit never sees a new shape; masks the
    padding out of the returned arrays. (The reference extracts features
    with `.tolist()` per batch on every rank redundantly,
    `pretrain.py:237-249`.)"""
    from vipformer_tpu.train.checkpoint import _host_leaf

    loader = Loader(dataset, batch_size, collate, shuffle=False)
    feats, labels = [], []
    for batch in loader:
        batch, mask = pad_batch(batch, batch_size)
        sb = shard_batch(batch, mesh)
        # _host_leaf allgathers batch-sharded outputs under multi-controller
        # runtimes (np.asarray alone raises on non-addressable shards); the
        # reference instead ran the whole eval redundantly per rank
        # (`pretrain.py:237-249`)
        out = _host_leaf(feats_fn(params, batch_stats, sb["points"]))
        feats.append(out[mask])
        labels.append(batch["labels"][mask])
    return np.concatenate(feats), np.concatenate(labels)


def dump_feats_artifact(run, logger, tag: str, feats, labels) -> str:
    """Write the test-split backbone features + labels artifact.

    Reference flow: the training scripts save
    `{ft,pt}_{MN,SO}_test_feats_labels.pth` tensors that
    `visualization/show_feats.ipynb` (cells 1-11) loads for its t-SNE
    figures. Here the CLIs write `<run>/files/<tag>_test_feats_labels.npz`
    (keys `feats` [N, 2D] and `labels` [N]) behind `--dump_feats`, and
    `tools/visualization/show_feats.py --feats_file` renders it.
    """
    import os as _os

    from vipformer_tpu.train.logging import is_chief

    path = run.file(_os.path.join("files", f"{tag}_test_feats_labels.npz"))
    if is_chief():  # rank-0 write gate, as `pretrain.py:278-308`
        np.savez(path, feats=np.asarray(feats), labels=np.asarray(labels))
        logger.write(
            f"dumped {len(np.asarray(labels))} test feature vectors -> {path}"
        )
    return path


def collate_points_labels(samples):
    pts = np.stack([s[0] for s in samples])
    labels = np.asarray([s[1] for s in samples], dtype=np.int64)
    return {"points": pts, "labels": labels}


def resume_training_state(run, state, logger, cfg: Config):
    """Crash-resume for the finetune loops (pretrain has its own inline
    version, cli/pretrain.py:100-123): restore the rolling `model_last`
    snapshot — full TrainState including optimizer moments — and the
    epoch/best metadata. Returns (state, start_epoch, meta).

    The reference has no equivalent: its finetune loops can only
    bootstrap weights from a pretrain checkpoint (`ft_cls.py:92-101`)
    and restart epoch 0 after any crash.
    """
    if not cfg.resume_training:
        return state, 0, {}
    import os

    from vipformer_tpu.train import load_checkpoint, load_metadata

    path = run.model_path("model_last")
    if not os.path.exists(path):
        # killed before the first rolling save: fresh start beats a crash
        # (unattended requeue loops — tools/run_queue.py — retry us)
        logger.write(
            f"resume_training requested but {path} missing: fresh start"
        )
        return state, 0, {}
    state = load_checkpoint(path, template=state)
    meta = load_metadata(path)
    start = meta.get("epoch", -1) + 1
    logger.write(f"resumed training from {path} at epoch {start}")
    return state, start, meta


def save_rolling(run, state, epoch: int, cfg: Config, extra: dict) -> None:
    """Kill-safe rolling snapshot every `save_freq` epochs (atomic via
    os.replace inside save_checkpoint; chief-gated there too)."""
    from vipformer_tpu.train import save_checkpoint

    if cfg.save_freq and (epoch + 1) % cfg.save_freq == 0:
        save_checkpoint(
            run.model_path("model_last"),
            jax.device_get(state),
            {"epoch": epoch, **extra},
        )
