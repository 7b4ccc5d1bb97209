"""Jitted train/eval steps for every task, and state construction.

TPU design (vs. the reference's per-rank DDP loops, SURVEY.md §2.6):
* one jit per task compiled over the *global* batch; inputs arrive sharded
  over the mesh's data axis (parallel/sharding.py) and XLA inserts the
  gradient reductions — there is no explicit allreduce anywhere;
* f32 master params, bf16 compute inside the models (`Config.compute_dtype`)
  — replacing torch AMP autocast + GradScaler (`pretrain.py:154,209-211`);
  bf16's exponent range needs no loss scaling;
* donated state: each step consumes and reuses its input buffers;
* dynamic scalars (lr) ride in optimizer hyperparams, so epoch scheduling
  never retraces;
* the NT-Xent negative pool follows the reference's per-rank semantics via
  group-restricted loss (losses/contrastive.py) unless
  `Config.global_negatives` upgrades it.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vipformer_tpu.config import Config
from vipformer_tpu.losses import (
    nt_xent_grouped,
    smoothed_cross_entropy,
)
from vipformer_tpu.train.optim import build_optimizer, set_learning_rate
from vipformer_tpu.train.state import TrainState

Array = jax.Array

# ShapeNetPart category -> part-id metadata (reference utils.py:33-43)
SEG_NUM = (4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3)
INDEX_START = (0, 4, 6, 8, 12, 16, 19, 22, 24, 28, 30, 36, 38, 41, 44, 47)


def category_part_mask() -> np.ndarray:
    """[16, 50] bool mask: which part ids belong to each object category."""
    mask = np.zeros((16, 50), dtype=bool)
    for c in range(16):
        mask[c, INDEX_START[c] : INDEX_START[c] + SEG_NUM[c]] = True
    return mask


def refine_partseg_pred(logits: Array, obj_labels: Array) -> Array:
    """Category-masked prediction: argmax restricted to the parts of each
    sample's object category.

    Vectorized replacement for the reference's per-sample host loop
    (`ft_partseg.py:163-169,279-285`): one gather of a precomputed [16, 50]
    mask + masked argmax, fully inside jit.
    """
    mask = jnp.asarray(category_part_mask())[obj_labels]  # [B, 50]
    neg = jnp.finfo(jnp.float32).min
    masked = jnp.where(
        mask[:, None, :], logits.astype(jnp.float32), neg
    )
    return jnp.argmax(masked, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# state construction


def init_variables(model, sample_args, seed: int = 0):
    keys = {
        "params": jax.random.key(seed),
        "dropout": jax.random.key(seed + 1),
        "fps": jax.random.key(seed + 2),
    }
    variables = model.init(keys, *sample_args)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return params, batch_stats


def create_state(cfg: Config, params, batch_stats) -> tuple[TrainState, Any]:
    tx = build_optimizer(cfg)
    opt_state = tx.init(params)
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )
    return state, tx


def _apply_train(model, params, batch_stats, x, rngs):
    out, updated = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x,
        deterministic=False,
        rngs=rngs,
        mutable=["batch_stats"],
    )
    return out, updated.get("batch_stats", {})


def _rngs(key, n=2):
    ks = jax.random.split(key, n)
    return {"dropout": ks[0], "fps": ks[1]}


def _make_step(loss_fn, tx):
    """Wrap a loss_fn(params, batch_stats, batch, key) -> (loss, (stats,
    metrics)) into a jitted, state-donating optimizer step."""

    def step(state: TrainState, batch, lr, key):
        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, key)
        opt_state = set_learning_rate(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        return (
            TrainState(params, new_stats, opt_state, state.step + 1),
            metrics,
        )

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# pretraining (reference pretrain.py:158-226)


def make_pretrain_step(cfg: Config, pc_model, img_model, tx, neg_groups: int):
    """Returns jit(step)(state, batch, lr, key) -> (state, metrics).

    state.params/batch_stats are {'pc': ..., 'img': ...} (img absent for
    imc-only). One optimizer spans both branches (pretrain.py:106).
    """
    modality = cfg.modality
    cmid_weight = cfg.cmid_weight
    groups = 1 if cfg.global_negatives else neg_groups
    device_augs = cfg.device_augs

    def loss_fn(params, batch_stats, batch, key):
        imgs_in = batch.get("imgs")
        if device_augs:
            # raw clouds (and uint8 images) in; both augmented point views
            # and the image jitter chain are made on-device
            from vipformer_tpu.data.augment_device import (
                image_pretrain_chain,
                pretrain_two_views,
            )

            k_aug, key = jax.random.split(key)
            t1_in, t2_in = pretrain_two_views(batch["pc_raw"], k_aug)
            if imgs_in is not None and jnp.issubdtype(
                imgs_in.dtype, jnp.integer
            ):
                k_img_aug, key = jax.random.split(key)
                imgs_in = image_pretrain_chain(imgs_in, k_img_aug)
        else:
            t1_in, t2_in = batch["pc_t1"], batch["pc_t2"]
        b = t1_in.shape[0]
        pc = jnp.concatenate([t1_in, t2_in], axis=0)
        k_pc, k_img = jax.random.split(key)
        (pc_proj, _), pc_stats = _apply_train(
            pc_model, params["pc"], batch_stats["pc"], pc, _rngs(k_pc)
        )
        # the two views sit at [0:b] and [b:2b]; grouped negatives need
        # shard-contiguous layout, which concatenation preserves per view
        t1, t2 = pc_proj[:b], pc_proj[b:]
        new_stats = {"pc": pc_stats}
        metrics = {}
        if modality == "imc-only":
            loss_imid = nt_xent_grouped(t1, t2, groups)
            loss_cmid = jnp.zeros(())
        else:
            loss_imid = (
                nt_xent_grouped(t1, t2, groups)
                if modality == "both"
                else jnp.zeros(())
            )
            (img_proj, _), img_stats = _apply_train(
                img_model, params["img"], batch_stats["img"],
                imgs_in, _rngs(k_img),
            )
            new_stats["img"] = img_stats
            loss_cmid = nt_xent_grouped((t1 + t2) / 2.0, img_proj, groups)
        total = loss_imid + cmid_weight * loss_cmid
        metrics.update(
            loss=total, loss_imid=loss_imid, loss_cmid=loss_cmid
        )
        return total, (new_stats, metrics)

    return _make_step(loss_fn, tx)


def make_feats_fn(model):
    """jit: (params, batch_stats, pts) -> backbone feats [B, 2D] (eval mode)."""

    @jax.jit
    def feats(params, batch_stats, x):
        _, backbone = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            deterministic=True,
        )
        return backbone

    return feats


# ---------------------------------------------------------------------------
# classification finetune (reference ft_cls.py:151-213)


def make_cls_step(cfg: Config, model, tx):
    def loss_fn(params, batch_stats, batch, key):
        (logits, _), new_stats = _apply_train(
            model, params, batch_stats, batch["points"], _rngs(key)
        )
        loss = smoothed_cross_entropy(logits, batch["labels"], 0.2)
        acc = jnp.mean(
            (jnp.argmax(logits, -1) == batch["labels"]).astype(jnp.float32)
        )
        return loss, (new_stats, {"loss": loss, "acc": acc})

    return _make_step(loss_fn, tx)


def make_cls_eval(model):
    @jax.jit
    def eval_step(params, batch_stats, points):
        logits, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            points,
            deterministic=True,
        )
        return jnp.argmax(logits, -1)

    return eval_step


# ---------------------------------------------------------------------------
# part segmentation (reference ft_partseg.py:135-247)


def make_partseg_step(cfg: Config, model, tx):
    num_obj = 16

    def loss_fn(params, batch_stats, batch, key):
        onehot = jax.nn.one_hot(batch["obj_labels"], num_obj)
        (logits), new_stats = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["points"],
            onehot,
            deterministic=False,
            rngs=_rngs(key),
            mutable=["batch_stats"],
        )
        new_stats = new_stats.get("batch_stats", {})
        loss = smoothed_cross_entropy(
            logits.reshape(-1, logits.shape[-1]),
            batch["seg"].reshape(-1),
            0.2,
        )
        refined = refine_partseg_pred(logits, batch["obj_labels"])
        acc = jnp.mean((refined == batch["seg"]).astype(jnp.float32))
        return loss, (new_stats, {"loss": loss, "acc": acc})

    return _make_step(loss_fn, tx)


def make_partseg_eval(model):
    @jax.jit
    def eval_step(params, batch_stats, points, obj_labels):
        onehot = jax.nn.one_hot(obj_labels, 16)
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            points,
            onehot,
            deterministic=True,
        )
        refined = refine_partseg_pred(logits, obj_labels)
        return logits, refined

    return eval_step


# ---------------------------------------------------------------------------
# semantic segmentation (capability present but unshipped in the reference;
# see SURVEY.md §2.1 "missing-but-implied entry point")


def make_semseg_step(cfg: Config, model, tx):
    def loss_fn(params, batch_stats, batch, key):
        logits, new_stats = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["points"],
            deterministic=False,
            rngs=_rngs(key),
            mutable=["batch_stats"],
        )
        new_stats = new_stats.get("batch_stats", {})
        loss = smoothed_cross_entropy(
            logits.reshape(-1, logits.shape[-1]),
            batch["seg"].reshape(-1),
            0.2,
        )
        acc = jnp.mean(
            (jnp.argmax(logits, -1) == batch["seg"]).astype(jnp.float32)
        )
        return loss, (new_stats, {"loss": loss, "acc": acc})

    return _make_step(loss_fn, tx)


def make_semseg_eval(model):
    @jax.jit
    def eval_step(params, batch_stats, points):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats},
            points,
            deterministic=True,
        )
        return jnp.argmax(logits, -1)

    return eval_step
