"""Optimizers with torch-matching update rules, on optax primitives.

Reference (`pretrain.py:111-124`):
* sgd  — torch SGD(lr, momentum=0.9): heavy-ball, update = -lr * buf,
* adam — torch Adam(lr, weight_decay=1e-6): *coupled* L2 (wd added to the
  gradient before the Adam transform — NOT decoupled AdamW),
* adamw — torch AdamW(lr) with its default decoupled weight decay 0.01.

The learning rate is injected as a dynamic hyperparameter
(`optax.inject_hyperparams`) so the host-side epoch schedule can set it
without retracing the jitted train step.
"""

from __future__ import annotations

import optax

from vipformer_tpu.config import Config


def _sgd(learning_rate: float, momentum: float) -> optax.GradientTransformation:
    return optax.chain(
        optax.trace(decay=momentum, nesterov=False),
        optax.scale(-learning_rate),
    )


def _adam_l2(learning_rate: float, weight_decay: float) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(weight_decay),  # coupled L2, torch Adam
        optax.scale_by_adam(eps=1e-8),
        optax.scale(-learning_rate),
    )


def _adamw(learning_rate: float, weight_decay: float) -> optax.GradientTransformation:
    return optax.chain(
        optax.scale_by_adam(eps=1e-8),
        optax.add_decayed_weights(weight_decay),  # decoupled, torch AdamW
        optax.scale(-learning_rate),
    )


def build_optimizer(cfg: Config) -> optax.GradientTransformation:
    if cfg.optim == "sgd":
        inner = optax.inject_hyperparams(_sgd)(
            learning_rate=cfg.lr, momentum=cfg.momentum
        )
    elif cfg.optim == "adam":
        inner = optax.inject_hyperparams(_adam_l2)(
            learning_rate=cfg.lr, weight_decay=1e-6
        )
    elif cfg.optim == "adamw":
        inner = optax.inject_hyperparams(_adamw)(
            learning_rate=cfg.lr, weight_decay=0.01
        )
    else:
        raise ValueError(cfg.optim)
    if cfg.grad_clip_norm is not None:
        return optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm), inner
        )
    return inner


def set_learning_rate(opt_state, lr):
    """Pure update of the lr hyperparameter in an (optionally grad-clip
    chained) inject_hyperparams optimizer state; jit-safe."""
    import jax.numpy as jnp

    lr = jnp.asarray(lr, dtype=jnp.float32)

    def _set(s):
        return s._replace(
            hyperparams={**s.hyperparams, "learning_rate": lr}
        )

    if hasattr(opt_state, "hyperparams"):
        return _set(opt_state)
    # chained with grad clip: inject_hyperparams state is the last element
    return tuple(opt_state[:-1]) + (_set(opt_state[-1]),)
