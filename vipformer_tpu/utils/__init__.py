"""Small shared utilities."""

from __future__ import annotations

import jax
import numpy as np


def param_count(params) -> int:
    """Total number of parameters in a pytree (matches torch
    sum(p.numel() for p in model.parameters()); running BN stats live in the
    separate 'batch_stats' collection and are excluded, like torch buffers)."""
    return int(
        sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    )


def one_hot_np(labels: np.ndarray, num_classes: int) -> np.ndarray:
    out = np.zeros((labels.shape[0], num_classes), dtype=np.float32)
    out[np.arange(labels.shape[0]), labels.reshape(-1)] = 1.0
    return out
