"""Functional training state."""

from __future__ import annotations

from typing import Any

import flax.struct


@flax.struct.dataclass
class TrainState:
    """One pytree carrying everything a jitted step mutates.

    params: f32 master weights (compute casts to bf16 inside the model).
    batch_stats: BatchNorm running statistics (torch "buffers").
    opt_state: optax state (with dynamic lr hyperparameter).
    step: global step counter.
    """

    params: Any
    batch_stats: Any
    opt_state: Any
    step: Any
