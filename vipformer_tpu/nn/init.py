"""Parameter initializers matching the reference's (PyTorch-default) inits.

The reference never sets custom initializers except for latent/output-query
arrays (N(0, 0.02) clamp ±2, `core/modules.py:301-304,447-449`). Everything
else uses torch defaults:

* `nn.Linear` / `nn.Conv1d`: kaiming_uniform(a=√5) on weights — which reduces
  to U(-1/√fan_in, 1/√fan_in) — and the same bound on biases.
* `nn.Parameter(torch.randn(...))` (image pos-emb): standard normal.

Training-from-scratch parity depends on these distributions, so we replicate
them instead of flax defaults (lecun_normal).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.nn.initializers import Initializer


def torch_linear_kernel() -> Initializer:
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); torch kaiming_uniform(a=sqrt(5))."""
    # variance_scaling uniform draws U(-sqrt(3*scale/fan), sqrt(3*scale/fan));
    # scale=1/3 gives bound 1/sqrt(fan_in).
    return jax.nn.initializers.variance_scaling(
        1.0 / 3.0, "fan_in", "uniform"
    )


def torch_linear_bias(fan_in: int) -> Initializer:
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound
        )

    return init


def latent_init(stddev: float = 0.02, clip: float = 2.0) -> Initializer:
    """N(0, stddev) clamped to ±clip (reference `core/modules.py:447-449`)."""

    def init(key, shape, dtype=jnp.float32):
        x = stddev * jax.random.normal(key, shape, dtype)
        return jnp.clip(x, -clip, clip)

    return init


def randn_init() -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype)

    return init
