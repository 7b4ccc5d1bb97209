"""Classification / segmentation losses.

Both label-smoothing conventions present in the reference are provided:
* `smoothed_cross_entropy` — torch `CrossEntropyLoss(label_smoothing=eps)`
  semantics (eps mass spread over *all* classes, target included), used by
  the finetune loops (`ft_cls.py:145`, `ft_partseg.py:128`);
* `partseg_smoothed_loss` — the reference's hand-rolled variant
  (`utils.py:379-395`) which puts eps/(n-1) on *non-target* classes only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def smoothed_cross_entropy(
    logits: Array, labels: Array, smoothing: float = 0.0
) -> Array:
    """Mean CE over leading dims; logits [..., C], labels [...] int."""
    logits = logits.astype(jnp.float32)
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1).squeeze(-1)
    if smoothing == 0.0:
        return jnp.mean(nll)
    smooth = -jnp.mean(logp, axis=-1)  # eps/n mass on every class
    loss = (1.0 - smoothing) * nll + smoothing * smooth
    return jnp.mean(loss)


def partseg_smoothed_loss(
    logits: Array, labels: Array, smoothing: bool = True, eps: float = 0.2
) -> Array:
    """Reference `partseg_loss` (`utils.py:379-395`): one-hot*(1-eps) plus
    eps/(n-1) on the other classes."""
    logits = logits.reshape(-1, logits.shape[-1]).astype(jnp.float32)
    labels = labels.reshape(-1)
    if not smoothing:
        return smoothed_cross_entropy(logits, labels, 0.0)
    n = logits.shape[-1]
    one_hot = jax.nn.one_hot(labels, n, dtype=jnp.float32)
    target = one_hot * (1.0 - eps) + (1.0 - one_hot) * eps / (n - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(target * logp, axis=-1))
