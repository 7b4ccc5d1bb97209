"""Serving-oriented inference wrapper.

The training CLIs work in fixed global batches; serving sees ragged request
sizes. `Predictor` compiles one executable per padding bucket (powers of two
up to `max_batch`) and routes requests to the smallest fitting bucket, so
arbitrary request sizes never trigger recompilation and the MXU always sees
static shapes. Works for any of the model families.
"""

from __future__ import annotations

import bisect
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class Predictor:
    """Bucketed, jit-compiled batch predictor.

    Args:
      apply_fn: (variables, batch_array) -> outputs pytree, eval mode.
      variables: model variables pytree.
      max_batch: largest supported request size (also the largest bucket).
      buckets: optional explicit bucket sizes (sorted ascending).
    """

    def __init__(
        self,
        apply_fn: Callable,
        variables,
        max_batch: int = 256,
        buckets: Sequence[int] | None = None,
    ):
        self.variables = variables
        if buckets is None:
            buckets = []
            b = 1
            while b < max_batch:
                buckets.append(b)
                b *= 2
            buckets.append(max_batch)
        self.buckets = sorted(set(buckets))
        self._fn = jax.jit(apply_fn)

    def _bucket(self, n: int) -> int:
        i = bisect.bisect_left(self.buckets, n)
        if i == len(self.buckets):
            raise ValueError(
                f"request of {n} exceeds max bucket {self.buckets[-1]}"
            )
        return self.buckets[i]

    def __call__(self, batch: np.ndarray):
        """batch [n, ...] -> outputs with the padding stripped."""
        n = batch.shape[0]
        if n == 0:
            raise ValueError("empty batch")
        b = self._bucket(n)
        if b != n:
            pad = np.repeat(batch[-1:], b - n, axis=0)
            batch = np.concatenate([batch, pad], axis=0)
        out = self._fn(self.variables, jnp.asarray(batch))
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[:n], out)

    def warmup(self, sample: np.ndarray) -> None:
        """Pre-compile every bucket from one example sample (call before
        taking traffic; each bucket is a separate executable)."""
        for b in self.buckets:
            batch = np.repeat(sample[None], b, axis=0)
            self._fn(self.variables, jnp.asarray(batch))


def classifier_predictor(model, variables, max_batch: int = 256) -> Predictor:
    def apply_fn(v, x):
        logits, feats = model.apply(v, x, deterministic=True)
        return {"logits": logits, "backbone_feats": feats}

    return Predictor(apply_fn, variables, max_batch)


def partseg_predictor(model, variables, max_batch: int = 128) -> Predictor:
    from vipformer_tpu.train.trainer import refine_partseg_pred

    def apply_fn(v, batch):
        pts, onehot, obj = batch
        logits = model.apply(v, pts, onehot, deterministic=True)
        return {
            "logits": logits,
            "refined": refine_partseg_pred(logits, obj),
        }

    class _P(Predictor):
        def __call__(self, pts, obj_labels):
            n = pts.shape[0]
            b = self._bucket(n)
            if b != n:
                pts = np.concatenate(
                    [pts, np.repeat(pts[-1:], b - n, axis=0)], axis=0
                )
                obj_labels = np.concatenate(
                    [obj_labels, np.repeat(obj_labels[-1:], b - n)], axis=0
                )
            onehot = jax.nn.one_hot(jnp.asarray(obj_labels), 16)
            out = self._fn(
                self.variables,
                (jnp.asarray(pts), onehot, jnp.asarray(obj_labels)),
            )
            return jax.tree_util.tree_map(lambda x: np.asarray(x)[:n], out)

    return _P(apply_fn, variables, max_batch)
