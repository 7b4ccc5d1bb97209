"""NT-Xent (normalized temperature-scaled cross entropy) contrastive loss.

In-repo replacement for the reference's external `lightly.loss.NTXentLoss`
(`pretrain.py:5,155`, temperature 0.1, no memory bank, no cross-rank
gathering): SimCLR's full-batch form over the 2B concatenated views —
cosine-similarity logits, diagonal masked, positives at offset B.

TPU notes: the similarity matrix is one [2B, D] x [D, 2B] MXU matmul; the
log-softmax runs in f32. Under pjit with batch-sharded inputs this computes
*global* negatives across the data axis (XLA all-gathers as needed); the
reference's DDP semantics are per-rank negatives — the trainer reproduces
those exactly by wrapping this loss in shard_map when
`Config.global_negatives=False` (see train/trainer.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def nt_xent_loss(z0: Array, z1: Array, temperature: float = 0.1) -> Array:
    """SimCLR NT-Xent between two aligned batches of embeddings.

    Args:
      z0, z1: [B, D] paired views (row i of z0 is positive with row i of z1).
      temperature: softmax temperature (reference uses 0.1, pretrain.py:155).
    Returns:
      scalar mean loss over all 2B anchors.
    """
    z0 = z0.astype(jnp.float32)
    z1 = z1.astype(jnp.float32)
    b = z0.shape[0]
    z = jnp.concatenate([z0, z1], axis=0)  # [2B, D]
    z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
    logits = (
        jnp.einsum("id,jd->ij", z, z, preferred_element_type=jnp.float32)
        / temperature
    )
    n = 2 * b
    diag = jnp.eye(n, dtype=bool)
    logits = jnp.where(diag, jnp.finfo(jnp.float32).min, logits)
    labels = (jnp.arange(n) + b) % n
    logp = jax.nn.log_softmax(logits, axis=-1)
    pos = jnp.take_along_axis(logp, labels[:, None], axis=-1)
    return -jnp.mean(pos)
