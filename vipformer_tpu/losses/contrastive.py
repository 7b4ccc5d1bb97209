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


def nt_xent_grouped(
    z0: Array, z1: Array, num_groups: int, temperature: float = 0.1
) -> Array:
    """NT-Xent with negatives restricted to contiguous batch groups.

    With `num_groups` equal to the data-axis size and the batch laid out
    shard-contiguously, this reproduces the reference's per-rank-negatives
    DDP semantics exactly (lightly NTXentLoss on each rank's local batch,
    `pretrain.py:155,196-202`) while staying a single global jit: the vmapped
    group losses fall entirely on their own shards, so XLA inserts no
    cross-device communication for them. `num_groups=1` gives global
    negatives (the `Config.global_negatives` upgrade path).
    """
    if num_groups <= 1:
        return nt_xent_loss(z0, z1, temperature)
    b = z0.shape[0]
    assert b % num_groups == 0, (b, num_groups)
    g = b // num_groups
    z0g = z0.reshape(num_groups, g, -1)
    z1g = z1.reshape(num_groups, g, -1)
    losses = jax.vmap(lambda a, c: nt_xent_loss(a, c, temperature))(z0g, z1g)
    return jnp.mean(losses)
