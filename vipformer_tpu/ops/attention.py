"""Scaled dot-product attention, structured for the TPU compute path.

One function serves every attention site in the framework (the reference has
three near-identical einsum stacks: `core/modules.py:84-95`,
`pointcloud/partseg.py:70-84`, `pointcloud/semseg.py` — here there is one).

Design notes (TPU):
* logits and softmax run in f32 regardless of the compute dtype — bf16
  softmax loses too much mass at these scales — then the attn·V matmul drops
  back to the compute dtype for the MXU;
* both matmuls are `einsum`s over [B, H, N, C] with static shapes, which XLA
  tiles straight onto the MXU and fuses with the surrounding bias/dropout;
* a Pallas fused-attention kernel can be slotted behind the same signature
  (see `vipformer_tpu.ops.pallas.attention`) for the large-M cross-attention
  case (e.g. 50k-token Fourier image inputs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def dot_product_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    scale: float,
    pad_mask: Array | None = None,
    dropout_rate: float = 0.0,
    dropout_rng: Array | None = None,
    deterministic: bool = True,
    out_dtype=None,
) -> Array:
    """Multi-head attention core.

    Args:
      q: [B, H, N, Ck]
      k: [B, H, M, Ck]
      v: [B, H, M, Cv]
      scale: logit scale (reference uses (Ck/H)^-0.5 per-head width).
      pad_mask: optional bool [B, M]; True marks padding keys to be masked
        out (reference `core/modules.py:86-89`).
      dropout_rate: post-softmax attention dropout (reference
        `core/modules.py:91-93` — dropout on the *normalized* attn matrix).
    Returns:
      [B, H, N, Cv] in `out_dtype` (defaults to v.dtype).
    """
    out_dtype = out_dtype or v.dtype

    from vipformer_tpu.ops.pallas.attention import (
        fused_attention,
        fused_attention_enabled,
        fused_attention_fits,
    )

    if fused_attention_enabled(pad_mask, dropout_rate, deterministic) and (
        fused_attention_fits(
            q.shape[2], k.shape[2], q.shape[3], v.shape[3], out_dtype
        )
    ):
        return fused_attention(
            q.astype(out_dtype), k.astype(out_dtype), v.astype(out_dtype),
            scale=float(scale),
        )

    logits = jnp.einsum(
        "bhnc,bhmc->bhnm", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * jnp.float32(scale)
    if pad_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(pad_mask[:, None, None, :], neg, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, attn.shape
        )
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)
    attn = attn.astype(out_dtype)
    out = jnp.einsum(
        "bhnm,bhmc->bhnc", attn, v.astype(out_dtype),
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype)
