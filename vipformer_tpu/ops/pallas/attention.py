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
    from vipformer_tpu.ops.pallas.shard import sharding_active

    if sharding_active():
        # head-split [B, H, G, dh] layout has no shard_map wrapper (the
        # packed kernels are the production path); keep it single-device
        return False
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


# ---------------------------------------------------------------------------
# packed-layout flash attention
#
# The head-split kernel above needs q/k/v in [B, H, N, dh] — but the model's
# projections produce [B, N, H*dh], and the transpose that XLA folds into its
# own attention einsums becomes a real relayout copy in front of a Pallas
# call (measured 2 x 0.64 ms for k/v at [256, 1024, 256] on v5e, eating the
# kernel's entire win). This variant takes the projections' layout directly:
# heads are split INSIDE the kernel (in-VMEM reshape), and the output comes
# back as [B, G, H*dh], exactly what the o_proj consumes — zero relayouts.
#
# M is processed in chunks with running-max/sum softmax state (the standard
# flash recurrence), so the same kernel serves the flagship cross-attention
# (M=1024, single chunk) and the non-mp Fourier image path (M ~ 50k tokens,
# streamed chunk by chunk) that motivated SURVEY §7's "Pallas headroom".

# queries per program grid row; G <= this stays one block
_Q_BLOCK = 512
# kv rows per chunk: [Mc, D] k + v blocks plus [G, Mc] f32 logits in VMEM
_KV_CHUNK = 2048


def _kv_chunk_for(m: int, cap: int = _KV_CHUNK) -> int:
    """Largest divisor of m that is <= cap (m itself when m <= cap)."""
    if m <= cap:
        return m
    best = 1
    d = 1
    while d * d <= m:
        if m % d == 0:
            if d <= cap:
                best = max(best, d)
            if m // d <= cap:
                best = max(best, m // d)
        d += 1
    return best


def _packed_kernel(scale, h, q_ref, k_ref, v_ref, o_ref,
                   acc_ref, m_ref, l_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # [G, H*dh]
    k = k_ref[0]  # [Mc, H*dh]
    v = v_ref[0]
    dh = q.shape[1] // h
    # heads live on the lane axis as static 64/96-wide slices — Mosaic
    # cannot shape-cast lanes into a new axis, so the head loop is unrolled
    # (h is 4-6 everywhere in this model family)
    for head in range(h):
        sl = slice(head * dh, (head + 1) * dh)
        q_h = q[:, sl].astype(jnp.float32)  # [G, dh]
        k_h = k[:, sl].astype(jnp.float32)  # [Mc, dh]
        logits = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [G, Mc]
        m_prev = m_ref[head, :]  # [G]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
        corr = jnp.exp(m_prev - m_new)  # [G]
        p = jnp.exp(logits - m_new[:, None])  # [G, Mc]
        l_ref[head, :] = l_ref[head, :] * corr + jnp.sum(p, axis=-1)
        m_ref[head, :] = m_new
        pv = jnp.dot(
            p.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32
        )  # [G, dh]
        acc_ref[head] = acc_ref[head] * corr[:, None] + pv

    @pl.when(j == nj - 1)
    def _():
        for head in range(h):
            sl = slice(head * dh, (head + 1) * dh)
            o_ref[0, :, sl] = (
                acc_ref[head] / l_ref[head, :][:, None]
            ).astype(o_ref.dtype)


@partial(
    jax.jit, static_argnames=("num_heads", "scale", "kv_chunk", "interpret")
)
def fused_attention_packed(
    q: Array,
    k: Array,
    v: Array,
    *,
    num_heads: int,
    scale: float,
    kv_chunk: int | None = None,
    interpret: bool = False,
) -> Array:
    """Flash attention on packed layouts.

    q [B, G, H*dh], k [B, M, H*dh], v [B, M, H*dv] -> [B, G, H*dv]; no
    masking/dropout (callers gate). Requires dh == dv (true everywhere in
    this model family: reference `partseg.py:47-50` projects q/k/v to the
    same width).
    """
    b, g, d = q.shape
    m = k.shape[1]
    assert v.shape[2] == d, "packed kernel requires matching qk/v widths"
    mc = kv_chunk or _kv_chunk_for(m)
    if m % mc:
        raise ValueError(f"M={m} not divisible by kv chunk {mc}")
    h = num_heads
    dh = d // h
    ms = pl.ANY if interpret else pltpu.VMEM

    out = pl.pallas_call(
        partial(_packed_kernel, float(scale), h),
        out_shape=jax.ShapeDtypeStruct((b, g, d), v.dtype),
        grid=(b, m // mc),
        in_specs=[
            pl.BlockSpec((1, g, d), lambda i, j: (i, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((1, mc, d), lambda i, j: (i, j, 0),
                         memory_space=ms),
            pl.BlockSpec((1, mc, d), lambda i, j: (i, j, 0),
                         memory_space=ms),
        ],
        out_specs=pl.BlockSpec(
            (1, g, d), lambda i, j: (i, 0, 0), memory_space=ms
        ),
        scratch_shapes=[
            pltpu.VMEM((h, g, dh), jnp.float32),
            pltpu.VMEM((h, g), jnp.float32),
            pltpu.VMEM((h, g), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out


def _packed_kv_kernel(scale, h, q_ref, x_ref, wk_ref, wv_ref, o_ref,
                      acc_ref, m_ref, l_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # [G, H*dh]
    x = x_ref[0]  # [Mc, Din] raw kv tokens
    dt = q.dtype
    # in-VMEM kv projections (k_proj/v_proj are bias-free in this model
    # family). Numerics match nn.layers.Dense: one f32-accumulated MXU
    # pass rounded on emit; precision pinned DEFAULT so a global
    # "highest" setting cannot request multi-pass bf16 dots Mosaic
    # cannot lower (same guard as ops/pallas/g2e_train.py).
    k = jax.lax.dot_general(
        x, wk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(dt)  # [Mc, H*dh]
    v = jax.lax.dot_general(
        x, wv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(dt)
    dh = q.shape[1] // h
    for head in range(h):
        sl = slice(head * dh, (head + 1) * dh)
        q_h = q[:, sl].astype(jnp.float32)
        k_h = k[:, sl].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [G, Mc]
        m_prev = m_ref[head, :]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new[:, None])
        l_ref[head, :] = l_ref[head, :] * corr + jnp.sum(p, axis=-1)
        m_ref[head, :] = m_new
        pv = jnp.dot(
            p.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32
        )
        acc_ref[head] = acc_ref[head] * corr[:, None] + pv

    @pl.when(j == nj - 1)
    def _():
        for head in range(h):
            sl = slice(head * dh, (head + 1) * dh)
            o_ref[0, :, sl] = (
                acc_ref[head] / l_ref[head, :][:, None]
            ).astype(o_ref.dtype)


@partial(
    jax.jit, static_argnames=("num_heads", "scale", "kv_chunk", "interpret")
)
def fused_attention_packed_kv(
    q: Array,
    x_kv: Array,
    wk: Array,
    wv: Array,
    *,
    num_heads: int,
    scale: float,
    kv_chunk: int | None = None,
    interpret: bool = False,
) -> Array:
    """Flash attention with the k/v projections folded into the kernel.

    q [B, G, H*dh], x_kv [B, M, Din], wk/wv [Din, H*dh] -> [B, G, H*dh].

    Each kv chunk is projected in VMEM right before use, so the [B, M,
    H*dh] k and v tensors never exist in HBM. This kills the r3 eval
    profile's only superlinear-in-batch ops: at B=256 XLA's cost model
    switches the LN+k/v-proj megafusions to a `XposeReuse` conv emitter
    it itself prices 1.4x worse per FLOP (memory pressure), taking the
    two projections from 154 to 86 TFLOP/s effective — 794 us/iter and
    ~2x the whole B=128->256 per-cloud regression. Weights ride along
    each grid cell (Din*D*2 bytes, 256 KB at flagship dims — VMEM-cheap
    next to the kv chunk they replace).
    """
    b, g, d = q.shape
    m = x_kv.shape[1]
    mc = kv_chunk or _kv_chunk_for(m)
    if m % mc:
        raise ValueError(f"M={m} not divisible by kv chunk {mc}")
    h = num_heads
    dh = d // h
    ms = pl.ANY if interpret else pltpu.VMEM

    return pl.pallas_call(
        partial(_packed_kv_kernel, float(scale), h),
        out_shape=jax.ShapeDtypeStruct((b, g, d), q.dtype),
        grid=(b, m // mc),
        in_specs=[
            pl.BlockSpec((1, g, d), lambda i, j: (i, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((1, mc, x_kv.shape[2]), lambda i, j: (i, j, 0),
                         memory_space=ms),
            pl.BlockSpec(wk.shape, lambda i, j: (0, 0), memory_space=ms),
            pl.BlockSpec(wv.shape, lambda i, j: (0, 0), memory_space=ms),
        ],
        out_specs=pl.BlockSpec(
            (1, g, d), lambda i, j: (i, 0, 0), memory_space=ms
        ),
        scratch_shapes=[
            pltpu.VMEM((h, g, dh), jnp.float32),
            pltpu.VMEM((h, g), jnp.float32),
            pltpu.VMEM((h, g), jnp.float32),
        ],
        interpret=interpret,
    )(q, x_kv, wk, wv)


def _packed_kv_ln_kernel(scale, h, q_ref, x_ref, lns_ref, lnb_ref,
                         wk_ref, wv_ref, o_ref, acc_ref, m_ref, l_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # [G, H*dh]
    dt = q.dtype
    # in-VMEM LayerNorm of the raw kv chunk — rowwise, so chunk-local.
    # Op-for-op the inline nn.layers.LayerNorm (f32 fast-variance stats,
    # eps 1e-5, cast to compute dtype), which XLA otherwise materializes
    # as a full [B, M, D] HBM tensor once the projections move in-kernel.
    xf = x_ref[0].astype(jnp.float32)  # [Mc, Din]
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    xn = (
        (xf - mu) * (jax.lax.rsqrt(var + 1e-5) * lns_ref[0])
        + lnb_ref[0]
    ).astype(dt)
    k = jax.lax.dot_general(
        xn, wk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(dt)
    v = jax.lax.dot_general(
        xn, wv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(dt)
    dh = q.shape[1] // h
    for head in range(h):
        sl = slice(head * dh, (head + 1) * dh)
        q_h = q[:, sl].astype(jnp.float32)
        k_h = k[:, sl].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m_prev = m_ref[head, :]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new[:, None])
        l_ref[head, :] = l_ref[head, :] * corr + jnp.sum(p, axis=-1)
        m_ref[head, :] = m_new
        pv = jnp.dot(
            p.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32
        )
        acc_ref[head] = acc_ref[head] * corr[:, None] + pv

    @pl.when(j == nj - 1)
    def _():
        for head in range(h):
            sl = slice(head * dh, (head + 1) * dh)
            o_ref[0, :, sl] = (
                acc_ref[head] / l_ref[head, :][:, None]
            ).astype(o_ref.dtype)


@partial(
    jax.jit, static_argnames=("num_heads", "scale", "kv_chunk", "interpret")
)
def fused_attention_packed_kv_ln(
    q: Array,
    x_kv: Array,
    ln_scale: Array,
    ln_bias: Array,
    wk: Array,
    wv: Array,
    *,
    num_heads: int,
    scale: float,
    kv_chunk: int | None = None,
    interpret: bool = False,
) -> Array:
    """fused_attention_packed_kv with the kv LayerNorm folded in.

    q [B, G, H*dh], x_kv [B, M, Din] RAW (pre-norm), ln_scale/ln_bias
    [Din] f32, wk/wv [Din, H*dh] -> [B, G, H*dh]. Neither the normalized
    tokens nor the k/v projections ever exist in HBM: measured at
    flagship dims (B=256) the LN+proj chain is 775 us of XLA fusions
    (two batch-degraded `XposeReuse` matmuls + a full [B, M, D] LN
    materialization once the projections alone move in-kernel); here it
    is VMEM work overlapping the attention recurrence.
    """
    b, g, d = q.shape
    m = x_kv.shape[1]
    mc = kv_chunk or _kv_chunk_for(m)
    if m % mc:
        raise ValueError(f"M={m} not divisible by kv chunk {mc}")
    h = num_heads
    dh = d // h
    ms = pl.ANY if interpret else pltpu.VMEM

    return pl.pallas_call(
        partial(_packed_kv_ln_kernel, float(scale), h),
        out_shape=jax.ShapeDtypeStruct((b, g, d), q.dtype),
        grid=(b, m // mc),
        in_specs=[
            pl.BlockSpec((1, g, d), lambda i, j: (i, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((1, mc, x_kv.shape[2]), lambda i, j: (i, j, 0),
                         memory_space=ms),
            pl.BlockSpec((1, x_kv.shape[2]), lambda i, j: (0, 0),
                         memory_space=ms),
            pl.BlockSpec((1, x_kv.shape[2]), lambda i, j: (0, 0),
                         memory_space=ms),
            pl.BlockSpec(wk.shape, lambda i, j: (0, 0), memory_space=ms),
            pl.BlockSpec(wv.shape, lambda i, j: (0, 0), memory_space=ms),
        ],
        out_specs=pl.BlockSpec(
            (1, g, d), lambda i, j: (i, 0, 0), memory_space=ms
        ),
        scratch_shapes=[
            pltpu.VMEM((h, g, dh), jnp.float32),
            pltpu.VMEM((h, g), jnp.float32),
            pltpu.VMEM((h, g), jnp.float32),
        ],
        interpret=interpret,
    )(
        q, x_kv,
        ln_scale.astype(jnp.float32).reshape(1, -1),
        ln_bias.astype(jnp.float32).reshape(1, -1),
        wk, wv,
    )


def packed_attention_kv_enabled(
    num_heads: int,
    qk_ch: int,
    v_ch: int,
    m: int,
    d_in: int,
    pad_mask,
    dropout_rate: float,
    deterministic: bool,
) -> bool:
    """Gate for the kv-projection-fused eval kernel.

    Multi-device meshes run through `shard.kv_attention_sharded_call`
    (r4): batch over data, whole heads + wk/wv columns over model; the
    head-divisibility requirement is `packed_attention_enabled`'s
    existing `tp_heads_shardable` check.
    """
    if not deterministic:
        # fwd-only kernel; this branch sits BEFORE the flash-train branch
        # in MultiHeadAttention, so it must reject training itself
        return False
    if not packed_attention_enabled(
        num_heads, qk_ch, v_ch, m, pad_mask, dropout_rate, deterministic
    ):
        return False
    # raw kv tokens must be lane-aligned and VMEM-friendly per chunk
    return d_in % 128 == 0 and d_in <= 1024


def packed_attention_enabled(
    num_heads: int,
    qk_ch: int,
    v_ch: int,
    m: int,
    pad_mask,
    dropout_rate: float,
    deterministic: bool,
) -> bool:
    """Gate for the packed kernel at the MHA layer (before head split).

    On by default on TPU for the large-M cross-attention (M >= 512), where
    it replaces the XLA path's [B, H, G, M] f32 HBM round-trip (measured
    2.50 -> 1.06 ms at [256, 4, 128, 1024] on v5e, with zero relayout
    copies). Small-M self-attention stays on XLA, which fuses those shapes
    well already.
    """
    from vipformer_tpu.ops.pallas.shard import (
        sharding_active,
        tp_heads_shardable,
    )

    if sharding_active() and not tp_heads_shardable(num_heads, qk_ch):
        return False
    if pad_mask is not None or (dropout_rate > 0.0 and not deterministic):
        return False
    if qk_ch != v_ch or qk_ch % num_heads:
        return False
    if USE_FUSED_ATTENTION is not None:
        return USE_FUSED_ATTENTION
    if jax.default_backend() != "tpu":
        return False
    return m >= 512 and _kv_chunk_for(m) >= 256


# ---------------------------------------------------------------------------
# batch-blocked packed attention for SMALL M (self-attention sites)
#
# At M = G = 128-144 the per-(batch) grid of the kernels above is
# launch-bound (each cell is a handful of [G, dh] matmuls), which is why
# "packed everywhere" measured slower in r1. But the XLA path's materialized
# [B, H, G, M] f32 scores become HBM-BW-bound as B grows: at B=256 the
# per-layer softmax-stats fusion (104 us) + PV fusion (90 us) both stream a
# 67 MB score tensor at ~650 GB/s — this family is exactly what made eval
# throughput non-monotone in batch (per-cloud cost 2.9-7.5x higher at B=256
# than B=32, tools/profile_ops.py). This kernel amortizes launches by
# processing BT batch rows per grid cell and keeps the scores in VMEM.
#
# r3 rewrite: the first version issued per-(row, head) 2-D [G, dh] dots and
# measured SLOWER than XLA (the fixed per-MXU-op cost swamped the HBM
# saving). This version uses BT-batched 3-D dot_generals — the same Mosaic
# batched-dot trick that made flash_train's image-SA cells fast
# (ops/pallas/flash_train.py:114) — so each head costs two batched MXU ops
# per cell instead of 2*BT small ones.

_SMALL_BT = 8


def _bdot(a, b_arr, contract_a, contract_b):
    """Batched (leading-dim) f32 dot_general; BT==1 lowers as a 2-D dot
    (Mosaic schedules batch-1 3-D dots measurably worse)."""
    if a.shape[0] == 1:
        out = jax.lax.dot_general(
            a[0], b_arr[0],
            (((contract_a - 1,), (contract_b - 1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return out[None]
    return jax.lax.dot_general(
        a, b_arr,
        (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _packed_small_kernel(scale, h, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[...]  # [BT, G, H*dh]
    k = k_ref[...]  # [BT, M, H*dh]
    v = v_ref[...]
    dh = q.shape[2] // h
    for head in range(h):
        sl = slice(head * dh, (head + 1) * dh)
        logits = _bdot(
            q[:, :, sl].astype(jnp.float32),
            k[:, :, sl].astype(jnp.float32), 2, 2,
        ) * scale  # [BT, G, M]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[:, :, sl] = _bdot(p.astype(v.dtype), v[:, :, sl], 2, 1).astype(
            o_ref.dtype
        )


@partial(jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def fused_attention_packed_small(
    q: Array, k: Array, v: Array, *, num_heads: int, scale: float,
    interpret: bool = False,
) -> Array:
    """q [B, G, H*dh], k/v [B, M, H*dh] -> [B, G, H*dh], M in VMEM whole."""
    b, g, d = q.shape
    m = k.shape[1]
    bt = _SMALL_BT
    while b % bt:
        bt //= 2
    ms = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        partial(_packed_small_kernel, float(scale), num_heads),
        out_shape=jax.ShapeDtypeStruct((b, g, d), v.dtype),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, g, d), lambda i: (i, 0, 0), memory_space=ms),
            pl.BlockSpec((bt, m, d), lambda i: (i, 0, 0), memory_space=ms),
            pl.BlockSpec((bt, m, d), lambda i: (i, 0, 0), memory_space=ms),
        ],
        out_specs=pl.BlockSpec(
            (bt, g, d), lambda i: (i, 0, 0), memory_space=ms
        ),
        interpret=interpret,
    )(q, k, v)


def _packed_small_qkv_ln_kernel(
    scale, h, eps, x_ref, lns_ref, lnb_ref, wq_ref, wk_ref, wv_ref, o_ref
):
    bt, g, din = x_ref.shape
    d = wq_ref.shape[1]
    dt = o_ref.dtype
    # in-VMEM pre-LN of the raw tokens — op-for-op nn.layers.LayerNorm
    # (f32 fast-variance stats, cast to the compute dtype), same fold the
    # CA eval kernel performs on its kv chunk (_packed_kv_ln_kernel)
    xf = x_ref[...].astype(jnp.float32)  # [BT, G, Din]
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    xn = (
        (xf - mu) * (jax.lax.rsqrt(var + eps) * lns_ref[0])
        + lnb_ref[0]
    ).astype(dt)
    # one full-width MXU dot per projection on the [BT*G, Din] rows
    xn2 = xn.reshape(bt * g, din)
    q = jax.lax.dot_general(
        xn2, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(dt).reshape(bt, g, d)
    k = jax.lax.dot_general(
        xn2, wk_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(dt).reshape(bt, g, d)
    v = jax.lax.dot_general(
        xn2, wv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(dt).reshape(bt, g, d)
    dh = d // h
    for head in range(h):
        sl = slice(head * dh, (head + 1) * dh)
        logits = _bdot(
            q[:, :, sl].astype(jnp.float32),
            k[:, :, sl].astype(jnp.float32), 2, 2,
        ) * scale  # [BT, G, G]
        m_ = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m_)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[:, :, sl] = _bdot(p.astype(v.dtype), v[:, :, sl], 2, 1).astype(
            o_ref.dtype
        )


@partial(jax.jit, static_argnames=("num_heads", "scale", "interpret"))
def fused_attention_packed_small_qkv_ln(
    x: Array,
    ln_scale: Array,
    ln_bias: Array,
    wq: Array,
    wk: Array,
    wv: Array,
    *,
    num_heads: int,
    scale: float,
    interpret: bool = False,
) -> Array:
    """Small-M SELF-attention with the pre-LN and all three projections
    folded in: x [B, G, Din] RAW (pre-norm), ln params [Din] f32,
    wq/wk/wv [Din, H*dh] -> [B, G, H*dh].

    Motivation (r5 per-op profile of the eval forward): with the plain
    small-M kernel engaged, each SA layer still pays an LN-stats fusion
    (f32[B,G] over bf16[B,G,D], 0.355 ms at B=512 — ~8x off HBM
    roofline) plus the LN-normalize and three projection megafusions in
    HBM — together ~2.8 ms of the 24.3 ms B=512 forward for the 8
    pc-encoder layers. Here the raw tokens are read ONCE per grid cell
    and everything up to the attention output lives in VMEM; HBM traffic
    per layer drops from ~7 tensor passes to read-x + write-o."""
    b, g, din = x.shape
    d = wq.shape[1]
    bt = _SMALL_BT
    while b % bt:
        bt //= 2
    ms = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        partial(
            _packed_small_qkv_ln_kernel, float(scale), num_heads, 1e-5
        ),
        out_shape=jax.ShapeDtypeStruct((b, g, d), x.dtype),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, g, din), lambda i: (i, 0, 0), memory_space=ms),
            pl.BlockSpec((1, din), lambda i: (0, 0), memory_space=ms),
            pl.BlockSpec((1, din), lambda i: (0, 0), memory_space=ms),
            pl.BlockSpec(wq.shape, lambda i: (0, 0), memory_space=ms),
            pl.BlockSpec(wk.shape, lambda i: (0, 0), memory_space=ms),
            pl.BlockSpec(wv.shape, lambda i: (0, 0), memory_space=ms),
        ],
        out_specs=pl.BlockSpec(
            (bt, g, d), lambda i: (i, 0, 0), memory_space=ms
        ),
        interpret=interpret,
    )(
        x,
        ln_scale.astype(jnp.float32).reshape(1, -1),
        ln_bias.astype(jnp.float32).reshape(1, -1),
        wq,
        wk,
        wv,
    )


# LN+qkv-folded SA kernel: None = auto (on-TPU at batch >= 128);
# True/False force. Measured (r5, flagship cls eval): per-op device
# profile 24.31 -> 23.13 ms at B=512 (-4.9% — the per-layer LN-stats
# fusion, LN-normalize and projection megafusions disappear,
# convert_reduce family 3.19 -> 0.95 ms/step, outweighing the kernel
# costing 96 us/layer over the plain attention-only one), and the
# chained-stream bench confirms at B>=128: 0.0458/0.0462/0.0477 ->
# 0.0446/0.0443/0.0456 ms/cloud at 128/256/512. At SMALL batch the
# kernel is a large LOSS in the stream (B=32: 0.0342 -> 0.0478
# ms/cloud): consolidating the layer into one custom call defeats the
# cross-iteration weight-staging overlap that pipelining wins at tiny
# batch latencies (ROADMAP item 0), so the auto gate requires B >= 128.
USE_SA_QKV_LN: bool | None = None


def packed_small_qkv_ln_enabled(
    num_heads: int, qk_ch: int, v_ch: int, b: int, g: int, d_in: int,
    pad_mask, dropout_rate: float, deterministic: bool,
) -> bool:
    """Eval gate for the LN+qkv-folded small-M SELF-attention kernel:
    the small-M conditions plus lane-aligned raw tokens and equal-width
    q/k/v from the same normalized input (the SelfAttention contract).
    `b` is the batch: the auto path engages only at b >= 128 (see
    USE_SA_QKV_LN note); forcing True bypasses the batch/backend checks
    but not the structural ones."""
    if USE_SA_QKV_LN is not None:
        if not USE_SA_QKV_LN:
            return False
    elif jax.default_backend() != "tpu" or b < 128:
        return False
    # structural small-M conditions (the plain small kernel's, minus its
    # backend/flag logic — USE_SA_QKV_LN already decided engagement, and
    # CPU callers run the kernel in interpret mode)
    from vipformer_tpu.ops.pallas.shard import sharding_active

    if sharding_active():
        # the SelfAttention wiring calls this kernel directly (no
        # shard_map wrapper yet); meshes keep the existing kernels
        return False
    if pad_mask is not None or not deterministic:
        return False
    if qk_ch != v_ch or qk_ch % num_heads:
        return False
    if g > 512:
        return False
    # folded-LN working set: [BT, G, Din] raw block + qkv + logits
    need = 2 * _SMALL_BT * g * (d_in + 3 * max(qk_ch, 128)) * 2 + (
        2 * _SMALL_BT * g * max(g, 128) * 4
    )
    return d_in % 128 == 0 and d_in <= 1024 and need < _VMEM_BUDGET


def packed_small_attention_enabled(
    num_heads: int, qk_ch: int, v_ch: int, g: int, m: int, pad_mask,
    dropout_rate: float, deterministic: bool,
) -> bool:
    """Eval-mode gate for the batch-blocked small-M kernel."""
    from vipformer_tpu.ops.pallas.shard import (
        sharding_active,
        tp_heads_shardable,
    )

    if sharding_active() and not tp_heads_shardable(num_heads, qk_ch):
        return False
    if pad_mask is not None or (dropout_rate > 0.0 and not deterministic):
        return False
    if not deterministic:
        return False  # training goes through flash_train
    if qk_ch != v_ch or qk_ch % num_heads:
        return False
    if USE_FUSED_ATTENTION is not None:
        return USE_FUSED_ATTENTION
    if jax.default_backend() != "tpu":
        return False
    if m >= 512 or g > 512:
        return False  # large M belongs to fused_attention_packed
    # whole-M working set per grid cell must fit VMEM: 4x [BT, G|M, D]
    # q/k/v/o blocks (double-buffered) + [BT, G, M] f32 logits and p
    need = 2 * 4 * _SMALL_BT * max(g, m) * max(qk_ch, 128) * 2 + (
        2 * _SMALL_BT * g * max(m, 128) * 4
    )
    return need < _VMEM_BUDGET
