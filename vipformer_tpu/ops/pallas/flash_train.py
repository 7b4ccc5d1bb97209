"""Pallas TPU flash attention for TRAINING: fwd + custom-VJP bwd with
in-kernel attention dropout.

Why this exists (measured on v5e, tools/profile_ops.py): under training the
XLA attention path materializes per layer, in HBM, the f32 [B, H, G, M]
score matrix (saved for backward), a same-shaped u32 random-bits array for
the dropout draw, and the pred keep-mask (also saved for backward). At the
pretrain shapes — cross-attention [B=384, H=4, G=128, M=2048] and image
self-attention [192, 4, 144, 144] — those tensors dominate the step's HBM
traffic (e.g. 1.2 ms of rng + 1.4 ms of mask apply per CA, plus the
backward re-reads).

This kernel keeps all of it in VMEM:
* packed layout ([B, N, H*dh] exactly as the projections produce it, heads
  split inside the kernel) — zero relayout copies, same trick as
  `attention.fused_attention_packed`;
* BT batch rows per grid cell with Mosaic *batched* dot_generals — the
  first version ran one grid cell per batch row with per-(row, head)
  PRNG re-seeding, and the seeding overhead alone dominated (783 us per
  image-SA layer for ~2 GFLOP of matmul); now each cell seeds ONCE and
  draws per-head blocks in a fixed order;
* online-softmax streaming over M chunks; the forward stores only the
  per-row logsumexp [B, H, G] (the standard flash residual);
* dropout uses the TPU's counter-based PRNG seeded per (seed, cell,
  chunk): the SAME masks are regenerated in the backward pass from the
  same scalar seed and draw order, so no mask array is ever written to
  HBM;
* backward recomputes P = exp(S - lse) per chunk and uses the
  delta = rowsum(dO * O) identity, which holds verbatim under post-softmax
  dropout (torch semantics: softmax -> dropout -> @V, reference
  `core/modules.py:91-93`):
      dV_j  = Pd^T dO
      dS    = Pd o (dO V^T) - P o delta
      dQ   += scale . dS K_j,   dK_j = scale . dS^T Q
  where Pd = P o keep/(1-rate) and the softmax denominator uses the
  UNdropped P (so lse is dropout-free).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANES = 128  # f32 lane tile


def _kv_chunk_for(m: int, cap: int = 2048) -> int:
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


# scoped-VMEM budget for one grid cell of the BACKWARD kernel (the heavier
# of the two; fwd and bwd must use the SAME blocking because the dropout
# draws are a function of the cell/chunk indices). The per-column model
# below omits Mosaic's own spill headroom, so the budget sits well under
# the 16M scoped limit (a 17.3M cell aborted compilation in testing, and
# raising this to 10M -- BT=8 at the image-SA shape -- aborted too; 8M is
# the calibrated ceiling on v5e).
_VMEM_BUDGET = 8 * 1024 * 1024


def _auto_chunk(g: int, d: int, m: int) -> int:
    """Largest kv chunk whose bwd working set fits the budget at BT=1.

    Per kv row: k+v bf16 in (2d), dk+dv f32 out (8d); per column of the
    [G, Mc] f32 temporaries (logits, p, pd, dpd, ds, random bits): 24g.
    """
    col_cost = 2 * d + 8 * d + 24 * g
    cap = max(_LANES, min(2048, _VMEM_BUDGET // col_cost))
    return _kv_chunk_for(m, cap)


def _cell_cost(g: int, d: int, mc: int) -> int:
    """Approximate bwd VMEM bytes for ONE batch row of a cell."""
    return g * d * 8 + mc * d * 12 + g * mc * 24


def _auto_bt(b: int, g: int, d: int, mc: int, cap: int = 8) -> int:
    """Largest divisor of b (<= cap) whose cell fits the VMEM budget."""
    per_row = _cell_cost(g, d, mc)
    bt = 1
    for cand in range(2, cap + 1):
        if b % cand == 0 and cand * per_row <= _VMEM_BUDGET:
            bt = cand
    return bt


def _keep_mask(rate: float, shape):
    """Bernoulli(1-rate) from the already-seeded TPU PRNG."""
    bits = pltpu.prng_random_bits(shape)  # int32 bits
    # uniform int32 >= (rate-quantile of the int32 range) keeps 1-rate mass
    thresh = np.int32(int(rate * (1 << 32)) - (1 << 31))
    return bits >= thresh


def _bdot(a, b_arr, contract_a, contract_b):
    """Batched (leading-dim) dot_general in f32.

    BT==1 blocks lower as plain 2-D dots — Mosaic schedules a batch-1
    3-D dot measurably worse than the equivalent 2-D one (CA fwd
    2.85 -> 3.83 ms when this path first shipped without the squeeze).
    """
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


def _fwd_kernel(scale, h, rate, seed_ref, q_ref, k_ref, v_ref,
                o_ref, lse_ref, acc_ref, m_ref, l_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[...]  # [BT, G, D]
    k = k_ref[...]  # [BT, Mc, D]
    v = v_ref[...]
    dh = q.shape[2] // h
    if rate > 0.0:
        # one seeding per (cell, chunk); per-head draws follow in a fixed
        # order so the backward regenerates identical masks. Mosaic allows
        # at most 2 seed scalars, so cell/chunk pack into one int32.
        pltpu.prng_seed(seed_ref[0], i * 4096 + j)
    for head in range(h):
        sl = slice(head * dh, (head + 1) * dh)
        logits = _bdot(
            q[:, :, sl].astype(jnp.float32),
            k[:, :, sl].astype(jnp.float32), 2, 2,
        ) * scale  # [BT, G, Mc]
        m_prev = m_ref[head]  # [BT, G]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new[:, :, None])
        # softmax denominator over the UNdropped probabilities
        l_ref[head] = l_ref[head] * corr + jnp.sum(p, axis=-1)
        m_ref[head] = m_new
        if rate > 0.0:
            keep = _keep_mask(rate, p.shape)
            p = jnp.where(keep, p / (1.0 - rate), 0.0)
        pv = _bdot(p.astype(v.dtype), v[:, :, sl], 2, 1)  # [BT, G, dh]
        acc_ref[head] = acc_ref[head] * corr[:, :, None] + pv

    @pl.when(j == nj - 1)
    def _():
        for head in range(h):
            sl = slice(head * dh, (head + 1) * dh)
            o_ref[:, :, sl] = (
                acc_ref[head] / l_ref[head][:, :, None]
            ).astype(o_ref.dtype)
            lse_ref[:, head, :] = m_ref[head] + jnp.log(l_ref[head])


def _bwd_kernel(scale, h, rate, seed_ref, q_ref, k_ref, v_ref, do_ref,
                lse_ref, delta_ref, dq_ref, dk_ref, dv_ref, dq_acc):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    do = do_ref[...]
    dh = q.shape[2] // h
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], i * 4096 + j)  # same stream as fwd
    for head in range(h):
        sl = slice(head * dh, (head + 1) * dh)
        q_h = q[:, :, sl].astype(jnp.float32)
        k_h = k[:, :, sl].astype(jnp.float32)
        logits = _bdot(q_h, k_h, 2, 2) * scale  # [BT, G, Mc]
        p = jnp.exp(logits - lse_ref[:, head, :][:, :, None])
        if rate > 0.0:
            keep = _keep_mask(rate, p.shape)
            pd = jnp.where(keep, p / (1.0 - rate), 0.0)
        else:
            pd = p
        do_h = do[:, :, sl].astype(jnp.float32)  # [BT, G, dh]
        v_h = v[:, :, sl].astype(jnp.float32)  # [BT, Mc, dh]
        # dV_j = Pd^T dO
        dv_ref[:, :, sl] = _bdot(pd, do_h, 1, 1).astype(dv_ref.dtype)
        # dPd = dO V^T
        dpd = _bdot(do_h, v_h, 2, 2)  # [BT, G, Mc]
        ds = (
            pd * dpd - p * delta_ref[:, head, :][:, :, None]
        ) * scale
        dq_acc[head] += _bdot(ds, k_h, 2, 1)  # [BT, G, dh]
        dk_ref[:, :, sl] = _bdot(ds, q_h, 1, 1).astype(dk_ref.dtype)

    @pl.when(j == nj - 1)
    def _():
        for head in range(h):
            sl = slice(head * dh, (head + 1) * dh)
            dq_ref[:, :, sl] = dq_acc[head].astype(dq_ref.dtype)


def _blocking(b, g, d, m, kv_chunk):
    mc = kv_chunk or _auto_chunk(g, d, m)
    bt = _auto_bt(b, g, d, mc)
    return mc, bt


def _fwd_call(q, k, v, seed, num_heads, scale, rate, kv_chunk, interpret):
    b, g, d = q.shape
    m = k.shape[1]
    mc, bt = _blocking(b, g, d, m, kv_chunk)
    h = num_heads
    ms = pl.ANY if interpret else pltpu.VMEM
    out, lse = pl.pallas_call(
        partial(_fwd_kernel, float(scale), h, float(rate)),
        grid=(b // bt, m // mc),
        out_shape=[
            jax.ShapeDtypeStruct((b, g, d), v.dtype),
            jax.ShapeDtypeStruct((b, h, g), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [1]
            pl.BlockSpec((bt, g, d), lambda i, j: (i, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((bt, mc, d), lambda i, j: (i, j, 0),
                         memory_space=ms),
            pl.BlockSpec((bt, mc, d), lambda i, j: (i, j, 0),
                         memory_space=ms),
        ],
        out_specs=[
            pl.BlockSpec((bt, g, d), lambda i, j: (i, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((bt, h, g), lambda i, j: (i, 0, 0),
                         memory_space=ms),
        ],
        scratch_shapes=[
            pltpu.VMEM((h, bt, g, d // h), jnp.float32),
            pltpu.VMEM((h, bt, g), jnp.float32),
            pltpu.VMEM((h, bt, g), jnp.float32),
        ],
        interpret=interpret,
    )(seed, q, k, v)
    return out, lse


def _bwd_call(q, k, v, do, o, lse, seed, num_heads, scale, rate, kv_chunk,
              interpret):
    b, g, d = q.shape
    m = k.shape[1]
    mc, bt = _blocking(b, g, d, m, kv_chunk)
    h = num_heads
    dh = d // h
    ms = pl.ANY if interpret else pltpu.VMEM
    # delta[b, head, g] = rowsum(dO o O) per head slice — holds with
    # post-softmax dropout because O = Pd V
    delta = jnp.sum(
        (do.astype(jnp.float32) * o.astype(jnp.float32)).reshape(
            b, g, h, dh
        ),
        axis=-1,
    ).transpose(0, 2, 1)  # [B, h, G]
    dq, dk, dv = pl.pallas_call(
        partial(_bwd_kernel, float(scale), h, float(rate)),
        grid=(b // bt, m // mc),
        out_shape=[
            jax.ShapeDtypeStruct((b, g, d), jnp.float32),
            jax.ShapeDtypeStruct((b, m, d), jnp.float32),
            jax.ShapeDtypeStruct((b, m, d), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [1]
            pl.BlockSpec((bt, g, d), lambda i, j: (i, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((bt, mc, d), lambda i, j: (i, j, 0),
                         memory_space=ms),
            pl.BlockSpec((bt, mc, d), lambda i, j: (i, j, 0),
                         memory_space=ms),
            pl.BlockSpec((bt, g, d), lambda i, j: (i, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((bt, h, g), lambda i, j: (i, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((bt, h, g), lambda i, j: (i, 0, 0),
                         memory_space=ms),
        ],
        out_specs=[
            pl.BlockSpec((bt, g, d), lambda i, j: (i, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((bt, mc, d), lambda i, j: (i, j, 0),
                         memory_space=ms),
            pl.BlockSpec((bt, mc, d), lambda i, j: (i, j, 0),
                         memory_space=ms),
        ],
        scratch_shapes=[pltpu.VMEM((h, bt, g, dh), jnp.float32)],
        interpret=interpret,
    )(seed, q, k, v, do, lse, delta)
    return dq, dk, dv


def _tp_layout(q, num_heads):
    """shard_map layout for the packed [B, N, H*dh] operands, or None for
    a direct (single-device) call. Returns (spec, lse_spec, local_heads,
    seed_fn); seed_fn offsets the dropout stream per shard so masks
    decorrelate across both mesh axes (fwd and bwd apply the SAME offset,
    so the bwd regenerates identical masks — but note a sharded run's
    masks differ from an unsharded run's at rate > 0)."""
    from vipformer_tpu.ops.pallas import shard

    if not shard.sharding_active():
        return None
    d, t = shard.data_size(), shard.model_size()
    if q.shape[0] % d or num_heads % t or q.shape[-1] % t:
        return None
    from jax.sharding import PartitionSpec as P

    da, ma = shard.data_axis(), shard.model_axis()
    spec = P(da, None, ma if t > 1 else None)
    lse_spec = P(da, ma if t > 1 else None, None)

    def seed_fn(seed):
        off = jax.lax.axis_index(da) * t
        if t > 1:
            off = off + jax.lax.axis_index(ma)
        return seed + off.astype(seed.dtype)

    return spec, lse_spec, num_heads // t, seed_fn


def _fwd_sharded(q, k, v, seed, num_heads, scale, rate, kv_chunk,
                 interpret):
    from vipformer_tpu.ops.pallas import shard

    layout = _tp_layout(q, num_heads)
    if layout is None:
        return _fwd_call(
            q, k, v, seed, num_heads, scale, rate, kv_chunk, interpret
        )
    spec, lse_spec, local_h, seed_fn = layout
    from jax.sharding import PartitionSpec as P

    def f(qq, kk, vv, sd):
        return _fwd_call(
            qq, kk, vv, seed_fn(sd), local_h, scale, rate, kv_chunk,
            interpret,
        )

    return jax.shard_map(
        f, mesh=shard.active_mesh(),
        in_specs=(spec, spec, spec, P()),
        out_specs=(spec, lse_spec),
        check_vma=False,
    )(q, k, v, seed)


def _bwd_sharded(q, k, v, do, o, lse, seed, num_heads, scale, rate,
                 kv_chunk, interpret):
    from vipformer_tpu.ops.pallas import shard

    layout = _tp_layout(q, num_heads)
    if layout is None:
        return _bwd_call(
            q, k, v, do, o, lse, seed, num_heads, scale, rate, kv_chunk,
            interpret,
        )
    spec, lse_spec, local_h, seed_fn = layout
    from jax.sharding import PartitionSpec as P

    def f(qq, kk, vv, dd, oo, ll, sd):
        return _bwd_call(
            qq, kk, vv, dd, oo, ll, seed_fn(sd), local_h, scale, rate,
            kv_chunk, interpret,
        )

    return jax.shard_map(
        f, mesh=shard.active_mesh(),
        in_specs=(spec, spec, spec, spec, spec, lse_spec, P()),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )(q, k, v, do, o, lse, seed)


@partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8)
)
def flash_attention_train(
    q: Array,
    k: Array,
    v: Array,
    seed: Array,
    num_heads: int,
    scale: float,
    rate: float,
    kv_chunk: int | None = None,
    interpret: bool = False,
) -> Array:
    """Differentiable packed flash attention with attention dropout.

    q [B, G, H*dh], k/v [B, M, H*dh], seed int32 [1] -> [B, G, H*dh].
    Gradients flow to q/k/v; the dropout mask is a pure function of
    (seed, cell, chunk, head order) and is identical in fwd and bwd.
    """
    out, _ = _fwd_sharded(
        q, k, v, seed, num_heads, scale, rate, kv_chunk, interpret
    )
    return out


def _vjp_fwd(q, k, v, seed, num_heads, scale, rate, kv_chunk, interpret):
    out, lse = _fwd_sharded(
        q, k, v, seed, num_heads, scale, rate, kv_chunk, interpret
    )
    return out, (q, k, v, out, lse, seed)


def _vjp_bwd(num_heads, scale, rate, kv_chunk, interpret, res, do):
    q, k, v, o, lse, seed = res
    dq, dk, dv = _bwd_sharded(
        q, k, v, do, o, lse, seed, num_heads, scale, rate, kv_chunk,
        interpret,
    )
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dseed
    )


flash_attention_train.defvjp(_vjp_fwd, _vjp_bwd)


def flash_train_enabled(
    num_heads: int,
    qk_ch: int,
    v_ch: int,
    g: int,
    m: int,
    pad_mask,
    deterministic: bool,
) -> bool:
    """Gate for the training kernel at the MHA layer.

    Training-mode counterpart of `packed_attention_enabled`: requires the
    packed-layout invariants (qk == v width, divisible heads), no pad mask,
    TPU backend, and shapes whose per-cell working set fits VMEM. Unlike
    the eval gate there is no M >= 512 cutoff: at ANY M the win is not the
    matmul but never materializing scores/masks/rng in HBM.
    """
    from vipformer_tpu.ops.pallas.attention import USE_FUSED_ATTENTION
    from vipformer_tpu.ops.pallas.shard import (
        sharding_active,
        tp_heads_shardable,
    )

    if sharding_active() and not tp_heads_shardable(num_heads, qk_ch):
        # heads don't divide the model axis: the packed feature shards
        # would split mid-head — fall back to the XLA path (which GSPMD
        # shards correctly, just without the VMEM fusion)
        return False
    if deterministic or pad_mask is not None:
        return False
    if qk_ch != v_ch or qk_ch % num_heads:
        return False
    if USE_FUSED_ATTENTION is not None:
        return USE_FUSED_ATTENTION
    if jax.default_backend() != "tpu":
        return False
    if g > 1024:
        return False
    # the auto-chunker fits the bwd working set into scoped VMEM as long as
    # a single kv chunk of _LANES rows fits
    mc = _auto_chunk(g, qk_ch, m)
    return m % mc == 0 and _cell_cost(g, qk_ch, mc) < _VMEM_BUDGET
