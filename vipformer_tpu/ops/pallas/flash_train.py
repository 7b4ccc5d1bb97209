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
    # outputs emitted at the operand dtypes: the f32 originals cost three
    # [B, M/G, D] f32 HBM arrays plus the convert round-trips the VJP's
    # astype added on top (~1.8 GB of traffic across the 8 SA layers at
    # pretrain dims); the in-kernel store casts the same f32 accumulators
    dq, dk, dv = pl.pallas_call(
        partial(_bwd_kernel, float(scale), h, float(rate)),
        grid=(b // bt, m // mc),
        out_shape=[
            jax.ShapeDtypeStruct((b, g, d), q.dtype),
            jax.ShapeDtypeStruct((b, m, d), k.dtype),
            jax.ShapeDtypeStruct((b, m, d), v.dtype),
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
    return dq, dk, dv, dseed


flash_attention_train.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# kv-side LayerNorm + projections folded into the training kernel
#
# The pretrain CA's kv side is LN -> bias-free k/v Dense over the [B, M,
# Din] point tokens. Run through XLA at B=384/M=2048 that chain costs (r3
# profile): 2 x 1.2 ms forward megafusions (batch-degraded XposeReuse
# emitters), and in the backward the flash kernel's dk/dv emerge as TWO
# f32 [B, M, D] HBM arrays (805 MB each) that XLA re-reads into transposed
# {1,2,0} activation copies (fusion.14, 1.8 ms) feeding its dW emitters.
# Folding the chain into the kernel, the forward projects each kv chunk in
# VMEM (raw x read once, k/v never in HBM) and the backward emits ONE bf16
# dx array plus f32 [Din, D] weight-grad accumulators that live in VMEM
# across the whole grid — the 1.6 GB of f32 dk/dv traffic disappears.

_LN_EPS = 1e-5


def _proj(x, w):
    """[BT, R, Din] @ [Din, D] -> [BT, R, D], f32 accumulate, emit x.dtype.
    precision pinned DEFAULT (see ops/pallas/g2e_train.py: a global
    'highest' would request multi-pass bf16 dots Mosaic cannot lower)."""
    if x.shape[0] == 1:
        out = jax.lax.dot_general(
            x[0], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )[None]
    else:
        out = jax.lax.dot_general(
            x, w, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
    return out


def _ln_fwd_stats(x_f32, lns, lnb):
    """Inline nn.layers.LayerNorm math on a [BT, R, Din] f32 block."""
    mu = jnp.mean(x_f32, axis=-1, keepdims=True)
    mu2 = jnp.mean(x_f32 * x_f32, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (x_f32 - mu) * rstd
    return xhat, rstd, xhat * lns + lnb


def _fwd_kv_kernel(scale, h, rate, dt_np, seed_ref, q_ref, x_ref, lns_ref,
                   lnb_ref, wk_ref, wv_ref, o_ref, lse_ref,
                   acc_ref, m_ref, l_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[...]  # [BT, G, D]
    _, _, xn_f = _ln_fwd_stats(
        x_ref[...].astype(jnp.float32), lns_ref[0], lnb_ref[0]
    )
    xn = xn_f.astype(dt_np)
    k = _proj(xn, wk_ref[...]).astype(dt_np)  # [BT, Mc, D]
    v = _proj(xn, wv_ref[...]).astype(dt_np)
    dh = q.shape[2] // h
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], i * 4096 + j)
    for head in range(h):
        sl = slice(head * dh, (head + 1) * dh)
        logits = _bdot(
            q[:, :, sl].astype(jnp.float32),
            k[:, :, sl].astype(jnp.float32), 2, 2,
        ) * scale
        m_prev = m_ref[head]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new[:, :, None])
        l_ref[head] = l_ref[head] * corr + jnp.sum(p, axis=-1)
        m_ref[head] = m_new
        if rate > 0.0:
            keep = _keep_mask(rate, p.shape)
            p = jnp.where(keep, p / (1.0 - rate), 0.0)
        pv = _bdot(p.astype(v.dtype), v[:, :, sl], 2, 1)
        acc_ref[head] = acc_ref[head] * corr[:, :, None] + pv

    @pl.when(j == nj - 1)
    def _():
        for head in range(h):
            sl = slice(head * dh, (head + 1) * dh)
            o_ref[:, :, sl] = (
                acc_ref[head] / l_ref[head][:, :, None]
            ).astype(o_ref.dtype)
            lse_ref[:, head, :] = m_ref[head] + jnp.log(l_ref[head])


def _bwd_kv_kernel(scale, h, rate, dt_np, seed_ref, q_ref, x_ref, lns_ref,
                   lnb_ref, wk_ref, wv_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, dx_ref, dwk_ref, dwv_ref, dlns_ref, dlnb_ref,
                   dq_acc):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when((i == 0) & (j == 0))
    def _():
        dwk_ref[...] = jnp.zeros_like(dwk_ref)
        dwv_ref[...] = jnp.zeros_like(dwv_ref)
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)

    q = q_ref[...]
    lns = lns_ref[0]
    xhat, rstd, xn_f = _ln_fwd_stats(
        x_ref[...].astype(jnp.float32), lns, lnb_ref[0]
    )
    xn = xn_f.astype(dt_np)
    wk = wk_ref[...]
    wv = wv_ref[...]
    k = _proj(xn, wk).astype(dt_np)
    v = _proj(xn, wv).astype(dt_np)
    do = do_ref[...]
    dh = q.shape[2] // h
    bt, mc, din = xhat.shape
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0], i * 4096 + j)  # same stream as fwd
    xn2 = xn_f.reshape(bt * mc, din)
    dk_heads, dv_heads = [], []
    for head in range(h):
        sl = slice(head * dh, (head + 1) * dh)
        q_h = q[:, :, sl].astype(jnp.float32)
        k_h = k[:, :, sl].astype(jnp.float32)
        logits = _bdot(q_h, k_h, 2, 2) * scale
        p = jnp.exp(logits - lse_ref[:, head, :][:, :, None])
        if rate > 0.0:
            keep = _keep_mask(rate, p.shape)
            pd = jnp.where(keep, p / (1.0 - rate), 0.0)
        else:
            pd = p
        do_h = do[:, :, sl].astype(jnp.float32)
        v_h = v[:, :, sl].astype(jnp.float32)
        dv_heads.append(_bdot(pd, do_h, 1, 1))  # [BT, Mc, dh] f32
        dpd = _bdot(do_h, v_h, 2, 2)
        ds = (
            pd * dpd - p * delta_ref[:, head, :][:, :, None]
        ) * scale
        dq_acc[head] += _bdot(ds, k_h, 2, 1)
        dk_heads.append(_bdot(ds, q_h, 1, 1))  # [BT, Mc, dh] f32

    # weight grads + dxn in FULL-WIDTH dots. The r3 version issued
    # per-head dW dots (output width dh=64 — half the MXU's 128-lane
    # result tile idles) and per-head dxn dots (contraction depth
    # dh=64 — half the systolic rows idle); concatenating the per-head
    # slices first makes both contract/emit at D=256 and cut the CA bwd
    # bucket 9.6 -> measured-below ms at pretrain dims.
    dk_full = jnp.concatenate(dk_heads, axis=2)  # [BT, Mc, D] f32
    dv_full = jnp.concatenate(dv_heads, axis=2)
    dwk_ref[...] += jax.lax.dot_general(
        xn2, dk_full.reshape(bt * mc, -1), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    dwv_ref[...] += jax.lax.dot_general(
        xn2, dv_full.reshape(bt * mc, -1), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    wk_f = wk.astype(jnp.float32)  # [Din, D]
    wv_f = wv.astype(jnp.float32)
    if bt == 1:
        dxn = (
            jax.lax.dot_general(
                dk_full[0], wk_f, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                dv_full[0], wv_f, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )[None]
    else:
        dxn = jax.lax.dot_general(
            dk_full, wk_f, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            dv_full, wv_f, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # LayerNorm backward (chunk-local: LN is rowwise over Din)
    dxn2 = dxn.reshape(bt * mc, din)
    dlns_ref[...] += jnp.sum(
        dxn2 * xhat.reshape(bt * mc, din), axis=0, keepdims=True
    )
    dlnb_ref[...] += jnp.sum(dxn2, axis=0, keepdims=True)
    dxhat = dxn * lns  # [BT, Mc, Din] f32
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)

    @pl.when(j == nj - 1)
    def _():
        for head in range(h):
            sl = slice(head * dh, (head + 1) * dh)
            dq_ref[:, :, sl] = dq_acc[head].astype(dq_ref.dtype)


def _row_spec(din, ms):
    return pl.BlockSpec((1, din), lambda i, j: (0, 0), memory_space=ms)


def _kv_blocking(b, g, d, m, din, kv_chunk):
    """Blocking for the kv-folded kernels (fwd and bwd MUST match so the
    dropout draws regenerate). On top of the plain bwd working set each kv
    row carries x (bf16), dx (bf16), xhat/dxn (f32), xn f32+cast ~= 18*din
    bytes, and the weights + dW accumulators hold ~0.75 MB of VMEM."""
    if kv_chunk is None:
        # + 8*d: the concatenated dk_full/dv_full f32 accumulators the
        # full-width dW/dxn dots need (r4)
        col_cost = 2 * d + 8 * d + 8 * d + 24 * g + 18 * din
        fixed = 6 * din * d + 2 * 4 * din  # wk/wv (bf16) + dwk/dwv (f32)
        cap = max(_LANES, min(2048, (_VMEM_BUDGET - fixed) // col_cost))
        mc = _kv_chunk_for(m, cap)
    else:
        mc = kv_chunk
    # bt picker with the kv kernel's own per-row cost (the plain
    # _cell_cost omits the x/xhat/dxn/dk_full/dv_full columns)
    per_row = _cell_cost(g, d, mc) + mc * (8 * d + 18 * din)
    bt = 1
    for cand in range(2, 9):
        if b % cand == 0 and cand * per_row <= _VMEM_BUDGET:
            bt = cand
    return mc, bt


def _fwd_kv_call(q, x, lns, lnb, wk, wv, seed, num_heads, scale, rate,
                 kv_chunk, interpret):
    b, g, d = q.shape
    m, din = x.shape[1], x.shape[2]
    mc, bt = _kv_blocking(b, g, d, m, din, kv_chunk)
    h = num_heads
    ms = pl.ANY if interpret else pltpu.VMEM
    out, lse = pl.pallas_call(
        partial(_fwd_kv_kernel, float(scale), h, float(rate), q.dtype),
        grid=(b // bt, m // mc),
        out_shape=[
            jax.ShapeDtypeStruct((b, g, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, g), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [1]
            pl.BlockSpec((bt, g, d), lambda i, j: (i, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((bt, mc, din), lambda i, j: (i, j, 0),
                         memory_space=ms),
            _row_spec(din, ms),
            _row_spec(din, ms),
            pl.BlockSpec(wk.shape, lambda i, j: (0, 0), memory_space=ms),
            pl.BlockSpec(wv.shape, lambda i, j: (0, 0), memory_space=ms),
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
    )(
        seed, q, x,
        lns.astype(jnp.float32).reshape(1, -1),
        lnb.astype(jnp.float32).reshape(1, -1),
        wk, wv,
    )
    return out, lse


def _bwd_kv_call(q, x, lns, lnb, wk, wv, do, o, lse, seed, num_heads,
                 scale, rate, kv_chunk, interpret):
    b, g, d = q.shape
    m, din = x.shape[1], x.shape[2]
    mc, bt = _kv_blocking(b, g, d, m, din, kv_chunk)
    h = num_heads
    dh = d // h
    ms = pl.ANY if interpret else pltpu.VMEM
    delta = jnp.sum(
        (do.astype(jnp.float32) * o.astype(jnp.float32)).reshape(
            b, g, h, dh
        ),
        axis=-1,
    ).transpose(0, 2, 1)  # [B, h, G]
    dq, dx, dwk, dwv, dlns, dlnb = pl.pallas_call(
        partial(_bwd_kv_kernel, float(scale), h, float(rate), q.dtype),
        grid=(b // bt, m // mc),
        out_shape=[
            jax.ShapeDtypeStruct((b, g, d), q.dtype),
            jax.ShapeDtypeStruct((b, m, din), x.dtype),
            jax.ShapeDtypeStruct((din, d), jnp.float32),
            jax.ShapeDtypeStruct((din, d), jnp.float32),
            jax.ShapeDtypeStruct((1, din), jnp.float32),
            jax.ShapeDtypeStruct((1, din), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [1]
            pl.BlockSpec((bt, g, d), lambda i, j: (i, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((bt, mc, din), lambda i, j: (i, j, 0),
                         memory_space=ms),
            _row_spec(din, ms),
            _row_spec(din, ms),
            pl.BlockSpec(wk.shape, lambda i, j: (0, 0), memory_space=ms),
            pl.BlockSpec(wv.shape, lambda i, j: (0, 0), memory_space=ms),
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
            pl.BlockSpec((bt, mc, din), lambda i, j: (i, j, 0),
                         memory_space=ms),
            pl.BlockSpec(wk.shape, lambda i, j: (0, 0), memory_space=ms),
            pl.BlockSpec(wv.shape, lambda i, j: (0, 0), memory_space=ms),
            _row_spec(din, ms),
            _row_spec(din, ms),
        ],
        scratch_shapes=[pltpu.VMEM((h, bt, g, dh), jnp.float32)],
        interpret=interpret,
    )(
        seed, q, x,
        lns.astype(jnp.float32).reshape(1, -1),
        lnb.astype(jnp.float32).reshape(1, -1),
        wk, wv, do, lse, delta,
    )
    return dq, dx, dwk, dwv, dlns[0], dlnb[0]


def _kv_tp_layout(q, num_heads):
    """shard_map layout for the kv-folded kernels, or None for a direct
    (single-device) call.

    DP: q/x/do batch-shard over the data axis; LN params and wk/wv are
    replicated, so the backward psums dwk/dwv/dlns/dlnb over data — the
    exact pattern ops/pallas/dense.py uses for its replicated-weight
    grads (the r3 gate kept this kernel single-device because these
    accumulators live in VMEM; the psum happens on the emitted outputs,
    outside the kernel, so nothing about the kernel changes per shard).

    TP (model_axis > 1): the packed head-major [B, G, H*dh] layout makes
    the Megatron column shards of wk/wv exactly whole heads, so each
    model shard projects and attends its own heads; dx then psums over
    the model axis (each shard contributes its heads' pullback into the
    shared kv tokens) and dlns/dlnb over both axes.
    """
    from vipformer_tpu.ops.pallas import shard

    if not shard.sharding_active():
        return None
    d, t = shard.data_size(), shard.model_size()
    if q.shape[0] % d or num_heads % t or q.shape[-1] % t:
        return None
    from jax.sharding import PartitionSpec as P

    da, ma = shard.data_axis(), shard.model_axis()
    mam = ma if t > 1 else None
    spec_q = P(da, None, mam)  # q / o / do / dq
    spec_x = P(da, None, None)  # x_kv / dx
    spec_w = P(None, mam)  # wk / wv / dwk / dwv
    lse_spec = P(da, mam, None)

    def seed_fn(seed):
        off = jax.lax.axis_index(da) * t
        if t > 1:
            off = off + jax.lax.axis_index(ma)
        return seed + off.astype(seed.dtype)

    return spec_q, spec_x, spec_w, lse_spec, num_heads // t, seed_fn, da, mam


def _fwd_kv_sharded(q, x, lns, lnb, wk, wv, seed, num_heads, scale, rate,
                    kv_chunk, interpret):
    layout = _kv_tp_layout(q, num_heads)
    if layout is None:
        return _fwd_kv_call(
            q, x, lns, lnb, wk, wv, seed, num_heads, scale, rate, kv_chunk,
            interpret,
        )
    spec_q, spec_x, spec_w, lse_spec, local_h, seed_fn, _, _ = layout
    from vipformer_tpu.ops.pallas import shard
    from jax.sharding import PartitionSpec as P

    def f(qq, xx, s1, b1, wkk, wvv, sd):
        return _fwd_kv_call(
            qq, xx, s1, b1, wkk, wvv, seed_fn(sd), local_h, scale, rate,
            kv_chunk, interpret,
        )

    return jax.shard_map(
        f, mesh=shard.active_mesh(),
        in_specs=(spec_q, spec_x, P(), P(), spec_w, spec_w, P()),
        out_specs=(spec_q, lse_spec),
        check_vma=False,
    )(q, x, lns, lnb, wk, wv, seed)


def _bwd_kv_sharded(q, x, lns, lnb, wk, wv, do, o, lse, seed, num_heads,
                    scale, rate, kv_chunk, interpret):
    layout = _kv_tp_layout(q, num_heads)
    if layout is None:
        return _bwd_kv_call(
            q, x, lns, lnb, wk, wv, do, o, lse, seed, num_heads, scale,
            rate, kv_chunk, interpret,
        )
    spec_q, spec_x, spec_w, lse_spec, local_h, seed_fn, da, mam = layout
    from vipformer_tpu.ops.pallas import shard
    from jax.sharding import PartitionSpec as P

    def f(qq, xx, s1, b1, wkk, wvv, dd, oo, ll, sd):
        dq, dx, dwk, dwv, dlns, dlnb = _bwd_kv_call(
            qq, xx, s1, b1, wkk, wvv, dd, oo, ll, seed_fn(sd), local_h,
            scale, rate, kv_chunk, interpret,
        )
        if mam is not None:
            dx = jax.lax.psum(dx, mam)
        dwk = jax.lax.psum(dwk, da)
        dwv = jax.lax.psum(dwv, da)
        red = (da,) if mam is None else (da, mam)
        dlns = jax.lax.psum(dlns, red)
        dlnb = jax.lax.psum(dlnb, red)
        return dq, dx, dwk, dwv, dlns, dlnb

    return jax.shard_map(
        f, mesh=shard.active_mesh(),
        in_specs=(
            spec_q, spec_x, P(), P(), spec_w, spec_w, spec_q, spec_q,
            lse_spec, P(),
        ),
        out_specs=(spec_q, spec_x, spec_w, spec_w, P(), P()),
        check_vma=False,
    )(q, x, lns, lnb, wk, wv, do, o, lse, seed)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def flash_attention_train_kv(
    q: Array,
    x_kv: Array,
    ln_scale: Array,
    ln_bias: Array,
    wk: Array,
    wv: Array,
    seed: Array,
    num_heads: int,
    scale: float,
    rate: float,
    kv_chunk: int | None = None,
    interpret: bool = False,
) -> Array:
    """flash_attention_train with the kv LayerNorm + bias-free k/v
    projections folded in.

    q [B, G, H*dh], x_kv [B, M, Din] RAW (pre-norm), ln_scale/ln_bias
    [Din] f32, wk/wv [Din, H*dh] -> [B, G, H*dh]. Gradients flow to all
    six array arguments. On a multi-device mesh the kernel runs under
    shard_map (batch over data, whole heads + wk/wv columns over model);
    the backward psums dwk/dwv/dln over the data axis and dx over the
    model axis (`_kv_tp_layout`), so DDP-equivalent grad semantics hold
    — reference `/root/reference/pretrain.py:104-109`.
    """
    out, _ = _fwd_kv_sharded(
        q, x_kv, ln_scale, ln_bias, wk, wv, seed, num_heads, scale, rate,
        kv_chunk, interpret,
    )
    return out


def _kv_vjp_fwd(q, x_kv, ln_scale, ln_bias, wk, wv, seed, num_heads,
                scale, rate, kv_chunk, interpret):
    out, lse = _fwd_kv_sharded(
        q, x_kv, ln_scale, ln_bias, wk, wv, seed, num_heads, scale, rate,
        kv_chunk, interpret,
    )
    return out, (q, x_kv, ln_scale, ln_bias, wk, wv, out, lse, seed)


def _kv_vjp_bwd(num_heads, scale, rate, kv_chunk, interpret, res, do):
    q, x_kv, ln_scale, ln_bias, wk, wv, o, lse, seed = res
    dq, dx, dwk, dwv, dlns, dlnb = _bwd_kv_sharded(
        q, x_kv, ln_scale, ln_bias, wk, wv, do, o, lse, seed, num_heads,
        scale, rate, kv_chunk, interpret,
    )
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (
        dq,
        dx,
        dlns.astype(ln_scale.dtype),
        dlnb.astype(ln_bias.dtype),
        dwk.astype(wk.dtype),
        dwv.astype(wv.dtype),
        dseed,
    )


flash_attention_train_kv.defvjp(_kv_vjp_fwd, _kv_vjp_bwd)


def flash_train_kv_enabled(
    num_heads: int,
    qk_ch: int,
    v_ch: int,
    g: int,
    m: int,
    d_in: int,
    pad_mask,
    deterministic: bool,
) -> bool:
    """Gate for the kv-folded training kernel (CrossAttention level).

    Multi-device meshes are served by `_kv_tp_layout`'s shard_map (r4):
    batch over data with psummed dwk/dwv/dln, whole heads + weight
    columns over model — so no mesh check here beyond what
    `flash_train_enabled`'s `tp_heads_shardable` already imposes.
    """
    if deterministic:
        return False
    if d_in % 128 or d_in > 1024:
        return False
    return flash_train_enabled(
        num_heads, qk_ch, v_ch, g, m, pad_mask, deterministic=False
    )


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
