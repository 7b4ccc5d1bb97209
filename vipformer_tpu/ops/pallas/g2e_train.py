"""Pallas TPU kernels: fused Group2Emb for TRAINING (fwd + custom-VJP bwd).

Why: the r3 per-component trace of the pretrain step (tools/profile_ops.py
+ HLO-metadata bucketing, B=192) attributes 30.5 ms of the 120 ms device
time to the Group2Emb mini-PointNet (reference `pointcloud/utils.py:
144-189`) — not to any one op, but to HBM traffic: XLA materializes and
re-reads the [B*G*S, C] activations ([1.57M, 64/128/256] at flagship
pretrain shapes, 0.2-0.8 GB each) once for the forward, and then several
more times in the backward for {dW, db, batch-norm dgamma/dbeta/dx, relu
masks, max-pool masks}, all at the reduce-fusion emitter's ~350 GB/s.

The fix is the flash-attention playbook applied to the patch embedder:
keep every [rows, C] activation block in VMEM and RECOMPUTE the cheap
parts of the chain instead of saving them. Only ONE intermediate is
cached in HBM — h3p, the pre-BatchNorm_1 activation ([R, 256] bf16) —
because everything downstream of it is VPU-only recoverable and
everything upstream of it is ~28 GFLOP to recompute from the tiny
[R, 3] input. Total: ~1.4 TFLOP of MXU work + ~3.3 GB of HBM traffic
across six passes, vs ~10 GB at 350 GB/s for the XLA lowering.

Chain implemented (exactly nn.pointnet.Group2Emb with train-mode
BatchNorm, flax semantics):

  h1p = x0 @ W0 + b0                    # Dense_0 [C_in -> 64]
  y1  = bn0(h1p)  (batch stats)         # BatchNorm_0
  x1  = relu(y1)
  h2  = x1 @ W1 + b1                    # Dense_1 [64 -> 128]
  gmax = max_S h2 ; xc = [gmax | h2]    # [rows, 256]
  h3p = xc @ W2 + b2                    # Dense_2 [256 -> 256]   (cached)
  x3  = relu(bn1(h3p))                  # BatchNorm_1
  h4  = x3 @ W3 + b3                    # Dense_3 [256 -> D]
  out = max_S h4                        # [B, G, D]

Passes (each its own pallas_call; the sequential TPU grid accumulates
f32 stats/weight-grad blocks across cells exactly like ops/pallas/dense):

  F1: batch sum/sumsq of h1p            -> bn0 stats
  F2: recompute to h3p, write cache,
      batch sum/sumsq of h3p            -> bn1 stats
  F3: h3p -> out, argmax4
  P1: dW3, db3, bn1 grad sums (s1b,s2b)
  P2: dW2, db2, dW1, db1, bn0 grad sums, dy1 cache ([R, 64] bf16)
  P3: dW0, db0, dx0

Numerics match the XLA path within float-rounding: Dense is
f32-accumulated then cast to the compute dtype before the bias add
(nn.layers.Dense); BatchNorm statistics and normalization math are f32
on the bf16-rounded activations (flax `_compute_stats`/`_normalize`,
fast variance clipped at 0); relu masks are taken on the recomputed
bf16 values, bitwise identical across passes. Max-pool gradients over
the group axis use jax's equal-split-on-ties convention for the h2
global-feature pool (mask/count, recomputed in P2); the FINAL pool's
subgradient routes to the first argmax (stored in F3 as int32) — under
exact ties this differs from jax's split, but both are valid
subgradients and ties are measure-zero in f32 (the parity tests pass
exactly); under bf16 the choice is statistically irrelevant.

BatchNorm running stats: the fwd returns (mu, var) per BN so the module
applies flax's momentum update outside the kernel; they are emitted
stop-gradient (the XLA path's running-stat update is likewise
undifferentiated), while the NORMALIZATION's dependence on the batch
stats is fully differentiated through the standard BN backward
  dh = (gamma*rstd) * (dy - mean(dy) - xhat * mean(dy*xhat)).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# auto policy: kernel on TPU in train mode when shapes qualify
USE_G2E_TRAIN: bool | None = None

_BN_EPS = 1e-5


# Explicit DEFAULT precision on every kernel dot: the kernel's contract is
# one native MXU pass with f32 accumulation (matching nn.layers.Dense at
# compute dtype). Under jax_default_matmul_precision="highest" (e.g. the
# test suite's conftest) Mosaic would otherwise be asked for a multi-pass
# bf16 dot it cannot lower ("Bad lhs type").
_PREC = jax.lax.Precision.DEFAULT


def _dense(x, w_ref, b_ref, dt):
    """nn.layers.Dense numerics: f32-accum matmul -> cast -> + bias."""
    y = jax.lax.dot_general(
        x, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC,
    ).astype(dt)
    return y + b_ref[...][0]


def _dense_t(dy, w_ref):
    """dx = dy @ W^T in f32."""
    return jax.lax.dot_general(
        dy, w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC,
    )


def _acc_dw(acc_ref, x, dy):
    """acc += x^T dy (f32)."""
    acc_ref[...] += jax.lax.dot_general(
        x, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_PREC,
    )


def _colsum(x):
    return jnp.sum(x, axis=0, keepdims=True)


def _zero_at_first(*refs):
    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in refs:
            r[...] = jnp.zeros_like(r)


# ------------------------------------------------------------------ fwd


def _f1_kernel(x0_ref, w0_ref, b0_ref, s_ref, ss_ref):
    _zero_at_first(s_ref, ss_ref)
    dt = x0_ref.dtype
    h1p = _dense(x0_ref[...], w0_ref, b0_ref, dt).astype(jnp.float32)
    s_ref[...] += _colsum(h1p)
    ss_ref[...] += _colsum(h1p * h1p)


def _recompute_to_xc(s, x0_ref, w0_ref, b0_ref, a0_ref, c0_ref,
                     w1_ref, b1_ref):
    """x0 block -> (x1 [rows,64] bf16, xc [rows,256] bf16)."""
    dt = x0_ref.dtype
    h1p = _dense(x0_ref[...], w0_ref, b0_ref, dt)
    y1 = (
        h1p.astype(jnp.float32) * a0_ref[...][0] + c0_ref[...][0]
    ).astype(dt)
    x1 = jax.nn.relu(y1)
    h2 = _dense(x1, w1_ref, b1_ref, dt)  # [rows, 128]
    rows, c2 = h2.shape
    gmax = jnp.max(h2.reshape(rows // s, s, c2), axis=1)  # [gc, 128]
    gbig = jax.lax.broadcast_in_dim(
        gmax, (rows // s, s, c2), (0, 2)
    ).reshape(rows, c2)
    xc = jnp.concatenate([gbig, h2], axis=1)  # [rows, 256]
    return x1, h2, gmax, xc


def _f2_kernel(s, x0_ref, w0_ref, b0_ref, a0_ref, c0_ref, w1_ref, b1_ref,
               w2_ref, b2_ref, h3p_ref, s_out, ss_out):
    _zero_at_first(s_out, ss_out)
    dt = x0_ref.dtype
    _, _, _, xc = _recompute_to_xc(
        s, x0_ref, w0_ref, b0_ref, a0_ref, c0_ref, w1_ref, b1_ref
    )
    h3p = _dense(xc, w2_ref, b2_ref, dt)
    h3p_ref[...] = h3p
    h3f = h3p.astype(jnp.float32)
    s_out[...] += _colsum(h3f)
    ss_out[...] += _colsum(h3f * h3f)


def _f3_kernel(s, h3p_ref, a1_ref, c1_ref, w3_ref, b3_ref,
               out_ref, amax_ref):
    dt = h3p_ref.dtype
    y3 = (
        h3p_ref[...].astype(jnp.float32) * a1_ref[...][0] + c1_ref[...][0]
    ).astype(dt)
    x3 = jax.nn.relu(y3)
    h4 = _dense(x3, w3_ref, b3_ref, dt)  # [rows, D]
    rows, d = h4.shape
    gc = rows // s
    h4g = h4.reshape(gc, s, d)
    mx = jnp.max(h4g, axis=1)
    out_ref[...] = mx
    # select-first-argmax without an i1 select: Mosaic's layout inference
    # demands the select mask lane-replicated whenever both value operands
    # are (iota varies only by row), and relayouting a concrete mask to a
    # replicated layout is invalid ("Non-singleton logical dimension is
    # replicated in destination but not in source"). Cast the miss mask to
    # i32 and blend arithmetically instead — replicated->concrete
    # relayouts of the value operands are legal.
    mxbig = jax.lax.broadcast_in_dim(mx, (gc, s, d), (0, 2)).reshape(
        rows, d
    )
    iota = jax.lax.broadcasted_iota(jnp.int32, (gc, s, d), 1).reshape(
        rows, d
    )
    # f32 compare: the VPU has no bf16 compare ("Target does not
    # support this comparison"); exactness is preserved (bf16 -> f32
    # widening is injective)
    miss = (
        h4.astype(jnp.float32) != mxbig.astype(jnp.float32)
    ).astype(jnp.int32)  # 0 at a max, 1 elsewhere
    cand = iota + (s - iota) * miss  # iota at a max, s elsewhere
    first = jnp.min(cand.reshape(gc, s, d), axis=1)
    amax_ref[...] = first.astype(jnp.int32)


# ------------------------------------------------------------------ bwd


def _dh4_from(s, dy_ref, amax_ref, rows, d):
    """Scatter dy rows to the stored argmax position of each group."""
    dyg = dy_ref[...]  # [gc, D]
    am = amax_ref[...]  # [gc, D] int32
    gc = rows // s
    # mask-cast + multiply for the same Mosaic-relayout reason as
    # _f3_kernel (no i1 select with replicated value operands)
    iota = jax.lax.broadcasted_iota(jnp.int32, (gc, s, d), 1).reshape(
        rows, d
    )
    ambig = jax.lax.broadcast_in_dim(am, (gc, s, d), (0, 2)).reshape(
        rows, d
    )
    dybig = jax.lax.broadcast_in_dim(dyg, (gc, s, d), (0, 2)).reshape(
        rows, d
    )
    return dybig * (iota == ambig).astype(dybig.dtype)


def _x3_from_h3p(h3p_ref, a1_ref, c1_ref):
    dt = h3p_ref.dtype
    y3 = (
        h3p_ref[...].astype(jnp.float32) * a1_ref[...][0] + c1_ref[...][0]
    ).astype(dt)
    return jax.nn.relu(y3)


def _p1_kernel(s, h3p_ref, dy_ref, amax_ref, a1_ref, c1_ref, w3_ref,
               mu1_ref, rstd1_ref,
               dw3_ref, db3_ref, s1b_ref, s2b_ref):
    _zero_at_first(dw3_ref, db3_ref, s1b_ref, s2b_ref)
    dt = h3p_ref.dtype
    x3 = _x3_from_h3p(h3p_ref, a1_ref, c1_ref)
    rows = x3.shape[0]
    d = dy_ref.shape[-1]
    dh4 = _dh4_from(s, dy_ref, amax_ref, rows, d).astype(dt)
    _acc_dw(dw3_ref, x3, dh4)
    db3_ref[...] += _colsum(dh4.astype(jnp.float32))
    dx3 = _dense_t(dh4, w3_ref)  # f32 [rows, 256]
    dy3 = jnp.where(x3.astype(jnp.float32) > 0, dx3, 0.0)
    xhat3 = (
        h3p_ref[...].astype(jnp.float32) - mu1_ref[...][0]
    ) * rstd1_ref[...][0]
    s1b_ref[...] += _colsum(dy3)
    s2b_ref[...] += _colsum(dy3 * xhat3)


def _p2_kernel(s, x0_ref, h3p_ref, dy_ref, amax_ref,
               w0_ref, b0_ref, a0_ref, c0_ref, w1_ref, b1_ref,
               a1_ref, c1_ref, w2_ref, w3_ref,
               mu1_ref, rstd1_ref, g1m_ref, m1b_ref, m2b_ref,
               mu0_ref, rstd0_ref,
               dy1_ref, dw2_ref, db2_ref, dw1_ref, db1_ref,
               s1a_ref, s2a_ref):
    _zero_at_first(dw2_ref, db2_ref, dw1_ref, db1_ref, s1a_ref, s2a_ref)
    dt = x0_ref.dtype
    x1, h2, gmax, xc = _recompute_to_xc(
        s, x0_ref, w0_ref, b0_ref, a0_ref, c0_ref, w1_ref, b1_ref
    )
    x3 = _x3_from_h3p(h3p_ref, a1_ref, c1_ref)
    rows = x1.shape[0]
    d = dy_ref.shape[-1]
    dh4 = _dh4_from(s, dy_ref, amax_ref, rows, d).astype(dt)
    dx3 = _dense_t(dh4, w3_ref)
    dy3 = jnp.where(x3.astype(jnp.float32) > 0, dx3, 0.0)
    xhat3 = (
        h3p_ref[...].astype(jnp.float32) - mu1_ref[...][0]
    ) * rstd1_ref[...][0]
    # g1m = gamma1 * rstd1; m1b/m2b = mean(dy3), mean(dy3*xhat3) from P1
    dh3p = (
        g1m_ref[...][0] * (dy3 - m1b_ref[...][0] - xhat3 * m2b_ref[...][0])
    ).astype(dt)
    _acc_dw(dw2_ref, xc, dh3p)
    db2_ref[...] += _colsum(dh3p.astype(jnp.float32))
    dxc = _dense_t(dh3p, w2_ref)  # f32 [rows, 256]
    c2 = h2.shape[1]
    dgbig = dxc[:, :c2]
    dh2loc = dxc[:, c2:]
    gc = rows // s
    dgmax = jnp.sum(dgbig.reshape(gc, s, c2), axis=1)  # [gc, 128]
    # tie-splitting maxpool backward in 2-D arithmetic form: f32 compare
    # (no bf16 VPU compare) and mask-cast * multiply instead of an i1
    # select whose value operands are both sublane-replicated (same
    # Mosaic relayout limitation as _f3_kernel)
    h2f = h2.astype(jnp.float32)
    gmaxbig = jax.lax.broadcast_in_dim(
        gmax.astype(jnp.float32), (gc, s, c2), (0, 2)
    ).reshape(rows, c2)
    eqf = (h2f == gmaxbig).astype(jnp.float32)  # [rows, c2]
    cnt = jnp.sum(eqf.reshape(gc, s, c2), axis=1)  # [gc, 128]
    sharebig = jax.lax.broadcast_in_dim(
        dgmax / cnt, (gc, s, c2), (0, 2)
    ).reshape(rows, c2)
    dh2 = (dh2loc + sharebig * eqf).astype(dt)
    _acc_dw(dw1_ref, x1, dh2)
    db1_ref[...] += _colsum(dh2.astype(jnp.float32))
    dx1 = _dense_t(dh2, w1_ref)  # f32 [rows, 64]
    dy1 = jnp.where(x1.astype(jnp.float32) > 0, dx1, 0.0)
    dy1_ref[...] = dy1.astype(dt)
    h1p = _dense(x0_ref[...], w0_ref, b0_ref, dt)
    xhat1 = (
        h1p.astype(jnp.float32) - mu0_ref[...][0]
    ) * rstd0_ref[...][0]
    s1a_ref[...] += _colsum(dy1)
    s2a_ref[...] += _colsum(dy1 * xhat1)


def _p3_kernel(x0_ref, dy1_ref, w0_ref, b0_ref,
               mu0_ref, rstd0_ref, g0m_ref, m1_ref, m2_ref,
               dx0_ref, dw0_ref, db0_ref):
    _zero_at_first(dw0_ref, db0_ref)
    dt = x0_ref.dtype
    h1p = _dense(x0_ref[...], w0_ref, b0_ref, dt)
    xhat1 = (
        h1p.astype(jnp.float32) - mu0_ref[...][0]
    ) * rstd0_ref[...][0]
    dy1 = dy1_ref[...].astype(jnp.float32)
    dh1p = (
        g0m_ref[...][0] * (dy1 - m1_ref[...][0] - xhat1 * m2_ref[...][0])
    ).astype(dt)
    _acc_dw(dw0_ref, x0_ref[...], dh1p)
    db0_ref[...] += _colsum(dh1p.astype(jnp.float32))
    dx0_ref[...] = _dense_t(dh1p, w0_ref).astype(dt)


# ------------------------------------------------------- host-side glue


def _pick_block_rows(r: int, s: int) -> int:
    """Row block: whole groups, divides R, near 1024 rows."""
    groups_total = r // s
    gc = max(1, min(groups_total, max(1, 1024 // s)))
    while groups_total % gc:
        gc -= 1
    return gc * s


def _row_spec(br, c, ms):
    return pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=ms)


def _acc_spec(shape, ms):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=ms)


def _wrow(x):
    return x.reshape(1, -1).astype(jnp.float32)


def _stats_from(s, ss, n):
    mu = s / n
    var = jnp.maximum(ss / n - mu * mu, 0.0)
    return mu, var


@partial(
    jax.jit,
    static_argnames=("s", "interpret", "psum_axis", "global_rows"),
)
def _g2e_fwd_impl(x0f, wb, s: int, interpret: bool = False,
                  psum_axis: str | None = None,
                  global_rows: int | None = None):
    """x0f [R, Cin] (R = B*G*S, group-major) -> (out [R//s, D], caches).

    `psum_axis`: when running per-shard under shard_map, the BatchNorm
    batch statistics must be GLOBAL (this framework's BN is sync-BN over
    the data axis, nn/layers.py `batch_norm`) — the per-shard sum/sumsq
    accumulators are psummed over that axis and `global_rows` (the full
    batch's row count) is the divisor.
    """
    (w0, b0, g0, be0, w1, b1, w2, b2, g1, be1, w3, b3) = wb
    r, cin = x0f.shape
    dt = x0f.dtype
    br = _pick_block_rows(r, s)
    grid = (r // br,)
    ms = pl.ANY if interpret else pltpu.VMEM
    n = float(global_rows if global_rows is not None else r)
    c1, c2, c3, d = (
        w0.shape[1], w1.shape[1], w2.shape[1], w3.shape[1]
    )

    f32 = jnp.float32
    s1, ss1 = pl.pallas_call(
        _f1_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, c1), f32),
            jax.ShapeDtypeStruct((1, c1), f32),
        ),
        grid=grid,
        in_specs=[
            _row_spec(br, cin, ms),
            _acc_spec(w0.shape, ms),
            _acc_spec((1, c1), ms),
        ],
        out_specs=(_acc_spec((1, c1), ms), _acc_spec((1, c1), ms)),
        interpret=interpret,
    )(x0f, w0.astype(dt), _wrow(b0).astype(dt))
    if psum_axis is not None:
        s1 = jax.lax.psum(s1, psum_axis)
        ss1 = jax.lax.psum(ss1, psum_axis)
    mu0, var0 = _stats_from(s1[0], ss1[0], n)
    rstd0 = jax.lax.rsqrt(var0 + _BN_EPS)
    a0 = g0.astype(f32) * rstd0
    c0 = be0.astype(f32) - mu0 * a0

    h3p, s2, ss2 = pl.pallas_call(
        partial(_f2_kernel, s),
        out_shape=(
            jax.ShapeDtypeStruct((r, c3), dt),
            jax.ShapeDtypeStruct((1, c3), f32),
            jax.ShapeDtypeStruct((1, c3), f32),
        ),
        grid=grid,
        in_specs=[
            _row_spec(br, cin, ms),
            _acc_spec(w0.shape, ms),
            _acc_spec((1, c1), ms),
            _acc_spec((1, c1), ms),
            _acc_spec((1, c1), ms),
            _acc_spec(w1.shape, ms),
            _acc_spec((1, c2), ms),
            _acc_spec(w2.shape, ms),
            _acc_spec((1, c3), ms),
        ],
        out_specs=(
            _row_spec(br, c3, ms),
            _acc_spec((1, c3), ms),
            _acc_spec((1, c3), ms),
        ),
        interpret=interpret,
    )(
        x0f, w0.astype(dt), _wrow(b0).astype(dt),
        _wrow(a0), _wrow(c0),
        w1.astype(dt), _wrow(b1).astype(dt),
        w2.astype(dt), _wrow(b2).astype(dt),
    )
    if psum_axis is not None:
        s2 = jax.lax.psum(s2, psum_axis)
        ss2 = jax.lax.psum(ss2, psum_axis)
    mu1, var1 = _stats_from(s2[0], ss2[0], n)
    rstd1 = jax.lax.rsqrt(var1 + _BN_EPS)
    a1 = g1.astype(f32) * rstd1
    c1_ = be1.astype(f32) - mu1 * a1

    gb = br // s
    out, amax = pl.pallas_call(
        partial(_f3_kernel, s),
        out_shape=(
            jax.ShapeDtypeStruct((r // s, d), dt),
            jax.ShapeDtypeStruct((r // s, d), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            _row_spec(br, c3, ms),
            _acc_spec((1, c3), ms),
            _acc_spec((1, c3), ms),
            _acc_spec(w3.shape, ms),
            _acc_spec((1, d), ms),
        ],
        out_specs=(
            _row_spec(gb, d, ms),
            _row_spec(gb, d, ms),
        ),
        interpret=interpret,
    )(h3p, _wrow(a1), _wrow(c1_), w3.astype(dt), _wrow(b3).astype(dt))

    stats = (mu0, var0, rstd0, mu1, var1, rstd1)
    return out, h3p, amax, stats


@partial(
    jax.jit, static_argnames=("s", "interpret", "psum_axis", "global_rows")
)
def _g2e_bwd_impl(x0f, wb, h3p, amax, stats, dyf, s: int,
                  interpret: bool = False, psum_axis: str | None = None,
                  global_rows: int | None = None):
    (w0, b0, g0, be0, w1, b1, w2, b2, g1, be1, w3, b3) = wb
    (mu0, var0, rstd0, mu1, var1, rstd1) = stats
    r, cin = x0f.shape
    dt = x0f.dtype
    br = _pick_block_rows(r, s)
    grid = (r // br,)
    gb = br // s
    ms = pl.ANY if interpret else pltpu.VMEM
    n = float(global_rows if global_rows is not None else r)
    f32 = jnp.float32
    c1, c2, c3, d = (
        w0.shape[1], w1.shape[1], w2.shape[1], w3.shape[1]
    )
    a0 = g0.astype(f32) * rstd0
    c0 = be0.astype(f32) - mu0 * a0
    a1 = g1.astype(f32) * rstd1
    c1_ = be1.astype(f32) - mu1 * a1

    dw3, db3, s1b, s2b = pl.pallas_call(
        partial(_p1_kernel, s),
        out_shape=(
            jax.ShapeDtypeStruct((c3, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((1, c3), f32),
            jax.ShapeDtypeStruct((1, c3), f32),
        ),
        grid=grid,
        in_specs=[
            _row_spec(br, c3, ms),
            _row_spec(gb, d, ms),
            _row_spec(gb, d, ms),
            _acc_spec((1, c3), ms),
            _acc_spec((1, c3), ms),
            _acc_spec(w3.shape, ms),
            _acc_spec((1, c3), ms),
            _acc_spec((1, c3), ms),
        ],
        out_specs=(
            _acc_spec((c3, d), ms),
            _acc_spec((1, d), ms),
            _acc_spec((1, c3), ms),
            _acc_spec((1, c3), ms),
        ),
        interpret=interpret,
    )(
        h3p, dyf, amax, _wrow(a1), _wrow(c1_), w3.astype(dt),
        _wrow(mu1), _wrow(rstd1),
    )
    if psum_axis is not None:
        # weight grads and the BN-backward batch means are sums over ALL
        # rows; reduce the shard-local partials before they feed the
        # per-row dx math of the next pass
        dw3 = jax.lax.psum(dw3, psum_axis)
        db3 = jax.lax.psum(db3, psum_axis)
        s1b = jax.lax.psum(s1b, psum_axis)
        s2b = jax.lax.psum(s2b, psum_axis)
    g1m = g1.astype(f32) * rstd1  # gamma1 * rstd1
    m1b = s1b[0] / n
    m2b = s2b[0] / n

    dy1c, dw2, db2, dw1, db1, s1a, s2a = pl.pallas_call(
        partial(_p2_kernel, s),
        out_shape=(
            jax.ShapeDtypeStruct((r, c1), dt),
            jax.ShapeDtypeStruct(w2.shape, f32),
            jax.ShapeDtypeStruct((1, c3), f32),
            jax.ShapeDtypeStruct(w1.shape, f32),
            jax.ShapeDtypeStruct((1, c2), f32),
            jax.ShapeDtypeStruct((1, c1), f32),
            jax.ShapeDtypeStruct((1, c1), f32),
        ),
        grid=grid,
        in_specs=[
            _row_spec(br, cin, ms),
            _row_spec(br, c3, ms),
            _row_spec(gb, d, ms),
            _row_spec(gb, d, ms),
            _acc_spec(w0.shape, ms),
            _acc_spec((1, c1), ms),
            _acc_spec((1, c1), ms),
            _acc_spec((1, c1), ms),
            _acc_spec(w1.shape, ms),
            _acc_spec((1, c2), ms),
            _acc_spec((1, c3), ms),
            _acc_spec((1, c3), ms),
            _acc_spec(w2.shape, ms),
            _acc_spec(w3.shape, ms),
            _acc_spec((1, c3), ms),
            _acc_spec((1, c3), ms),
            _acc_spec((1, c3), ms),
            _acc_spec((1, c3), ms),
            _acc_spec((1, c3), ms),
            _acc_spec((1, c1), ms),
            _acc_spec((1, c1), ms),
        ],
        out_specs=(
            _row_spec(br, c1, ms),
            _acc_spec(w2.shape, ms),
            _acc_spec((1, c3), ms),
            _acc_spec(w1.shape, ms),
            _acc_spec((1, c2), ms),
            _acc_spec((1, c1), ms),
            _acc_spec((1, c1), ms),
        ),
        interpret=interpret,
    )(
        x0f, h3p, dyf, amax,
        w0.astype(dt), _wrow(b0).astype(dt), _wrow(a0), _wrow(c0),
        w1.astype(dt), _wrow(b1).astype(dt),
        _wrow(a1), _wrow(c1_), w2.astype(dt), w3.astype(dt),
        _wrow(mu1), _wrow(rstd1),
        _wrow(g1m), _wrow(m1b), _wrow(m2b),
        _wrow(mu0), _wrow(rstd0),
    )
    if psum_axis is not None:
        dw2 = jax.lax.psum(dw2, psum_axis)
        db2 = jax.lax.psum(db2, psum_axis)
        dw1 = jax.lax.psum(dw1, psum_axis)
        db1 = jax.lax.psum(db1, psum_axis)
        s1a = jax.lax.psum(s1a, psum_axis)
        s2a = jax.lax.psum(s2a, psum_axis)
    g0m = g0.astype(f32) * rstd0
    m1a = s1a[0] / n
    m2a = s2a[0] / n

    dx0, dw0, db0 = pl.pallas_call(
        _p3_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((r, cin), dt),
            jax.ShapeDtypeStruct((cin, c1), f32),
            jax.ShapeDtypeStruct((1, c1), f32),
        ),
        grid=grid,
        in_specs=[
            _row_spec(br, cin, ms),
            _row_spec(br, c1, ms),
            _acc_spec(w0.shape, ms),
            _acc_spec((1, c1), ms),
            _acc_spec((1, c1), ms),
            _acc_spec((1, c1), ms),
            _acc_spec((1, c1), ms),
            _acc_spec((1, c1), ms),
            _acc_spec((1, c1), ms),
        ],
        out_specs=(
            _row_spec(br, cin, ms),
            _acc_spec((cin, c1), ms),
            _acc_spec((1, c1), ms),
        ),
        interpret=interpret,
    )(
        x0f, dy1c, w0.astype(dt), _wrow(b0).astype(dt),
        _wrow(mu0), _wrow(rstd0), _wrow(g0m), _wrow(m1a), _wrow(m2a),
    )

    if psum_axis is not None:
        dw0 = jax.lax.psum(dw0, psum_axis)
        db0 = jax.lax.psum(db0, psum_axis)
    # param grads: dgamma = sum(dy * xhat), dbeta = sum(dy); weight grads
    # cast to the param dtypes
    grads = (
        dw0.astype(w0.dtype), db0[0].astype(b0.dtype),
        s2a[0].astype(g0.dtype), s1a[0].astype(be0.dtype),
        dw1.astype(w1.dtype), db1[0].astype(b1.dtype),
        dw2.astype(w2.dtype), db2[0].astype(b2.dtype),
        s2b[0].astype(g1.dtype), s1b[0].astype(be1.dtype),
        dw3.astype(w3.dtype), db3[0].astype(b3.dtype),
    )
    return dx0, grads


# --------------------------------------------------------- public API


def _g2e_fwd_sharded(x0f, wb, s, interpret):
    """Per-data-shard forward under shard_map; BN stats psummed to global
    (see `_g2e_fwd_impl`'s psum_axis). Direct call off-mesh."""
    from vipformer_tpu.ops.pallas import shard

    r = x0f.shape[0]
    if not shard.sharding_active() or r % shard.data_size():
        return _g2e_fwd_impl(x0f, wb, s=s, interpret=interpret)
    from jax.sharding import PartitionSpec as P

    da = shard.data_axis()
    row = P(da, None)

    def f(xx, *wbt):
        return _g2e_fwd_impl(
            xx, tuple(wbt), s=s, interpret=interpret,
            psum_axis=da, global_rows=r,
        )

    return jax.shard_map(
        f, mesh=shard.active_mesh(),
        in_specs=(row,) + (P(),) * len(wb),
        out_specs=(row, row, row, tuple(P() for _ in range(6))),
        check_vma=False,
    )(x0f, *wb)


def _g2e_bwd_sharded(x0f, wb, h3p, amax, stats, dyf, s, interpret):
    """Per-data-shard backward; weight grads and BN-backward batch means
    psummed inside (see `_g2e_bwd_impl`)."""
    from vipformer_tpu.ops.pallas import shard

    r = x0f.shape[0]
    if not shard.sharding_active() or r % shard.data_size():
        return _g2e_bwd_impl(
            x0f, wb, h3p, amax, stats, dyf, s=s, interpret=interpret
        )
    from jax.sharding import PartitionSpec as P

    da = shard.data_axis()
    row = P(da, None)

    nst = len(stats)

    def f(xx, hh, aa, dd, *rest):
        wbt, stt = rest[: len(wb)], rest[len(wb):]
        return _g2e_bwd_impl(
            xx, tuple(wbt), hh, aa, tuple(stt), dd, s=s,
            interpret=interpret, psum_axis=da, global_rows=r,
        )

    return jax.shard_map(
        f, mesh=shard.active_mesh(),
        in_specs=(row, row, row, row) + (P(),) * (len(wb) + nst),
        out_specs=(row, tuple(P() for _ in range(12))),
        check_vma=False,
    )(x0f, h3p, amax, dyf, *wb, *stats)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def g2e_train_apply(x0, wb, s: int, interpret: bool = False):
    """Fused train-mode Group2Emb.

    x0: [B, G, S, Cin] neighbor patches (divide_patches output).
    wb: 12-tuple (w0, b0, gamma0, beta0, w1, b1, w2, b2, gamma1, beta1,
        w3, b3) — the Dense_0..3 / BatchNorm_0..1 leaves of the flax
        Group2Emb param tree, in chain order.
    Returns (out [B, G, D], (mu0, var0, mu1, var1)) where the stats are
    the f32 batch statistics for the running-average update.
    """
    out, _, _, stats = _g2e_fwd_sharded(
        x0.reshape(-1, x0.shape[-1]), wb, s, interpret
    )
    (mu0, var0, _, mu1, var1, _) = stats
    b, g = x0.shape[0], x0.shape[1]
    return (
        out.reshape(b, g, -1),
        jax.tree_util.tree_map(
            jax.lax.stop_gradient, (mu0, var0, mu1, var1)
        ),
    )


def _g2e_vjp_fwd(x0, wb, s, interpret):
    x0f = x0.reshape(-1, x0.shape[-1])
    out, h3p, amax, stats = _g2e_fwd_sharded(x0f, wb, s, interpret)
    (mu0, var0, _, mu1, var1, _) = stats
    b, g = x0.shape[0], x0.shape[1]
    res = (x0f, wb, h3p, amax, stats, x0.shape)
    return (
        out.reshape(b, g, -1),
        jax.tree_util.tree_map(
            jax.lax.stop_gradient, (mu0, var0, mu1, var1)
        ),
    ), res


def _g2e_vjp_bwd(s, interpret, res, cts):
    dy, _ = cts  # stats cotangents are zero (stop_gradient at use sites)
    x0f, wb, h3p, amax, stats, x0_shape = res
    dyf = dy.reshape(-1, dy.shape[-1]).astype(x0f.dtype)
    dx0, grads = _g2e_bwd_sharded(
        x0f, wb, h3p, amax, stats, dyf, s, interpret
    )
    return dx0.reshape(x0_shape), grads


g2e_train_apply.defvjp(_g2e_vjp_fwd, _g2e_vjp_bwd)


def g2e_train_supported(b: int, g: int, s: int, cin: int) -> bool:
    """Shape gate: whole groups must tile into row blocks (per data shard
    on a multi-device mesh — the kernel runs under shard_map there)."""
    from vipformer_tpu.ops.pallas import shard

    if shard.sharding_active():
        if b % shard.data_size():
            return False
        b = b // shard.data_size()
    r = b * g * s
    br = _pick_block_rows(r, s)
    return (
        s >= 2
        and br % s == 0
        and r % br == 0
        and (br // s) >= 1
        and cin <= 16
    )


def g2e_train_enabled() -> bool:
    # no TP gate: the mini-PointNet operands (patch tables, stem weights)
    # are never feature-sharded; the shard_map wrappers handle DP meshes
    # with psummed weight grads / BN stats
    if USE_G2E_TRAIN is not None:
        return USE_G2E_TRAIN
    return jax.default_backend() == "tpu"
