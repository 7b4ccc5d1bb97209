"""Pallas TPU kernel: LayerNorm forward + backward as single row-stream passes.

Status: built to chase the r3 eval-profile `convert_reduce_fusion` ops
(Dense matmul + LN stats fused, ~161 us each at B=128), then measured
SLOWER in-model and left OFF by default — see `layernorm_enabled`.  The
investigation instead found the real cost inside those megafusions was
the erfc-form exact GELU (fixed in nn.layers.gelu_exact: MLP block
161 -> 80 us); XLA's own LN handling (stats fused into the producer
matmul, normalize fused into consumers) is already free, while this
kernel adds an HBM round-trip and a launch per site.

Kept because it is correct, tested, and the escape hatch if XLA's
reduce emitter regresses at a new shape: fwd is one VMEM pass (read x,
write y + per-row mu/rsig), bwd is one pass emitting dx and
accumulating the [D] dscale/dbias column sums in resident f32 blocks —
the same tall-skinny-reduce shape ops/pallas/dense.py rescued for
Dense grads.  Force with USE_LAYERNORM=True.

Numerics match flax.linen.LayerNorm exactly: stats in f32 with the
fast-variance form var = max(0, E[x^2] - E[x]^2), eps added inside
rsqrt, output cast to the compute dtype (flax normalization.py:138-141,
:206-226).  The analytic VJP is identical to autodiff's because
E[x^2]-E[x]^2 == E[(x-mu)^2] in exact arithmetic.

Reference counterpart: torch.nn.LayerNorm inside every pre-LN block
(`/root/reference/vipformer/model/core/modules.py:107-156`); cuDNN owns
this fusion there — on TPU we own it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

EPS = 1e-5

# None = auto policy (TPU + qualifying shapes); bool forces on/off
USE_LAYERNORM: bool | None = None

# double-buffered x blocks + f32 temps must fit beside Mosaic scratch
_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_block_rows(r: int, d: int, itemsize: int) -> int:
    br = 4096
    while br >= 256:
        # resident set: double-buffered in/out blocks (2+2 x itemsize) plus
        # Mosaic's f32 temporaries (xf, xf*xf, y ~= 3 x 4 bytes); measured:
        # br=2048 at d=256 bf16 asked for 18.5 MB of the 16 MB scoped vmem
        if r % br == 0 and br * d * (4 * itemsize + 12) <= _VMEM_BUDGET:
            return br
        br //= 2
    return 0


def _fwd_kernel(x_ref, s_ref, b_ref, y_ref, mu_ref, rsig_ref):
    xf = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    rsig = jax.lax.rsqrt(var + EPS)
    y = (xf - mu) * (rsig * s_ref[...]) + b_ref[...]
    y_ref[...] = y.astype(y_ref.dtype)
    mu_ref[...] = mu
    rsig_ref[...] = rsig


def _bwd_kernel(x_ref, dy_ref, mu_ref, rsig_ref, s_ref,
                dx_ref, ds_ref, db_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    xf = x_ref[...].astype(jnp.float32)
    dyf = dy_ref[...].astype(jnp.float32)
    mu = mu_ref[...]
    rsig = rsig_ref[...]
    xhat = (xf - mu) * rsig
    dxhat = dyf * s_ref[...]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rsig * (dxhat - m1 - xhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    ds_ref[...] += jnp.sum(dyf * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dyf, axis=0, keepdims=True)


def _fwd_call(x2d: Array, s2d: Array, b2d: Array, interpret: bool):
    r, d = x2d.shape
    br = _pick_block_rows(r, d, x2d.dtype.itemsize)
    y, mu, rsig = pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((r, d), x2d.dtype),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((br, 1), lambda i: (i, 0)),
            pl.BlockSpec((br, 1), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(x2d, s2d, b2d)
    return y, mu, rsig


def _bwd_call(x2d, dy2d, mu, rsig, s2d, interpret: bool):
    r, d = x2d.shape
    br = _pick_block_rows(r, d, x2d.dtype.itemsize)
    dx, ds, db = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((r, d), x2d.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((br, 1), lambda i: (i, 0)),
            pl.BlockSpec((br, 1), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((br, d), lambda i: (i, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ),
        interpret=interpret,
    )(x2d, dy2d, mu, rsig, s2d)
    return dx, ds[0], db[0]


def layernorm_enabled(rows: int, d: int, itemsize: int) -> bool:
    """Auto policy: on-TPU, lane-aligned feature dim, enough rows to
    amortize the launch, per-(data-)shard rows divide a feasible block."""
    from vipformer_tpu.ops.pallas import shard

    if shard.model_size() > 1:
        # under TP the LN inputs are replicated over the model axis; the
        # XLA path partitions itself correctly, the kernel would need its
        # own replication story — same policy as ops/pallas/dense.py
        return False
    if shard.sharding_active():
        if rows % shard.data_size():
            return False
        rows = rows // shard.data_size()
    if USE_LAYERNORM is not None:
        return USE_LAYERNORM and _pick_block_rows(rows, d, itemsize) > 0
    # Auto policy: OFF. Measured in-model (tools/profile_ops.py, v5e,
    # flagship dims, after the gelu_exact erf-form fix): eval forward
    # B=128 6,036 us (XLA LN) vs 6,597 us (kernel); pretrain step B=192
    # 103.4 ms vs 109.2 ms. XLA already fuses the LN stats into the
    # adjacent matmul fusions and the normalize into consumers at no
    # measurable cost — what looked like a slow LN-stat reduce in the
    # r3 profile (convert_reduce_fusion @ 161 us) was the erfc-form GELU
    # in the same MLP megafusion (see nn.layers.gelu_exact).  This
    # kernel pays an extra HBM round-trip (y write + consumer read) plus
    # a launch per site.  Kept forceable for experiments and for any
    # future shape where XLA's reduce emitter misbehaves again.
    return False


@jax.custom_vjp
def layernorm_apply(x: Array, scale: Array, bias: Array) -> Array:
    """flax-LayerNorm-equivalent forward via the Pallas kernel.

    x: [..., D] (flattened to rows inside), scale/bias: [D] f32.
    Output dtype follows flax's promotion: f32 stats path cast back to
    x.dtype only when x is sub-f32 (bf16); f32 inputs stay f32.
    """
    y, _, _ = _ln_fwd_res(x, scale, bias)
    return y


def _ln_fwd_res(x, scale, bias):
    from vipformer_tpu.ops.pallas import shard

    r = 1
    for dim in x.shape[:-1]:
        r *= dim
    d = x.shape[-1]
    x2 = x.reshape(r, d)
    s2 = scale.astype(jnp.float32).reshape(1, d)
    b2 = bias.astype(jnp.float32).reshape(1, d)
    interp = jax.default_backend() != "tpu"

    fn = partial(_fwd_call, interpret=interp)
    y2, mu, rsig = shard.data_sharded_call(
        fn, (x2, s2, b2), batched=(True, False, False),
        out_batched=(True, True, True),
    )
    return y2.reshape(x.shape), mu, rsig


def _ln_vjp_fwd(x, scale, bias):
    y, mu, rsig = _ln_fwd_res(x, scale, bias)
    return y, (x, scale, mu, rsig)


def _ln_vjp_bwd(res, dy):
    from vipformer_tpu.ops.pallas import shard

    x, scale, mu, rsig = res
    r = 1
    for dim in x.shape[:-1]:
        r *= dim
    d = x.shape[-1]
    x2 = x.reshape(r, d)
    dy2 = dy.reshape(r, d).astype(x2.dtype)
    s2 = scale.astype(jnp.float32).reshape(1, d)
    interp = jax.default_backend() != "tpu"

    if shard.sharding_active() and r % shard.data_size() == 0:
        from jax.sharding import PartitionSpec as P

        da = shard.data_axis()

        def f(xx, dd, m, rs, ss):
            dxl, dsl, dbl = _bwd_call(xx, dd, m, rs, ss, interpret=interp)
            # dscale/dbias are sums over ALL rows -> reduce shard partials
            return dxl, jax.lax.psum(dsl, da), jax.lax.psum(dbl, da)

        dx2, ds, db = jax.shard_map(
            f,
            mesh=shard.active_mesh(),
            in_specs=(
                P(da, None), P(da, None), P(da, None), P(da, None), P(),
            ),
            out_specs=(P(da, None), P(), P()),
            check_vma=False,
        )(x2, dy2, mu, rsig, s2)
    else:
        dx2, ds, db = _bwd_call(x2, dy2, mu, rsig, s2, interpret=interp)
    return (
        dx2.reshape(x.shape).astype(x.dtype),
        ds.astype(scale.dtype),
        db.astype(scale.dtype),
    )


layernorm_apply.defvjp(_ln_vjp_fwd, _ln_vjp_bwd)
