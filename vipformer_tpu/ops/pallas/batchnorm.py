"""Pallas TPU kernels: train-mode BatchNorm statistics + gradient reduces.

Why: the r5 per-HLO profile of the partseg train step (tools/profile_ops.py
partseg_train 96) shows the decode stack's BatchNorms are the largest
remaining waste family. The [B*N = 98k, 1536/1024/512/256] activations
behind FeaturePropagation/SegHead (reference `pointcloud/partseg.py:
399-405,460-466` heads, `pointcloud/utils.py:192-242` propagation) pay
XLA's reduce emitter four times per layer — forward mean/|x|^2 stats
(`convert_reduce_fusion.{1,2}`: 1.64 + 1.63 ms for f32[1536]/f32[1024]
outputs) and backward dscale/dbias (`fusion.2405/2399`: 1.32 + 0.91 ms)
— ~7 ms/step total, ~4x off HBM roofline (the same
`EmitAllBatchInSublanes` pathology ops/pallas/dense.py documents for dW).
The reference hides all of this inside cuDNN BatchNorm
(`ft_partseg.py:135-219` backward); on TPU we own it.

Two row-stream kernels, structurally identical to
ops/pallas/dense.dense_grads_pallas: stream [BR, C] blocks through VMEM
once, accumulate f32 [C] results in residency.

* `bn_stats_pallas(x2d)` -> (sum, sumsq): forward batch stats in one read
  of x (flax computes mean + mean(|x|^2) in f32; same math, same f32
  accumulation).
* `bn_grad_reduces_pallas(x2d, dy2d, mean, rstd)` -> (dscale, dbias):
  the two backward column-sums in one read of (x, dy); xhat is
  recomputed in VMEM from the saved per-channel stats.

`bn_train_apply` stitches them into a custom-VJP train-mode BatchNorm
core (stats + normalize + affine): the forward normalize and the
backward dx stay XLA elementwise fusions (they run at roofline fused
with their neighbors); only the four pathological column reduces route
through Pallas. Under a device mesh both kernels run per data shard with
an explicit psum, so batch stats and grads stay GLOBAL — bit-matching
the sync-BN semantics the pjit path gets from XLA's automatic
collectives (nn.layers.batch_norm docstring).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# auto policy: kernel on TPU when shapes qualify; None = auto, bool forces
USE_BN_TRAIN: bool | None = None

_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_block_rows(r: int, c: int, n_inputs: int, itemsize: int) -> int:
    br = 4096
    while br >= 128:
        if r % br == 0 and 2 * n_inputs * br * c * itemsize <= _VMEM_BUDGET:
            return br
        br //= 2
    return 0


def _stats_kernel(x_ref, s_ref, ss_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)
        ss_ref[...] = jnp.zeros_like(ss_ref)

    x = x_ref[...].astype(jnp.float32)
    s_ref[...] += jnp.sum(x, axis=0, keepdims=True)
    ss_ref[...] += jnp.sum(x * x, axis=0, keepdims=True)


def bn_stats_pallas(x2d: Array, interpret: bool = False) -> tuple[Array, Array]:
    """x2d [R, C] -> (sum f32 [C], sumsq f32 [C]) in one HBM read of x."""
    r, c = x2d.shape
    br = _pick_block_rows(r, c, 1, x2d.dtype.itemsize)
    ms = pl.ANY if interpret else pltpu.VMEM
    s, ss = pl.pallas_call(
        _stats_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=ms),
        ],
        out_specs=(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=ms),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=ms),
        ),
        interpret=interpret,
    )(x2d)
    return s[0], ss[0]


def _grad_kernel(x_ref, dy_ref, mean_ref, rstd_ref, ds_ref, db_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    xhat = (x - mean_ref[...]) * rstd_ref[...]
    ds_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)


def bn_grad_reduces_pallas(
    x2d: Array,
    dy2d: Array,
    mean: Array,
    rstd: Array,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """-> (dscale f32 [C], dbias f32 [C]) in one HBM read of (x, dy)."""
    r, c = x2d.shape
    br = _pick_block_rows(r, c, 2, x2d.dtype.itemsize)
    ms = pl.ANY if interpret else pltpu.VMEM
    ds, db = pl.pallas_call(
        _grad_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=ms),
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=ms),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=ms),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=ms),
        ],
        out_specs=(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=ms),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=ms),
        ),
        interpret=interpret,
    )(
        x2d,
        dy2d,
        mean.astype(jnp.float32).reshape(1, -1),
        rstd.astype(jnp.float32).reshape(1, -1),
    )
    return ds[0], db[0]


def bn_train_enabled(r: int, c: int, itemsize: int) -> bool:
    """OFF by default — measured a NET LOSS in-model (r5, partseg train
    45.6 -> 49.8 ms with the kernel auto-on at the [98k, 1536/1024/512/
    256] decode BNs).  The reduces themselves got cheaper (fwd stats +
    dscale/dbias ~7.6 -> ~4.6 ms), but routing the backward through the
    kernel stops XLA from RECOMPUTING the ReLU mask inside each of its
    reduce fusions: the [96,1024,1536] `compare_select` dy-mask pass and
    the normalize's f32 intermediate materialize standalone (+2.9 ms
    family) — the same recompute-vs-materialize trade g2e_train.py's
    six-pass design exists to win, which a BN-only kernel cannot see.
    A winning version must absorb the surrounding ReLU/Dense chain like
    g2e does.  Kept correct and forceable (USE_BN_TRAIN=True; parity
    pinned by tests/test_pallas.py::test_batchnorm_*)."""
    from vipformer_tpu.ops.pallas import shard

    if shard.sharding_active():
        if r % shard.data_size():
            return False
        r = r // shard.data_size()
    if USE_BN_TRAIN is not None:
        return USE_BN_TRAIN and _pick_block_rows(r, c, 2, itemsize) > 0
    return False


def _global_rows(r: int) -> int:
    return r


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train_apply(x: Array, scale: Array, bias: Array, eps: float):
    """Train-mode BatchNorm core over the leading axes of x [..., C].

    Returns (y, mean f32 [C], var f32 [C]) — y in x.dtype via the exact
    flax formula (f32 stats, `max(0, E[x^2] - E[x]^2)` fast variance,
    normalize in f32, cast at the end), mean/var for the caller's
    running-stat update (undifferentiated there, but the VJP handles
    their cotangents exactly for any other caller).
    """
    y, mean, var, _ = _bn_fwd_impl(x, scale, bias, eps)
    return y, mean, var


def _bn_fwd_impl(x, scale, bias, eps):
    c = x.shape[-1]
    x2 = x.reshape(-1, x.shape[-1])
    r = x2.shape[0]

    from vipformer_tpu.ops.pallas import shard

    interp = jax.default_backend() != "tpu"
    if shard.sharding_active() and r % shard.data_size() == 0:
        from jax.sharding import PartitionSpec as P

        da = shard.data_axis()

        def f(xx):
            s, ss = bn_stats_pallas(xx, interpret=interp)
            return jax.lax.psum(s, da), jax.lax.psum(ss, da)

        s, ss = jax.shard_map(
            f,
            mesh=shard.active_mesh(),
            in_specs=(P(da, None),),
            out_specs=(P(), P()),
            check_vma=False,
        )(x2)
    else:
        s, ss = bn_stats_pallas(x2, interpret=interp)
    rn = jnp.float32(r)
    mean = s / rn
    var = jnp.maximum(0.0, ss / rn - mean * mean)
    rstd = jax.lax.rsqrt(var + jnp.float32(eps))
    # flax _normalize order: (x - mean) * (rstd * scale) + bias, all in
    # f32 (stats are f32, params are f32), cast to x.dtype at the end
    shape = (1,) * (x.ndim - 1) + (c,)
    y = (x.astype(jnp.float32) - mean.reshape(shape)) * (
        rstd * scale.astype(jnp.float32)
    ).reshape(shape) + bias.astype(jnp.float32).reshape(shape)
    return y.astype(x.dtype), mean, var, rstd


def _bn_fwd(x, scale, bias, eps):
    y, mean, var, rstd = _bn_fwd_impl(x, scale, bias, eps)
    return (y, mean, var), (x, scale, mean, rstd)


def _bn_bwd(eps, res, cots):
    x, scale, mean, rstd = res
    dy, dmean_cot, dvar_cot = cots
    c = x.shape[-1]
    shape = (1,) * (x.ndim - 1) + (c,)
    x2 = x.reshape(-1, c)
    dy2 = dy.reshape(-1, c)
    r = x2.shape[0]

    from vipformer_tpu.ops.pallas import shard

    interp = jax.default_backend() != "tpu"
    if shard.sharding_active() and r % shard.data_size() == 0:
        from jax.sharding import PartitionSpec as P

        da = shard.data_axis()

        def f(xx, dd):
            ds, db = bn_grad_reduces_pallas(xx, dd, mean, rstd, interp)
            return jax.lax.psum(ds, da), jax.lax.psum(db, da)

        dscale, dbias = jax.shard_map(
            f,
            mesh=shard.active_mesh(),
            in_specs=(P(da, None), P(da, None)),
            out_specs=(P(), P()),
            check_vma=False,
        )(x2, dy2)
    else:
        dscale, dbias = bn_grad_reduces_pallas(x2, dy2, mean, rstd, interp)

    rn = jnp.float32(r)
    xf = x.astype(jnp.float32)
    meanb = mean.reshape(shape)
    rstdb = rstd.reshape(shape)
    xhat = (xf - meanb) * rstdb
    # standard BN dx, with per-channel Σdy·scale = scale*dbias and
    # Σ(dy·scale)·xhat = scale*dscale (scale is per-channel, so it
    # factors out of the row sums the kernel already computed)
    sf = scale.astype(jnp.float32).reshape(shape)
    dyf = dy.astype(jnp.float32)
    dx = (sf * rstdb) * (
        dyf
        - (dbias.reshape(shape) / rn)
        - xhat * (dscale.reshape(shape) / rn)
    )
    # exact cotangent terms for the mean/var outputs (zero arrays in the
    # framework's own train steps — stats feed only the undifferentiated
    # running update — but handled for correctness)
    dx = dx + dmean_cot.astype(jnp.float32).reshape(shape) / rn
    dx = dx + dvar_cot.astype(jnp.float32).reshape(shape) * 2.0 * (
        xf - meanb
    ) / rn
    return (
        dx.astype(x.dtype),
        dscale.astype(scale.dtype),
        dbias.astype(scale.dtype),
    )


bn_train_apply.defvjp(_bn_fwd, _bn_bwd)
