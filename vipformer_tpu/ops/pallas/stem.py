"""Pallas TPU kernel: fused patch stem (neighbor gather + Group2Emb), eval.

The XLA stem at flagship shapes (B=256, N=1024, G=128, S=32, D=256) spends
~6 ms per forward moving [B, G, S, C] intermediates through HBM: the MXU
one-hot gather writes 4096 neighbor rows per cloud, a layout copy reshapes
them, and the Group2Emb mini-PointNet (reference `pointcloud/utils.py:
144-189`) streams five [B*G*S, C] tensors in and out of HBM around two
max-pools. Per cloud all of that is ~1.1 GMAC of matmul work whose natural
home is VMEM.

This kernel runs the whole chain for a block of groups without touching HBM
in between:

  one-hot gather of per-point first-layer features (t1 = pts @ W1, folded
  with eval BatchNorm) -> subtract the per-group center term -> ReLU ->
  x @ W2 -> segment max over each group -> concat[global, local] ->
  x @ W3 (BN-folded) -> ReLU -> x @ W4 -> segment max -> [G, D] embeddings.

Applicable in eval mode only: the BatchNorms fold to per-channel affines
(training needs batch-wide statistics and gradients, and stays on the XLA
path). The center normalization is the *documented-intent* variant of
`divide_patches`; the reference-faithful `compat` slice keeps the XLA path.

The first Dense (3 -> 64) is hoisted OUT of the kernel: gathering rows of
the projected table t1 [N, 64] costs the same MXU work as gathering raw
xyz (both pad to 128 output lanes), and (p - c) @ W1 = p @ W1 - c @ W1 by
linearity, so the subtraction moves behind the projection exactly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# auto policy: kernel on TPU in eval mode, XLA path elsewhere
USE_FUSED_STEM: bool | None = None

_BN_EPS = 1e-5


def _dense(x, w, b, out_dtype):
    """Match nn.layers.Dense numerics: f32-accumulated matmul, cast to the
    compute dtype, THEN add the bias (layers.py:55-61)."""
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(out_dtype)
    if b is not None:
        y = y + b[0]
    return y


def _stem_kernel(gc: int, s: int, t1_ref, idx_ref, cidx_ref, w2_ref, b2_ref,
                 w3_ref, b3_ref, w4_ref, b4_ref, o_ref):
    t1 = t1_ref[0]  # [N + Gpad, C1]: point projections, then center terms
    n = t1.shape[0]
    rows = gc * s
    dt = t1.dtype

    idx = idx_ref[0, 0]  # [rows // 128, 128] int32 neighbor rows
    cidx = cidx_ref[0, 0]  # [rows // 128, 128] int32 center rows (>= N)
    # signed one-hot gather on the MXU: +1 at the neighbor row, -1 at the
    # group's center row, so ONE contraction yields t1[p] - c1[g] — the
    # center subtraction costs no broadcast (Mosaic cannot lower a
    # per-group broadcast of a ref-derived block) and ~12% extra MACs
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows // 128, 128, n), 2)
    onehot = (
        (iota == idx[:, :, None]).astype(dt)
        - (iota == cidx[:, :, None]).astype(dt)
    )
    g0 = jax.lax.dot_general(
        onehot, t1, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [r8, 128, C1] f32
    x = jax.nn.relu(g0.reshape(rows, t1.shape[1]).astype(dt))

    x = _dense(x, w2_ref[...], b2_ref[...], dt)  # [rows, 128]
    c2 = x.shape[1]
    gmax = jnp.max(x.reshape(gc, s, c2), axis=1)  # [Gc, 128]
    gbig = jax.lax.broadcast_in_dim(
        gmax, (gc, s, c2), (0, 2)
    ).reshape(rows, c2)
    x = jnp.concatenate([gbig, x], axis=1)  # [rows, 256]

    x = jax.nn.relu(_dense(x, w3_ref[...], b3_ref[...], dt))
    x = _dense(x, w4_ref[...], b4_ref[...], dt)  # [rows, D]
    o_ref[0] = jnp.max(x.reshape(gc, s, x.shape[1]), axis=1)  # [Gc, D]


@partial(jax.jit, static_argnames=("num_groups", "group_size", "interpret"))
def _stem_call(t1ext, idx, cidx, w2, b2, w3, b3, w4, b4,
               num_groups: int, group_size: int, interpret: bool = False):
    b, next_, c1w = t1ext.shape
    g, s = num_groups, group_size
    d = w4.shape[1]
    # groups per program: ~1024 rows keeps every intermediate comfortably
    # in VMEM ([rows, 256] biggest = 0.5 MB bf16) next to the 2 MB one-hot
    gc = max(1, min(g, 1024 // s))
    while g % gc:
        gc -= 1
    rows = gc * s
    nj = g // gc
    idx4 = idx.astype(jnp.int32).reshape(b, nj, rows // 128, 128)
    cidx4 = cidx.astype(jnp.int32).reshape(b, nj, rows // 128, 128)
    ms = pl.ANY if interpret else pltpu.VMEM

    def row2(x):  # biases as [1, C] (scalars must be >= 2-D on TPU)
        return x.reshape(1, -1)

    idx_spec = pl.BlockSpec(
        (1, 1, rows // 128, 128), lambda i, j: (i, j, 0, 0),
        memory_space=ms,
    )
    return pl.pallas_call(
        partial(_stem_kernel, gc, s),
        out_shape=jax.ShapeDtypeStruct((b, g, d), t1ext.dtype),
        grid=(b, nj),
        in_specs=[
            pl.BlockSpec((1, next_, c1w), lambda i, j: (i, 0, 0),
                         memory_space=ms),
            idx_spec,
            idx_spec,
            pl.BlockSpec(w2.shape, lambda i, j: (0, 0), memory_space=ms),
            pl.BlockSpec((1, w2.shape[1]), lambda i, j: (0, 0),
                         memory_space=ms),
            pl.BlockSpec(w3.shape, lambda i, j: (0, 0), memory_space=ms),
            pl.BlockSpec((1, w3.shape[1]), lambda i, j: (0, 0),
                         memory_space=ms),
            pl.BlockSpec(w4.shape, lambda i, j: (0, 0), memory_space=ms),
            pl.BlockSpec((1, w4.shape[1]), lambda i, j: (0, 0),
                         memory_space=ms),
        ],
        out_specs=pl.BlockSpec(
            (1, gc, d), lambda i, j: (i, j, 0), memory_space=ms
        ),
        interpret=interpret,
    )(t1ext, idx4, cidx4, w2, row2(b2), w3, row2(b3), w4, row2(b4))


def _fold_bn(params, stats, eps=_BN_EPS):
    """Eval BatchNorm -> per-channel (scale, shift)."""
    scale = params["scale"] / jnp.sqrt(stats["var"] + eps)
    shift = params["bias"] - stats["mean"] * scale
    return scale, shift


def group2emb_fused_apply(
    params,
    batch_stats,
    pts: Array,
    centers: Array,
    idx: Array,
    dtype,
    interpret: bool = False,
) -> Array:
    """Group2Emb on (pts, centers, kNN idx) without materializing neighbors.

    `params` / `batch_stats` are the Group2Emb subtree (Dense_0..3,
    BatchNorm_0..1) produced by the flax module — the fused path reads the
    exact same weights a checkpoint restores.

    pts [B, N, C>=3] (xyz used), centers [B, G, C], idx int [B, G, S]
    -> [B, G, D].
    """
    b, g, s = idx.shape
    d0, d1 = params["Dense_0"], params["Dense_1"]
    d2, d3 = params["Dense_2"], params["Dense_3"]
    s0, t0 = _fold_bn(params["BatchNorm_0"], batch_stats["BatchNorm_0"])
    s1, t1_ = _fold_bn(params["BatchNorm_1"], batch_stats["BatchNorm_1"])

    # fold BN0 into Dense_0:  BN(x @ W + b) = x @ (W*s) + (b*s + t)
    w1 = (d0["kernel"] * s0[None, :]).astype(jnp.float32)
    b1 = (d0["bias"] * s0 + t0).astype(jnp.float32)
    # fold BN1 into Dense_2
    w3 = (d2["kernel"] * s1[None, :]).astype(dtype)
    b3 = (d2["bias"] * s1 + t1_).astype(dtype)

    pf = pts.astype(jnp.float32)  # [B, N, C]: xyz (+ extra channels, e.g.
    # rgb for semseg, which divide_patches leaves UNcentered)
    cz = jnp.concatenate(
        [
            centers[..., :3].astype(jnp.float32),
            jnp.zeros(
                (b, g, pf.shape[-1] - 3), jnp.float32
            ),
        ],
        axis=-1,
    )
    n = pf.shape[1]
    # (p - c) @ W1 + b1 = (p @ W1) - (c @ W1 - b1), exactly, in f32.
    # Both terms live in ONE extended table so the kernel's signed one-hot
    # contraction produces the difference directly: rows [0, N) hold the
    # point projections, rows [N, N+G) the per-group center terms.
    t1 = jnp.einsum("bnc,cf->bnf", pf, w1)
    c1 = jnp.einsum("bgc,cf->bgf", cz, w1) - b1[None, None, :]
    t1ext = jnp.concatenate([t1, c1], axis=1).astype(dtype)
    row_g = jnp.arange(g * s, dtype=jnp.int32) // s  # group of each row
    cidx = jnp.broadcast_to(n + row_g, (b, g * s))

    from vipformer_tpu.ops.pallas.shard import data_sharded_call

    # batch rows over the data axis, weights replicated (eval path: no AD,
    # so replicated operands need no gradient collective)
    return data_sharded_call(
        lambda t, i, ci, *wb: _stem_call(
            t, i, ci, *wb, num_groups=g, group_size=s, interpret=interpret
        ),
        (
            t1ext, idx.reshape(b, g * s), cidx,
            d1["kernel"].astype(dtype), d1["bias"].astype(dtype),
            w3, b3,
            d3["kernel"].astype(dtype), d3["bias"].astype(dtype),
        ),
        (True, True, True, False, False, False, False, False, False),
        True,
    )


def fused_stem_supported(
    num_groups: int, group_size: int, n: int, deterministic: bool,
    patch_compat: bool,
) -> bool:
    """Shape/mode gate; the backend/default policy is USE_FUSED_STEM."""
    if not deterministic or patch_compat:
        return False
    rows = num_groups * group_size
    if rows % 128:
        return False
    gc = max(1, min(num_groups, 1024 // group_size))
    while num_groups % gc:
        gc -= 1
    if gc * group_size % 128:
        return False
    # one-hot block [rows_chunk, N] and t1 [N, 64] must stay VMEM-friendly
    return n <= 4096


def fused_stem_enabled() -> bool:
    # no TP gate: stem operands (point tables, mini-PointNet weights) are
    # never feature-sharded; shard.data_sharded_call handles DP meshes
    if USE_FUSED_STEM is not None:
        return USE_FUSED_STEM
    return jax.default_backend() == "tpu"
