"""Pallas TPU kernel: batched row gather via one-hot MXU matmul.

TPUs have no hardware gather; XLA lowers `take_along_axis` row gathers to
scalar-driven copies that dominate the patch pipeline (~12 ms of a 36 ms
forward at [256, 1024] -> [256, 4096] rows). The MXU, however, is nearly
free at these sizes: selecting K rows of an [N, C] table is
`onehot[K, N] @ table[N, C]`, and built inside the kernel the one-hot
matrix only ever exists in VMEM (materializing it in HBM would cost
gigabytes).

Layout notes (Mosaic): indices travel as [rows, 128] tiles and stay in
that layout — the one-hot is built 3-D ([rows, 128, N]) and contracted
against the table without any vector relayout; outputs are produced as
[B, K/128, 128, C] and reshaped to [B, K, C] at the XLA level where the
reshape is free.

Exactness: bf16 tables gather exactly at DEFAULT precision (products are
1.0 x bf16 with f32 accumulation); f32 tables use Precision.HIGHEST
(bf16x6) and reproduce take_along_axis bit-exactly (verified on chip). The
patch stem therefore gathers neighbors in the compute dtype - identical
values to gather-then-cast, at DEFAULT-matmul speed.
Differentiable w.r.t. the table: the VJP is the transposed contraction
(scatter-add), also an MXU kernel accumulating across K-chunks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# auto policy: kernel on TPU, take_along_axis elsewhere
USE_MXU_GATHER: bool | None = None


def _onehot3(idx, n):
    """idx [rows, 128] int32 -> one-hot [rows, 128, n] f32, no relayout."""
    rows = idx.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (rows, 128, n), 2)
    return (iota == idx[:, :, None]).astype(jnp.float32)


def _precision_for(dtype):
    """bf16 tables are exact at DEFAULT (1.0 x bf16 products, f32
    accumulate); f32 tables need HIGHEST (bf16x6) for bit-exact rows."""
    if dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _gather_kernel(idx_ref, pts_ref, out_ref):
    idx = idx_ref[0]  # [rows, 128] int32
    pts = pts_ref[0]  # [N, C]
    n = pts.shape[0]
    onehot = _onehot3(idx, n).astype(pts.dtype)  # [rows, 128, N]
    out = jax.lax.dot_general(
        onehot,
        pts,
        (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision_for(pts.dtype),
    )  # [rows, 128, C]
    out_ref[0] = out.astype(out_ref.dtype)


def _scat_dot(onehot, g):
    """[rows, 128, N]^T-contract-[rows, 128, C] -> [N, C], collapsed to a
    single-contracting-dim 2-D dot: Mosaic lowers the 3-D double
    contraction only when it can retile the rhs, which fails for tiny
    minor dims (C=3 xyz tables -> 'lhs contracting dims must be of size
    1'); the explicit sublane collapse works for every C."""
    rk = onehot.shape[0] * onehot.shape[1]
    return jax.lax.dot_general(
        onehot.reshape(rk, onehot.shape[2]),
        g.reshape(rk, g.shape[2]),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision_for(g.dtype),
    )


def _scatter_kernel(idx_ref, g_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    idx = idx_ref[0]  # [rows, 128]
    g = g_ref[0]  # [rows, 128, C]
    n = out_ref.shape[1]
    onehot = _onehot3(idx, n).astype(g.dtype)  # [rows, 128, N]
    out_ref[0] += _scat_dot(onehot, g).astype(out_ref.dtype)  # [N, C]


def _pick_rows(k128: int, rows: int) -> int:
    """Rows-of-128 per program: largest divisor of k128 that is <= rows."""
    rows = min(rows, k128)
    while rows > 1 and k128 % rows:
        rows -= 1
    return rows


def _pad_k(idx, extra=None):
    k0 = idx.shape[1]
    k = -(-k0 // 128) * 128
    if k != k0:
        idx = jnp.pad(idx, ((0, 0), (0, k - k0)))
        if extra is not None:
            extra = jnp.pad(extra, ((0, 0), (0, k - k0), (0, 0)))
    return idx, extra, k0, k


def _gather_impl(points, idx, rows, interpret):
    b, n, c = points.shape
    idx, _, k0, k = _pad_k(idx)
    rows = _pick_rows(k // 128, rows)
    idx3 = idx.astype(jnp.int32).reshape(b, k // 128, 128)
    ms = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((b, k // 128, 128, c), points.dtype),
        grid=(b, k // 128 // rows),
        in_specs=[
            pl.BlockSpec((1, rows, 128), lambda i, j: (i, j, 0),
                         memory_space=ms),
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0), memory_space=ms),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, 128, c), lambda i, j: (i, j, 0, 0), memory_space=ms
        ),
        interpret=interpret,
    )(idx3, points)
    return out.reshape(b, k, c)[:, :k0]


def _scatter_impl(g, idx, points_shape, dtype, rows, interpret):
    b, n, c = points_shape
    idx, g, k0, k = _pad_k(idx, g)
    rows = _pick_rows(k // 128, rows)
    idx3 = idx.astype(jnp.int32).reshape(b, k // 128, 128)
    g4 = g.reshape(b, k // 128, 128, c)
    ms = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        _scatter_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, c), dtype),
        grid=(b, k // 128 // rows),
        in_specs=[
            pl.BlockSpec((1, rows, 128), lambda i, j: (i, j, 0),
                         memory_space=ms),
            pl.BlockSpec((1, rows, 128, c), lambda i, j: (i, j, 0, 0),
                         memory_space=ms),
        ],
        out_specs=pl.BlockSpec(
            (1, n, c), lambda i, j: (i, 0, 0), memory_space=ms
        ),
        interpret=interpret,
    )(idx3, g4)


def _gather_sharded(points, idx, rows, interpret):
    # per-data-shard gather: each shard owns its own batch rows' table and
    # indices (indices address within the sample, so no cross-shard reads)
    from vipformer_tpu.ops.pallas.shard import data_sharded_call

    return data_sharded_call(
        lambda p, i: _gather_impl(p, i, rows, interpret),
        (points, idx),
        (True, True),
        True,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_rows_pallas(
    points: Array,
    idx: Array,
    rows: int = 8,
    interpret: bool = False,
) -> Array:
    """points [B, N, C] (C <= 128), idx int [B, K] -> [B, K, C]."""
    return _gather_sharded(points, idx, rows, interpret)


def _gather_fwd(points, idx, rows, interpret):
    out = _gather_sharded(points, idx, rows, interpret)
    # points[:0]: zero-size carrier of the table's shape/dtype for bwd
    return out, (points[:0], idx)


def _gather_bwd(rows, interpret, res, g):
    import numpy as np

    from vipformer_tpu.ops.pallas.shard import data_sharded_call

    proto, idx = res
    shape = (idx.shape[0],) + proto.shape[1:]
    # cotangents are batch-sharded like the primals — no collective needed
    d_points = data_sharded_call(
        lambda gg, ii: _scatter_impl(
            gg, ii, (gg.shape[0],) + shape[1:], proto.dtype, rows, interpret
        ),
        (g, idx),
        (True, True),
        True,
    )
    return d_points, np.zeros(idx.shape, dtype=jax.dtypes.float0)


gather_rows_pallas.defvjp(_gather_fwd, _gather_bwd)


def _gather_centered_kernel(idx_ref, cidx_ref, pts_ref, c_ref, out_ref):
    """out = pts[idx] - centers[gid], as TWO one-hot dots of different
    widths. The first r3 version used one signed one-hot over an extended
    [N+G, C] table; building the [rows, 128, N+G] compare mask twice cost
    ~1.3 ms of VPU work at [384, 128x32, 2048] (stem.1 4.5 -> 5.8 ms).
    The center mask only needs width G (128 vs 2176 here), so the split
    halves the compare bill; the subtract happens in registers."""
    idx = idx_ref[0]  # [rows, 128] int32 neighbor rows in [0, N)
    gid = cidx_ref[0]  # [rows, 128] int32 group ids in [0, G)
    pts = pts_ref[0]  # [N, C]
    cz = c_ref[0]  # [G, C] center xyz (extra channels zero)
    onehot = _onehot3(idx, pts.shape[0]).astype(pts.dtype)
    g1 = jax.lax.dot_general(
        onehot, pts, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision_for(pts.dtype),
    )
    conehot = _onehot3(gid, cz.shape[0]).astype(cz.dtype)
    g2 = jax.lax.dot_general(
        conehot, cz, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision_for(cz.dtype),
    )
    out_ref[0] = (g1 - g2).astype(out_ref.dtype)


def _scatter_centered_kernel(idx_ref, gid_ref, g_ref, dp_ref, dc_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dp_ref[...] = jnp.zeros_like(dp_ref)
        dc_ref[...] = jnp.zeros_like(dc_ref)

    idx = idx_ref[0]
    gid = gid_ref[0]
    g = g_ref[0]  # [rows, 128, C]
    onehot = _onehot3(idx, dp_ref.shape[1]).astype(g.dtype)
    dp_ref[0] += _scat_dot(onehot, g).astype(dp_ref.dtype)  # [N, C]
    conehot = _onehot3(gid, dc_ref.shape[1]).astype(g.dtype)
    # centers get -sum(dg) over their group
    dc_ref[0] -= _scat_dot(conehot, g).astype(dc_ref.dtype)  # [G, C]


def _centered_impl(points, cz, idx, gid, rows, interpret):
    b, n, c = points.shape
    k = idx.shape[1]
    gnum = cz.shape[1]
    assert k % 128 == 0  # G*S for the patch stem; gate guarantees this
    rows = _pick_rows(k // 128, rows)
    idx3 = idx.astype(jnp.int32).reshape(b, k // 128, 128)
    gid3 = gid.astype(jnp.int32).reshape(b, k // 128, 128)
    ms = pl.ANY if interpret else pltpu.VMEM
    idx_spec = pl.BlockSpec(
        (1, rows, 128), lambda i, j: (i, j, 0), memory_space=ms
    )
    out = pl.pallas_call(
        _gather_centered_kernel,
        out_shape=jax.ShapeDtypeStruct((b, k // 128, 128, c), points.dtype),
        grid=(b, k // 128 // rows),
        in_specs=[
            idx_spec,
            idx_spec,
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((1, gnum, c), lambda i, j: (i, 0, 0),
                         memory_space=ms),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, 128, c), lambda i, j: (i, j, 0, 0), memory_space=ms
        ),
        interpret=interpret,
    )(idx3, gid3, points, cz)
    return out.reshape(b, k, c)


def _scatter_centered_impl(g, idx, gid, n, gnum, dtype, rows, interpret):
    b, k, c = g.shape
    rows = _pick_rows(k // 128, rows)
    idx3 = idx.astype(jnp.int32).reshape(b, k // 128, 128)
    gid3 = gid.astype(jnp.int32).reshape(b, k // 128, 128)
    g4 = g.reshape(b, k // 128, 128, c)
    ms = pl.ANY if interpret else pltpu.VMEM
    idx_spec = pl.BlockSpec(
        (1, rows, 128), lambda i, j: (i, j, 0), memory_space=ms
    )
    return pl.pallas_call(
        _scatter_centered_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), dtype),
            jax.ShapeDtypeStruct((b, gnum, c), dtype),
        ],
        grid=(b, k // 128 // rows),
        in_specs=[
            idx_spec,
            idx_spec,
            pl.BlockSpec((1, rows, 128, c), lambda i, j: (i, j, 0, 0),
                         memory_space=ms),
        ],
        out_specs=[
            pl.BlockSpec((1, n, c), lambda i, j: (i, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((1, gnum, c), lambda i, j: (i, 0, 0),
                         memory_space=ms),
        ],
        interpret=interpret,
    )(idx3, gid3, g4)


def _center_table(points, centers):
    """centers [B, G, Cc>=3] -> [B, G, C] xyz table in the points' dtype
    (zero in extra channels, which stay uncentered per divide_patches'
    documented-intent normalization)."""
    b, _, c = points.shape
    g = centers.shape[1]
    cz = centers[..., :3].astype(points.dtype)
    if c > 3:
        cz = jnp.concatenate(
            [cz, jnp.zeros((b, g, c - 3), points.dtype)], axis=-1
        )
    return cz


def _centered_sharded(points, centers, idx, group_size, rows, interpret):
    from vipformer_tpu.ops.pallas.shard import data_sharded_call

    b, n, _ = points.shape
    k = idx.shape[1]
    cz = _center_table(points, centers)
    row_g = jnp.arange(k, dtype=jnp.int32) // group_size
    gid = jnp.broadcast_to(row_g, (b, k))
    return data_sharded_call(
        lambda p, cc, i, gi: _centered_impl(p, cc, i, gi, rows, interpret),
        (points, cz, idx, gid),
        (True, True, True, True),
        True,
    )


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gather_rows_centered_pallas(
    points: Array,
    centers: Array,
    idx: Array,
    group_size: int,
    rows: int = 8,
    interpret: bool = False,
) -> Array:
    """points [B, N, C<=128], centers [B, G, Cc>=3], idx int [B, G*S] ->
    [B, G*S, C] = points[idx] with the owning group's center xyz
    subtracted from channels :3 (extra channels ride along uncentered).

    Two one-hot MXU contractions inside one kernel (a width-N neighbor
    gather and a width-G center gather, subtracted in registers) replace
    gather + broadcast + sub: the r3 train profile shows the separate
    centering costs 2.5 ms at [384, 128, 32, 3] because the padded
    minor-dim-3 tiles round-trip HBM at 2.3% lane occupancy. Bit-exactness
    matches the separate path: f32 tables contract at HIGHEST (exact
    1.0/-1.0 products, f32 accumulate = the f32 subtract); bf16 tables
    accumulate the f32 difference of bf16 values and round once — the
    correctly-rounded bf16 subtract.
    """
    return _centered_sharded(points, centers, idx, group_size, rows,
                             interpret)


def _centered_fwd(points, centers, idx, group_size, rows, interpret):
    out = _centered_sharded(points, centers, idx, group_size, rows,
                            interpret)
    return out, (points[:0], centers[:0], idx)


def _centered_bwd(group_size, rows, interpret, res, g):
    import numpy as np

    from vipformer_tpu.ops.pallas.shard import data_sharded_call

    p_proto, c_proto, idx = res
    b, k = idx.shape
    n = p_proto.shape[1]
    gnum = c_proto.shape[1]
    row_g = jnp.arange(k, dtype=jnp.int32) // group_size
    gid = jnp.broadcast_to(row_g, (b, k))
    d_points, d_cz = data_sharded_call(
        lambda gg, ii, gi: tuple(_scatter_centered_impl(
            gg, ii, gi, n, gnum, p_proto.dtype, rows, interpret
        )),
        (g, idx, gid),
        (True, True, True),
        (True, True),
    )
    d_c = d_cz[..., :3]  # the scatter kernel already carries the -1
    cc = c_proto.shape[-1]
    if cc > 3:
        d_c = jnp.concatenate(
            [d_c, jnp.zeros((b, gnum, cc - 3), d_c.dtype)], axis=-1
        )
    return (
        d_points,
        d_c.astype(c_proto.dtype),
        np.zeros(idx.shape, dtype=jax.dtypes.float0),
    )


gather_rows_centered_pallas.defvjp(_centered_fwd, _centered_bwd)


def centered_gather_enabled(points: Array, num_groups: int,
                            group_size: int) -> bool:
    """Gate for the fused gather+center path in divide_patches."""
    flat_k = num_groups * group_size
    if flat_k % 128:
        return False
    return mxu_gather_enabled(points, flat_k)


def mxu_gather_enabled(points: Array, flat_k: int) -> bool:
    # no TP gate: gather operands (xyz tables, inter-layer features) are
    # batch-sharded only; shard.data_sharded_call runs it per data shard
    if USE_MXU_GATHER is not None:
        return USE_MXU_GATHER
    if jax.default_backend() != "tpu":
        return False
    b, n, c = points.shape
    # worthwhile when the gather is big enough to beat dispatch overhead
    # and the table row fits one tile of lanes
    return c <= 128 and n >= 128 and flat_k >= 512
