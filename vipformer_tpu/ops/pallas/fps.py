"""Pallas TPU kernel: farthest point sampling.

FPS is the one inherently sequential kernel in the pipeline (SURVEY.md §7
"hard parts"): npoint dependent iterations of gather -> distance ->
min -> argmax over a [B, N] state. The XLA `fori_loop` version
(ops/geometry.py) round-trips the state through HLO loop machinery every
step; this kernel keeps the whole loop resident in VMEM — one program
processes a tile of batch rows and each iteration is pure VPU work:

* coordinates are carried as three separate [B, N] planes — a trailing
  xyz-dim of 3 would pad to the 128-lane tile and blow VMEM 40x,
* the centroid gather is a masked reduction (row == farthest via iota
  compare), no dynamic addressing,
* argmax is max + first-index-of-max (iota min), matching torch.max tie
  semantics (`pointcloud/utils.py:83`),
* selected indices accumulate in registers via one-hot adds (Mosaic
  disallows unaligned dynamic single-column stores) and are written once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _fps_kernel(npoint: int, n: int, xs_ref, ys_ref, zs_ref, start_ref,
                out_ref, cx_ref=None, cy_ref=None, cz_ref=None):
    xs = xs_ref[...]  # [Bt, N] f32
    ys = ys_ref[...]
    zs = zs_ref[...]
    bt = xs.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (bt, n), 1)  # [Bt, N]
    out_col = jax.lax.broadcasted_iota(jnp.int32, (bt, npoint), 1)
    with_centers = cx_ref is not None

    dist0 = jnp.full((bt, n), 1e10, dtype=jnp.float32)
    far0 = start_ref[...][:, 0]  # [Bt, 1] -> [Bt] int32
    acc0 = jnp.zeros((bt, npoint), dtype=jnp.int32)
    zf = jnp.zeros((bt, npoint), dtype=jnp.float32)

    def body(i, carry):
        dist, far, acc, ax, ay, az = carry
        acc = acc + jnp.where(out_col == i, far[:, None], 0)
        sel = (col == far[:, None]).astype(jnp.float32)  # [Bt, N]
        cx = jnp.sum(sel * xs, axis=1, keepdims=True)  # [Bt, 1]
        cy = jnp.sum(sel * ys, axis=1, keepdims=True)
        cz = jnp.sum(sel * zs, axis=1, keepdims=True)
        if with_centers:
            # the selected centroid's coordinates are already in registers:
            # bank them into the output planes (a free byproduct that lets
            # callers skip the [B, G, 3] gather entirely — XLA's gather on
            # a minor-dim-3 array measured 293 us at B=256, superlinear)
            hit = out_col == i
            ax = ax + jnp.where(hit, cx, 0.0)
            ay = ay + jnp.where(hit, cy, 0.0)
            az = az + jnp.where(hit, cz, 0.0)
        d = (xs - cx) ** 2 + (ys - cy) ** 2 + (zs - cz) ** 2
        dist = jnp.minimum(dist, d)
        m = jnp.max(dist, axis=-1, keepdims=True)
        far = jnp.min(
            jnp.where(dist == m, col, n), axis=-1
        ).astype(jnp.int32)
        return dist, far, acc, ax, ay, az

    _, _, acc, ax, ay, az = jax.lax.fori_loop(
        0, npoint, body, (dist0, far0, acc0, zf, zf, zf)
    )
    out_ref[...] = acc
    if with_centers:
        cx_ref[...] = ax
        cy_ref[...] = ay
        cz_ref[...] = az


def _auto_block_rows(b: int, n: int) -> int:
    """Batch rows per program. Bigger blocks amortize the VPU's per-op
    overhead across more sublane tiles — the sequential npoint-step loop
    issues ~10 small ops per step, and at 8 rows each op touches only 8
    vregs (measured 1.64 ms at [256, 1024, 128] on v5e vs 0.22 ms at 128
    rows). Capped so the resident planes (3 coord + dist, 4 x rows x N f32)
    stay well inside VMEM, and by the padded batch so tiny batches don't
    blow up 16x."""
    # ~8 MB of resident f32 planes: 4 planes x rows x N x 4B
    max_rows_by_vmem = (512 * 1024) // max(n, 1)
    cap = max(8, min(128, max_rows_by_vmem))
    b8 = -(-b // 8) * 8
    return min(cap, b8)


@partial(
    jax.jit,
    static_argnames=("npoint", "block_rows", "interpret", "return_centers"),
)
def fps_pallas(
    xyz: Array,
    npoint: int,
    start: Array | None = None,
    block_rows: int | None = None,
    interpret: bool = False,
    return_centers: bool = False,
) -> Array:
    """FPS indices [B, npoint] for xyz [B, N, >=3] (first 3 channels used).

    `start`: optional int32 [B] start indices (defaults to 0, matching the
    deterministic mode of ops.geometry.farthest_point_sample).
    `block_rows`: batch rows per program; None picks a measured-good size.
    `return_centers`: also return the sampled points' xyz [B, npoint, 3]
    f32, banked from in-kernel registers — saves the consumer's
    index_points gather (XLA gathers on minor-dim-3 arrays run at ~1 GB/s
    effective and scale superlinearly with batch).
    """
    b, n, _ = xyz.shape
    if block_rows is None:
        block_rows = _auto_block_rows(b, n)
    if start is None:
        start = jnp.zeros((b,), jnp.int32)
    # Mosaic mishandles single-row (Bt=1) blocks (rank-1 size-1 vector
    # layouts abort the compiler), so ragged/small batches are padded up to
    # a multiple of block_rows with copies of row 0 and sliced after.
    b_pad = -(-b // block_rows) * block_rows
    if b_pad != b:
        reps = [1] * xyz.ndim
        xyz = jnp.concatenate(
            [xyz, jnp.broadcast_to(xyz[:1], (b_pad - b, *xyz.shape[1:]))], 0
        )
        start = jnp.concatenate(
            [start, jnp.broadcast_to(start[:1], (b_pad - b,))], 0
        )
    planes = [xyz[..., i].astype(jnp.float32) for i in range(3)]
    # rank-1 blocks are restricted on TPU; carry start as [B, 1]
    start = start.astype(jnp.int32).reshape(b_pad, 1)

    grid = (b_pad // block_rows,)
    ms = pl.ANY if interpret else pltpu.VMEM
    plane_spec = pl.BlockSpec(
        (block_rows, n), lambda i: (i, 0), memory_space=ms
    )
    out_spec = pl.BlockSpec(
        (block_rows, npoint), lambda i: (i, 0), memory_space=ms
    )
    idx_shape = jax.ShapeDtypeStruct((b_pad, npoint), jnp.int32)
    if return_centers:
        plane_shape = jax.ShapeDtypeStruct((b_pad, npoint), jnp.float32)
        out, cx, cy, cz = pl.pallas_call(
            partial(_fps_kernel, npoint, n),
            out_shape=(idx_shape, plane_shape, plane_shape, plane_shape),
            grid=grid,
            in_specs=[
                plane_spec,
                plane_spec,
                plane_spec,
                pl.BlockSpec(
                    (block_rows, 1), lambda i: (i, 0), memory_space=ms
                ),
            ],
            out_specs=(out_spec, out_spec, out_spec, out_spec),
            interpret=interpret,
        )(*planes, start)
        centers = jnp.stack([cx, cy, cz], axis=-1)
        return out[:b], centers[:b]
    out = pl.pallas_call(
        partial(_fps_kernel, npoint, n),
        out_shape=idx_shape,
        grid=grid,
        in_specs=[
            plane_spec,
            plane_spec,
            plane_spec,
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=ms),
        ],
        out_specs=out_spec,
        interpret=interpret,
    )(*planes, start)
    return out[:b]
