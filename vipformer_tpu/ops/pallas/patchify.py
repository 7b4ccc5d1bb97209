"""Pallas TPU kernel: fused FPS + kNN ("patchify").

The patch pipeline runs FPS (sequential argmax chain) and then kNN of the
selected centers — two kernels that both stream the same coordinate planes.
This kernel fuses them per batch-row tile:

* phase 1 — FPS exactly as ops/pallas/fps.py, additionally accumulating the
  selected centers' coordinates into [Bt, G] registers (they are already in
  hand each iteration as the current centroid);
* phase 2 — packed kNN keys [Bt, G, N] built from those center coordinates
  against the resident planes (exact f32 VPU differences, same as
  ops/pallas/knn.py);
* phase 3 — k extractions by single min-reduce per step (index rides in the
  key's low bits).

One launch, one load of the planes, no XLA-side centers gather for the
kNN query set.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

INT_MAX = jnp.iinfo(jnp.int32).max


def _patchify_kernel(
    g: int, k: int, n: int, idx_bits: int,
    xs_ref, ys_ref, zs_ref, start_ref, cidx_ref, nidx_ref,
):
    xs = xs_ref[...]  # [Bt, N] f32
    ys = ys_ref[...]
    zs = zs_ref[...]
    bt = xs.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (bt, n), 1)
    out_colg = jax.lax.broadcasted_iota(jnp.int32, (bt, g), 1)

    # ---- phase 1: FPS, accumulating center indices and coordinates
    dist0 = jnp.full((bt, n), 1e10, dtype=jnp.float32)
    far0 = start_ref[...][:, 0]
    zeros_g = jnp.zeros((bt, g), jnp.float32)

    def fps_body(i, carry):
        dist, far, cacc, cx, cy, cz = carry
        sel_i = out_colg == i
        cacc = cacc + jnp.where(sel_i, far[:, None], 0)
        sel = (col == far[:, None]).astype(jnp.float32)
        cxi = jnp.sum(sel * xs, axis=1, keepdims=True)  # [Bt, 1]
        cyi = jnp.sum(sel * ys, axis=1, keepdims=True)
        czi = jnp.sum(sel * zs, axis=1, keepdims=True)
        cx = cx + jnp.where(sel_i, cxi, 0.0)
        cy = cy + jnp.where(sel_i, cyi, 0.0)
        cz = cz + jnp.where(sel_i, czi, 0.0)
        d = (xs - cxi) ** 2 + (ys - cyi) ** 2 + (zs - czi) ** 2
        dist = jnp.minimum(dist, d)
        m = jnp.max(dist, axis=-1, keepdims=True)
        far = jnp.min(jnp.where(dist == m, col, n), axis=-1).astype(jnp.int32)
        return dist, far, cacc, cx, cy, cz

    _, _, cacc, cx, cy, cz = jax.lax.fori_loop(
        0, g, fps_body,
        (dist0, far0, jnp.zeros((bt, g), jnp.int32), zeros_g, zeros_g,
         zeros_g),
    )
    cidx_ref[...] = cacc

    # ---- phase 2: packed kNN keys of every center against all points
    mask = (1 << idx_bits) - 1
    d = (
        (cx[:, :, None] - xs[:, None, :]) ** 2
        + (cy[:, :, None] - ys[:, None, :]) ** 2
        + (cz[:, :, None] - zs[:, None, :]) ** 2
    )  # [Bt, G, N]
    col3 = jax.lax.broadcasted_iota(jnp.int32, (bt, g, n), 2)
    keys = (pltpu.bitcast(d, jnp.int32) & ~mask) | col3

    # ---- phase 3: k extractions, one min-reduce each
    out_colk = jax.lax.broadcasted_iota(jnp.int32, (bt, g, k), 2)
    acc0 = jnp.zeros((bt, g, k), jnp.int32)

    def sel_body(t, carry):
        keys, acc = carry
        m = jnp.min(keys, axis=-1, keepdims=True)  # [Bt, G, 1]
        acc = acc + jnp.where(out_colk == t, m & mask, 0)
        keys = jnp.where(keys == m, INT_MAX, keys)
        return keys, acc

    _, acc = jax.lax.fori_loop(0, k, sel_body, (keys, acc0))
    nidx_ref[...] = acc


@partial(
    jax.jit, static_argnames=("num_groups", "group_size", "block_rows",
                              "interpret")
)
def fps_knn_pallas(
    xyz: Array,
    num_groups: int,
    group_size: int,
    start: Array | None = None,
    block_rows: int = 8,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """xyz [B, N, >=3] -> (centers_idx [B, G] int32,
    neighbor_idx [B, G, K] int32, nearest-first)."""
    b, n, _ = xyz.shape
    planes = [xyz[..., i].astype(jnp.float32) for i in range(3)]
    if start is None:
        start = jnp.zeros((b,), jnp.int32)
    start = start.astype(jnp.int32).reshape(b, 1)
    block_rows = min(block_rows, b)
    if b % block_rows:
        block_rows = 1
    idx_bits = max(1, (n - 1).bit_length())
    ms = pl.ANY if interpret else pltpu.VMEM
    plane_spec = pl.BlockSpec(
        (block_rows, n), lambda i: (i, 0), memory_space=ms
    )
    return pl.pallas_call(
        partial(_patchify_kernel, num_groups, group_size, n, idx_bits),
        out_shape=(
            jax.ShapeDtypeStruct((b, num_groups), jnp.int32),
            jax.ShapeDtypeStruct((b, num_groups, group_size), jnp.int32),
        ),
        grid=(b // block_rows,),
        in_specs=[
            plane_spec,
            plane_spec,
            plane_spec,
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0), memory_space=ms),
        ],
        out_specs=(
            pl.BlockSpec(
                (block_rows, num_groups), lambda i: (i, 0), memory_space=ms
            ),
            pl.BlockSpec(
                (block_rows, num_groups, group_size),
                lambda i: (i, 0, 0),
                memory_space=ms,
            ),
        ),
        interpret=interpret,
    )(*planes, start)
