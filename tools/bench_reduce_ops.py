"""Microbench: XLA reduce emitter vs Pallas row-stat kernels.

The r2 pretrain-step profile shows ~15 ms of tiny-output reduce fusions
(bias grads, BatchNorm fwd/bwd stats: [256]/[128]/[64] outputs over
[B*2048, C] / [B*G*S, C] activations) and ~7 ms of f32[256,256] dW
matmuls.  XLA's reduce emitter measures ~7x off HBM bandwidth at these
shapes; this script quantifies what a Pallas row-block accumulator kernel
achieves before the kernels are promoted into ops/pallas/rowstats.py.

Timing uses the chained-K pattern (bench.py:56): the tunneled PJRT backend
has a ~3.3 ms dispatch floor, so only in-jit chained iterations measure
device time.
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _timed(fn, *args, k1=2, k2=12, reps=5):
    """fn(k, *args) -> scalar; returns seconds per iteration."""
    fn(jnp.int32(k1), *args).block_until_ready()
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(jnp.int32(k1), *args).block_until_ready()
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        fn(jnp.int32(k2), *args).block_until_ready()
        t2s.append(time.perf_counter() - t0)
    return (np.median(t2s) - np.median(t1s)) / (k2 - k1)


# ---------------------------------------------------------------- kernels


def _colsum_kernel(x_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jnp.sum(
        x_ref[...].astype(jnp.float32), axis=0, keepdims=True
    )


def colsum_pallas(x, block_rows=4096):
    r, c = x.shape
    assert r % block_rows == 0
    return pl.pallas_call(
        _colsum_kernel,
        out_shape=jax.ShapeDtypeStruct((1, c), jnp.float32),
        grid=(r // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )(x)[0]


def _bn_bwd_kernel(dy_ref, x_ref, mean_ref, rstd_ref, s1_ref, s2_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    dy = dy_ref[...].astype(jnp.float32)
    xhat = (x_ref[...].astype(jnp.float32) - mean_ref[...]) * rstd_ref[...]
    s1_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    s2_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)


def bn_bwd_pallas(dy, x, mean, rstd, block_rows=4096):
    r, c = x.shape
    assert r % block_rows == 0
    s1, s2 = pl.pallas_call(
        _bn_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        grid=(r // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
    )(dy, x, mean.reshape(1, c), rstd.reshape(1, c))
    return s1[0], s2[0]


def _dense_bwd_kernel(x_ref, dy_ref, dw_ref, db_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[...]
    dy = dy_ref[...]
    dw_ref[...] += jax.lax.dot_general(
        x, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    db_ref[...] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)


def dense_bwd_pallas(x, dy, block_rows=4096):
    r, cin = x.shape
    _, cout = dy.shape
    assert r % block_rows == 0
    dw, db = pl.pallas_call(
        _dense_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((cin, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
        ),
        grid=(r // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(x, dy)
    return dw, db[0]


# ----------------------------------------------------------------- cases


def _chain(fn):
    """Wrap op(x, ...) -> pytree into a k-chained jit with data dependence."""

    @jax.jit
    def run(k, *args):
        def body(_, carry):
            x, acc = carry
            out = fn(x, *args[1:])
            s = sum(
                jnp.sum(t).astype(jnp.float32)
                for t in jax.tree_util.tree_leaves(out)
            )
            return x + (s * 1e-20).astype(x.dtype), acc + s

        _, acc = jax.lax.fori_loop(0, k, body, (args[0], jnp.float32(0)))
        return acc

    return run


def main():
    rows_list = [(786432, 256), (1572864, 256), (1572864, 64)]
    rng = np.random.default_rng(0)
    hbm_gbps = []
    for r, c in rows_list:
        x = jnp.asarray(rng.standard_normal((r, c)), jnp.bfloat16)
        dy = jnp.asarray(rng.standard_normal((r, c)), jnp.bfloat16)
        mean = jnp.zeros((c,), jnp.float32)
        rstd = jnp.ones((c,), jnp.float32)
        bytes_1x = r * c * 2

        # correctness
        ref = jnp.sum(x.astype(jnp.float32), axis=0)
        got = colsum_pallas(x)
        err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        print(f"[{r}x{c}] colsum rel err {err:.2e}")

        t_xla = _timed(_chain(lambda x: jnp.sum(x.astype(jnp.float32), 0)), x)
        t_pl = _timed(_chain(colsum_pallas), x)
        print(
            f"  colsum      xla {t_xla*1e3:7.3f} ms ({bytes_1x/t_xla/1e9:6.1f} GB/s)"
            f"   pallas {t_pl*1e3:7.3f} ms ({bytes_1x/t_pl/1e9:6.1f} GB/s)"
        )

        t_xla = _timed(
            _chain(
                lambda dy, x: (
                    jnp.sum(dy.astype(jnp.float32), 0),
                    jnp.sum(
                        dy.astype(jnp.float32)
                        * (x.astype(jnp.float32) - mean) * rstd,
                        0,
                    ),
                )
            ),
            dy, x,
        )
        t_pl = _timed(
            _chain(lambda dy, x: bn_bwd_pallas(dy, x, mean, rstd)), dy, x
        )
        print(
            f"  bn_bwd(2in) xla {t_xla*1e3:7.3f} ms ({2*bytes_1x/t_xla/1e9:6.1f} GB/s)"
            f"   pallas {t_pl*1e3:7.3f} ms ({2*bytes_1x/t_pl/1e9:6.1f} GB/s)"
        )

        t_xla = _timed(
            _chain(
                lambda x, dy: (
                    jax.lax.dot_general(
                        x, dy, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ),
                    jnp.sum(dy.astype(jnp.float32), 0),
                )
            ),
            x, dy,
        )
        t_pl = _timed(_chain(dense_bwd_pallas), x, dy)
        ref_dw = jax.lax.dot_general(
            x, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        got_dw, _ = dense_bwd_pallas(x, dy)
        errw = float(
            jnp.max(jnp.abs(ref_dw - got_dw)) / (jnp.max(jnp.abs(ref_dw)) + 1e-9)
        )
        print(
            f"  dW+db       xla {t_xla*1e3:7.3f} ms ({2*bytes_1x/t_xla/1e9:6.1f} GB/s)"
            f"   pallas {t_pl*1e3:7.3f} ms ({2*bytes_1x/t_pl/1e9:6.1f} GB/s)"
            f"   dW rel err {errw:.2e}"
        )


if __name__ == "__main__":
    main()
