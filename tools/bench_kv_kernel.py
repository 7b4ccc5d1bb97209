"""Microbenchmark: the kv-folded flash CA kernel (fwd+bwd) at pretrain
dims, chained-K timing. Used to tune blocking (kv_chunk x BT) on the chip.

Usage: python tools/bench_kv_kernel.py [kv_chunk ...]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vipformer_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
from vipformer_tpu.ops.pallas.flash_train import (
    flash_attention_train_kv,
    _kv_blocking,
)

B, G, M, D, DIN, H, RATE = 384, 128, 2048, 256, 256, 4, 0.1


def bench(kv_chunk):
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((B, G, D)), dt)
    x = jnp.asarray(rng.standard_normal((B, M, DIN)), dt)
    lns = jnp.ones((DIN,), jnp.float32)
    lnb = jnp.zeros((DIN,), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((DIN, D)) * 0.05, dt)
    wv = jnp.asarray(rng.standard_normal((DIN, D)) * 0.05, dt)
    seed = jnp.zeros((1,), jnp.int32)
    scale = (D // H) ** -0.5
    mc, bt = _kv_blocking(B, G, D, M, DIN, kv_chunk)

    def loss(q, x, lns, lnb, wk, wv):
        return jnp.sum(
            flash_attention_train_kv(
                q, x, lns, lnb, wk, wv, seed, H, scale, RATE, kv_chunk,
                False,
            ).astype(jnp.float32) ** 2
        )

    grad = jax.value_and_grad(loss, argnums=(0, 1, 4, 5))

    @jax.jit
    def chain(q, x, lns, lnb, wk, wv, k):
        def body(_, carry):
            qq, acc = carry
            val, (dq, dx, dwk, dwv) = grad(qq, x, lns, lnb, wk, wv)
            return qq + dq * 1e-9, acc + val

        _, acc = jax.lax.fori_loop(0, k, body, (q, jnp.float32(0)))
        return acc

    def run(k):
        return float(chain(q, x, lns, lnb, wk, wv, jnp.int32(k)))

    run(2)
    t1s, t2s = [], []
    for _ in range(4):
        t0 = time.perf_counter()
        run(2)
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(8)
        t2s.append(time.perf_counter() - t0)
    step = (np.median(t2s) - np.median(t1s)) / 6
    print(
        f"kv_chunk={kv_chunk} -> mc={mc} bt={bt}: "
        f"{step * 1e3:.2f} ms fwd+bwd"
    )


if __name__ == "__main__":
    chunks = [None]
    if len(sys.argv) > 1:
        chunks = [
            None if a == "auto" else int(a) for a in sys.argv[1:]
        ]
    for c in chunks:
        try:
            bench(c)
        except Exception as e:
            print(f"kv_chunk={c} FAILED: {type(e).__name__}: {str(e)[:200]}")
