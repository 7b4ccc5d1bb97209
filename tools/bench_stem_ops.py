"""Microbenchmarks for the patch-stem kernels (FPS / kNN / gather) on the
current backend, using the chained-K differencing harness (see bench.py for
why per-call timing is meaningless on a tunneled PJRT backend).

Usage: python tools/bench_stem_ops.py [batch] [n] [groups] [k]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from vipformer_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from vipformer_tpu.ops.geometry import farthest_point_sample, knn
from vipformer_tpu.ops.pallas.gather import gather_rows_pallas


def device_time(fn, pts, reps=5, k1=2, k2=12):
    @jax.jit
    def chain(x, k):
        def body(_, carry):
            x_i, acc = carry
            s = fn(x_i)
            return x_i + (s * 1e-12).astype(x_i.dtype), acc + s

        _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0)))
        return acc

    def run(k):
        return float(chain(pts, jnp.int32(k)))

    run(k1)
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(k1)
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(k2)
        t2s.append(time.perf_counter() - t0)
    return max((np.median(t2s) - np.median(t1s)) / (k2 - k1), 1e-9)


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    g = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((b, n, 3)), dtype=jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, (b, g * k)), dtype=jnp.int32)
    centers = jnp.asarray(
        rng.standard_normal((b, g, 3)), dtype=jnp.float32
    )
    print(f"backend={jax.default_backend()} B={b} N={n} G={g} k={k}")

    t = device_time(
        lambda x: jnp.sum(farthest_point_sample(x, g)).astype(jnp.float32),
        pts,
    )
    print(f"fps:            {t*1e3:7.3f} ms")

    t = device_time(
        lambda x: jnp.sum(knn(k, x, centers)).astype(jnp.float32), pts
    )
    print(f"knn:            {t*1e3:7.3f} ms")

    t = device_time(
        lambda x: jnp.sum(gather_rows_pallas(x, idx)).astype(jnp.float32),
        pts,
    )
    print(f"gather C=3:     {t*1e3:7.3f} ms  ({b * g * k} rows/batch-row)")

    wide = jnp.asarray(
        rng.standard_normal((b, n, 128)), dtype=jnp.bfloat16
    )
    t = device_time(
        lambda x: jnp.sum(gather_rows_pallas(x, idx))
        .astype(jnp.float32),
        wide,
    )
    print(f"gather C=128bf: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
