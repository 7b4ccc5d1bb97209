"""Breakdown profile of the flagship forward on the current backend:
full model vs. patch-pipeline stages (FPS / kNN / divide_patches) vs.
encoder remainder. Guides kernel-optimization priorities.

Timing uses chained-K executions inside one jit with differenced trip
counts (see bench.py) — per-call block_until_ready is meaningless on a
tunneled PJRT backend.

Usage: python tools/profile_forward.py [batch] [num_points] [lax_fps]
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

from vipformer_tpu.config import Config, decode_arch_name
from vipformer_tpu.models import build_pc_model
from vipformer_tpu.ops import geometry
from vipformer_tpu.ops.geometry import (
    divide_patches,
    farthest_point_sample,
    index_points,
    knn,
)


def device_time(make_chain, reps=5, k1=2, k2=12):
    """make_chain(k) -> float scalar; returns seconds per iteration."""
    jitted = jax.jit(make_chain)

    def run(k):
        return float(jitted(jnp.int32(k)))

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


def chain_over_pts(fn, pts):
    """Build a chain where each iteration's scalar output perturbs pts."""

    def chain(k):
        def body(_, carry):
            x, acc = carry
            s = fn(x)
            return x + (s * 1e-12).astype(x.dtype), acc + s

        _, acc = jax.lax.fori_loop(0, k, body, (pts, jnp.float32(0)))
        return acc

    return chain


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    if len(sys.argv) > 3 and sys.argv[3] == "lax_fps":
        geometry.USE_PALLAS_FPS = False
    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        compute_dtype="bfloat16" if on_tpu else "float32",
        **decode_arch_name("E1CL8SL-H4D256-L128-MR2"),
    )
    print(f"backend={jax.default_backend()} batch={batch} points={n} "
          f"pallas_fps={geometry._pallas_fps_enabled()}")

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((batch, n, 3)), dtype=jnp.float32)

    model = build_pc_model(cfg)
    variables = model.init({"params": jax.random.key(0)}, pts)

    t_full = device_time(
        chain_over_pts(
            lambda x: jnp.sum(
                model.apply(variables, x, deterministic=True)[1]
            ).astype(jnp.float32),
            pts,
        )
    )
    print(f"full forward:      {t_full*1e3:8.2f} ms  "
          f"({batch/t_full:,.0f} clouds/s)")

    t_fps = device_time(
        chain_over_pts(
            lambda x: jnp.sum(
                farthest_point_sample(x, cfg.num_pc_latents)
            ).astype(jnp.float32),
            pts,
        )
    )
    print(f"fps only:          {t_fps*1e3:8.2f} ms  ({100*t_fps/t_full:.0f}%)")

    centers = index_points(pts, farthest_point_sample(pts, cfg.num_pc_latents))

    def knn_scalar(x):
        return jnp.sum(knn(cfg.group_size, x, centers)).astype(jnp.float32)

    t_knn = device_time(chain_over_pts(knn_scalar, pts))
    print(f"knn only:          {t_knn*1e3:8.2f} ms  ({100*t_knn/t_full:.0f}%)")

    def patches_scalar(x):
        nb, c = divide_patches(x, cfg.num_pc_latents, cfg.group_size)
        return (jnp.sum(nb) + jnp.sum(c)).astype(jnp.float32)

    t_patch = device_time(chain_over_pts(patches_scalar, pts))
    print(f"divide_patches:    {t_patch*1e3:8.2f} ms  "
          f"({100*t_patch/t_full:.0f}%)")


if __name__ == "__main__":
    main()
