"""Breakdown profile of the flagship forward on the current backend:
full model vs. patch-pipeline stages (FPS / kNN / gather / Group2Emb) vs.
encoder, at a given batch size. Guides kernel-optimization priorities.

Usage: python tools/profile_forward.py [batch] [num_points]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from vipformer_tpu.config import Config, decode_arch_name
from vipformer_tpu.models import build_pc_model
from vipformer_tpu.ops.geometry import (
    divide_patches,
    farthest_point_sample,
    index_points,
    knn,
)


def timeit(fn, *args, iters=20, warmup=3):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        compute_dtype="bfloat16" if on_tpu else "float32",
        **decode_arch_name("E1CL8SL-H4D256-L128-MR2"),
    )
    print(f"backend={jax.default_backend()} batch={batch} points={n}")

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((batch, n, 3)), dtype=jnp.float32)

    model = build_pc_model(cfg)
    variables = model.init({"params": jax.random.key(0)}, pts)

    fwd = jax.jit(lambda v, x: model.apply(v, x, deterministic=True))
    t_full = timeit(fwd, variables, pts)
    print(f"full forward:      {t_full*1e3:8.2f} ms  "
          f"({batch/t_full:,.0f} clouds/s)")

    fps_j = jax.jit(lambda x: farthest_point_sample(x, cfg.num_pc_latents))
    t_fps = timeit(fps_j, pts)
    print(f"fps only:          {t_fps*1e3:8.2f} ms  ({100*t_fps/t_full:.0f}%)")

    idx = fps_j(pts)
    centers = index_points(pts, idx)
    knn_j = jax.jit(lambda p, c: knn(cfg.group_size, p, c))
    t_knn = timeit(knn_j, pts, centers)
    print(f"knn only:          {t_knn*1e3:8.2f} ms  ({100*t_knn/t_full:.0f}%)")

    patches_j = jax.jit(
        lambda x: divide_patches(x, cfg.num_pc_latents, cfg.group_size)
    )
    t_patch = timeit(patches_j, pts)
    print(f"divide_patches:    {t_patch*1e3:8.2f} ms  "
          f"({100*t_patch/t_full:.0f}%)")


if __name__ == "__main__":
    main()
