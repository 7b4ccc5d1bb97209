"""Benchmark: classification-inference throughput of the flagship model.

Prints ONE JSON line:
  {"metric": "clouds_per_sec_per_chip_1024pt_cls", "value": N,
   "unit": "clouds/s", "vs_baseline": R}

Baseline: the reference's most direct published latency row — TABLE I
(assets/tab1.png): 1,015 ms finetune latency for the 5.1 M-param
H4D256-L128-MR2 classification model at test batch 160 on the 6-GPU CUDA
10.2 node => 160 / 1.015 s = 157.6 clouds/s for the whole node. We report
per-chip throughput, so vs_baseline = ours_per_chip / 157.6 (conservative:
the denominator is a 6-GPU aggregate).

Run on the TPU: python bench.py            (full batch sweep, ~1 min)
               python bench.py --quick    (single batch size)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from vipformer_tpu.config import Config, decode_arch_name
from vipformer_tpu.models import build_ft_cls

BASELINE_CLOUDS_PER_SEC = 160.0 / 1.015  # reference TABLE I latency row
FLAGSHIP = "E1CL8SL-H4D256-L128-MR2"
NUM_POINTS = 1024


def bench_forward(batch_size: int, iters: int = 30, warmup: int = 5):
    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        compute_dtype="bfloat16" if on_tpu else "float32",
        num_obj_classes=40,
        **decode_arch_name(FLAGSHIP),
    )
    model = build_ft_cls(cfg)
    pts = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch_size, NUM_POINTS, 3)
        ),
        dtype=jnp.float32,
    )
    variables = model.init({"params": jax.random.key(0)}, pts)

    @jax.jit
    def fwd(v, x):
        logits, _ = model.apply(v, x, deterministic=True)
        return logits

    # compile + warmup
    fwd(variables, pts).block_until_ready()
    for _ in range(warmup):
        out = fwd(variables, pts)
    out.block_until_ready()

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fwd(variables, pts).block_until_ready()
        times.append(time.perf_counter() - t0)
    times = np.array(times)
    p50 = float(np.percentile(times, 50))
    best = float(np.min(times))
    return {
        "batch": batch_size,
        "p50_batch_latency_s": p50,
        "clouds_per_sec_p50": batch_size / p50,
        "clouds_per_sec_best": batch_size / best,
        "p50_per_cloud_ms": 1000.0 * p50 / batch_size,
    }


def main():
    quick = "--quick" in sys.argv
    batches = [256] if quick else [64, 128, 256, 512]
    results = []
    for b in batches:
        try:
            results.append(bench_forward(b))
            print(f"# batch {b}: {results[-1]}", file=sys.stderr)
        except Exception as e:  # e.g. OOM at large batch
            print(f"# batch {b} failed: {e}", file=sys.stderr)
    if not results:
        raise SystemExit("no benchmark configuration succeeded")
    bestcfg = max(results, key=lambda r: r["clouds_per_sec_p50"])
    value = bestcfg["clouds_per_sec_p50"]
    print(
        json.dumps(
            {
                "metric": "clouds_per_sec_per_chip_1024pt_cls",
                "value": round(value, 1),
                "unit": "clouds/s",
                "vs_baseline": round(value / BASELINE_CLOUDS_PER_SEC, 2),
                "detail": {
                    "flagship": FLAGSHIP,
                    "backend": jax.default_backend(),
                    "best_batch": bestcfg["batch"],
                    "p50_per_cloud_ms": round(
                        bestcfg["p50_per_cloud_ms"], 4
                    ),
                    "baseline": "TABLE I: 160-cloud batch / 1.015 s on "
                    "6-GPU node = 157.6 clouds/s",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
