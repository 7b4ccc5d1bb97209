"""Serving latency benchmark: ragged-request traffic through the bucketed
Predictor (vipformer_tpu/inference.py) on the flagship classifier.

Simulates a request stream with mixed batch sizes (1..max), measures
end-to-end per-request wall latency (host -> device -> host, padding and
stripping included) after a full bucket warmup, and reports percentiles
per requested size class plus aggregate throughput.

Usage: python tools/bench_serving.py [--max_batch 256] [--requests 400]
Prints one JSON line (driver-compatible shape).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from vipformer_tpu.config import Config, decode_arch_name
from vipformer_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from vipformer_tpu.inference import classifier_predictor
from vipformer_tpu.models import build_ft_cls

NUM_POINTS = 1024


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max_batch", type=int, default=256)
    ap.add_argument("--requests", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    cfg = Config(
        compute_dtype="bfloat16" if on_tpu else "float32",
        num_obj_classes=40,
        **decode_arch_name("E1CL8SL-H4D256-L128-MR2"),
    )
    model = build_ft_cls(cfg)
    rng = np.random.default_rng(args.seed)
    sample = rng.standard_normal((NUM_POINTS, 3)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.key(0)},
        np.repeat(sample[None], 2, axis=0),
    )
    pred = classifier_predictor(model, variables, max_batch=args.max_batch)

    t0 = time.perf_counter()
    pred.warmup(sample)
    warmup_s = time.perf_counter() - t0

    # link floor: round-trip of a scalar through the backend — on the
    # tunneled PJRT backend of this image it is tens of ms and dominates
    # every request; on a host-attached TPU VM it is microseconds
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1.0)
    tiny(jnp.float32(0))
    floors = []
    for _ in range(20):
        t1 = time.perf_counter()
        np.asarray(tiny(jnp.float32(0)))
        floors.append(time.perf_counter() - t1)
    link_floor_ms = float(np.median(floors) * 1e3)

    # ragged traffic: log-uniform request sizes, realistic for a service
    sizes = np.unique(
        np.round(
            np.exp(
                rng.uniform(0, np.log(args.max_batch), args.requests)
            )
        ).astype(int)
    )
    reqs = rng.choice(
        np.clip(
            np.round(
                np.exp(rng.uniform(0, np.log(args.max_batch), args.requests))
            ).astype(int),
            1,
            args.max_batch,
        ),
        args.requests,
    )
    lat = []
    clouds = 0
    t0 = time.perf_counter()
    for n in reqs:
        batch = rng.standard_normal((int(n), NUM_POINTS, 3)).astype(
            np.float32
        )
        t1 = time.perf_counter()
        out = pred(batch)
        lat.append(time.perf_counter() - t1)
        assert out["logits"].shape == (int(n), 40)
        clouds += int(n)
    total = time.perf_counter() - t0
    lat_ms = np.asarray(lat) * 1e3

    print(
        json.dumps(
            {
                "metric": "serving_p50_request_latency_ms",
                "value": round(float(np.percentile(lat_ms, 50)), 3),
                "unit": "ms",
                "detail": {
                    "backend": jax.default_backend(),
                    "p90_ms": round(float(np.percentile(lat_ms, 90)), 3),
                    "p99_ms": round(float(np.percentile(lat_ms, 99)), 3),
                    "max_ms": round(float(lat_ms.max()), 3),
                    "requests": int(len(reqs)),
                    "clouds_per_sec": round(clouds / total, 1),
                    "distinct_sizes": int(len(np.unique(reqs))),
                    "buckets": pred.buckets,
                    "warmup_s": round(warmup_s, 1),
                    "link_floor_ms": round(link_floor_ms, 2),
                    "p50_minus_link_ms": round(
                        float(np.percentile(lat_ms, 50)) - link_floor_ms, 3
                    ),
                    "note": "end-to-end host->device->host per ragged "
                    "request after bucket warmup; no recompiles in the "
                    "serving path. On this image the backend is a "
                    "remote-PJRT tunnel whose round-trip floor "
                    "(link_floor_ms) dominates; subtract it for the "
                    "on-host serving estimate",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
