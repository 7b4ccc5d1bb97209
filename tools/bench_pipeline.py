"""Host input-pipeline throughput benchmark: can the host feed the chip?

Builds a synthetic on-disk ShapeNet(Rendering) tree (binary PLY clouds +
PNG renders, the real layout `data/datasets.py:ShapeNetRender` reads),
then measures `Loader` samples/s over the full pretraining path — PLY
parse, PNG decode, the two host augmentation chains, image transform,
collate — across worker counts, and for the `--device_augs` raw-views
mode that moves augmentation onto the chip.

Context (reference: 18 DataLoader worker *processes* per rank,
`scripts/pretrain/*.sh`): the consumers to beat are the measured device
rates — ~1.1k clouds/s for the full pretrain step and ~18k clouds/s for
pure inference on one v5e chip.

Usage: python tools/bench_pipeline.py [--samples 512] [--points 2048]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vipformer_tpu.data.datasets import ShapeNetRender
from vipformer_tpu.data.pipeline import (
    Loader,
    collate_pretrain,
    collate_pretrain_raw,
)
from vipformer_tpu.data.ply import save_ply
from vipformer_tpu.data.synthetic import splat_image, synthetic_classification


def build_tree(root: str, samples: int, points: int) -> None:
    from PIL import Image

    clouds, labels = synthetic_classification(samples, points, 16, seed=3)
    for i, (cloud, lab) in enumerate(zip(clouds, labels)):
        cls = f"{int(lab):08d}"
        sid = f"model_{i:05d}"
        ply_path = os.path.join(root, "ShapeNet", cls, sid + ".ply")
        os.makedirs(os.path.dirname(ply_path), exist_ok=True)
        save_ply(ply_path, cloud)
        rdir = os.path.join(
            root, "ShapeNetRendering", cls, sid, "rendering"
        )
        os.makedirs(rdir, exist_ok=True)
        img = splat_image(cloud)
        for v in range(2):  # two views is enough to exercise the choice
            Image.fromarray(img).save(os.path.join(rdir, f"{v:02d}.png"))


def bench(
    ds, collate, batch: int, workers: int, epochs: int = 2,
    backend: str = "thread",
) -> float:
    loader = Loader(
        ds, batch, collate, shuffle=True, seed=0, drop_last=True,
        num_workers=workers, worker_backend=backend,
    )
    # warm epoch (page cache, pools)
    for _ in loader:
        pass
    n = 0
    t0 = time.perf_counter()
    for e in range(epochs):
        loader.set_epoch(e + 1)
        for b in loader:
            n += len(next(iter(b.values())))
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    root = tempfile.mkdtemp(prefix="vipformer_pipe_bench_")
    try:
        t0 = time.perf_counter()
        build_tree(root, args.samples, args.points)
        print(
            f"# built {args.samples}-sample tree in "
            f"{time.perf_counter()-t0:.1f}s under {root}",
            file=sys.stderr,
        )
        for raw_views, collate, tag in (
            (False, collate_pretrain, "host_augs"),
            (True, collate_pretrain_raw, "device_augs"),
        ):
            ds = ShapeNetRender(
                root, num_points=args.points, synthetic_ok=False,
                raw_views=raw_views,
            )
            assert not ds.synthetic and len(ds) == args.samples
            for backend, workers in (
                ("thread", 0),
                ("thread", 4),
                ("thread", 8),
                ("process", 4),
                ("process", 8),
            ):
                sps = bench(ds, collate, args.batch, workers, backend=backend)
                print(
                    json.dumps(
                        {
                            "metric": f"pipeline_samples_per_sec_{tag}",
                            "workers": workers,
                            "backend": backend,
                            "value": round(sps, 1),
                            "unit": "samples/s",
                            "points": args.points,
                        }
                    )
                )
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
