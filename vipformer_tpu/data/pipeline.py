"""Host-side input pipeline: epoch-seeded shuffling, threaded sample
assembly, and static-shape batches ready for device transfer.

Replaces the reference's torch DataLoader + DistributedSampler stack
(`pretrain.py:56-69`): per-epoch reshuffle is a seeded permutation (the
`set_epoch` equivalent), worker parallelism is a thread pool over the
dataset's `get` (h5py/PIL/numpy release the GIL for the heavy parts), and
every batch has a fixed shape so the jitted step never recompiles. The
trainer shards batches across the device mesh with NamedSharding
(parallel/sharding.py), which replaces DistributedSampler's rank slicing.
"""

from __future__ import annotations

from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np

# process-pool workers get the dataset once via the fork initializer
# (copy-on-write), not pickled per task
_WORKER_DATASET = None


def _process_pool_init(dataset):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _process_pool_get(task):
    i, seed = task
    return _WORKER_DATASET.get(int(i), np.random.default_rng(int(seed)))


class Loader:
    """Minimal deterministic batch loader.

    Args:
      dataset: object with `__len__` and `get(i, rng)`.
      batch_size: global batch size; every yielded batch has exactly this
        many samples (`drop_last` semantics when shuffling, wrap-around
        padding otherwise disabled).
      collate: fn(list_of_samples) -> batch pytree of numpy arrays.
      shuffle: epoch-seeded permutation when True.
      seed: base seed; actual epoch seed is seed + epoch (set_epoch).
      num_workers: worker-pool width for sample assembly (0 = inline).
      worker_backend: "thread" (default; h5py/PIL/numpy release the GIL
        for the heavy parts) or "process" (torch-DataLoader-style worker
        processes for GIL-bound datasets; the dataset ships to workers
        once via fork, samples return pickled — see
        tools/bench_pipeline.py for the measured trade-off).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate: Callable,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        num_workers: int = 0,
        worker_backend: str = "thread",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        assert worker_backend in ("thread", "process"), worker_backend
        self.worker_backend = worker_backend
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        n = len(self.dataset)
        rng = np.random.default_rng(self.seed + self.epoch)
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        pool = None
        if self.num_workers > 0:
            if self.worker_backend == "process":
                pool = ProcessPoolExecutor(
                    self.num_workers,
                    initializer=_process_pool_init,
                    initargs=(self.dataset,),
                )
            else:
                pool = ThreadPoolExecutor(self.num_workers)
        try:
            for start in range(0, n, self.batch_size):
                idx = order[start : start + self.batch_size]
                if len(idx) < self.batch_size and self.drop_last:
                    break
                # one child rng per sample, derived deterministically
                seeds = rng.integers(0, 2**63 - 1, size=len(idx))
                if pool is None:
                    samples = [
                        self.dataset.get(
                            int(i), np.random.default_rng(int(s))
                        )
                        for i, s in zip(idx, seeds)
                    ]
                elif self.worker_backend == "process":
                    samples = list(
                        pool.map(
                            _process_pool_get,
                            list(zip(idx, seeds)),
                            chunksize=max(1, len(idx) // (4 * self.num_workers)),
                        )
                    )
                else:
                    samples = list(
                        pool.map(
                            lambda t: self.dataset.get(
                                int(t[0]), np.random.default_rng(int(t[1]))
                            ),
                            zip(idx, seeds),
                        )
                    )
                yield self.collate(samples)
        finally:
            if pool is not None:
                # process workers must be joined (wait=False would leak a
                # process group per epoch); idle threads can be abandoned
                pool.shutdown(wait=self.worker_backend == "process")


def collate_pretrain(samples):
    t1 = np.stack([s[0] for s in samples])
    t2 = np.stack([s[1] for s in samples])
    imgs = np.stack([s[2] for s in samples])
    return {"pc_t1": t1, "pc_t2": t2, "imgs": imgs}


def collate_pretrain_raw(samples):
    raw = np.stack([s[0] for s in samples])
    imgs = np.stack([s[1] for s in samples])
    return {"pc_raw": raw, "imgs": imgs}


def collate_cls(samples):
    pts = np.stack([s[0] for s in samples])
    labels = np.asarray([s[1] for s in samples], dtype=np.int64)
    return {"points": pts, "labels": labels}


def collate_partseg(samples):
    pts = np.stack([s[0] for s in samples])
    labels = np.asarray([s[1] for s in samples], dtype=np.int64)
    seg = np.stack([s[2] for s in samples])
    return {"points": pts, "obj_labels": labels, "seg": seg}


def collate_semseg(samples):
    pts = np.stack([s[0] for s in samples])
    seg = np.stack([s[1] for s in samples])
    return {"points": pts, "seg": seg}


def prefetch_to_device(iterator, mesh, depth: int = 2):
    """Overlap host batch assembly + H2D transfer with device compute.

    Wraps a Loader iterator: a background thread keeps `depth` batches
    already sharded onto the mesh (device_put is async), so the training
    loop never waits on the host. Replaces the reference's DataLoader
    `pin_memory=True` + implicit CUDA stream overlap.
    """
    import queue as _queue
    import threading

    from vipformer_tpu.parallel.sharding import shard_batch

    q: _queue.Queue = _queue.Queue(maxsize=depth)
    _END = object()

    def producer():
        try:
            for batch in iterator:
                q.put(shard_batch(batch, mesh))
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item


def pad_batch(batch: dict, batch_size: int) -> tuple[dict, np.ndarray]:
    """Pad a trailing partial batch up to `batch_size` by repeating the last
    sample; returns (padded_batch, valid_mask [batch_size]). Keeps evaluation
    shapes static for jit while metrics mask out the padding."""
    any_leaf = next(iter(batch.values()))
    n = len(any_leaf)
    mask = np.zeros(batch_size, dtype=bool)
    mask[:n] = True
    if n == batch_size:
        return batch, mask
    out = {}
    for k, v in batch.items():
        pad = np.repeat(v[-1:], batch_size - n, axis=0)
        out[k] = np.concatenate([v, pad], axis=0)
    return out, mask
