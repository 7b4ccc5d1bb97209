"""Persistent XLA compilation cache.

First compiles through the remote TPU toolchain cost minutes; the persistent
cache makes every repeat instantaneous across processes. Called by bench,
the graft entry, and all CLIs.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.expanduser("~/.cache/vipformer_tpu_xla")


def enable_compile_cache(path: str | None = None) -> None:
    try:
        jax.config.update(
            "jax_compilation_cache_dir", path or DEFAULT_DIR
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0
        )
    except Exception:
        pass  # older jax without these flags


def train_key(seed: int):
    """PRNG key for training streams (dropout/droppath/fps).

    On TPU the default threefry PRNG generates mask bits in software on the
    VPU — measured at 86 ms of a 232 ms pretrain step (the attention-dropout
    mask over [2B, H, G, M] dominates). The 'rbg' implementation uses the
    hardware RNG instructions instead; dropout only needs statistical
    independence, not cross-backend bit-reproducibility, so training streams
    default to rbg there.
    """
    import jax

    if jax.default_backend() == "tpu":
        return jax.random.key(seed, impl="rbg")
    return jax.random.key(seed)
