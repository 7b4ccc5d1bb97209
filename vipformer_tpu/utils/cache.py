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
