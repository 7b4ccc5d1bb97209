"""Test configuration: force a simulated 8-device CPU platform.

The reference framework could only exercise its DDP path on a real multi-GPU
node (pretrain.py exits if <2 GPUs). Here every distributed test runs on a
virtual 8-device CPU mesh so DP/TP semantics are covered in CI without TPUs.

This file must set the env vars before anything imports jax.
"""

import os

# set VIPFORMER_TEST_TPU=1 to run the suite against the real chip instead
# (enables the @skipif(tpu) hardware tests, e.g. flash-dropout parity)
_ON_TPU = os.environ.get("VIPFORMER_TEST_TPU") == "1"
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A sitecustomize hook in this image force-registers a remote-TPU PJRT
# platform and overwrites jax_platforms at interpreter start; re-assert the
# CPU platform after import (before any backend is initialized) so tests run
# locally on the virtual 8-device mesh.
if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/vipformer_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.key(0)


@pytest.fixture(autouse=True)
def _reset_kernel_mesh():
    """Clear the shard_map kernel-dispatch mesh registry after each test.

    `parallel.make_mesh` registers the mesh process-globally (production
    CLIs build exactly one); without this reset a test that builds a mesh
    would leak multi-device kernel dispatch into every later test."""
    yield
    from vipformer_tpu.ops.pallas import shard

    shard.register_mesh(None)
