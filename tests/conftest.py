"""Test configuration: force a simulated 8-device CPU platform.

The reference framework could only exercise its DDP path on a real multi-GPU
node (pretrain.py exits if <2 GPUs). Here every distributed test runs on a
virtual 8-device CPU mesh so DP/TP semantics are covered in CI without TPUs.

This file must set the env vars before anything imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.key(0)
