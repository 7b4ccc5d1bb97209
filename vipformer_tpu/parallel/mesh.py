"""Device-mesh construction and axis conventions.

The reference's distributed runtime is single-node DDP over NCCL
(`pretrain.py:30-36,104-109`); the TPU-native equivalent is a
`jax.sharding.Mesh` over ICI with XLA-inserted collectives:

* `data` axis — batch (DP). Gradients are reduced by XLA because the loss
  is a mean over a batch-sharded array under jit (no explicit allreduce
  calls anywhere, unlike DDP's bucketed NCCL allreduce).
* `model` axis — optional tensor parallelism over attention heads / MLP
  hidden units (the reference has no TP at all; size 1 by default).

Multi-host: call `jax.distributed.initialize()` before `make_mesh` and the
global device list spans hosts; everything else is unchanged.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed() -> bool:
    """Join a multi-process JAX job if coordinator env vars are present.

    Env contract (set by pod launchers or tests): `JAX_COORDINATOR_ADDRESS`
    plus optionally `JAX_NUM_PROCESSES` / `JAX_PROCESS_ID` (TPU pods
    auto-detect the latter two). This is the process-group bring-up the
    reference does via `mp.spawn` + `dist.init_process_group`
    (`pretrain.py:339`, `vipformer/utils.py` NCCL setup); here the
    distributed runtime only exchanges topology — gradient reductions are
    XLA collectives inserted under jit, not NCCL calls.

    Returns True when the process is part of a >1-process job. Raises on a
    failed bring-up (a half-joined job must not train silently).
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        # NOTE: jax.process_count() would initialise the XLA backend, which
        # must not happen before jax.distributed.initialize — so the no-env
        # fast path checks the distributed client state instead
        from jax._src import distributed as _dist

        return _dist.global_state.client is not None
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:  # already joined
        return True
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return jax.process_count() > 1


def make_mesh(
    num_devices: int = 0, model_axis: int = 1, devices=None
) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    n = num_devices or len(devs)
    if n % model_axis:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    # register the mesh with the kernel dispatch layer: pallas_call has no
    # SPMD partitioning rule, so on multi-device meshes every kernel call
    # site runs under shard_map (batch over data, attention heads over
    # model) — see ops/pallas/shard.py
    import logging

    from vipformer_tpu.ops.pallas import set_tp_kernel_gate, shard

    set_tp_kernel_gate(
        model_axis, log=logging.getLogger("vipformer_tpu").warning
    )
    arr = np.array(devs[:n]).reshape(n // model_axis, model_axis)
    mesh = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    shard.register_mesh(mesh)
    return mesh


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_axis_size(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS]
