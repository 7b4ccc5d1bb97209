"""Sharding placement: batches over the data axis, parameters replicated or
tensor-parallel over the model axis.

Tensor-parallel rules (model_axis > 1): attention q/k/v projection kernels
and the MLP up-projection shard their *output* features; attention output
projections and MLP down-projections shard their *input* features, so each
pair contracts locally and XLA inserts a single psum per block — the
standard Megatron layout expressed purely through NamedSharding constraints
(no collective is written by hand).
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vipformer_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, batch_sharding

# (path regex, PartitionSpec) — first match wins; applied only to 2-D kernels
_TP_RULES = [
    (re.compile(r"(q_proj|k_proj|v_proj)/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"o_proj/kernel$"), P(MODEL_AXIS, None)),
    # MLP: first Dense widens (shard out), second projects back (shard in)
    (re.compile(r"MLP_\d+/Dense_0/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"MLP_\d+/Dense_1/kernel$"), P(MODEL_AXIS, None)),
]


def _path_str(path) -> str:
    return "/".join(
        getattr(p, "key", getattr(p, "name", str(p))) for p in path
    )


def tp_role_for_path(path_str: str) -> str | None:
    """Megatron role of a Dense kernel at a flax path ('.../kernel'):
    'col' = output features sharded (P(None, model)), 'row' = input
    features sharded (P(model, None)), None = replicated. Single source
    of truth shared by `param_shardings` (parameter placement) and
    nn.layers.Dense (backward-kernel shard specs, ops/pallas/dense.py) —
    the two must agree or the dW psum reduces over the wrong axis."""
    for rx, pspec in _TP_RULES:
        if rx.search(path_str):
            return "row" if pspec[0] == MODEL_AXIS else "col"
    return None


def param_shardings(variables, mesh: Mesh):
    """NamedSharding pytree for a variables pytree: TP rules on matching
    kernels when the model axis is >1, replicated otherwise."""
    tp = mesh.shape[MODEL_AXIS] > 1

    def spec(path, leaf):
        if tp and hasattr(leaf, "ndim") and leaf.ndim == 2:
            role = tp_role_for_path(_path_str(path))
            if role is not None:
                ax = 0 if role == "row" else 1
                if leaf.shape[ax] % mesh.shape[MODEL_AXIS] == 0:
                    pspec = (
                        P(MODEL_AXIS, None)
                        if role == "row"
                        else P(None, MODEL_AXIS)
                    )
                    return NamedSharding(mesh, pspec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, variables)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Host numpy batch -> global device arrays sharded over the data axis.

    Replaces DistributedSampler + per-rank `.to(rank)`: one device_put with a
    NamedSharding splits the leading axis across the mesh.
    """
    sh = batch_sharding(mesh)
    return {
        k: jax.device_put(np.asarray(v), sh) for k, v in batch.items()
    }


def place_state(state, mesh: Mesh):
    """Place a train-state pytree on the mesh with param_shardings."""
    shardings = param_shardings(state, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, shardings
    )
