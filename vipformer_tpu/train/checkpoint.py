"""Pytree checkpointing + explicit backbone restore.

Replaces the reference's `torch.save(state_dict)` / `load_state_dict(
strict=False)` pattern (`pretrain.py:286-290`, `ft_cls.py:92-98`): msgpack
pytree snapshots with a JSON sidecar of metadata, and a *loud* submodule
restore API instead of strict=False silence — the finetune entry points log
exactly which subtrees were taken from the pretrain checkpoint and which
were freshly initialized.
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterable

import jax
import numpy as np
from flax import serialization


def _host_leaf(x):
    """One leaf -> host numpy, valid under multi-controller runtimes.

    np.asarray raises on arrays whose shards live on other hosts; replicated
    arrays read the local copy, genuinely sharded ones are allgathered (a
    collective — every process must reach this point). The reference never
    faced this: DDP keeps a full replica per rank (`pretrain.py:286-290`).
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.sharding.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _to_host(tree):
    return jax.tree_util.tree_map(_host_leaf, tree)


def save_checkpoint(path: str, tree: Any, metadata: dict | None = None) -> None:
    """Snapshot a pytree to disk. Multi-controller safe: every process
    participates in gathering device state (collective), but only process 0
    writes — the rank-0 gate the reference applies at each torch.save
    (`pretrain.py:278-308`), enforced here so no caller can forget it."""
    host_tree = _to_host(tree)
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    raw = serialization.msgpack_serialize(
        serialization.to_state_dict(host_tree)
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(raw)
    os.replace(tmp, path)  # atomic
    if metadata is not None:
        with open(path + ".json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def load_checkpoint(path: str, template: Any | None = None) -> Any:
    """Load a checkpoint; with a template pytree the result has the
    template's structure (and raises on mismatch), otherwise returns raw
    nested dicts."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if template is None:
        return raw
    return serialization.from_state_dict(template, raw)


def load_metadata(path: str) -> dict:
    with open(path + ".json") as f:
        return json.load(f)


def restore_backbone(
    init_params: dict,
    pretrained_params: dict,
    submodules: Iterable[str] = ("stem", "encoder"),
    log=None,
) -> dict:
    """Copy the named top-level subtrees from a pretrain checkpoint into a
    freshly initialized finetune parameter tree.

    Equivalent in effect to the reference's `"module."+k` remap +
    `strict=False` load (`ft_cls.py:92-98`) — the pretrain projection head is
    dropped, the finetune head keeps its fresh init — but explicit: returns a
    new tree and reports what happened.
    """
    out = dict(init_params)
    restored, fresh = [], []
    for name in init_params:
        if name in submodules and name in pretrained_params:
            out[name] = pretrained_params[name]
            restored.append(name)
        else:
            fresh.append(name)
    msg = (
        f"backbone restore: loaded {restored} from checkpoint; "
        f"fresh init for {fresh}"
    )
    if log is not None:
        log(msg)
    return out
