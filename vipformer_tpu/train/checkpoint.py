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


def _merge_subtree(init, pre, path, restored, fresh, mismatched):
    """Leaf-wise merge of `pre` into the structure of `init`.

    The output always has `init`'s structure: keys present in both take the
    checkpoint value (when shapes agree), keys only in `init` keep their
    fresh initialization, keys only in `pre` are dropped. This is the
    torch `load_state_dict(strict=False)` contract the reference relies on
    (`ft_partseg.py:83`) — crucially its partseg finetune builds a *12*-SA-
    layer encoder and restores an *8*-layer pretrain into it
    (`scripts/finetune/ft-E1CL8SL-*.sh` pretrain vs our
    `scripts/finetune/ft-partseg.sh --num_sa_layers 12`), so layers 9-12
    must survive as fresh init rather than vanish with a subtree swap.
    """
    if isinstance(init, dict):
        out = {}
        for k, v in init.items():
            if isinstance(pre, dict) and k in pre:
                out[k] = _merge_subtree(
                    v, pre[k], f"{path}/{k}", restored, fresh, mismatched
                )
            else:
                out[k] = v
                fresh.append(f"{path}/{k}")
        return out
    init_shape = getattr(init, "shape", None)
    pre_shape = getattr(pre, "shape", None)
    if init_shape == pre_shape:
        restored.append(path)
        return pre
    mismatched.append(f"{path}: ckpt{pre_shape} != model{init_shape}")
    return init


def restore_backbone(
    init_params: dict,
    pretrained_params: dict,
    submodules: Iterable[str] = ("stem", "encoder"),
    log=None,
) -> dict:
    """Merge the named top-level subtrees from a pretrain checkpoint into a
    freshly initialized finetune parameter tree, leaf by leaf.

    Equivalent in effect to the reference's `"module."+k` remap +
    `strict=False` load (`ft_cls.py:92-98`, `ft_partseg.py:83`) — the
    pretrain projection head is dropped, the finetune head keeps its fresh
    init, and finetune layers *beyond* the pretrain depth keep theirs — but
    explicit: returns a new tree and reports exactly which subtrees were
    restored, which stayed fresh, and any shape mismatches (kept fresh,
    loudly)."""
    out = dict(init_params)
    restored, fresh, mismatched = [], [], []
    for name in init_params:
        if name in submodules and name in pretrained_params:
            out[name] = _merge_subtree(
                init_params[name], pretrained_params[name], name,
                restored, fresh, mismatched,
            )
        else:
            fresh.append(name)
    msg = (
        f"backbone restore: {len(restored)} tensors from checkpoint; "
        f"fresh init for {fresh}"
    )
    if mismatched:
        msg += f"; SHAPE MISMATCH (kept fresh): {mismatched}"
    if log is not None:
        log(msg)
    return out
