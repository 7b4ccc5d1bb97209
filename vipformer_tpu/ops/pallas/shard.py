"""shard_map plumbing: keep the Pallas kernels live on multi-device meshes.

Why this exists: `pallas_call` has no SPMD partitioning rule. Under
pjit/GSPMD a kernel whose operands are sharded either forces an
allgather-to-replicated in front of every call or fails to lower (JAX 0.9's
abstract eval raises "pallas_call requires all mesh axes to be Manual" for
sharding-typed operands). The ecosystem answer is to run kernels under
`jax.shard_map`, where each shard sees an ordinary local array — that is
what these helpers do, transparently, at every kernel call site:

* single-device mesh (or no mesh registered): direct call, zero overhead —
  the single-chip benchmarks compile byte-identical programs;
* data-parallel mesh: the kernel runs per data shard on its local batch
  rows (the kernels' own grid axis IS the batch axis, so per-shard
  execution is exactly the same computation);
* tensor-parallel mesh (`model_axis > 1`): the packed attention kernels
  additionally split over heads — q/k/v arrive feature-sharded from the
  Megatron-style projection shardings (parallel/sharding.py `_TP_RULES`)
  and the head-major packed layout [B, N, H*dh] makes the feature shards
  exactly whole heads, so each model shard runs the kernel on its own
  heads with no collective.

`parallel.make_mesh` registers the active mesh here. The wrappers fall
back to a direct call whenever the shapes don't divide the mesh (e.g. a
ragged last eval batch) — behaviorally identical to before this module.

Weight-gradient reductions: kernels with replicated parameter operands
(dense dW/db, Group2Emb) must `psum` their weight grads over the data
axis inside the wrapped backward — see ops/pallas/dense.py and
g2e_train.py. Kernels whose cotangents are all batch-sharded (flash
attention, gather) need no collective.

The reference has no analogue: its kernels are stock torch ops inside
DDP (`/root/reference/pretrain.py:104-109`), where NCCL allreduce handles
everything. Here the collective placement is explicit per kernel.
"""

from __future__ import annotations

from typing import Sequence

import jax
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array

_MESH: Mesh | None = None


def register_mesh(mesh: Mesh | None) -> None:
    """Called by parallel.make_mesh; `None` clears (single-device mode)."""
    global _MESH
    _MESH = mesh


def active_mesh() -> Mesh | None:
    return _MESH


def sharding_active() -> bool:
    """True when kernels must run under shard_map (mesh with >1 device)."""
    return _MESH is not None and _MESH.devices.size > 1


def data_axis() -> str:
    return _MESH.axis_names[0]


def model_axis() -> str:
    return _MESH.axis_names[1]


def data_size() -> int:
    return 1 if _MESH is None else _MESH.shape[_MESH.axis_names[0]]


def model_size() -> int:
    return 1 if _MESH is None else _MESH.shape[_MESH.axis_names[1]]


def _dp_spec(rank: int) -> P:
    """Leading axis over data, rest replicated."""
    return P(data_axis(), *([None] * (rank - 1)))


def data_sharded_call(
    fn,
    args: Sequence[Array],
    batched: Sequence[bool],
    out_batched: Sequence[bool] | bool,
):
    """Run `fn(*args)` with the batched args' leading axis over the data
    axis (model axis unmapped == replicated compute per model shard).

    `batched[i]` marks args whose axis 0 is the batch; others are
    replicated (parameters, scalars). `out_batched` likewise for the
    outputs (a bool for a single-array result). Falls back to a direct
    call when no multi-device mesh is registered or the batch doesn't
    divide the data axis.
    """
    if not sharding_active():
        return fn(*args)
    d = data_size()
    if any(b and (a.shape[0] % d) for a, b in zip(args, batched)):
        return fn(*args)
    in_specs = tuple(
        _dp_spec(a.ndim) if b else P() for a, b in zip(args, batched)
    )
    single = isinstance(out_batched, bool)
    ob = (out_batched,) if single else tuple(out_batched)

    def wrapped(*xs):
        out = fn(*xs)
        outs = (out,) if single else tuple(out)
        return outs

    def out_specs_for(outs):
        return tuple(
            _dp_spec(o.ndim) if b else P() for o, b in zip(outs, ob)
        )

    # out specs need output ranks: get them from an abstract eval
    out_avals = jax.eval_shape(
        lambda *xs: wrapped(*xs),
        *(
            jax.ShapeDtypeStruct(
                (a.shape[0] // d, *a.shape[1:]) if b else a.shape, a.dtype
            )
            for a, b in zip(args, batched)
        ),
    )
    out_specs = out_specs_for(out_avals)
    res = jax.shard_map(
        wrapped,
        mesh=_MESH,
        in_specs=in_specs,
        out_specs=out_specs,
        check_vma=False,
    )(*args)
    return res[0] if single else res


def tp_heads_shardable(num_heads: int, packed_dim: int) -> bool:
    """Can a packed-layout attention kernel split over the model axis?

    Requires whole heads per shard; the packed feature axis [H*dh] then
    shards into contiguous per-shard head blocks.
    """
    t = model_size()
    return t == 1 or (num_heads % t == 0 and packed_dim % t == 0)


def kv_attention_sharded_call(
    fn,
    q: Array,
    x_kv: Array,
    rep: Sequence[Array],
    wk: Array,
    wv: Array,
    *,
    num_heads: int,
):
    """Run a kv-projection-fused packed attention kernel under shard_map.

    `fn(q, x_kv, *rep, wk, wv, local_heads)` is called per shard with
    q [B, G, H*dh] batch-sharded over data and heads over model,
    x_kv [B, M, Din] batch-sharded only, `rep` replicated (e.g. the kv
    LayerNorm scale/bias), and wk/wv [Din, H*dh] column-sharded over the
    model axis — the head-major packed layout makes the Megatron column
    shards exactly whole heads, so each model shard projects and attends
    its own heads with no collective (fwd-only kernels: no weight grads,
    hence no psum). Falls back to a direct call when no multi-device
    mesh is registered or the shapes don't divide it.
    """
    if not sharding_active():
        return fn(q, x_kv, *rep, wk, wv, num_heads)
    d, t = data_size(), model_size()
    if q.shape[0] % d or num_heads % t or q.shape[-1] % t:
        return fn(q, x_kv, *rep, wk, wv, num_heads)
    mam = model_axis() if t > 1 else None
    qspec = P(data_axis(), None, mam)
    xspec = P(data_axis(), None, None)
    wspec = P(None, mam)
    local_h = num_heads // t
    return jax.shard_map(
        lambda qq, xx, *rest: fn(qq, xx, *rest, local_h),
        mesh=_MESH,
        in_specs=(qspec, xspec) + tuple(P() for _ in rep) + (wspec, wspec),
        out_specs=qspec,
        check_vma=False,
    )(q, x_kv, *rep, wk, wv)


def attention_sharded_call(fn, q: Array, k: Array, v: Array, *, num_heads: int):
    """Run a packed-layout attention kernel (q [B, G, H*dh], k/v
    [B, M, H*dh]) under shard_map: batch over data, heads over model.

    `fn(q, k, v, num_heads)` is called with per-shard operands and the
    per-shard head count. Caller gates must have checked
    `tp_heads_shardable` already; falls back to a direct call when the
    mesh is single-device or the batch doesn't divide.
    """
    if not sharding_active():
        return fn(q, k, v, num_heads)
    d, t = data_size(), model_size()
    if q.shape[0] % d or num_heads % t or q.shape[-1] % t:
        return fn(q, k, v, num_heads)
    spec = P(data_axis(), None, model_axis() if t > 1 else None)
    local_h = num_heads // t
    return jax.shard_map(
        lambda a, b, c: fn(a, b, c, local_h),
        mesh=_MESH,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v)
