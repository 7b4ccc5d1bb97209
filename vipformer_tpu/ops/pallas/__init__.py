from vipformer_tpu.ops.pallas.fps import fps_pallas

# ---------------------------------------------------------------------------
# tensor-parallel kernel gate
#
# The Pallas kernels consume packed [B, N, H*dh] (or [B, G, S, C]) operands
# whole; under a mesh with model_axis > 1 those operands are TP-sharded on
# the feature axis and a pallas_call has no SPMD partitioning rule — GSPMD
# would either force an allgather-to-replicated in front of every kernel or
# fail to lower. Until the kernels are shard_map'ed over heads, TP runs use
# the XLA paths (which are sharding-aware); `make_mesh` flips this flag and
# every *_enabled gate consults it. DP-only meshes keep the kernels on: the
# batch axis is the kernels' own grid axis.

_TP_ACTIVE = False


def set_tp_kernel_gate(model_axis: int, log=None) -> None:
    """Called by parallel.make_mesh; disables Pallas kernels for TP runs."""
    global _TP_ACTIVE
    active = model_axis > 1
    if active and not _TP_ACTIVE and log is not None:
        log(
            "model_axis>1: Pallas kernels disabled for this run "
            "(packed-layout kernels are unproven under tensor-parallel "
            "sharding; XLA attention/gather paths are used instead)"
        )
    _TP_ACTIVE = active


def tp_kernels_disabled() -> bool:
    return _TP_ACTIVE


__all__ = ["fps_pallas", "set_tp_kernel_gate", "tp_kernels_disabled"]


import contextlib


@contextlib.contextmanager
def xla_reference_mode():
    """Force every kernel gate to the XLA path for the duration.

    Used for FLOPs accounting: XLA's cost model reports 0 FLOPs for a
    custom call, so a forward lowered with the Pallas kernels live
    UNDER-counts the model (the attention/stem matmuls live inside the
    kernels). Lowering under this context yields the full analytical
    model-FLOPs for the same computation (bench.py MFU denominator).
    """
    import vipformer_tpu.ops.geometry as geometry
    from vipformer_tpu.ops.pallas import (
        attention, dense, g2e_train, gather, stem,
    )

    saved = (
        attention.USE_FUSED_ATTENTION,
        dense.USE_DENSE_GRAD,
        gather.USE_MXU_GATHER,
        stem.USE_FUSED_STEM,
        g2e_train.USE_G2E_TRAIN,
        geometry.USE_PALLAS_FPS,
        geometry.KNN_METHOD,
    )
    try:
        attention.USE_FUSED_ATTENTION = False
        dense.USE_DENSE_GRAD = False
        gather.USE_MXU_GATHER = False
        stem.USE_FUSED_STEM = False
        g2e_train.USE_G2E_TRAIN = False
        geometry.USE_PALLAS_FPS = False
        geometry.KNN_METHOD = "exact"
        yield
    finally:
        (
            attention.USE_FUSED_ATTENTION,
            dense.USE_DENSE_GRAD,
            gather.USE_MXU_GATHER,
            stem.USE_FUSED_STEM,
            g2e_train.USE_G2E_TRAIN,
            geometry.USE_PALLAS_FPS,
            geometry.KNN_METHOD,
        ) = saved
