from vipformer_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    data_axis_size,
    make_mesh,
    maybe_initialize_distributed,
    replicated,
)
from vipformer_tpu.parallel.sharding import (
    param_shardings,
    place_state,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "data_axis_size",
    "make_mesh",
    "maybe_initialize_distributed",
    "replicated",
    "param_shardings",
    "place_state",
    "shard_batch",
]
