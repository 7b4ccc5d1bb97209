from vipformer_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    data_axis_size,
    make_mesh,
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
    "replicated",
    "param_shardings",
    "place_state",
    "shard_batch",
]
