from vipformer_tpu.ops.geometry import (
    divide_patches,
    farthest_point_sample,
    fps,
    index_points,
    knn,
    square_distance,
    three_nn_interpolate,
    three_nn_weights,
)

__all__ = [
    "divide_patches",
    "farthest_point_sample",
    "fps",
    "index_points",
    "knn",
    "square_distance",
    "three_nn_interpolate",
    "three_nn_weights",
]
