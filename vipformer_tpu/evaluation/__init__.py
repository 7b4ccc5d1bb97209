from vipformer_tpu.evaluation.fewshot import fewshot_eval
from vipformer_tpu.evaluation.flops import complexity_report, forward_flops
from vipformer_tpu.evaluation.iou import (
    PartSegMetrics,
    semseg_miou,
    shape_ious,
)
from vipformer_tpu.evaluation.svm import (
    LinearSVM,
    RBFSVM,
    fit_rbf_svm,
    fit_svm,
    grid_search_svm,
)

__all__ = [
    "fewshot_eval",
    "complexity_report",
    "forward_flops",
    "PartSegMetrics",
    "semseg_miou",
    "shape_ious",
    "LinearSVM",
    "RBFSVM",
    "fit_svm",
    "fit_rbf_svm",
    "grid_search_svm",
]
