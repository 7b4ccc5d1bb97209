"""Evaluation-suite tests: JAX SVM vs sklearn, few-shot protocol, IoU rules."""

import numpy as np
import pytest

from vipformer_tpu.evaluation import (
    PartSegMetrics,
    fewshot_eval,
    fit_svm,
    semseg_miou,
    shape_ious,
)


def _blobs(rng, n_per_class, num_classes, dim=16, spread=4.0, centers=None):
    if centers is None:
        centers = rng.standard_normal((num_classes, dim)) * spread
    X, y = [], []
    for c in range(num_classes):
        X.append(centers[c] + rng.standard_normal((n_per_class, dim)))
        y.extend([c] * n_per_class)
    return np.concatenate(X).astype(np.float32), np.array(y), centers


def test_jax_svm_separable(rng):
    X, y, _ = _blobs(rng, 50, 5)
    svm = fit_svm(X, y, c=1.0)
    assert svm.score(X, y) > 0.99


def test_jax_svm_close_to_sklearn(rng):
    """On overlapping blobs, the on-device squared-hinge OvR probe must land
    within a couple points of sklearn's SVC (different objective/multiclass
    scheme, same regime)."""
    Xtr, ytr, centers = _blobs(rng, 60, 4, spread=1.5)
    Xte, yte, _ = _blobs(rng, 40, 4, spread=1.5, centers=centers)
    ours = fit_svm(Xtr, ytr, c=1.0).score(Xte, yte)
    sk = fit_svm(Xtr, ytr, c=1.0, backend="sklearn").score(Xte, yte)
    assert abs(ours - sk) < 0.05, (ours, sk)


def test_svm_standardize(rng):
    X, y, _ = _blobs(rng, 30, 3)
    X_scaled = X * np.array([1000.0] + [1.0] * 15)  # wreck one scale
    svm = fit_svm(X_scaled, y, standardize=True)
    assert svm.score(X_scaled, y) > 0.95


def test_fewshot_protocol(rng):
    feats, labels, _ = _blobs(rng, 40, 10)
    mean, std, accs = fewshot_eval(
        feats, labels, k_way=5, n_shot=10, n_query=20, n_runs=3, seed=0
    )
    assert len(accs) == 3
    assert mean > 90.0  # separable blobs => near-perfect episodes
    # deterministic under the same seed
    mean2, _, _ = fewshot_eval(
        feats, labels, k_way=5, n_shot=10, n_query=20, n_runs=3, seed=0
    )
    assert mean == mean2


def test_shape_iou_perfect_and_empty_union():
    seg = np.array([[12, 12, 13, 13]])  # chair parts
    pred = seg.copy()
    obj = np.array([4])
    # parts 14, 15 of chair are absent from both pred and gt -> IoU 1 each
    out = shape_ious(pred, seg, obj)
    assert out[0] == 1.0


def test_shape_iou_half_overlap():
    seg = np.array([[12, 12, 12, 12]])
    pred = np.array([[12, 12, 13, 13]])
    obj = np.array([4])
    # part 12: I=2, U=4 -> 0.5; part 13: I=0, U=2 -> 0; parts 14, 15 -> 1
    assert abs(shape_ious(pred, seg, obj)[0] - (0.5 + 0 + 1 + 1) / 4) < 1e-9


def test_partseg_metrics_accumulator(rng):
    m = PartSegMetrics()
    seg = np.array([[12, 13, 14, 15], [0, 1, 2, 3]])
    pred = seg.copy()
    obj = np.array([4, 0])
    m.update(pred, seg, obj)
    r = m.results()
    assert r["mean_part_iou"] == 1.0
    assert r["mean_category_iou"] == 1.0
    assert r["point_level_acc"] == 1.0
    assert r["mean_part_acc"] == 1.0


def test_partseg_metrics_valid_mask():
    m = PartSegMetrics()
    seg = np.array([[12, 13], [0, 0]])
    pred = np.array([[12, 13], [3, 3]])  # wrong but masked out
    m.update(pred, seg, np.array([4, 0]), valid=np.array([True, False]))
    assert m.results()["point_level_acc"] == 1.0


def test_semseg_miou():
    seg = np.array([[0, 0, 1, 1]])
    pred = np.array([[0, 1, 1, 1]])
    out = semseg_miou(pred, seg, num_classes=13)
    assert abs(out["point_level_acc"] - 0.75) < 1e-9
    # class 0: I=1 U=2 -> 0.5; class 1: I=2 U=3 -> 2/3
    assert abs(out["miou"] - (0.5 + 2 / 3) / 2) < 1e-9
