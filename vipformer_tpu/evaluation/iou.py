"""Segmentation metrics, vectorized.

Reproduces the reference's exact metric definitions:
* per-shape part IoU with the empty-union -> IoU=1 rule
  (`ft_partseg.py:297-322`, `utils.calculate_shape_IoU:352-376`),
* instance-mean part IoU (mean over all shapes),
* category-mean IoU (mean over the 16 category means),
* mean part accuracy (per-part-id predicted/total count ratio,
  `ft_partseg.py:290-295,324` — note the reference divides predicted-count
  by true-count, reproduced as-is),
* point-level accuracy.

Everything is numpy over accumulated predictions (the per-batch work is a
couple of bincounts; the reference loops per sample per part on device).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

SEG_NUM = (4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3)
INDEX_START = (0, 4, 6, 8, 12, 16, 19, 22, 24, 28, 30, 36, 38, 41, 44, 47)
CATEGORIES = (
    "Airplane", "Bag", "Cap", "Car", "Chair", "Earphone", "Guitar", "Knife",
    "Lamp", "Laptop", "Motorbike", "Mug", "Pistol", "Rocket", "Skateboard",
    "Table",
)


def shape_ious(
    pred: np.ndarray, seg: np.ndarray, obj_label: np.ndarray
) -> np.ndarray:
    """Per-shape mean part IoU. pred/seg: [B, N] part ids; obj_label: [B]."""
    out = np.zeros(len(pred), dtype=np.float64)
    for i in range(len(pred)):
        c = int(obj_label[i])
        lo, k = INDEX_START[c], SEG_NUM[c]
        ious = []
        for part in range(lo, lo + k):
            p = pred[i] == part
            g = seg[i] == part
            union = np.logical_or(p, g).sum()
            if union == 0:
                ious.append(1.0)  # empty-union rule (ft_partseg.py:306-307)
            else:
                ious.append(np.logical_and(p, g).sum() / union)
        out[i] = np.mean(ious)
    return out


@dataclass
class PartSegMetrics:
    """Streaming accumulator over evaluation batches."""

    num_parts: int = 50
    part_pred_count: np.ndarray = None
    part_true_count: np.ndarray = None
    correct_points: int = 0
    total_points: int = 0
    cat_ious: dict = field(default_factory=lambda: {c: [] for c in CATEGORIES})

    def __post_init__(self):
        self.part_pred_count = np.zeros(self.num_parts, dtype=np.int64)
        self.part_true_count = np.zeros(self.num_parts, dtype=np.int64)

    def update(
        self,
        pred: np.ndarray,
        seg: np.ndarray,
        obj_label: np.ndarray,
        valid: np.ndarray | None = None,
    ) -> None:
        if valid is not None:
            pred, seg, obj_label = pred[valid], seg[valid], obj_label[valid]
        if len(pred) == 0:
            return
        self.correct_points += int((pred == seg).sum())
        self.total_points += pred.size
        self.part_pred_count += np.bincount(
            pred.reshape(-1), minlength=self.num_parts
        )
        self.part_true_count += np.bincount(
            seg.reshape(-1), minlength=self.num_parts
        )
        ious = shape_ious(pred, seg, obj_label)
        for i, c in enumerate(obj_label):
            self.cat_ious[CATEGORIES[int(c)]].append(ious[i])

    def results(self) -> dict:
        all_ious = [v for vs in self.cat_ious.values() for v in vs]
        cat_means = [np.mean(vs) for vs in self.cat_ious.values() if vs]
        with np.errstate(divide="ignore", invalid="ignore"):
            part_acc = self.part_pred_count / np.maximum(
                self.part_true_count, 1
            )
        seen = self.part_true_count > 0
        return {
            "mean_part_iou": float(np.mean(all_ious)) if all_ious else 0.0,
            "mean_category_iou": float(np.mean(cat_means)) if cat_means else 0.0,
            "mean_part_acc": float(np.mean(part_acc[seen])) if seen.any() else 0.0,
            "point_level_acc": self.correct_points / max(self.total_points, 1),
        }


def semseg_miou(
    pred: np.ndarray, seg: np.ndarray, num_classes: int = 13
) -> dict:
    """Semantic-seg overall accuracy + class-mean IoU over all points."""
    pred = pred.reshape(-1)
    seg = seg.reshape(-1)
    acc = float(np.mean(pred == seg))
    ious = []
    for c in range(num_classes):
        p = pred == c
        g = seg == c
        union = np.logical_or(p, g).sum()
        if union > 0:
            ious.append(np.logical_and(p, g).sum() / union)
    return {"point_level_acc": acc, "miou": float(np.mean(ious))}
