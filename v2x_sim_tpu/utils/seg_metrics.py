"""Segmentation metrics: confusion-matrix mIoU.

Analog of † coperception/utils/SegMetrics.py `ComputeIoU` (SURVEY.md
§2.1). The confusion matrix is accumulated on device with one bincount
per batch; mIoU is read out on host at epoch end.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    pred: jnp.ndarray, label: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """(...,) int predictions vs labels -> (C, C) counts; label<0 ignored."""
    valid = label >= 0
    idx = label * num_classes + pred
    idx = jnp.where(valid, idx, num_classes * num_classes)
    counts = jnp.bincount(
        idx.reshape(-1), length=num_classes * num_classes + 1
    )[: num_classes * num_classes]
    return counts.reshape(num_classes, num_classes)


def iou_from_confusion(cm: np.ndarray) -> Dict[str, float]:
    """Per-class IoU and mIoU from an accumulated confusion matrix."""
    cm = np.asarray(cm, np.float64)
    tp = np.diag(cm)
    denom = cm.sum(0) + cm.sum(1) - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(denom > 0, tp / denom, np.nan)
    out = {f"iou_class{i}": float(v) for i, v in enumerate(iou)}
    out["miou"] = float(np.nanmean(iou))
    return out
