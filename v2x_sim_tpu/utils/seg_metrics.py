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
    # Compare-and-reduce instead of bincount: the scatter-add behind
    # bincount serializes on collisions on TPU (~6x slower for 25M
    # elements into C^2 bins).
    c2 = num_classes * num_classes
    flat = idx.reshape(-1)
    n = flat.size
    pad = -(-n // 512) * 512 - n
    if pad:  # out-of-range filler contributes to no bin
        flat = jnp.concatenate([flat, jnp.full((pad,), c2, flat.dtype)])
    rows = flat.reshape(-1, 512)
    counts = jnp.sum(
        rows[..., None] == jnp.arange(c2, dtype=idx.dtype), axis=(0, 1)
    )
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
