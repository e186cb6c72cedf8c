"""mAP evaluation for rotated BEV detections.

Analog of the reference's mmdetection-derived evaluator
(† coperception/utils/mean_ap.py: `eval_map`/`tpfp_default`/
`average_precision`, SURVEY.md §2.1): VOC-style greedy TP/FP matching at
rotated IoU 0.5 / 0.7, area-mode AP integration, reported per-agent
("local") and averaged ("global").

Split of labor: the (F, K, M) IoU tensor is computed on device in one
static-shape batched call (ops.iou); the greedy match + PR integration is
a cheap exact host loop — scoring stays bit-stable and shapely-free.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from v2x_sim_tpu.ops.iou_sh import rotated_iou_matrix_auto as rotated_iou_matrix


def average_precision(recalls: np.ndarray, precisions: np.ndarray) -> float:
    """Area under the PR curve (mmdet 'area' mode)."""
    mrec = np.concatenate([[0.0], recalls, [1.0]])
    mpre = np.concatenate([[0.0], precisions, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.nonzero(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


# Module-level so repeat eval_map calls (thresholds x agents) reuse the
# compiled executable — a fresh jax.jit wrapper per call retraces and
# recompiles every time (function identity keys the jit cache).
_batched_iou_jit = jax.jit(jax.vmap(rotated_iou_matrix))


def _batched_iou(det_boxes: np.ndarray, gt_boxes: np.ndarray) -> np.ndarray:
    """(F, K, 5) x (F, M, 5) -> (F, K, M) IoU, one compiled call."""
    return np.asarray(
        _batched_iou_jit(jnp.asarray(det_boxes), jnp.asarray(gt_boxes))
    )


def eval_map(
    det_boxes: np.ndarray,
    det_scores: np.ndarray,
    det_valid: np.ndarray,
    gt_boxes: np.ndarray,
    gt_mask: np.ndarray,
    iou_threshold: float = 0.5,
    match: str = "iou",
) -> float:
    """Single-class AP over F frames of padded detections/GT.

    Args:
      det_boxes: (F, K, 5); det_scores: (F, K); det_valid: (F, K) bool.
      gt_boxes: (F, M, 5); gt_mask: (F, M) bool.
      iou_threshold: match threshold — rotated IoU (0.5/0.7) when
        match="iou" (the reference's criterion), or a center distance in
        METERS when match="center" (nuScenes detection-style matching:
        nearest unmatched GT within the radius; the right criterion when
        the voxel grid is coarse relative to the threshold).

    Returns:
      AP in [0, 1].
    """
    f = det_boxes.shape[0]
    if match == "center":
        # Match quality = negative center distance; threshold flips sign.
        qual = -np.linalg.norm(
            det_boxes[:, :, None, :2] - gt_boxes[:, None, :, :2], axis=-1
        )
        thr = -float(iou_threshold)
    else:
        qual = _batched_iou(det_boxes, gt_boxes)
        thr = float(iou_threshold)
    num_gt = int(gt_mask.sum())
    if num_gt == 0:
        return 0.0

    records = []  # (score, is_tp)
    for fi in range(f):
        order = np.argsort(-det_scores[fi])
        matched = np.zeros(gt_boxes.shape[1], bool)
        for di in order:
            if not det_valid[fi, di]:
                continue
            ious = np.where(gt_mask[fi] & ~matched, qual[fi, di], -np.inf)
            gi = int(np.argmax(ious))
            if ious[gi] >= thr:
                matched[gi] = True
                records.append((det_scores[fi, di], 1))
            else:
                records.append((det_scores[fi, di], 0))

    if not records:
        return 0.0
    records.sort(key=lambda r: -r[0])
    tp = np.cumsum([r[1] for r in records])
    fp = np.cumsum([1 - r[1] for r in records])
    recalls = tp / num_gt
    precisions = tp / np.maximum(tp + fp, 1)
    return average_precision(recalls, precisions)


def eval_map_agents(
    det_boxes: np.ndarray,
    det_scores: np.ndarray,
    det_valid: np.ndarray,
    gt_boxes: np.ndarray,
    gt_mask: np.ndarray,
    agent_mask: np.ndarray,
    iou_thresholds: Sequence[float] = (0.5, 0.7),
    match: str = "iou",
) -> Dict[str, float]:
    """Per-agent ("local") and averaged ("global") mAP, reference-style.

    Args:
      det_boxes: (F, A, K, 5) etc.; agent_mask: (F, A).
      match: "iou" (reference) or "center" (thresholds in meters; keys
        get an "m" suffix, e.g. "mAP@2.0m").

    Returns:
      {"mAP@0.5": ..., "mAP@0.7": ..., "agent{i}_mAP@0.5": ...}.
    """
    f, a = det_boxes.shape[:2]
    out: Dict[str, float] = {}
    unit = "m" if match == "center" else ""
    for thr in iou_thresholds:
        per_agent = []
        for ai in range(a):
            keep = agent_mask[:, ai]
            if not keep.any():
                continue
            ap = eval_map(
                det_boxes[keep, ai],
                det_scores[keep, ai],
                det_valid[keep, ai],
                gt_boxes[keep, ai],
                gt_mask[keep, ai],
                thr,
                match=match,
            )
            per_agent.append(ap)
            out[f"agent{ai}_mAP@{thr}{unit}"] = ap
        out[f"mAP@{thr}{unit}"] = float(np.mean(per_agent)) if per_agent else 0.0
    return out
