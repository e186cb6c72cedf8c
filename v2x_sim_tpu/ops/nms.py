"""Rotated-box NMS, static-shape and on-device.

The reference runs greedy NMS on host through shapely polygon IoU
(† coperception/utils/postprocess.py + detection_util.py, SURVEY.md §2.1) —
a GPU->host boundary in its eval loop (SURVEY.md §3.3). Here NMS stays on
device: a top-K pre-selection gives a static candidate count, the full
K x K exact rotated-IoU matrix is one batched kernel, and greedy
suppression is a `fori_loop` of masked vector ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from v2x_sim_tpu.ops.iou_sh import rotated_iou_matrix_auto

NEG_INF = -1e9


class NMSResult(NamedTuple):
    """boxes (K, 5), scores (K,), valid (K,) — score-sorted, suppressed
    entries have valid=False and score=NEG_INF."""

    boxes: jnp.ndarray
    scores: jnp.ndarray
    valid: jnp.ndarray


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.1,
) -> NMSResult:
    """Greedy rotated NMS over a fixed-size candidate set.

    Args:
      boxes: (K, 5) candidate boxes.
      scores: (K,) scores.
      valid: (K,) bool — padding/low-score entries to ignore.
      iou_threshold: suppression threshold (reference det default ~0.1?
        # VERIFY vs reference († coperception/utils/postprocess.py)).

    Returns:
      NMSResult with surviving boxes score-sorted first.
    """
    k = boxes.shape[0]
    scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-scores)
    boxes = boxes[order]
    scores = scores[order]
    valid = valid[order]

    iou = rotated_iou_matrix_auto(boxes, boxes)
    idx = jnp.arange(k)

    def body(i, keep):
        sup = (iou[i] > iou_threshold) & (idx > i) & keep[i] & keep
        return keep & ~sup

    # Heavy unroll: each iteration is a trivial vector op, so the loop is
    # dominated by per-iteration while-loop dispatch on TPU (~12 ms at
    # K=256 without unrolling).
    keep = jax.lax.fori_loop(0, k, body, valid, unroll=32)
    return NMSResult(boxes, jnp.where(keep, scores, NEG_INF), keep)


def batched_nms(boxes, scores, valid, iou_threshold: float = 0.1) -> NMSResult:
    """vmap NMS over leading batch dims: (..., K, 5)/(..., K)."""
    batch_shape = boxes.shape[:-2]
    fn = lambda b, s, v: nms(b, s, v, iou_threshold)
    flat = jax.vmap(fn)(
        boxes.reshape((-1,) + boxes.shape[-2:]),
        scores.reshape((-1,) + scores.shape[-1:]),
        valid.reshape((-1,) + valid.shape[-1:]),
    )
    return NMSResult(
        flat.boxes.reshape(batch_shape + flat.boxes.shape[-2:]),
        flat.scores.reshape(batch_shape + flat.scores.shape[-1:]),
        flat.valid.reshape(batch_shape + flat.valid.shape[-1:]),
    )
