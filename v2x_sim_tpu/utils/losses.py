"""Training losses for the detection and segmentation heads.

Analogs of the reference's `SoftmaxFocalClassificationLoss` and
`WeightedSmoothL1LocalizationLoss` († coperception/utils/loss.py,
SURVEY.md §2.1), plus pixel cross-entropy for segmentation. All are pure
jnp functions over dense masked targets — no dynamic shapes.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def softmax_focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Softmax focal loss over anchor classification.

    Args:
      logits: (..., K, C) per-anchor class logits (C=2: background, vehicle).
      labels: (..., K) int32 in {-1 ignore, 0 background, 1..C-1 classes}.
      gamma: focusing exponent.   # VERIFY vs reference defaults
      alpha: positive-class balance weight.

    Returns:
      Scalar mean loss over non-ignored anchors.
    """
    c = logits.shape[-1]
    ignore = labels < 0
    safe_labels = jnp.clip(labels, 0, c - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(safe_labels, c, dtype=logits.dtype)
    pt_log = jnp.sum(onehot * logp, axis=-1)
    pt = jnp.exp(pt_log)
    alpha_t = jnp.where(safe_labels > 0, alpha, 1.0 - alpha)
    loss = -alpha_t * (1.0 - pt) ** gamma * pt_log
    weight = (~ignore).astype(logits.dtype)
    denom = jnp.maximum(jnp.sum(weight), 1.0)
    return jnp.sum(loss * weight) / denom


def smooth_l1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    delta: float = 1.0,
) -> jnp.ndarray:
    """Masked smooth-L1 (Huber) localization loss.

    Args:
      pred: (..., K, 6) predicted box codes.
      target: (..., K, 6) encoded GT codes.
      mask: (..., K) 1.0 where the anchor is positive.

    Returns:
      Scalar loss, normalized by positive-anchor count.
    """
    diff = jnp.abs(pred - target)
    loss = jnp.where(
        diff < delta, 0.5 * diff * diff / delta, diff - 0.5 * delta
    )
    loss = jnp.sum(loss, axis=-1) * mask
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(loss) / denom


def seg_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """Per-pixel softmax cross-entropy for BEV semantic segmentation.

    Args:
      logits: (..., H, W, C).
      labels: (..., H, W) int32 class ids; negatives are ignored.
    """
    ignore = labels < 0
    safe = jnp.clip(labels, 0, num_classes - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    weight = (~ignore).astype(logits.dtype)
    return jnp.sum(nll * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def kd_mse_loss(student: jnp.ndarray, teacher: jnp.ndarray) -> jnp.ndarray:
    """Feature-map knowledge distillation (DiscoNet student vs TeacherNet)."""
    return jnp.mean((student - teacher) ** 2)
