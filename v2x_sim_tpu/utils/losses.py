"""Training losses for the detection and segmentation heads.

Analogs of the reference's `SoftmaxFocalClassificationLoss` and
`WeightedSmoothL1LocalizationLoss` († coperception/utils/loss.py,
SURVEY.md §2.1), plus pixel cross-entropy for segmentation.

Every loss comes in a `*_sum` form returning (sum, normalizer-count) so
the task modules can normalize by the GLOBAL count under data
parallelism: the counts are psum'd across the mesh before dividing, and
gradients are then psum'd (not pmean'd) — which makes an N-way DP step
bitwise-equivalent in expectation to the single-device step on the full
batch (see tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def softmax_focal_loss_sum(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Softmax focal loss over anchor classification.

    Args:
      logits: (..., K, C) per-anchor class logits (C=2: background, vehicle).
      labels: (..., K) int32 in {-1 ignore, 0 background, 1..C-1 classes}.
      gamma: focusing exponent.   # VERIFY vs reference defaults
      alpha: positive-class balance weight.

    Returns:
      (loss_sum, num_positive) — normalize by the positive count
      (RetinaNet convention): with ~10^5 anchors and tens of positives,
      normalizing by total anchors would dilute the foreground gradient.
    """
    c = logits.shape[-1]
    if c == 2 and logits.ndim >= 3:
        # Binary fast path on layout-safe views. Two rules, both learned
        # from multi-GB padded HBM copies / 100x-slow backward passes at
        # production geometry:
        #   * never materialize a big (..., K, C)-minor tensor — fold the
        #     trailing dims and slice the channel (like ops.postprocess);
        #   * never stride a giant 1-D axis — its transpose (backward) is
        #     pathological on TPU; stride the modest folded channel dim.
        k = logits.shape[-2]
        x = logits.reshape(logits.shape[:-2] + (k * c,))
        rows = x.shape[0]
        x0 = x[..., 0::c].reshape(rows, -1).astype(jnp.float32)
        x1 = x[..., 1::c].reshape(rows, -1).astype(jnp.float32)
        l = labels.reshape(rows, -1)
        lse = jnp.logaddexp(x0, x1)
        pt_log = jnp.where(l > 0, x1, x0) - lse
        pt = jnp.exp(pt_log)
        alpha_t = jnp.where(l > 0, alpha, 1.0 - alpha)
        loss = -alpha_t * (1.0 - pt) ** gamma * pt_log
        weight = (l >= 0).astype(jnp.float32)
        num_pos = jnp.sum((l > 0).astype(jnp.float32))
        return jnp.sum(loss * weight), num_pos

    logits = logits.astype(jnp.float32)  # bf16 sums over ~10^7 anchors drift
    ignore = labels < 0
    safe_labels = jnp.clip(labels, 0, c - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(safe_labels, c, dtype=logits.dtype)
    pt_log = jnp.sum(onehot * logp, axis=-1)
    pt = jnp.exp(pt_log)
    alpha_t = jnp.where(safe_labels > 0, alpha, 1.0 - alpha)
    loss = -alpha_t * (1.0 - pt) ** gamma * pt_log
    weight = (~ignore).astype(logits.dtype)
    num_pos = jnp.sum((labels > 0).astype(logits.dtype))
    return jnp.sum(loss * weight), num_pos


def smooth_l1_loss_sum(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray,
    delta: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked smooth-L1 (Huber) localization loss.

    Args:
      pred: (..., K, 6) predicted box codes.
      target: (..., K, 6) encoded GT codes.
      mask: (..., K) 1.0 where the anchor is positive.

    Returns:
      (loss_sum, num_positive).
    """
    # Layout-safe formulation: fold (K, code) into one channel dim, do
    # the elementwise Huber there, and reduce per-anchor via `code`
    # strided slices of the modest folded channel axis (see the focal
    # loss for the two TPU layout rules this follows).
    code = pred.shape[-1]
    if pred.ndim < 3:  # small/low-rank inputs: no layout concerns
        diff = jnp.abs(
            pred.astype(jnp.float32) - target.reshape(pred.shape).astype(jnp.float32)
        )
        loss = jnp.where(
            diff < delta, 0.5 * diff * diff / delta, diff - 0.5 * delta
        )
        m = mask.astype(jnp.float32)
        return jnp.sum(jnp.sum(loss, axis=-1) * m), jnp.sum(m)
    k = pred.shape[-2]
    x = pred.reshape(pred.shape[:-2] + (k * code,)).astype(jnp.float32)
    t = target.reshape(x.shape).astype(jnp.float32)
    rows = x.shape[0]
    diff = jnp.abs(x - t)
    loss = jnp.where(diff < delta, 0.5 * diff * diff / delta, diff - 0.5 * delta)
    per_anchor = sum(
        loss[..., j::code].reshape(rows, -1) for j in range(code)
    )
    m = mask.reshape(rows, -1).astype(jnp.float32)
    return jnp.sum(per_anchor * m), jnp.sum(m)


def seg_cross_entropy_sum(
    logits: jnp.ndarray, labels: jnp.ndarray, num_classes: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel softmax cross-entropy; labels < 0 are ignored.

    Returns (loss_sum, valid_pixel_count)."""
    logits = logits.astype(jnp.float32)
    ignore = labels < 0
    safe = jnp.clip(labels, 0, num_classes - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    weight = (~ignore).astype(logits.dtype)
    return jnp.sum(nll * weight), jnp.sum(weight)


def kd_mse_loss_sum(
    student: jnp.ndarray, teacher: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Feature-map distillation MSE (DiscoNet student vs TeacherNet).

    Returns (squared_error_sum, element_count)."""
    student = student.astype(jnp.float32)
    teacher = teacher.astype(jnp.float32)
    return (
        jnp.sum((student - teacher) ** 2),
        jnp.asarray(student.size, jnp.float32),
    )


def _norm(pair: Tuple[jnp.ndarray, jnp.ndarray]) -> jnp.ndarray:
    s, n = pair
    return s / jnp.maximum(n, 1.0)


# Mean-normalized convenience wrappers (single-device semantics).
def softmax_focal_loss(logits, labels, gamma=2.0, alpha=0.25):
    return _norm(softmax_focal_loss_sum(logits, labels, gamma, alpha))


def smooth_l1_loss(pred, target, mask, delta=1.0):
    return _norm(smooth_l1_loss_sum(pred, target, mask, delta))


def seg_cross_entropy(logits, labels, num_classes):
    return _norm(seg_cross_entropy_sum(logits, labels, num_classes))


def kd_mse_loss(student, teacher):
    return _norm(kd_mse_loss_sum(student, teacher))


def smooth_l1_loss_sparse_sum(
    pred: jnp.ndarray,
    cell: jnp.ndarray,
    lane: jnp.ndarray,
    target: jnp.ndarray,
    weight: jnp.ndarray,
    delta: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Smooth-L1 over SPARSE positive anchors.

    The dense formulation hauls a (B, A, H, W, K, 6) float32 target
    tensor (905 MB at production geometry) through prepare, the loss,
    and its backward — all to touch ~10^2 positive anchors per scene.
    The per-op trace (tools/xprof_det --what train) showed ~35 ms/step
    of pure HBM traffic on it. Here the positives arrive as indices +
    targets, predictions are fetched with one-hot MXU contractions
    (gather lowerings are VMEM-bound on TPU — docs/PERF.md), and the
    backward of the fetch is another dense matmul that feeds the conv
    grad directly.

    Args:
      pred: (B, A, R, F) predicted codes in folded conv layout — R cells,
        F = K*code lanes (K anchors per cell; blocked layout folds the
        2x2 phase into K).
      cell: (B, A, P) int32 row index of each positive (< R).
      lane: (B, A, P) int32 anchor-within-row index (< K).
      target: (B, A, P, code) encoded GT codes.
      weight: (B, A, P) 1.0 for real positives, 0.0 padding.

    Returns:
      (loss_sum, num_positive).
    """
    b, a, r, f = pred.shape
    code = target.shape[-1]
    kk = f // code
    n = b * a
    p = cell.shape[-1]
    pf = pred.reshape(n, r, f)
    sel = (
        cell.reshape(n, p)[:, :, None] == jnp.arange(r)[None, None, :]
    ).astype(pf.dtype)
    rows = jnp.einsum("npr,nrf->npf", sel, pf)
    lsel = (
        lane.reshape(n, p)[..., None] == jnp.arange(kk)
    ).astype(pf.dtype)
    x = jnp.einsum(
        "npk,npkc->npc", lsel, rows.reshape(n, p, kk, code)
    ).astype(jnp.float32)
    t = target.reshape(n, p, code).astype(jnp.float32)
    diff = jnp.abs(x - t)
    loss = jnp.where(
        diff < delta, 0.5 * diff * diff / delta, diff - 0.5 * delta
    )
    w = weight.reshape(n, p).astype(jnp.float32)
    return jnp.sum(jnp.sum(loss, axis=-1) * w), jnp.sum(w)
